from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from spider_spark.session import get_spark

    s = get_spark(app="spider_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def world_dir(tmp_path_factory):
    """Small deterministic web world shared by crawl tests."""
    from spider_spark.fixtures import write_world

    d = tmp_path_factory.mktemp("world")
    write_world(str(d), n_hosts=10, median_pages=12, hot_factor=20, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
