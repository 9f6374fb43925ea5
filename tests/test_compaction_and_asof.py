from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from spider_spark.engine.politeness import robots_asof
from spider_spark.oracle import CrawlPolicy

POLICY = CrawlPolicy(max_per_host=4, round_ms=2_000, max_retries=2, max_rounds=12)


def test_robots_asof_versioned(spark):
    """Versioned robots rows: as-of picks the newest fetch ≤ the cut."""
    t = lambda d: datetime(2024, 3, d, tzinfo=timezone.utc)  # noqa: E731
    rows = [
        ("a.test", 100, ["/old"], t(1)),
        ("a.test", 500, ["/new"], t(10)),
        ("b.test", 0, [], t(5)),
    ]
    robots = spark.createDataFrame(
        rows,
        "host string, crawl_delay_ms long, disallow_prefixes array<string>, "
        "fetched_ts timestamp",
    )
    latest = {r["host"]: r for r in robots_asof(robots).collect()}
    assert latest["a.test"]["crawl_delay_ms"] == 500
    assert latest["a.test"]["disallow_prefixes"] == ["/new"]
    asof5 = {r["host"]: r for r in robots_asof(robots, t(5)).collect()}
    assert asof5["a.test"]["crawl_delay_ms"] == 100
    assert asof5["a.test"]["disallow_prefixes"] == ["/old"]
    assert "b.test" in asof5
    asof2 = {r["host"]: r for r in robots_asof(robots, t(2)).collect()}
    assert "b.test" not in asof2  # not yet fetched at the cut


def test_compact_then_resume_identical(spark, world_dir, tmp_path):
    """Compaction after round k must not change anything the rest of the
    crawl produces — final results equal the uncompacted run."""
    from spider_spark.engine import CrawlEngine

    def mk(ckpt):
        return CrawlEngine(
            spark,
            pages_path=os.path.join(world_dir, "pages.parquet"),
            robots_path=os.path.join(world_dir, "robots.parquet"),
            checkpoint_dir=ckpt,
            policy=POLICY,
            n_partitions=4,
        )

    seeds = spark.read.parquet(os.path.join(world_dir, "seeds.parquet"))

    plain = mk(str(tmp_path / "plain"))
    plain.run(seeds=seeds)

    comp = mk(str(tmp_path / "comp"))
    comp.run(seeds=seeds, max_rounds=3)
    info = comp.compact()
    assert info["upto_round"] == 3 and info["compacted"] > 0
    # compacted layout: exactly one seen_delta round dir remains
    seen_root = os.path.join(str(tmp_path / "comp"), "seen_delta")
    assert os.listdir(seen_root) == ["round=3"]
    comp2 = mk(str(tmp_path / "comp"))  # fresh engine: resume post-compact
    comp2.run()

    a = {(r["url"], r["seq"]) for r in plain.results().select("url", "seq").collect()}
    b = {(r["url"], r["seq"]) for r in comp2.results().select("url", "seq").collect()}
    assert a == b
    sa = {r["url"] for r in plain.seen().collect()}
    sb = {r["url"] for r in comp2.seen().collect()}
    assert sa == sb
