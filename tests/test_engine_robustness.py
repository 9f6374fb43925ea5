"""Engine ≡ oracle across different random worlds — not just the shared
fixture. Each world varies topology (hosts, sizes, branching, delays)."""

from __future__ import annotations

import os

import pytest

from spider_spark.fixtures import write_world
from spider_spark.oracle import CrawlPolicy, crawl

CASES = [
    dict(seed=7, n_hosts=5, median_pages=8, hot_factor=6, branching=3),
    dict(seed=99, n_hosts=13, median_pages=6, hot_factor=12, branching=2,
         dead_link_rate=0.15),
    dict(seed=123, n_hosts=3, median_pages=20, hot_factor=3, branching=5,
         delays=[0, 3000]),
]

POLICY = CrawlPolicy(max_per_host=3, round_ms=6_000, max_retries=1, max_rounds=8)


@pytest.mark.parametrize("spec", CASES, ids=[f"seed{c['seed']}" for c in CASES])
def test_engine_matches_oracle_random_worlds(spark, tmp_path, spec):
    import pyarrow.parquet as pq

    from spider_spark.engine import CrawlEngine

    wdir = str(tmp_path / f"world{spec['seed']}")
    write_world(wdir, **spec)

    pages_t = pq.read_table(os.path.join(wdir, "pages.parquet"))
    pages = dict(zip(pages_t["url"].to_pylist(), pages_t["html"].to_pylist()))
    seeds_t = pq.read_table(os.path.join(wdir, "seeds.parquet"))
    seeds = list(zip(seeds_t["url"].to_pylist(), seeds_t["priority"].to_pylist()))
    rob_t = pq.read_table(os.path.join(wdir, "robots.parquet"))
    robots = {
        h: (d, p)
        for h, d, p in zip(
            rob_t["host"].to_pylist(),
            rob_t["crawl_delay_ms"].to_pylist(),
            rob_t["disallow_prefixes"].to_pylist(),
        )
    }
    want = crawl(pages, seeds, robots, POLICY)

    eng = CrawlEngine(
        spark,
        pages_path=os.path.join(wdir, "pages.parquet"),
        robots_path=os.path.join(wdir, "robots.parquet"),
        checkpoint_dir=str(tmp_path / f"ckpt{spec['seed']}"),
        policy=POLICY,
        n_partitions=4,
    )
    eng.run(seeds=spark.read.parquet(os.path.join(wdir, "seeds.parquet")))

    got_order = {r["url"]: r["seq"] for r in eng.results().select("url", "seq").collect()}
    assert got_order == dict(want.order)
    got_seen = {r["url"] for r in eng.seen().collect()}
    assert got_seen == want.seen
    dead_df = eng.dead()
    got_dead = {r["url"] for r in dead_df.collect()} if dead_df is not None else set()
    assert got_dead == want.dead
