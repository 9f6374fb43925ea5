"""Crawl-throughput benchmark: the same job at two parallelism levels.

Evidence protocol for BASELINE.json's two-cluster-size criterion (no real
cluster in the sandbox — see BASELINE.md): run the identical crawl on the
identical synthetic frontier at N and 4N local cores, report pages
fetched+deduped/sec at both and efficiency = (pps_4N / pps_N) / 4.

The bench world is wide and shallow (branching 16) with zero crawl delays
and every host seeded, so the politeness budget never caps a round and the
measured quantity is the engine's fetch+extract+dedup pipeline, not the
politeness wait that dominates a real crawl's wall-clock.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from spider_spark.oracle import CrawlPolicy

BENCH_POLICY = CrawlPolicy(
    max_per_host=1_000_000, round_ms=60_000, max_retries=0, max_rounds=12
)

WORLD_SPEC = dict(
    n_hosts=96,
    median_pages=1800,
    hot_factor=18,
    branching=64,  # wide+shallow: 4 BFS rounds, so fixed round cost amortizes
    with_text=False,
    delays=[0],
    seed_all_hosts=True,
    dead_link_rate=0.0,
    page_weight=12,  # ~6 KB pages → realistic per-page parse cost
    seed=42,
)


def ensure_world(cache_dir: str) -> str:
    """Build (once) and cache the bench world; spec-keyed so changing
    WORLD_SPEC invalidates the cache."""
    key = json.dumps(WORLD_SPEC, sort_keys=True)
    marker = os.path.join(cache_dir, "spec.json")
    if os.path.isfile(marker) and open(marker).read() == key:
        return cache_dir
    shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(cache_dir, exist_ok=True)
    from spider_spark.fixtures import write_world

    write_world(cache_dir, **WORLD_SPEC)
    with open(marker, "w") as f:
        f.write(key)
    return cache_dir


def run_crawl_bench(cores: int, world_dir: str, work_dir: str) -> dict:
    """One full crawl (fresh session on local[cores]) → throughput stats."""
    from spider_spark.engine import CrawlEngine
    from spider_spark.session import get_spark

    ckpt = os.path.join(work_dir, f"ckpt_{cores}")
    shutil.rmtree(ckpt, ignore_errors=True)
    spark = get_spark(
        app=f"crawl_bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    try:
        eng = CrawlEngine(
            spark,
            pages_path=os.path.join(world_dir, "pages.parquet"),
            robots_path=os.path.join(world_dir, "robots.parquet"),
            checkpoint_dir=ckpt,
            policy=BENCH_POLICY,
            n_partitions=max(cores, 8),
            use_bloom=False,  # exact anti-join path; bloom is a pre-screen
            bench_mode=True,
        )
        seeds = spark.read.parquet(os.path.join(world_dir, "seeds.parquet"))
        t0 = time.time()
        meta = eng.run(seeds=seeds)
        elapsed = time.time() - t0
        fetched = meta["next_seq"]  # crawled pages = dense seq counter
        rounds_meta = [
            eng._read_commit(i) for i in range(1, (eng.last_committed_round() or 0) + 1)
        ]
        return {
            "cores": cores,
            "elapsed_sec": round(elapsed, 2),
            "pages_fetched": fetched,
            "rounds": meta["round"],
            "pages_per_sec": round(fetched / elapsed, 1),
            "round_timings": [m.get("timings", {}) for m in rounds_meta],
        }
    finally:
        spark.stop()
        shutil.rmtree(ckpt, ignore_errors=True)


def scaling_bench(world_dir: str, work_dir: str, n_small: int = 8, n_big: int = 32) -> dict:
    small = run_crawl_bench(n_small, world_dir, work_dir)
    big = run_crawl_bench(n_big, world_dir, work_dir)
    eff = (big["pages_per_sec"] / small["pages_per_sec"]) / (n_big / n_small)
    return {
        f"local{n_small}": small,
        f"local{n_big}": big,
        "scaling_efficiency": round(eff, 3),
    }
