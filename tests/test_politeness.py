from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.engine.politeness import (
    budget_col,
    disallowed_col,
    token_bucket_schedule,
    with_robots,
)
from spider_spark.oracle import CrawlPolicy, host_budget


def test_budget_col_matches_oracle(spark):
    """JVM budget math must equal the oracle's host_budget exactly."""
    policy = CrawlPolicy(max_per_host=8, round_ms=10_000)
    delays = [0, 50, 100, 1000, 1999, 2000, 2001, 10_000, 20_000, 1_000_000]
    df = spark.createDataFrame([(d,) for d in delays], ["delay"])
    got = {
        r["delay"]: r["b"]
        for r in df.select("delay", budget_col(F.col("delay"), policy).alias("b")).collect()
    }
    for d in delays:
        assert got[d] == host_budget("h", {"h": (d, [])}, policy), d


def test_disallowed_col(spark):
    rows = [
        ("http://a.test/private/x", ["/private"], True),
        ("http://a.test/pub/x", ["/private"], False),
        ("http://a.test/private/x", [], False),
        ("http://a.test/private/x", None, False),
        ("http://a.test/", ["/"], True),
        ("http://a.test/privateer", ["/private"], True),  # prefix semantics
    ]
    df = spark.createDataFrame(
        [(u, p) for u, p, _ in rows], "url string, prefixes array<string>"
    )
    got = [
        r["d"]
        for r in df.select(
            disallowed_col(F.col("url"), F.col("prefixes")).alias("d")
        ).collect()
    ]
    assert got == [e for _, _, e in rows]


def test_token_bucket_deterministic_offsets(spark):
    """fire_at_ms = (host_rank-1)·delay regardless of salt placement."""
    rows = []
    for h, delay in (("slow.test", 500), ("fast.test", 0)):
        for k in range(1, 7):
            rows.append((f"http://{h}/p/{k}", h, k, delay))
    df = spark.createDataFrame(
        rows, "url string, host string, _host_rank int, _delay long"
    ).withColumn("_salt", F.pmod(F.hash("url"), F.lit(4)))
    out = token_bucket_schedule(df)
    got = {r["url"]: r["fire_at_ms"] for r in out.collect()}
    for k in range(1, 7):
        assert got[f"http://slow.test/p/{k}"] == (k - 1) * 500
        assert got[f"http://fast.test/p/{k}"] == 0
    # deterministic across runs
    again = {r["url"]: r["fire_at_ms"] for r in token_bucket_schedule(df).collect()}
    assert again == got


def test_dequeue_salting_bounds_bucket_size(spark, world_dir):
    """Hot-host skew control: after stage-1 salting, no (host, salt) rank
    bucket ever holds more than ceil(pending_host / n_salts)+slack rows —
    the windowed sort never sees a whole hot host."""
    import os

    from spider_spark.engine import CrawlEngine
    from spider_spark.engine.crawler import N_SALTS

    policy = CrawlPolicy(max_per_host=4, round_ms=2000, max_retries=2, max_rounds=2)
    eng = CrawlEngine(
        spark,
        pages_path=os.path.join(world_dir, "pages.parquet"),
        robots_path=os.path.join(world_dir, "robots.parquet"),
        checkpoint_dir=os.path.join(world_dir, "..", "ckpt_skew"),
        policy=policy,
        n_partitions=4,
    )
    seeds = spark.read.parquet(os.path.join(world_dir, "seeds.parquet"))
    eng.run(seeds=seeds, max_rounds=2)
    pending = spark.read.parquet(eng._path("state", 2))
    per_host = {r["host"]: r["n"] for r in
                pending.groupBy("host").agg(F.count("*").alias("n")).collect()}
    buckets = (
        pending.withColumn("_salt", F.pmod(F.hash("url"), F.lit(N_SALTS)))
        .groupBy("host", "_salt")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    import math

    for r in buckets:
        cap = math.ceil(per_host[r["host"]] / N_SALTS) + max(
            8, per_host[r["host"]] // N_SALTS
        )
        assert r["n"] <= cap, (r["host"], r["n"], cap)
