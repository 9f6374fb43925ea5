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


def test_adaptive_delays_floor_clamp_and_budget(spark):
    """Heritrix-rule properties: robots delay is a floor, the adaptive term
    is delay_factor x integer mean latency clamped at max, unobserved
    hosts are untouched, and the output feeds budget_col unchanged."""
    import datetime as dt

    from pyspark.sql import functions as F

    from spider_spark.engine.politeness import adaptive_delays, budget_col
    from spider_spark.oracle import CrawlPolicy

    ts = dt.datetime(2024, 1, 1)
    robots = spark.createDataFrame(
        [
            ("slowhost", 5000, [], ts),   # robots slower than observed
            ("fasthost", 100, [], ts),    # observed slower than robots
            ("quiet", 250, [], ts),       # no observations
            ("storm", 0, [], ts),         # latency blowup hits the clamp
        ],
        "host string, crawl_delay_ms long, "
        "disallow_prefixes array<string>, fetched_ts timestamp",
    )
    obs = spark.createDataFrame(
        [
            ("slowhost", 300),
            ("slowhost", 500),   # mean 400 -> adaptive 800 < robots 5000
            ("fasthost", 900),
            ("fasthost", 1000),  # mean 950 -> adaptive 1900 > robots 100
            ("storm", 60000),    # adaptive 120000 -> clamped to 30000
        ],
        "host string, latency_ms long",
    )
    out = {
        r["host"]: r["crawl_delay_ms"]
        for r in adaptive_delays(robots, obs).collect()
    }
    assert out == {
        "slowhost": 5000,
        "fasthost": 1900,
        "quiet": 250,
        "storm": 30000,
    }
    # schema unchanged -> budget math consumes it directly
    pol = CrawlPolicy(max_per_host=8, round_ms=2_000)
    budgets = {
        r["host"]: r["b"]
        for r in adaptive_delays(robots, obs)
        .withColumn("b", budget_col(F.col("crawl_delay_ms"), pol))
        .collect()
    }
    assert budgets == {"slowhost": 1, "fasthost": 1, "quiet": 8, "storm": 1}


def test_adaptive_delays_partition_invariant(spark):
    """Integer mean => identical table under different partitionings."""
    import datetime as dt

    from spider_spark.engine.politeness import adaptive_delays

    ts = dt.datetime(2024, 1, 1)
    robots = spark.createDataFrame(
        [("h", 10, [], ts)],
        "host string, crawl_delay_ms long, "
        "disallow_prefixes array<string>, fetched_ts timestamp",
    )
    obs = spark.createDataFrame(
        [("h", v) for v in (7, 11, 13, 17, 19, 23, 101)],
        "host string, latency_ms long",
    )
    a = adaptive_delays(robots, obs.repartition(1)).collect()
    b = adaptive_delays(robots, obs.repartition(7)).collect()
    assert a == b and a[0]["crawl_delay_ms"] == 2 * (191 // 7)
