"""Politeness: robots disallow + per-host crawl-delay budget, as columns.

Generalizes the reference's fixed inter-request sleeps
(/root/reference/suplicmap_vector.py:161 — 2 s; /root/reference/getDirection.py:56-57
— 5 s) and its pinned single-host concurrency caps
(/root/reference/suplicmap_vector2.py:19 — 10 in flight) into a per-host
token budget per round:

    K_host = max(1, min(max_per_host, round_ms // crawl_delay_ms))

computed identically by the oracle (spider_spark.oracle.host_budget). All
JVM-side column math — no Python in the round's hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.engine.udfs import path_col
from spider_spark.oracle import CrawlPolicy


def budget_col(delay_col, policy: CrawlPolicy):
    """Per-host dequeue budget for one round (see module docstring)."""
    d = F.coalesce(delay_col, F.lit(0))
    return (
        F.when(d <= 0, F.lit(policy.max_per_host))
        .otherwise(
            F.greatest(
                F.lit(1),
                F.least(
                    F.lit(policy.max_per_host),
                    F.floor(F.lit(policy.round_ms) / d).cast("int"),
                ),
            )
        )
        .cast("int")
    )


def disallowed_col(url_col, prefixes_col):
    """True when the URL's path starts with any robots disallow prefix
    (array<string>); null/empty prefix list → allowed. JVM-side
    higher-order function — no UDF."""
    path = path_col(url_col)
    return F.coalesce(
        F.exists(prefixes_col, lambda p: path.startswith(p)), F.lit(False)
    )


def token_bucket_schedule(ranked: DataFrame) -> DataFrame:
    """Intra-round fetch scheduling as a grouped-map token bucket
    (north-star: "crawl-delay token bucket ... salted groupBy-host").

    Input: admitted rows carrying `_host_rank` (the host-global dequeue
    rank), `_delay` (crawl_delay_ms) and `_salt`. Output adds
    `fire_at_ms` — the offset within the round at which the fetch may
    fire: row with rank k fires at (k-1)·crawl_delay_ms, i.e. one token
    per delay interval.

    The groupBy key is (host, _salt), so a hot host's bucket is processed
    on many tasks; offsets stay correct under salting because they are a
    pure function of the pre-computed global per-host rank, never of which
    bucket a row landed in (SURVEY.md §7 stage 4 determinism rule).
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [f for f in ranked.schema.fields] + [T.StructField("fire_at_ms", T.LongType())]
    )

    def _bucket(key, pdf):
        pdf = pdf.copy()
        delay = pdf["_delay"].fillna(0).astype("int64").clip(lower=0)
        pdf["fire_at_ms"] = ((pdf["_host_rank"] - 1) * delay).astype("int64")
        return pdf

    return ranked.groupBy("host", "_salt").applyInPandas(_bucket, schema=out_schema)


def robots_asof(robots: DataFrame, as_of=None) -> DataFrame:
    """As-of selection over a versioned robots table: the newest fetch per
    host with fetched_ts <= as_of (SURVEY.md §2.3: robots-cache validity).
    With as_of=None, simply the latest version per host. max_by keeps it a
    single aggregate — no window, no self-join."""
    r = robots
    if as_of is not None and "fetched_ts" in robots.columns:
        r = r.filter(F.col("fetched_ts") <= F.lit(as_of))
    if "fetched_ts" not in robots.columns:
        return r
    return r.groupBy("host").agg(
        F.expr("max_by(crawl_delay_ms, fetched_ts)").alias("crawl_delay_ms"),
        F.expr("max_by(disallow_prefixes, fetched_ts)").alias("disallow_prefixes"),
        F.max("fetched_ts").alias("fetched_ts"),
    )


def with_robots(
    df: DataFrame, robots: DataFrame, policy: CrawlPolicy, as_of=None
) -> DataFrame:
    """Left-broadcast-join robots onto a frontier-shaped df (has `host`),
    adding `blocked:boolean` and `budget:int`. The robots table is a tiny
    dimension (one valid row per host after as-of selection) — always
    broadcast (J4 in SURVEY.md §2.3)."""
    robots = robots_asof(robots, as_of)
    r = robots.select(
        F.col("host").alias("_r_host"),
        F.col("crawl_delay_ms").alias("_r_delay"),
        F.col("disallow_prefixes").alias("_r_prefixes"),
    )
    joined = df.join(F.broadcast(r), df["host"] == r["_r_host"], "left")
    return (
        joined.withColumn("blocked", disallowed_col(F.col("url"), F.col("_r_prefixes")))
        .withColumn("budget", budget_col(F.col("_r_delay"), policy))
        .drop("_r_host", "_r_delay", "_r_prefixes")
    )


def adaptive_delays(
    robots: DataFrame,
    observations: DataFrame,
    delay_factor: int = 2,
    min_delay_ms: int = 0,
    max_delay_ms: int = 30_000,
) -> DataFrame:
    """Latency-adaptive crawl delays (Heritrix's public ``delayFactor``
    politeness rule: wait ≈ delayFactor × observed fetch duration), as a
    politeness-table transform the next round's ``with_robots`` consumes.

    ``observations`` is per-fetch (host, latency_ms) — in production the
    fetch stage's per-row timing, in tests a synthetic table. Per host:

        adaptive = clamp(delay_factor * mean_latency, min..max)
        crawl_delay_ms' = max(robots crawl_delay_ms, adaptive)

    robots.txt remains a FLOOR — adaptivity may only slow a crawl down,
    never override a host's declared delay. Integer math throughout
    (mean = sum // count), so the updated table is bit-deterministic
    however the observation rows are partitioned.

    Scale shape: one map-side-combinable aggregate over the |hosts|-sized
    key space, then a broadcast-sized join back onto the robots dimension
    — hosts with no observations keep their robots delay (left join +
    coalesce). The output keeps the robots schema, so it drops into
    ``robots_asof``/``with_robots`` unchanged."""
    per_host = observations.groupBy("host").agg(
        F.expr("sum(latency_ms) div count(1)").cast("long").alias("_mean_ms")
    )
    adaptive = F.greatest(
        F.lit(min_delay_ms),
        F.least(F.lit(max_delay_ms), F.col("_mean_ms") * delay_factor),
    )
    base = robots_asof(robots)
    out_cols = [c for c in base.columns]
    return (
        base.join(per_host, "host", "left")
        .withColumn(
            "crawl_delay_ms",
            F.when(
                F.col("_mean_ms").isNull(), F.col("crawl_delay_ms")
            ).otherwise(F.greatest(F.col("crawl_delay_ms"), adaptive)),
        )
        .select(*out_cols)
    )
