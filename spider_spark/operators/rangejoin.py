"""Range join (point-in-interval) — the second custom operator the task
names that Spark lacks natively (Spark falls back to BroadcastNestedLoop
for inequality joins, which is O(n·m)).

Scale path: bucketize. Intervals explode into the fixed-width buckets they
overlap; points map to their bucket; the join becomes an equi-join on
bucket_id followed by the exact range filter. With bucket width ≈ median
interval width, each interval lands in O(1) buckets and the shuffle is
keyed — no quadratic comparison. (Same trick DuckDB/Trino use for their
range-join optimizers.)

Also here: the hypertable-style continuous-aggregate rollup (hourly
pre-agg → daily rollup) the task lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators import load, query


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join: every (point, interval) pair with
    lo <= point <= hi, via bucketized equi-join."""
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    i = intervals.withColumn(
        "_b_lo", F.floor(F.col(lo_col) / bucket_width).cast("long")
    ).withColumn("_b_hi", F.floor(F.col(hi_col) / bucket_width).cast("long"))
    i_exploded = i.withColumn(
        "_bucket", F.explode(F.sequence("_b_lo", "_b_hi"))
    ).drop("_b_lo", "_b_hi")
    joined = p.join(i_exploded, "_bucket")
    return joined.filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    ).drop("_bucket")


@query(
    "j8_range_join",
    """
    SELECT c.c_custkey, s.s_suppkey,
           round(c.c_acctbal, 2) AS point_bal,
           round(s.s_acctbal, 2) AS center_bal
    FROM customer c JOIN supplier s
      ON c.c_acctbal >= s.s_acctbal - 200 AND c.c_acctbal <= s.s_acctbal + 200
    """,
)
def j8_range_join(spark, sf_dir):
    """Customers whose balance falls within ±200 of a supplier's balance —
    bucketized range join (bucket width 400 → each interval spans ≤2
    buckets) checked against DuckDB's inequality join."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s = (
        load(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_acctbal")
        .withColumn("lo", F.col("s_acctbal") - 200)
        .withColumn("hi", F.col("s_acctbal") + 200)
    )
    out = range_join(c, s, point_col="c_acctbal", lo_col="lo", hi_col="hi",
                     bucket_width=400.0)
    return out.select(
        "c_custkey",
        "s_suppkey",
        F.round("c_acctbal", 2).alias("point_bal"),
        F.round("s_acctbal", 2).alias("center_bal"),
    )


@query(
    "f19_hypertable_rollup",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n, sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day, event_type,
           CAST(sum(n) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS total_cents
    FROM hourly GROUP BY 1, 2
    """,
)
def f19_hypertable_rollup(spark, sf_dir):
    """Continuous-aggregate pattern: hourly pre-aggregate (what a
    hypertable materializes per chunk) rolled up to daily at query time.
    Two-level partial agg — the hourly layer is reusable/materializable;
    integer cents keep the rollup exact across engines — emitted AS BIGINT
    cents (no final /100 double division: that re-introduced the
    cross-engine decimal-rendering divergence the driver's value hash
    caught in round 1)."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"),  # NTZ: timezone-free
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    return hourly.groupBy(
        F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.sum("n").alias("n"),
        F.sum("cents").alias("total_cents"),
    )
