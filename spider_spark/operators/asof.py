"""As-of (time-travel) join — a custom operator Spark's join zoo lacks.

SURVEY.md §2.3 notes the engine needs as-of semantics for robots-cache
validity (latest robots fetch at or before the crawl round). Implemented
as a composition of existing DataFrame ops (no UDF): tag + union both
sides, one window pass per key ordered by time, carry the right side
forward with ``last(..., ignorenulls=True)``, keep left rows. One shuffle
on the key — same cost class as a regular join, no range explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_spark.operators import load, query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row: the most recent right row with the same ``on``
    key and ``right_ts <= left_ts`` (within ``tolerance_s`` if given).
    Matched right columns come back suffixed ``_asof``; unmatched → null.
    Ties on equal timestamps resolve to the later right row in
    (ts, right_cols) order — deterministic.
    """
    lt = left.withColumn("_t", F.col(left_ts).cast("timestamp")).withColumn(
        "_is_left", F.lit(1)
    )
    rt = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("_t"),
        *[F.col(c) for c in right_cols],
    ).withColumn("_is_left", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in right_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.select(*rt.columns).unionByName(rt)

    # right rows sort before left rows at the same timestamp (_is_left asc)
    w = Window.partitionBy(on).orderBy("_t", "_is_left").rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_is_left") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"{c}_asof")
            for c in right_cols
        ],
        F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_asof_t"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_s is not None:
        stale = F.col("_asof_t") < F.col("_t") - F.expr(
            f"INTERVAL {tolerance_s} SECONDS"
        )
        for c in right_cols:
            out = out.withColumn(
                f"{c}_asof", F.when(stale, F.lit(None)).otherwise(F.col(f"{c}_asof"))
            )
    return out.drop("_is_left", "_t", "_asof_t", *right_cols)


@query(
    "j7_asof_join",
    """
    SELECT p.event_id,
           CAST(floor(epoch(p.ts)) AS BIGINT)        AS purchase_s,
           c.event_id                                 AS click_id_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def j7_asof_join(spark, sf_dir):
    """For each purchase, the user's most recent click at or before it —
    DuckDB's native ASOF JOIN is the oracle for the windowed-carry-forward
    implementation."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="cts",
        right_cols=["click_id"],
    )
    from spider_spark.operators import ntz_epoch_s

    return joined.select(
        "event_id",
        ntz_epoch_s("ts").cast("long").alias("purchase_s"),
        F.col("click_id_asof"),
    )
