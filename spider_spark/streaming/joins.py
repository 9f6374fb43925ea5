"""Stream-stream joins with event-time range conditions.

The attribution shape: each click (purchase) joins the view by the same
user that happened at most ``max_lag`` before it. In batch this is a plain
inequality join; in streaming it is Spark's symmetric hash join, where the
watermarks on BOTH inputs plus the time-range condition are what let the
engine expire buffered state — without them the join buffers both streams
forever. The builder runs identically on static and streaming frames
(batch/stream parity is the test), the same dual-mode discipline as
windows.py.

Scale shape: the join keys on user_id (the natural key, hash-partitioned
state store), the range condition bounds each side's state to max_lag of
event time per key, and late rows beyond the watermark are dropped — the
state size is O(active users × window), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attributed_conversions(
    views: DataFrame,
    purchases: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join: purchases attributed to the same user's view(s) within
    ``max_lag`` BEFORE the purchase (strictly after the view).

    Inputs carry (user_id, ts, event_id); output is one row per
    (view, purchase) pair with both timestamps and the lag in seconds —
    exact integer microsecond arithmetic."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").cast("timestamp").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if views.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return v.join(p, cond, "inner").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.col("v_ts").alias("view_ts"),
        F.col("p_ts").alias("purchase_ts"),
        F.expr("timestampdiff(SECOND, v_ts, p_ts)")
        .cast("long")
        .alias("lag_s"),
    )


def run_attribution_stream(
    spark,
    views_dir: str,
    purchases_dir: str,
    out_table: str,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drive the join as a real two-stream availableNow run over parquet
    directories; returns the materialized result table."""
    views = spark.readStream.schema(
        spark.read.parquet(views_dir).schema
    ).parquet(views_dir)
    purchases = spark.readStream.schema(
        spark.read.parquet(purchases_dir).schema
    ).parquet(purchases_dir)
    out = attributed_conversions(views, purchases, max_lag, watermark)
    q = (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)
