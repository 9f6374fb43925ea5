"""Streaming incremental recrawl-schedule maintenance: c1's freshness
scheduler (operators/crawlops.py) kept up to date as fetch observations
arrive, instead of recomputed from the full history each time.

Shape: each micro-batch of raw events is reduced to a per-page DELTA
aggregate (n_fetches, n_changes, last_seen_s — all three merge
associatively: sum/sum/max) and written to a ``batch=<id>`` subdirectory
with idempotent overwrite — the same marker-and-overwrite exactly-once
discipline as the crawl engine's round commits and the dedup stream
(streaming/dedup_stream.py). The current schedule is merge-on-read: one
groupBy over the accumulated deltas, then the SAME tier/due-time column
logic the batch operator uses (shared helpers, so stream⇄batch parity is
definitional, and tested). Per-batch work is O(batch) regardless of how
much history has accumulated; the delta store compacts like any
log-structured table.

At 100 TB this is the production posture: a crawler never re-reads its
full fetch log to decide what to fetch next — it folds the last round's
observations into page-level state and re-tiers only what moved.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.crawlops import (
    c1_observations,
    schedule_from_obs_agg,
)

_DELTA_SCHEMA = (
    "page_id int, n_fetches bigint, n_changes bigint, last_seen_s bigint"
)


def _fold_one_batch(batch_df: DataFrame, batch_id: int, store_dir: str) -> None:
    """foreachBatch body: raw events → per-page delta aggregate →
    idempotent per-batch overwrite (replay rewrites the same bytes)."""
    delta = (
        c1_observations(batch_df)
        .groupBy("page_id")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum("changed").cast("long").alias("n_changes"),
            F.max("ts_s").alias("last_seen_s"),
        )
    )
    delta.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={batch_id}")
    )


def current_schedule(spark, store_dir: str) -> DataFrame:
    """Merge-on-read: fold all per-batch deltas (sum/sum/max are
    associative, so delta granularity is invisible) and apply the shared
    tier logic. Returns an empty schedule if nothing has streamed yet."""
    subs = (
        [
            os.path.join(store_dir, e)
            for e in sorted(os.listdir(store_dir))
            if e.startswith("batch=")
        ]
        if os.path.isdir(store_dir)
        else []
    )
    if not subs:
        return spark.createDataFrame(
            [],
            "page_id int, n_fetches bigint, n_changes bigint, "
            "change_ppm bigint, revisit_tier string, revisit_hours bigint, "
            "next_due_s bigint",
        )
    deltas = spark.read.parquet(*subs)
    agg = deltas.groupBy("page_id").agg(
        F.sum("n_fetches").alias("n_fetches"),
        F.sum("n_changes").alias("n_changes"),
        F.max("last_seen_s").alias("last_seen_s"),
    )
    return schedule_from_obs_agg(agg)


def run_schedule_stream(
    spark,
    events_dir: str,
    work_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """availableNow micro-batch run: readStream over a directory of event
    parquet files (one file ≙ one crawl round's observations), fold each
    into the delta store, return the current schedule. Re-running with the
    same work_dir resumes from the checkpoint: already-folded files are
    not re-counted (exactly-once, tested)."""
    store_dir = os.path.join(work_dir, "obs_deltas")
    ckpt = os.path.join(work_dir, "ckpt")
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: _fold_one_batch(df, bid, store_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return current_schedule(spark, store_dir)
