"""Windowed streaming aggregations over an events stream.

Batch/stream parity: the same builders run on a static DataFrame (tests
compare against groupBy equivalents) and on a readStream source with a
watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-type counts — the streaming analog of the
    reference's hourly fetch loop (one output row per (hour, type))."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TZ
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_avg_stream(
    events: DataFrame,
    window: str = "24 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
) -> DataFrame:
    """Sliding-window average (the scraped 24h rolling column, W3) as an
    overlapping window agg."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TZ
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.round(F.avg("value"), 4).alias("avg_value"), F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "avg_value", "n")
    )


def run_stream_from_parquet(
    spark, events_dir: str, out_table: str = "stream_out", window: str = "1 hour"
) -> DataFrame:
    """Micro-batch run: readStream over a directory of events parquet files
    with availableNow trigger → in-memory sink; returns the final table.
    One micro-batch round ≙ one crawl round in the engine's model.
    (FileStreamSource requires a directory, one file per micro-batch.)"""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg = tumbling_counts_stream(stream, window=window)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_table)


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user — the streaming analog of the
    batch w4_sessionize gaps-and-islands: a session is a maximal run of a
    user's events with no silence longer than ``gap``. Uses the native
    ``session_window`` aggregation, so the state store merges
    overlapping/adjacent candidate sessions as events arrive and the
    watermark bounds how long an open session is kept for late data.

    Scale shape: state is keyed by (user, open-session) — as wide as the
    active-user population, never the event log; emission (append mode)
    happens once per CLOSED session."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TZ
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_session_stream_from_parquet(
    spark,
    events_dir: str,
    out_table: str = "session_out",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """availableNow micro-batch run of the session aggregation, append
    mode: a session row is emitted exactly once, when the watermark
    passes its end (so sessions still open against the final watermark
    stay in state and are NOT emitted — the correct streaming semantics,
    asserted by the parity test)."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg = session_counts_stream(stream, gap=gap, watermark=watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_table)


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermark-scoped exactly-once event dedup: emit the FIRST arrival
    of each event_id, drop re-deliveries arriving within the watermark
    horizon (``dropDuplicatesWithinWatermark`` — state for an id is
    evicted once the watermark passes it, so dedup state is bounded by
    the horizon, not the stream's lifetime — the at-least-once →
    exactly-once bridge in front of every downstream agg). Batch mode
    degrades to plain dropDuplicates (the whole input is one horizon)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → TZ
    if not events.isStreaming:
        return src.dropDuplicates(["event_id"])
    return src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_dedup_stream_from_parquet(
    spark, events_dir: str, out_table: str = "dedup_out"
) -> DataFrame:
    """availableNow micro-batch run of the watermark dedup (append mode —
    first arrivals emit immediately)."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        dedup_events_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_table)
