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
