from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.streaming import sliding_avg_stream, tumbling_counts_stream
from spider_spark.streaming.windows import run_stream_from_parquet


def test_stream_batch_parity(spark, sf_dir, tmp_path):
    """The streaming tumbling agg over the events parquet (availableNow
    micro-batches) must equal the same agg run in batch mode."""
    import shutil

    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", events_dir / "part-0.parquet")
    batch = tumbling_counts_stream(spark.read.parquet(str(events_dir)))
    streamed = run_stream_from_parquet(spark, str(events_dir), out_table="t_parity")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in streamed.collect()}
    assert b == s
    assert len(b) > 0


def test_sliding_window_overlap(spark, sf_dir):
    """24h window sliding hourly: every event lands in 24 window rows."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = sliding_avg_stream(events)
    n_events = events.count()
    total_in_windows = out.agg(F.sum("n")).collect()[0][0]
    assert total_in_windows == 24 * n_events


def test_streaming_plan_has_watermark(spark, sf_dir):
    events_path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = tumbling_counts_stream(stream)
    assert agg.isStreaming
    assert "EventTimeWatermark" in agg._jdf.queryExecution().logical().toString()
