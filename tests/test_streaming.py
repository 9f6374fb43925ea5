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


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState: state must persist across micro-batches —
    final running totals equal the batch groupBy over both files."""
    import shutil

    from pyspark.sql import functions as F

    from spider_spark.streaming.stateful import run_stateful_from_parquet

    events_dir = tmp_path / "ev_state"
    events_dir.mkdir()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    half1 = events.filter("event_id % 2 = 0")
    half2 = events.filter("event_id % 2 = 1")
    half1.coalesce(1).write.parquet(str(events_dir / "b1"))
    half2.coalesce(1).write.parquet(str(events_dir / "b2"))
    # flatten: move part files up so each is its own micro-batch
    import glob
    import os

    for i, f in enumerate(glob.glob(str(events_dir / "b*" / "*.parquet"))):
        shutil.move(f, str(events_dir / f"file{i}.parquet"))
    shutil.rmtree(events_dir / "b1")
    shutil.rmtree(events_dir / "b2")

    got = run_stateful_from_parquet(spark, str(events_dir), "t_stateful")
    want = events.groupBy("user_id").agg(
        F.count("*").alias("events_total"),
        F.round(F.sum("value"), 2).alias("value_total"),
    )
    g = {r["user_id"]: (r["events_total"], r["value_total"]) for r in got.collect()}
    w = {r["user_id"]: (r["events_total"], r["value_total"]) for r in want.collect()}
    assert set(g) == set(w)
    for uid in w:
        assert g[uid][0] == w[uid][0]
        assert abs(g[uid][1] - w[uid][1]) < 0.05  # per-batch rounding


def test_streaming_plan_has_watermark(spark, sf_dir):
    events_path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = tumbling_counts_stream(stream)
    assert agg.isStreaming
    assert "EventTimeWatermark" in agg._jdf.queryExecution().logical().toString()
