"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9): a per-key running counter with persistent state across
micro-batches — the shape of a streaming per-host fetch-budget tracker
(the crawl engine's batch analog is the frontier's `retries`/metrics
columns carried between rounds).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_total", T.LongType()),
        T.StructField("value_total", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _update(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "events_total": [n], "value_total": [round(v, 2)]}
    )


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals; state persists across
    micro-batches (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_from_parquet(spark, events_dir: str, out_table: str) -> DataFrame:
    """availableNow micro-batch run (one file per batch) → memory sink;
    returns the final running totals per user (last update wins)."""
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
        .select("user_id", "value")
    )
    q = (
        running_totals_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sink = spark.table(out_table)
    # memory sink in update mode appends every state update; keep the final
    # (max events_total) row per user
    w = Window.partitionBy("user_id").orderBy(F.desc("events_total"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
