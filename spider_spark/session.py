"""SparkSession factory with the engine's standard scale-oriented config.

These settings are the defaults the engine assumes everywhere (SURVEY.md §4):
AQE on (runtime re-plan + skew-join split), Arrow on (every pandas UDF is an
Arrow batch, never per-row pickling), shuffle partitions sized to the
parallelism level rather than Spark's 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "spider_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        if n == "*":
            shuffle_partitions = cpus
        elif "," in n:
            # local-cluster[execs, cores-per-exec, mem-mb] → execs × cores
            execs, cores = n.split(",")[:2]
            shuffle_partitions = int(execs) * int(cores)
        else:
            shuffle_partitions = int(n)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~6 KB pages × 10k default batch = 60 MB per python batch; smaller
        # batches pipeline better and cap python-worker memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
