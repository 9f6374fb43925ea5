"""AQE skew-join proof (SURVEY.md §4 / north-star: "AQE skew-join handling
proven"): a join keyed on a hot-host-style skewed column must get its
oversized partition split by AdaptiveSparkPlan at runtime."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        # hot key 0 carries 95% of the left side — the hot-host shape
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 997)
            .alias("host_key"),
            F.concat(F.lit("url_"), F.col("id")).alias("url"),
        )
        right = spark.range(0, 997).select(
            F.col("id").cast("long").alias("host_key"),
            F.concat(F.lit("robots_"), F.col("id")).alias("rules"),
        )
        joined = left.join(right, "host_key")
        # collect() drives joined's own QueryExecution, so the adaptive
        # final plan (with runtime skew handling) is inspectable on it —
        # count() would plan a separate aggregate execution
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "AdaptiveSparkPlan isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            conf.set(k, v)
