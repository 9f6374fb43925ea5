"""The co-located join credential: two stores bucketed+sorted on the same
key join with ZERO Exchange in the physical plan — the property the crawl
engine's page-store docstrings assume of the production Iceberg layout
(engine/crawler.py), demonstrated and plan-asserted on the open-source
bucketed-table path."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.operators.sources import write_bucketed_store


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    pages = spark.range(0, 2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit("/p/"), F.col("id").cast("string")).alias("url"),
        F.sha1(F.col("id").cast("string").cast("binary")).alias("html"),
    )
    frontier = spark.range(0, 2000, 3).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit("/p/"), F.col("id").cast("string")).alias("url"),
        F.lit(1).alias("priority"),
    )
    write_bucketed_store(pages, "t_pages_b", f"{tmp_path}/pages", 8, "url")
    write_bucketed_store(frontier, "t_frontier_b", f"{tmp_path}/front", 8, "url")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_frontier_b").join(
            spark.table("t_pages_b"), "url"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the join is still CORRECT: every 3rd url hits
        assert joined.count() == 667
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_pages_b")
        spark.sql("DROP TABLE IF EXISTS t_frontier_b")


def test_bucketed_groupby_needs_no_exchange(spark, tmp_path):
    """Aggregation on the bucket key also rides the bucketing: groupBy(url)
    over a bucketed store plans without a shuffle Exchange."""
    docs = spark.range(0, 1000).select(
        F.concat(F.lit("u"), (F.col("id") % 100).cast("string")).alias("url"),
        F.col("id").alias("sz"),
    )
    write_bucketed_store(docs, "t_docs_b", f"{tmp_path}/docs", 4, "url")
    try:
        agg = spark.table("t_docs_b").groupBy("url").agg(F.sum("sz").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
