"""Sketch-vs-exact validation for the paired scale-path operators in
operators/relational2.py — currently w5 (exact per-language ntile) vs
w6 (approx_percentile boundary broadcast, the 100 TB path).

Both queries are independently DuckDB-oracle-checked in
test_operators.py::test_query_matches_oracle; this file pins the
*relationship* between the exact form and its sketch variant, which no
single-query oracle can see."""

from __future__ import annotations

import pyspark.sql.functions as F

from spider_spark.operators import QUERIES


def test_decile_sketch_agrees_with_exact(spark, sf_dir):
    """w6's threshold-count decile must track w5's exact ntile: at test
    scale every language holds < 10k docs, so the Greenwald-Khanna sketch
    retains all values and the boundaries are exact order statistics — the
    only divergence allowed is tie handling (ntile splits equal n_chars by
    doc_id; the sketch puts all ties in one decile), which can move a doc
    by at most one decile."""
    w5 = QUERIES["w5_quality_deciles"](spark, sf_dir).withColumnRenamed(
        "decile", "exact"
    )
    w6 = QUERIES["w6_decile_sketch"](spark, sf_dir).withColumnRenamed(
        "decile", "sketch"
    )
    j = w5.join(w6.select("doc_id", "sketch"), "doc_id").cache()
    try:
        total = j.count()
        assert total == w5.count() == w6.count(), "row sets must be identical"
        agree = j.filter("exact = sketch").count()
        assert agree / total >= 0.9, f"only {agree}/{total} deciles agree"
        max_drift = j.agg(
            F.max(F.abs(F.col("exact") - F.col("sketch")))
        ).first()[0]
        assert max_drift <= 1, f"sketch drifted {max_drift} deciles from exact"
    finally:
        j.unpersist()


def test_decile_sketch_buckets_cover_each_language(spark, sf_dir):
    """Every language with >= 10 docs must populate all ten deciles, and
    the bucket sizes must sum back to the language's doc count — i.e. the
    boundary broadcast loses no rows and produces no empty ranges."""
    w6 = QUERIES["w6_decile_sketch"](spark, sf_dir)
    per_lang = (
        w6.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("decile").alias("n_deciles"),
            F.min("decile").alias("lo"),
            F.max("decile").alias("hi"),
        )
        .collect()
    )
    assert per_lang
    for r in per_lang:
        assert r["lo"] >= 1 and r["hi"] <= 10
        if r["n"] >= 10:
            assert r["n_deciles"] == 10, f"{r['lang']}: empty decile bucket"


def test_decile_sketch_plan_has_no_window(spark, sf_dir):
    """The whole point of w6: decile assignment WITHOUT a per-language
    window (w5's scale hazard — one task per language). The plan must show
    the tiny boundary aggregate broadcast back to the corpus and contain
    no Window operator and no sort-merge shuffle of the corpus."""
    plan = (
        QUERIES["w6_decile_sketch"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
