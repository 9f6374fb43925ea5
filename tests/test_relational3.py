"""Targeted tests for the third relational batch (q9–q12, e1/e2): ordered-
funnel semantics on a hand-built event log, and conservation invariants the
DuckDB value-hash check can't express on its own."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spider_spark.operators import QUERIES


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_funnel_requires_stage_order_and_window(spark, tmp_path):
    """A purchase BEFORE the first view must not convert, and a view
    outside the 48-hour window must not count: the funnel is an ordered
    sequence, not a bag of per-type counts."""
    rows = [
        # user 1: signup d1 → view d2 → purchase d3 — full conversion
        (1, _ts(1), 1, "signup", 0.0, "{}"),
        (2, _ts(2), 1, "view", 0.0, "{}"),
        (3, _ts(3), 1, "purchase", 0.0, "{}"),
        # user 2: purchase BEFORE any view — stage stops at 1? no: has a
        # view after signup, but the only purchase predates it → stage 2
        (4, _ts(1), 2, "signup", 0.0, "{}"),
        (5, _ts(1, 6), 2, "purchase", 0.0, "{}"),
        (6, _ts(2), 2, "view", 0.0, "{}"),
        # user 3: view 3 days after signup — outside the 48 h window → 1
        (7, _ts(1), 3, "signup", 0.0, "{}"),
        (8, _ts(5), 3, "view", 0.0, "{}"),
        # user 4: never signed up — not in the funnel at all
        (9, _ts(1), 4, "view", 0.0, "{}"),
        (10, _ts(1, 1), 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["stage"]: r["n_users"]
        for r in QUERIES["e1_event_funnel"](spark, str(tmp_path)).collect()
    }
    assert got == {3: 1, 2: 1, 1: 1}


def test_funnel_counts_partition_signup_users(spark, sf_dir):
    """Every user with a signup lands in exactly one stage bucket."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_signup = (
        e.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    rows = QUERIES["e1_event_funnel"](spark, sf_dir).collect()
    assert set(r["stage"] for r in rows) <= {1, 2, 3}
    assert sum(r["n_users"] for r in rows) == n_signup


def test_retention_offset_zero_equals_cohort_size(spark, sf_dir):
    """By construction every user is active in their own first week, so
    the offset-0 column of the retention triangle IS the cohort size, and
    no later offset can exceed it."""
    rows = QUERIES["e2_retention_cohorts"](spark, sf_dir).collect()
    base = {
        r["cohort_week"]: r["n_active"] for r in rows if r["week_offset"] == 0
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    cohorts = {
        r["cohort_week"]: r["n"]
        for r in e.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("c"))
        .groupBy(F.date_format("c", "yyyy-MM-dd").alias("cohort_week"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert base == cohorts
    for r in rows:
        assert r["n_active"] <= base[r["cohort_week"]]
        assert r["week_offset"] >= 0


def test_custdist_conserves_orders_and_customers(spark, sf_dir):
    """Σ custdist = |customers| and Σ k·custdist = |orders| — the
    distribution is a partition of both tables."""
    rows = QUERIES["q9_custdist"](spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    n_ord = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    assert sum(r["c_count"] * r["custdist"] for r in rows) == n_ord


def test_important_parts_threshold_is_exact(spark, sf_dir):
    """q11's share filter must be the exact integer cross-multiplication:
    recompute the per-part cent totals and global total independently and
    check the returned set is exactly the > 0.6 % slice."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    pv = (
        li.select("l_partkey", cents.alias("c"))
        .groupBy("l_partkey")
        .agg(F.sum("c").alias("v"))
        .collect()
    )
    total = sum(r["v"] for r in pv)
    want = {r["l_partkey"]: r["v"] for r in pv if r["v"] * 1000 > total * 6}
    got = {
        r["l_partkey"]: r["value_cents"]
        for r in QUERIES["q11_important_parts"](spark, sf_dir).collect()
    }
    assert got == want
