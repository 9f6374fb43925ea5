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


def test_rfm_scores_partition_purchasers(spark, sf_dir):
    """Every purchasing user appears once with quartile scores in 1..4 and
    a non-negative recency."""
    rows = QUERIES["e3_rfm_segments"](spark, sf_dir).collect()
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_buyers = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(rows) == n_buyers
    assert len({r["user_id"] for r in rows}) == n_buyers
    for r in rows:
        assert 1 <= r["r_score"] <= 4 and 1 <= r["f_score"] <= 4
        assert r["recency_days"] >= 0 and r["frequency"] >= 1


def test_anomaly_flag_matches_float_zscore(spark, sf_dir):
    """The integer cross-multiplied test is exactly |z| > 2 computed the
    float way (up to the boundary, which integers decide exactly)."""
    import statistics

    rows = QUERIES["e4_anomaly_days"](spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for _t, days in by_type.items():
        xs = [r["n_events"] for r in days]
        n = len(xs)
        mu = statistics.mean(xs)
        var = statistics.pvariance(xs)
        for r in days:
            want = (r["n_events"] - mu) ** 2 > 4 * var + 1e-9
            exact_eq = abs((r["n_events"] - mu) ** 2 - 4 * var) < 1e-9
            if not exact_eq:  # off-boundary: float and integer agree
                assert r["is_anomaly"] == want, (r, mu, var)


def test_knn_prediction_is_modal_neighbor_label(spark, sf_dir):
    """Recompute the 5-NN vote from ann_bruteforce_topk's own output —
    the classifier must agree with its candidate generator."""
    from collections import Counter

    nn = QUERIES["ann_bruteforce_topk"](spark, sf_dir).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    votes: dict[int, Counter] = {}
    for r in nn:
        votes.setdefault(r["query_id"], Counter())[
            labels[r["neighbor"]]
        ] += 1
    want = {
        q: min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        for q, c in votes.items()
    }
    got = {
        r["query_id"]: (r["predicted"], r["n_votes"])
        for r in QUERIES["emb_knn_label"](spark, sf_dir).collect()
    }
    assert got == {q: (lbl, n) for q, (lbl, n) in want.items()}


def test_e5_planted_bots_and_only_them_flagged(spark, sf_dir):
    """Exactly the murmur-designated users are bots (their peak hour gets
    the 25x burst; everyone else peaks at their raw event max, far below
    the threshold), and per-user totals decompose as burst x n_events."""
    import pyspark.sql.functions as F

    from spider_spark.operators import QUERIES, load
    from spider_spark.operators.relational3 import (
        _E5_BOT_MOD,
        _E5_BURST,
    )

    rows = QUERIES["e5_bot_rate"](spark, sf_dir).collect()
    assert rows
    planted = {
        r.user_id
        for r in load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.pmod(F.hash(F.expr("user_id * 7 + 3")), F.lit(_E5_BOT_MOD)).alias(
                "m"
            ),
        )
        .filter("m = 0")
        .distinct()
        .collect()
    }
    n_ev = {
        r.user_id: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert planted, "fixture must contain at least one planted bot"
    for r in rows:
        assert r.is_bot == (r.user_id in planted), r
        mult = _E5_BURST if r.user_id in planted else 1
        assert r.total_req == mult * n_ev[r.user_id], r
        assert r.max_hourly <= r.total_req
