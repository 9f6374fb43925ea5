"""Targeted tests for the fourth relational batch: invariants the DuckDB
value-hash check can't express on its own — salted ≡ unsalted, SCD2
intervals partition each user's timeline, Q21 blame semantics on a planted
fixture, cube marginal conservation, and a known-waveform audio check."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spider_spark.operators import QUERIES
from spider_spark.operators.multimodal import decode_audio_fake


def test_salted_agg_identical_to_direct_groupby(spark, sf_dir):
    """Salting changes the exchange topology, never the answer: the
    two-stage plan must match a direct groupBy bit-for-bit."""
    got = {
        r["event_type"]: (r["n"], r["value_cents"])
        for r in QUERIES["a12_salted_agg"](spark, sf_dir).collect()
    }
    direct = {
        r["event_type"]: (r["n"], r["value_cents"])
        for r in (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.floor(F.col("value") * 100 + 0.5).cast("long")
                ).cast("long").alias("value_cents"),
            )
            .collect()
        )
    }
    assert got == direct


def test_scd2_intervals_partition_each_user_timeline(spark, sf_dir):
    """Per user: intervals are ordered, contiguous (each valid_to equals
    the next valid_from), only the last is open (-1), and the first
    starts at the user's earliest event."""
    rows = QUERIES["w8_scd2_intervals"](spark, sf_dir).collect()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.min(
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) / 1000"
                ).cast("long")
            ).alias("first_ms")
        )
        .collect()
    )
    first_ms = {r["user_id"]: r["first_ms"] for r in ev}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(first_ms)
    for uid, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert ivs[0]["valid_from"] == first_ms[uid]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["state"] != b["state"]
        assert ivs[-1]["valid_to"] == -1
        assert all(iv["valid_to"] != -1 for iv in ivs[:-1])


def test_waiting_suppliers_blame_semantics(spark, tmp_path):
    """Planted Q21 fixture: blame only the UNIQUE last shipper of a
    multi-supplier order — single-supplier orders and ties don't count."""
    d = lambda day: dt.datetime(1995, 1, day)  # noqa: E731
    li = [
        # order 1: supplier 2 ships last alone among {1, 2} → blame 2
        (1, 1, d(1)),
        (1, 2, d(5)),
        # order 2: single supplier — no blame however late
        (2, 3, d(9)),
        # order 3: suppliers 1 and 2 tie at the max — nobody alone
        (3, 1, d(4)),
        (3, 2, d(4)),
        # order 4: supplier 1 last alone among {1, 3} → blame 1
        (4, 3, d(2)),
        (4, 1, d(7)),
    ]
    spark.createDataFrame(
        li, "l_orderkey long, l_suppkey long, l_shipdate timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")
    got = {
        r["s_suppkey"]: r["numwait"]
        for r in QUERIES["q19_waiting_suppliers"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: 1, 2: 1}


def test_large_orders_threshold_and_recompute(spark, sf_dir):
    """Every returned order's quantity really exceeds 300, and the set is
    exactly the independently recomputed HAVING slice."""
    rows = QUERIES["q17_large_orders"](spark, sf_dir).collect()
    qty = {
        r["l_orderkey"]: r["tq"]
        for r in (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_orderkey")
            .agg(F.round(F.sum("l_quantity"), 2).alias("tq"))
            .filter(F.col("tq") > 300)
            .collect()
        )
    }
    assert {r["o_orderkey"] for r in rows} == set(qty)
    for r in rows:
        assert r["total_qty"] == qty[r["o_orderkey"]] > 300


def test_min_cost_supplier_is_the_minimum(spark, sf_dir):
    """Each returned (part, supplier) cost equals the part's true minimum
    integer-cent unit cost over all suppliers (cents, not round(x, 2):
    the 2dp rounding hit the Spark-vs-DuckDB double-round disagreement
    at sf0.1)."""
    rows = QUERIES["q20_min_cost_supplier"](spark, sf_dir).collect()
    assert rows
    best = {
        r["l_partkey"]: r["best"]
        for r in (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_partkey", "l_suppkey")
            .agg(
                F.floor(
                    F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                    * 100
                    + 0.5
                )
                .cast("long")
                .alias("c")
            )
            .groupBy("l_partkey")
            .agg(F.min("c").alias("best"))
            .collect()
        )
    }
    for r in rows:
        assert r["unit_cost_cents"] == best[r["p_partkey"]]


def test_cube_marginals_conserve(spark, sf_dir):
    """The CUBE's grand total equals the table size, and each marginal's
    cells sum to it."""
    rows = QUERIES["a13_cube"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    total = [r for r in rows if r["lang_g"] == "ALL" and r["source_g"] == "ALL"]
    assert len(total) == 1 and total[0]["n"] == n_docs
    lang_marginal = sum(
        r["n"] for r in rows if r["lang_g"] != "ALL" and r["source_g"] == "ALL"
    )
    src_marginal = sum(
        r["n"] for r in rows if r["lang_g"] == "ALL" and r["source_g"] != "ALL"
    )
    cells = sum(
        r["n"] for r in rows if r["lang_g"] != "ALL" and r["source_g"] != "ALL"
    )
    assert lang_marginal == src_marginal == cells == n_docs


def test_audio_features_known_waveform(spark, tmp_path):
    """Hand-checkable payload: 'a`a`' → samples (+1, 0, +1, 0) has zero
    strict sign flips; 'aZaZ' → (+1, -6, +1, -6) has three."""
    docs = [(1, "a`a`"), (2, "aZaZ")]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: (
            r["n_samples"], r["energy"], r["zero_crossings"], r["peak"]
        )
        for r in QUERIES["mm_audio_features"](spark, str(tmp_path)).collect()
    }
    assert got[1] == (4, 0.5, 0, 1)   # (1+0+1+0)/4
    assert got[2] == (4, 18.5, 3, 6)  # (1+36+1+36)/4
    # the pure decoder agrees
    assert list(decode_audio_fake(b"aZaZ")) == [1, -6, 1, -6]


def test_changelog_apply_delete_and_ordering(spark, tmp_path):
    """A key whose LATEST op is a delete is absent from the snapshot; a
    late-arriving older upsert never overwrites a newer one."""
    rows = [
        # user 1: upsert then delete → absent
        (1, dt.datetime(2024, 1, 1), 1, "purchase", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 1, "error", 0.0, "{}"),
        # user 2: delete then upsert → present with the newer value
        (3, dt.datetime(2024, 1, 1), 2, "error", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 2), 2, "view", 7.25, "{}"),
        # user 3: the older event appears later in the log — ts wins
        (5, dt.datetime(2024, 1, 5), 3, "click", 9.0, "{}"),
        (6, dt.datetime(2024, 1, 4), 3, "click", 2.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["user_id"]: r["last_value_cents"]
        for r in QUERIES["u7_apply_changelog"](spark, str(tmp_path)).collect()
    }
    assert got == {2: 725, 3: 900}
