"""Semantic invariants for the selection operators (the oracle cross-check
in test_operators.py covers value equality; these pin meaning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.operators import QUERIES, load


def test_dsir_target_domain_scores_higher(spark, tmp_path):
    """DSIR's whole point: documents whose token distribution matches the
    target domain (lang=en) must out-score off-target ones. The shared-SF
    fixture gives every lang the same vocabulary (t25's oracle check still
    holds there), so the separation property is pinned on a planted corpus
    where the domains genuinely differ — run through the real query fn."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            text, lang = "spark shuffle broadcast catalyst arrow " * 6, "en"
        else:
            text, lang = "goethe schiller novelle roman lyrik " * 6, "de"
        rows.append((i, text.strip(), lang, f"src{i % 4}", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    scores = QUERIES["t25_dsir_weights"](spark, str(tmp_path))
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet").select(
        "doc_id", "lang"
    )
    by_domain = (
        scores.join(docs, "doc_id")
        .groupBy((F.col("lang") == "en").alias("is_target"))
        .agg(F.avg("dsir_score").alias("mean_score"))
        .collect()
    )
    means = {r["is_target"]: r["mean_score"] for r in by_domain}
    assert means[True] > means[False]


def test_dsir_broadcasts_ratio_table(spark, sf_dir):
    """The ≤256-row bucket-ratio table must broadcast — the exploded corpus
    must never shuffle on the bucket key."""
    plan = (
        QUERIES["t25_dsir_weights"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_script_profile_counts_and_dominance(spark, sf_dir):
    rows = QUERIES["t26_script_profile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        mod = r["doc_id"] % 4
        # injection classes put non-Latin chars exactly where expected
        assert (r["cjk_n"] > 0) == (mod == 1)
        assert (r["cyr_n"] > 0) == (mod == 2)
        assert (r["arab_n"] > 0) == (mod == 3)
        if mod == 0:
            assert r["script"] == "latin"
    # the 30x injection must flip dominance for at least some docs
    assert len({r["script"] for r in rows}) >= 2


def test_url_dedup_collapses_variants(spark, sf_dir):
    """Canonicalization must actually merge messy variants: scheme/host
    case, default ports, and fragments collapse; non-default ports and
    distinct paths do not."""
    out = QUERIES["d12_url_dedup"](spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    total = sum(r["n_variants"] for r in out)
    assert total == n_docs  # partition of the corpus
    assert len(out) < n_docs  # something actually collapsed
    for r in out:
        u = r["canonical_url"]
        assert "#" not in u
        assert ":80/" not in u and u.rsplit("/", 1)[0].endswith(":443") is False
        assert u == u.lower() or ":8080" in u  # canonical is lowercase
        scheme = u.split("://")[0]
        assert scheme in ("http", "https")
    # non-default port survives canonicalization
    assert any(":8080" in r["canonical_url"] for r in out)


def test_pq_codes_compress_and_rank_sanely(spark, sf_dir):
    """ann_pq structural invariants: exactly TOP_K neighbors per query,
    ADC distances non-negative and non-decreasing in rank, and the plan
    keeps the corpus unshuffled (LUT broadcast — no SortMergeJoin)."""
    from spider_spark.operators.similarity import N_QUERIES, TOP_K

    df = QUERIES["ann_pq"](spark, sf_dir)
    rows = df.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["adc_dist"])
        assert r["adc_dist"] >= 0.0
        assert r["neighbor"] != r["query_id"]
    assert len(per_q) == N_QUERIES
    for q, dists in per_q.items():
        assert len(dists) == TOP_K
        assert dists == sorted(dists)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # LUT is broadcast, corpus never shuffles
