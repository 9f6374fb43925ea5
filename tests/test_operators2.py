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


def test_t8_long_document_bounded_time(spark, tmp_path):
    """t8's per-row cost must be O(L log L), not O(L²): a single 50k-token
    document with ~49k DISTINCT tokens (the worst case for the r3
    distinct×filter form — ~2.5e9 string compares) must produce exact
    Gopher stats in seconds. Token layout: w0..w48999 then "dup"×1000, so
    the expected values are closed-form."""
    import time

    n_uniq, n_dup = 49_000, 1_000
    toks = [f"w{i}" for i in range(n_uniq)] + ["dup"] * n_dup
    n = n_uniq + n_dup
    text = " ".join(toks)
    d = str(tmp_path / "t8world")
    spark.createDataFrame(
        [(1, text, "en", "synth", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")

    t0 = time.monotonic()
    row = QUERIES["t8_repetition_stats"](spark, d).collect()[0]
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"t8 took {elapsed:.1f}s on one 50k-token doc"

    # top token: "dup" ×1000 of 50000
    assert row["top_token_frac"] == round(n_dup / n, 4)
    # distinct bigrams: 48999 w-chain + (w48999,dup) + (dup,dup) = 49001
    n_distinct_bg = (n_uniq - 1) + 1 + 1
    assert row["dup_bigram_frac"] == round(1.0 - n_distinct_bg / (n - 1), 4)
    chars = len(text.replace(" ", ""))
    assert row["mean_word_len"] == round(chars / n, 4)


def test_star_contraction_deep_chain(spark):
    """d7's fallback path: a planted 60-link chain (diameter far beyond a
    small propagation bound) must still cluster to its minimum via
    large-star/small-star contraction in logarithmic rounds — both through
    the connected_components() dispatcher (prop_rounds too small → falls
    back) and through cc_star_contraction() directly."""
    from spider_spark.operators.dedup import (
        cc_star_contraction,
        connected_components,
    )

    chain = [(i, i + 1) for i in range(60)]       # component {0..60}
    extra = [(100, 101), (101, 102), (200, 201)]  # two shallow components
    edges = spark.createDataFrame(chain + extra, "u long, v long")

    for labels in (
        connected_components(edges, prop_rounds=3),
        cc_star_contraction(edges),
    ):
        got = {r["id"]: r["cluster"] for r in labels.collect()}
        assert got == {
            **{i: 0 for i in range(61)},
            **{i: 100 for i in (100, 101, 102)},
            **{i: 200 for i in (200, 201)},
        }


def test_connected_components_shallow_stays_on_propagation(spark):
    """The common case (shallow near-dup components) must converge inside
    the propagation loop — same labels, no contraction needed."""
    from spider_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 10)], "u long, v long"
    )
    got = {
        r["id"]: r["cluster"]
        for r in connected_components(edges, prop_rounds=10).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_pagerank_plan_broadcasts_ranks_no_cartesian(spark, sf_dir):
    """g1's per-iteration join of the |hosts|-sized rank table onto edges
    must broadcast (never shuffle the edge table on src), and nothing in
    the 5-iteration plan may degenerate to a cartesian."""
    from spider_spark.operators import QUERIES

    plan = (
        QUERIES["g1_host_pagerank"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # hosts join, deg join, 5 rank joins, final name join are all broadcast
    assert plan.count("BroadcastHashJoin") >= 7


def test_pagerank_mass_conservation_bound(spark, sf_dir):
    """Fixed-point PageRank: total rank stays within (teleport + damped)
    bounds — floor division only ever loses mass, never creates it."""
    from spider_spark.operators import QUERIES

    rows = QUERIES["g1_host_pagerank"](spark, sf_dir).collect()
    total = sum(r["pr"] for r in rows)
    assert 0 < total <= 10**12
    # ranks differ across hosts (the derived graph is not regular)
    assert len({r["pr"] for r in rows}) > 1
    # rk is a dense ranking aligned with pr descending
    by_pr = sorted(rows, key=lambda r: -r["pr"])
    for a, b in zip(by_pr, by_pr[1:]):
        assert (a["rk"] < b["rk"]) == (a["pr"] > b["pr"])
        assert (a["rk"] == b["rk"]) == (a["pr"] == b["pr"])


def test_triangle_count_known_graph(spark):
    """Degree-orientation triangle counting on a hand-checked graph:
    K4 on {0,1,2,3} (4 triangles, each node in 3) plus a pendant 3-4
    (node 4 in none)."""
    from pyspark.sql import functions as F

    from spider_spark.operators.graph import g2_triangle_count  # noqa: F401
    # exercise the orientation pipeline directly on a fixed edge set
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b] + [(3, 4), (4, 3)],
        "src long, dst long",
    )
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lo = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        und.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when(lo, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lo, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    o1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    o2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    o3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = o1.join(o2, "y").join(o3, ["x", "z"]).collect()
    assert len(tri) == 4  # K4 has exactly 4 triangles, pendant adds none
    seen = {tuple(sorted((r["x"], r["y"], r["z"]))) for r in tri}
    assert seen == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}


def test_triangle_plan_no_cartesian(spark, sf_dir):
    from spider_spark.operators import QUERIES

    plan = (
        QUERIES["g2_triangle_count"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_components_partition_the_hosts(spark, sf_dir):
    """g3: components partition the host set — comp_size is consistent
    within a component and sums to |hosts| over distinct components."""
    from spider_spark.operators import QUERIES

    rows = QUERIES["g3_host_components"](spark, sf_dir).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["comp"], []).append(r)
    for comp, members in by_comp.items():
        assert {m["comp_size"] for m in members} == {len(members)}
    assert sum(len(m) for m in by_comp.values()) == len(rows)
    assert len(rows) == len({r["source"] for r in rows})


def test_host_components_plan_no_cartesian(spark, sf_dir):
    from spider_spark.operators import QUERIES

    plan = (
        QUERIES["g3_host_components"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hits_normalization_and_spread(spark, sf_dir):
    """g4: fixed-point HITS — scores are non-negative, the normalized
    totals stay near SCALE (floor division in the normalize step divides
    by (total // SCALE), so the sum can only drift by a rounding factor),
    and the derived graph is irregular enough that scores differ."""
    from spider_spark.operators import QUERIES
    from spider_spark.operators.graph import _HITS_SCALE

    rows = QUERIES["g4_hits"](spark, sf_dir).collect()
    assert all(r["auth"] >= 0 and r["hub"] >= 0 for r in rows)
    for col in ("auth", "hub"):
        total = sum(r[col] for r in rows)
        assert 0 < total <= int(_HITS_SCALE * 1.05)
        assert len({r[col] for r in rows}) > 1


def test_c4_rules_keep_is_conjunction_and_discriminates(spark, sf_dir):
    from spider_spark.operators import QUERIES

    rows = QUERIES["t17_c4_rules"](spark, sf_dir).collect()
    flags = [
        "r_word_count",
        "r_mean_word_len",
        "r_no_giant_words",
        "r_stopwords",
        "r_no_brace",
        "r_no_lorem",
    ]
    for r in rows:
        assert r["keep"] == all(r[f] for f in flags)
    kept = sum(r["keep"] for r in rows)
    # the fixture's 10-99-word docs straddle the 50-word C4 floor, so the
    # rule set must actually discriminate — a degenerate all-keep (or
    # all-drop) run means the rules silently stopped binding
    assert 0 < kept < len(rows)


def test_rrf_fusion_matches_python_recompute(spark, sf_dir):
    """ann_rrf_fusion == RRF recomputed in pure Python from the two
    ranked lists it fuses (integer contributions, same tie-breaks)."""
    from spider_spark.operators import QUERIES
    from spider_spark.operators.similarity import _RRF_K, _RRF_SCALE

    def ranked(name):
        rows = QUERIES[name](spark, sf_dir).collect()
        out = {}
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: (-r["cos_sim"], r["neighbor"]))
            for i, r in enumerate(rs, start=1):
                out[(q, r["neighbor"])] = i
        return out

    ri = ranked("ann_ivf")
    rl = ranked("ann_lsh_bucketed")
    expected = {}
    for key in set(ri) | set(rl):
        s = 0
        n = 0
        for lst in (ri, rl):
            if key in lst:
                s += _RRF_SCALE // (_RRF_K + lst[key])
                n += 1
        expected[key] = (s, n)
    got = {
        (r["query_id"], r["neighbor"]): (r["rrf"], r["n_lists"])
        for r in QUERIES["ann_rrf_fusion"](spark, sf_dir).collect()
    }
    assert got == expected


def test_except_all_bag_semantics(spark):
    """u6's engine (exceptAll) on a hand-built multiset: each left
    occurrence consumes at most one right occurrence."""
    left = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], "suppkey long")
    right = spark.createDataFrame([(1,), (3,), (3,)], "suppkey long")
    got = sorted(r["suppkey"] for r in left.exceptAll(right).collect())
    assert got == [1, 1, 2]


def test_host_degrees_conservation(spark, sf_dir):
    """g5: every document contributes exactly one edge, so Σ out_deg =
    Σ in_deg = |documents|, and distinct degree never exceeds multi-edge
    degree."""
    from spider_spark.operators import QUERIES, load

    rows = QUERIES["g5_host_degrees"](spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["out_deg"] for r in rows) == n_docs
    assert sum(r["in_deg"] for r in rows) == n_docs
    for r in rows:
        assert r["out_distinct"] <= r["out_deg"]
        assert r["in_distinct"] <= r["in_deg"]


# Registered queries whose physical plan legitimately contains
# BroadcastNestedLoopJoin — every one is a BROADCAST of a provably tiny
# relation (a 1-row global aggregate, a fixed query set, or a constant
# mode/grid enumeration), never a data-sized side. Exact counts pinned so
# a new unbroadcast join or a plan regression shows up as a diff here.
_BNLJ_WHITELIST = {
    "ann_bruteforce_topk": 1,  # fixed query set broadcast, non-equi (<>)
    "ann_pq": 1,               # fixed 8-query ADC LUT broadcast, non-equi (<>)
    # e3_rfm_segments: the 1-row as-of anchor's BNLJ now executes inside
    # the two-phase ntile's pinning checkpoint, so the final plan has 0
    "emb_knn_label": 1,        # fixed query set broadcast, non-equi (<>)
    "g4_hits": 2,              # 1-row normalization total per half-step
    "j2_cross_modes": 1,       # constant mode enumeration
    "j5_tile_placement": 3,    # 1-row global min-corner aggregate
    "q11_important_parts": 1,  # 1-row global-total aggregate
    "q12_dormant_customers": 1,  # 1-row avg-balance threshold
    "q21_sales_opportunity": 1,  # 1-row (sum, count) average gate
    "w12_coverage_calendar": 1,  # |days|-row calendar from 1-row bounds
    "s6_tile_grid": 2,         # constant grid range enumeration
    "t22_mix_rebalance": 1,    # 1-row min-source target aggregate
    "t11_tfidf_topk": 1,       # 1-row corpus-size aggregate
    "t16_token_familiarity": 1,  # 1-row corpus-size aggregate
    "t20_bm25_rank": 1,        # 1-row corpus stats (N, total dl) broadcast
    "a14_equiwidth_hist": 1,   # 1-row min/max extent aggregate broadcast
    "c8_fetch_budget": 2,      # 1-row total + leftover aggregates (the
                               # remainder-rank branch's copy of the total
                               # BNLJ now runs inside the two-phase
                               # checkpoint, leaving the leftover branch's)
    "w9_host_concentration": 1,  # 1-row corpus-total aggregate broadcast
    "t28_source_drift": 2,     # 64-bucket global marginal + 1-row total
    "sim_mmr_rerank": 79,      # unrolled greedy picks over the ≤12-row
                               # relevance pool — every BNLJ side is
                               # pool-sized by construction (documented in
                               # sim_mmr_rerank's docstring), so the count
                               # scales with _MMR_K, never the corpus
}


def test_every_registered_query_plan_is_scale_clean(spark, sf_dir):
    """Blanket 100-TB plan-hygiene gate over ALL registered queries: no
    CartesianProduct anywhere (an unbroadcast cartesian is the one plan
    shape that cannot survive a 100x scale-up), and
    BroadcastNestedLoopJoin only where the whitelist documents a tiny
    broadcast side, at exactly the pinned count."""
    from spider_spark.operators import QUERIES

    failures = []
    for name, fn in sorted(QUERIES.items()):
        plan = (
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        cart = plan.count("CartesianProduct")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        if cart:
            failures.append(f"{name}: {cart} CartesianProduct")
        if bnlj != _BNLJ_WHITELIST.get(name, 0):
            failures.append(
                f"{name}: {bnlj} BNLJ (expected "
                f"{_BNLJ_WHITELIST.get(name, 0)})"
            )
    assert not failures, failures


def test_chunk_windows_tile_and_reconstruct(spark, sf_dir):
    """t18: chunks tile each document — chunk_idx is dense from 0, every
    chunk's text is exactly the stride-aligned token slice, and stitching
    the first STRIDE tokens of each chunk (all of the last) reproduces the
    original text byte-for-byte."""
    from spider_spark.operators import QUERIES, load
    from spider_spark.operators.textstats import _T18_S, _T18_W

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in QUERIES["t18_chunk_windows"](spark, sf_dir).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id].split(" ")
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            start = c["chunk_idx"] * _T18_S
            want = toks[start : start + _T18_W]
            assert c["chunk_text"] == " ".join(want)
            assert c["n_chunk_tokens"] == len(want)
        # stitching: every chunk contributes its stride window, the last
        # contributes everything it has
        rebuilt = []
        for c in chunks[:-1]:
            rebuilt.extend(
                toks[c["chunk_idx"] * _T18_S : c["chunk_idx"] * _T18_S + _T18_S]
            )
        last = chunks[-1]
        rebuilt.extend(toks[last["chunk_idx"] * _T18_S :])
        assert " ".join(rebuilt) == docs[doc_id]


def test_pack_bins_matches_sequential_recompute(spark, sf_dir):
    """t19's distributed two-stage prefix sum must equal the sequential
    concat-then-chunk packing recomputed in pure Python, and a bin's
    occupants must be contiguous in doc_id order."""
    from spider_spark.operators import QUERIES, load
    from spider_spark.operators.textstats import _T19_CAP

    docs = sorted(
        (r["lang"], r["doc_id"], len(r["text"].split(" ")))
        for r in load(spark, sf_dir, "documents").collect()
    )
    expected = {}
    cum = {}
    for lang, doc_id, n in docs:
        c = cum.get(lang, 0)
        expected[doc_id] = (lang, n, c // _T19_CAP, c % _T19_CAP)
        cum[lang] = c + n
    got = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in QUERIES["t19_pack_bins"](spark, sf_dir).collect()
    }
    assert got == expected


def test_bm25_matches_python_recompute(spark, sf_dir):
    """t20 == BM25 recomputed in pure Python with the identical fixed-order
    float expression (same tie-breaks, same rounding)."""
    from spider_spark.operators import QUERIES, load
    from spider_spark.operators.textstats import (
        _T20_B,
        _T20_K1,
        _T20_TERMS,
        _T20_TOPK,
    )

    rows = load(spark, sf_dir, "documents").collect()
    n = len(rows)
    tdl = sum(len(r["text"].split(" ")) for r in rows)
    df = {t: 0 for t in _T20_TERMS}
    per_doc = []
    for r in rows:
        toks = r["text"].split(" ")
        tf = {t: toks.count(t) for t in _T20_TERMS}
        for t in _T20_TERMS:
            if tf[t]:
                df[t] += 1
        per_doc.append((r["doc_id"], r["lang"], len(toks), tf))
    scored = {}
    for doc_id, lang, dl, tf in per_doc:
        if not any(tf.values()):
            continue
        parts = []
        for t in _T20_TERMS:
            if not tf[t]:
                parts.append(0.0)
                continue
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            parts.append(
                idf
                * (tf[t] * (_T20_K1 + 1.0))
                / (
                    tf[t]
                    + _T20_K1
                    * ((1.0 - _T20_B) + _T20_B * ((dl * n) * 1.0 / tdl))
                )
            )
        total = parts[0] + parts[1] + parts[2]
        scored.setdefault(lang, []).append(
            (doc_id, sum(1 for t in _T20_TERMS if tf[t]), total)
        )
    expected = {}
    for lang, lst in scored.items():
        lst.sort(key=lambda x: (-x[2], x[0]))
        for rk, (doc_id, n_matched, total) in enumerate(
            lst[:_T20_TOPK], start=1
        ):
            expected[(doc_id, lang)] = (n_matched, round(total, 4), rk)
    got = {
        (r["doc_id"], r["lang"]): (r["n_matched"], r["score"], r["rk"])
        for r in QUERIES["t20_bm25_rank"](spark, sf_dir).collect()
    }
    assert got == expected


def test_priority_exists_semi_never_duplicates(spark, sf_dir):
    """q4: EXISTS must count each order once however many lineitems match —
    total order_count equals the number of DISTINCT orderkeys with an
    'R'-flagged lineitem."""
    from spider_spark.operators import QUERIES, load

    got = sum(
        r["order_count"]
        for r in QUERIES["q4_priority_exists"](spark, sf_dir).collect()
    )
    li = load(spark, sf_dir, "lineitem").filter("l_returnflag = 'R'")
    o = load(spark, sf_dir, "orders")
    want = (
        o.join(li.select("l_orderkey").distinct(), o.o_orderkey == li.l_orderkey)
        .count()
    )
    assert got == want


def test_small_quantity_matches_correlated_subquery(spark, sf_dir):
    """q8's hand-decorrelated window form == Spark's OWN correlated scalar
    subquery over the same tables (Catalyst decorrelates independently),
    proving the rewrite preserved subquery semantics."""
    from spider_spark.operators import QUERIES, load
    from spider_spark.operators.relational2 import _Q8_BRANDS

    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q8_li")
    load(spark, sf_dir, "part").createOrReplaceTempView("q8_p")
    brands = ", ".join(f"'{b}'" for b in _Q8_BRANDS)
    want = {
        (r["p_brand"], r["n_small"], r["small_qty_revenue"])
        for r in spark.sql(
            f"""
            SELECT p_brand, count(*) AS n_small,
                   round(sum(l_extendedprice), 2) AS small_qty_revenue
            FROM q8_li l JOIN q8_p p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand IN ({brands})
              AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                                  FROM q8_li l2
                                  WHERE l2.l_partkey = l.l_partkey)
            GROUP BY p_brand
            """
        ).collect()
    }
    got = {
        (r["p_brand"], r["n_small"], r["small_qty_revenue"])
        for r in QUERIES["q8_small_quantity"](spark, sf_dir).collect()
    }
    assert got == want


def test_t31_classifier_is_shuffle_free_and_consistent(spark, sf_dir):
    """t31's whole point is zero-exchange scoring: the plan must contain
    no Exchange at all (higher-order functions, no explode/groupBy), and
    keep must equal score_sum > 0 with |score_sum| <= 1000 * n_toks."""
    q = QUERIES["t31_quality_classifier"](spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "classifier scoring must not shuffle"
    rows = q.collect()
    assert rows
    for r in rows:
        assert r.keep == (r.score_sum > 0)
        assert abs(r.score_sum) <= 1000 * r.n_toks


def test_t32_host_cap_bounds_and_ranks(spark, sf_dir):
    """Every host keeps at most K docs, host_rank is dense 1..n within
    each host, and the kept set is exactly the K hash-smallest docs of
    that host (checked against a direct single-window computation)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from spider_spark.operators import load
    from spider_spark.operators.textstats import _T32_K

    got = QUERIES["t32_host_cap"](spark, sf_dir).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.source, []).append(r.host_rank)
    for host, ranks in by_host.items():
        assert len(ranks) <= _T32_K, host
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), host

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.hash(F.col("doc_id").cast("string")), "doc_id"
    )
    ref = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _T32_K)
        .select("doc_id", "source")
        .collect()
    )
    assert {(r.doc_id, r.source) for r in got} == {
        (r.doc_id, r.source) for r in ref
    }


def test_t33_mojibake_detects_exactly_the_planted_damage(spark, sf_dir):
    """Clean docs (neither injection arm fires) must read n_moji == 0;
    the %7 arm always plants one marker; the %3 arm plants (doc_id//3)%4
    'Ã©' markers — including the planted ZERO case, which must not flag."""
    rows = QUERIES["t33_mojibake"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        expect = (r.doc_id % 3 == 0) * ((r.doc_id // 3) % 4) + (
            r.doc_id % 7 == 0
        )
        assert r.n_moji == expect, r
        assert r.is_mojibake == (expect > 0), r


def test_g8_trustrank_attenuates_from_seeds(spark, sf_dir):
    """TrustRank invariants: exactly the every-5th hosts are seeds; every
    seed holds at least the undamped teleport floor; total trust never
    exceeds the injected mass (floor division only loses); and trust is
    not uniform (the graph is irregular, so distance-to-seed matters)."""
    from spider_spark.operators.graph import (
        _DAMP_DEN,
        _DAMP_NUM,
        _G8_SEED_MOD,
        _SCALE,
    )

    rows = QUERIES["g8_trustrank"](spark, sf_dir).collect()
    assert rows
    n_hosts = len(rows)
    n_seeds = (n_hosts + _G8_SEED_MOD - 1) // _G8_SEED_MOD
    assert sum(r.is_seed for r in rows) == n_seeds
    floor_base = ((_DAMP_DEN - _DAMP_NUM) * _SCALE) // (_DAMP_DEN * n_seeds)
    for r in rows:
        assert r.trust >= 0
        if r.is_seed:
            assert r.trust >= floor_base, r
    assert sum(r.trust for r in rows) <= _SCALE
    assert len({r.trust for r in rows}) > 1


def test_a15_cms_estimate_dominates_truth(spark, sf_dir):
    """The CMS hard guarantee: every estimate >= the exact count (min of
    upper bounds), exactly TOPK rows come back, and the sketch stays
    useful — overshoot on the fixture is far below the trivial N bound."""
    from spider_spark.operators.textstats import _A15_TOPK

    rows = QUERIES["a15_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == _A15_TOPK
    total = sum(r.exact_cnt for r in rows)  # lower bound on stream size N
    for r in rows:
        assert r.cms_est >= r.exact_cnt, r
        assert r.cms_est - r.exact_cnt < total, r


def test_g9_mutual_pairs_match_direct_recompute(spark, sf_dir):
    """g9's single-pass pair aggregation must equal the naive both-
    directions check on the collected edge multiset, and its plan must
    contain no self-join of the edge table (one shuffle on the pair key,
    broadcast-only joins)."""
    from collections import Counter

    from spider_spark.operators.graph import _derived_graph

    q = QUERIES["g9_reciprocal_links"](spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # host-id derivation + two host-name lookups, all broadcast
    assert plan.count("BroadcastHashJoin") == 3

    hosts, _, edges0 = _derived_graph(spark, sf_dir)
    names = {r.host_id: r.source for r in hosts.collect()}
    cnt = Counter((r.src, r.dst) for r in edges0.collect() if r.src != r.dst)
    want = {}
    for (s, d), n in cnt.items():
        if s < d and (d, s) in cnt:
            want[(names[s], names[d])] = (n, cnt[(d, s)])
    got = {(r.host_a, r.host_b): (r.n_fwd, r.n_rev) for r in q.collect()}
    assert got == want


def test_t36_chunk_verdicts_recompute(spark, sf_dir):
    """Per-doc chunk counts recomputed in pure Python over the same 8-word
    grain: n_chunks, n_en_chunks, and the mixed verdict must all agree."""
    import math

    from spider_spark.operators import load
    from spider_spark.operators.textstats import _T29_CHUNK

    texts = {
        r.doc_id: r.text
        for r in load(spark, sf_dir, "documents").collect()
    }
    for r in QUERIES["t36_code_switch"](spark, sf_dir).collect():
        toks = texts[r.doc_id].split(" ")
        chunks = [
            toks[i * _T29_CHUNK : (i + 1) * _T29_CHUNK]
            for i in range(math.ceil(len(toks) / _T29_CHUNK))
        ]
        en = [
            ch
            for ch in chunks
            if 100 * sum(1 for x in ch if x in ("the", "a")) >= 3 * len(ch)
        ]
        assert r.n_chunks == len(chunks), r
        assert r.n_en_chunks == len(en), r
        assert r.is_mixed == (0 < len(en) < len(chunks)), r


def test_t37_bands_partition_vocabulary(spark, sf_dir):
    """Every vocabulary term lands in exactly one band: n_terms and
    n_tokens sum to the direct vocabulary/token totals, every band's
    min-count is 2^band, and term counts within a band respect its
    [2^band, 2^(band+1)) range by construction of bit length."""
    import pyspark.sql.functions as F

    from spider_spark.operators import load

    rows = QUERIES["t37_freq_spectrum"](spark, sf_dir).collect()
    assert rows
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .count()
    )
    n_vocab, n_tok = tf.count(), tf.agg(F.sum("count")).first()[0]
    assert sum(r.n_terms for r in rows) == n_vocab
    assert sum(r.n_tokens for r in rows) == n_tok
    for r in rows:
        assert r.band_min_count == 2**r.band
        assert r.band_min_count * r.n_terms <= r.n_tokens
        assert r.n_tokens < 2 * r.band_min_count * r.n_terms


def test_w11_growth_and_ranks_consistent(spark, sf_dir):
    """Trending ranks are dense 1..k per day, growth_ppm is the exact
    integer ratio of the emitted counts, and both counts clear the noise
    floor."""
    from spider_spark.operators.textstats import _W11_MIN, _W11_TOPK

    rows = QUERIES["w11_trending_tokens"](spark, sf_dir).collect()
    assert rows
    by_day = {}
    for r in rows:
        by_day.setdefault(r.day, []).append(r)
        assert r.cnt_today >= _W11_MIN and r.cnt_prev >= _W11_MIN
        assert r.growth_ppm == (1_000_000 * r.cnt_today) // r.cnt_prev
    for day, rs in by_day.items():
        ranks = sorted(x.rk for x in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(rs) <= _W11_TOPK
        # ordering respected: growth desc, then count desc, then token
        srt = sorted(
            rs, key=lambda x: (-x.growth_ppm, -x.cnt_today, x.tok)
        )
        assert [x.rk for x in srt] == sorted(x.rk for x in rs)
