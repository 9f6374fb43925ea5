"""Invariant tests for the crawl-scheduling batch (c1/c2/c3/t27) and the
MMR rerank — semantic properties the DuckDB value-hash oracle can't state
(tier partitioning, PSL correctness, greedy-pick optimality), plus plan
hygiene on the corpus-sized paths."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    from spider_spark.operators.crawlops import (
        c1_recrawl_schedule,
        c2_etld1_rollup,
        c3_frontier_reprioritize,
        t27_filter_cascade,
    )
    from spider_spark.operators.similarity import sim_mmr_rerank

    return {
        "c1": c1_recrawl_schedule(spark, SF).collect(),
        "c2": c2_etld1_rollup(spark, SF).collect(),
        "c3": c3_frontier_reprioritize(spark, SF).collect(),
        "t27": t27_filter_cascade(spark, SF).collect(),
        "mmr": sim_mmr_rerank(spark, SF).collect(),
    }


def test_c1_schedule_invariants(rows):
    from spider_spark.operators.crawlops import _C1_TIERS

    hours = {name: h for _, name, h in _C1_TIERS}
    floors = sorted((f, name) for f, name, _ in _C1_TIERS)
    assert rows["c1"], "schedule is empty"
    tiers_seen = set()
    for r in rows["c1"]:
        assert 0 <= r.n_changes <= r.n_fetches
        assert 0 <= r.change_ppm <= 1_000_000
        # tier is the highest floor ≤ change_ppm
        expect = max(
            (f, name) for f, name in floors if r.change_ppm >= f
        )[1]
        assert r.revisit_tier == expect
        assert r.revisit_hours == hours[r.revisit_tier]
        # next_due = last_seen + interval; last_seen is a 2024+ epoch
        assert r.next_due_s - 3600 * r.revisit_hours > 1_700_000_000
        tiers_seen.add(r.revisit_tier)
    assert len(tiers_seen) >= 2, "fixture should exercise multiple tiers"


def test_c2_psl_extraction(rows):
    from spider_spark.operators.crawlops import _C2_PSL2

    assert rows["c2"]
    for r in rows["c2"]:
        labels = r.registrable_domain.split(".")
        tail2 = ".".join(labels[-2:])
        if tail2 in _C2_PSL2:
            # e.g. srcN.co.uk — exactly one label before the 2-label suffix
            assert len(labels) == 3
        else:
            assert len(labels) == 2
        assert 1 <= r.n_hosts <= r.n_pages
        # min_host must belong to this registrable domain
        assert r.min_host.endswith("." + r.registrable_domain) or (
            r.min_host == r.registrable_domain
        )


def test_c3_priority_composition(rows):
    by_src: dict[str, set] = {}
    for r in rows["c3"]:
        assert 1 <= r.host_tier <= 4
        assert 0 <= r.depth < 6
        tie = r.priority - r.host_tier * 1_000_000 - r.depth * 10_000
        assert 0 <= tie < 10_000
        by_src.setdefault(r.source, set()).add(r.host_tier)
    # every URL of one host shares that host's tier
    assert all(len(tiers) == 1 for tiers in by_src.values())
    # and better-tier URLs always sort ahead of worse-tier ones
    tier_of = {s: next(iter(t)) for s, t in by_src.items()}
    pr = sorted(rows["c3"], key=lambda r: r.priority)
    tiers_in_order = [tier_of[r.source] for r in pr]
    assert tiers_in_order == sorted(tiers_in_order)


def test_t27_first_failing_reason(rows):
    reasons = {r.reason for r in rows["t27"]}
    assert "kept" in reasons
    order = ["min_length", "min_words", "word_length", "stopword", "diversity"]
    for r in rows["t27"]:
        assert r.kept == (r.reason == "kept")
        assert r.reason == "kept" or r.reason in order
        if r.reason in order[1:]:  # a later rule fired → earlier ones passed
            idx = order.index(r.reason)
            if idx >= 2:
                assert r.n_toks >= 15


def test_mmr_greedy_semantics(rows, spark):
    from spider_spark.operators.similarity import _MMR_K, _MMR_POOL

    mmr = sorted(rows["mmr"], key=lambda r: r.pick)
    assert [r.pick for r in mmr] == list(range(1, _MMR_K + 1))
    assert len({r.vec_id for r in mmr}) == _MMR_K
    # pick 1 is the relevance argmax: every other pick has rel <= pick1's
    assert all(r.rel <= mmr[0].rel for r in mmr[1:])
    # mmr = 0.7·rel − 0.3·maxsim with maxsim ∈ [−1, 1] (cosines of random
    # embeddings can be negative, so the redundancy term may ADD)
    for r in mmr[1:]:
        assert abs(r.mmr - 0.7 * r.rel) <= 0.3 + 1e-9


def test_corpus_paths_have_no_cartesian(spark):
    """Plan hygiene: c1/c2/t27 corpus-sized plans must contain no
    BroadcastNestedLoopJoin or CartesianProduct (MMR's pool×pool nested
    loop is pool-sized by construction and exempt)."""
    from spider_spark.operators.crawlops import (
        c1_recrawl_schedule,
        c2_etld1_rollup,
        c3_frontier_reprioritize,
        t27_filter_cascade,
    )

    for fn in (
        c1_recrawl_schedule,
        c2_etld1_rollup,
        c3_frontier_reprioritize,
        t27_filter_cascade,
    ):
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_d13_planted_pairs_all_found(spark):
    """Every document of ≥ 64 bytes plants one near-dup image pair
    (2·doc_id, 2·doc_id+1) at Hamming ≤ 2 by construction: the 8×8 fake
    image is the FIRST 64 payload bytes, so a first-two-character swap
    touches only pixels 0–1 and preserves the mean. Shorter payloads tile
    and may drift past the threshold — excluded from the must-find set
    (deterministically, identically, in both engines)."""
    from pyspark.sql import functions as F

    from spider_spark.operators import load
    from spider_spark.operators.multimodal import d13_phash_neardup

    out = d13_phash_neardup(spark, SF).collect()
    doc_ids = [
        r.doc_id
        for r in load(spark, SF, "documents")
        .filter(F.length("text") >= 64)
        .select("doc_id")
        .collect()
    ]
    assert doc_ids
    found = {(r.id_a, r.id_b) for r in out}
    for d in doc_ids:
        assert (2 * d, 2 * d + 1) in found
    for r in out:
        assert r.id_a < r.id_b
        assert 0 <= r.hamming <= 3


def test_t28_drift_bounds(spark):
    from spider_spark.operators.selection import t28_source_drift

    rows = t28_source_drift(spark, SF).collect()
    assert rows
    # L1 of two prob. distributions in ppm is ≤ 2e6 (floors only shrink)
    assert all(0 <= r.drift_ppm <= 2_000_000 for r in rows)
    assert any(r.drift_ppm > 0 for r in rows), "sources should differ"
    assert all(r.n_tokens > 0 for r in rows)
    plan = (
        t28_source_drift(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_a14_histogram_partitions_corpus(spark):
    from spider_spark.operators import load
    from spider_spark.operators.relational4 import a14_equiwidth_hist

    rows = a14_equiwidth_hist(spark, SF).collect()
    total = load(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert all(0 <= r.bucket < 16 for r in rows)
    for r in rows:
        assert r.bucket_lo <= r.min_val <= r.max_val


def test_w9_concentration_monotone(spark):
    from spider_spark.operators.crawlops import w9_host_concentration

    rows = sorted(
        w9_host_concentration(spark, SF).collect(), key=lambda r: r.rk
    )
    assert rows[-1].cum_ppm in (999999, 1000000) or rows[-1].cum_ppm > 999990
    cums = [r.cum_ppm for r in rows]
    assert cums == sorted(cums)
    byts = [r.host_bytes for r in rows]
    assert byts == sorted(byts, reverse=True)


def test_g6_covisitation_capped_and_symmetric_free(spark):
    from spider_spark.operators.graph import _G6_CAP, _G6_MIN_CO, g6_covisitation

    rows = g6_covisitation(spark, SF).collect()
    assert rows, "expected co-visited pairs at sf0.001"
    seen = set()
    for r in rows:
        assert r.page_a < r.page_b, "pairs must be canonical (a < b)"
        assert r.co_count >= _G6_MIN_CO
        assert (r.page_a, r.page_b) not in seen
        seen.add((r.page_a, r.page_b))


def test_new_operators_pass_oracle_under_local_cluster():
    """Multi-executor parity for the operator layer: the SAME DuckDB
    value-hash oracle checks, but with Spark running on
    local-cluster[2,2,2048] — two executor backends in separate JVM
    processes, real serialization/shuffle/broadcast boundaries. Covers
    the round-4 shapes that most depend on distribution assumptions:
    the iterative broadcast PageRank reprioritizer (c3), the
    mapInPandas-fed band join (d13), the broadcast-grid drift
    monitor (t28), and the d2→d7→d14 dedup chain terminal (left join +
    max(struct) argmax across real executor boundaries)."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [
            _sys.executable,
            "-m",
            "spider_spark.verify",
            SF,
            "c3_frontier_reprioritize,d13_phash_neardup,t28_source_drift,"
            "d14_cluster_keep_best",
            "--master",
            "local-cluster[2,2,2048]",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "0 failing" in out.stdout


def test_t29_boilerplate_plan_broadcasts_page_counts(spark):
    """t29's per-host page-count aggregate must broadcast back onto the
    (source, para) rollup — the paragraph table must never sort-merge on
    source — and representative detection must be pure aggregation."""
    from spider_spark.operators.textstats import t29_boilerplate

    plan = (
        t29_boilerplate(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_d14_keep_best_is_window_free(spark):
    """d14's argmax-per-cluster must compile to a map-side-combinable
    aggregate (max(struct)), not a row_number window over the full doc
    table — a 10^6-copy cluster would serialize through one window task."""
    from spider_spark.operators.dedup import d14_cluster_keep_best

    df = d14_cluster_keep_best(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "d14 must not use a window"
    rows = {r.cluster: r for r in df.collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows.values()) == docs
    for r in rows.values():
        assert r.n_dropped == r.n_docs - 1
        assert r.keeper >= 0


def test_g7_anchor_topk_ranks_within_host(spark):
    """g7: at most 3 anchors per host, ranks contiguous from 1, counts
    non-increasing within a host."""
    from spider_spark.operators.graph import g7_anchor_topk

    rows = g7_anchor_topk(spark, SF).collect()
    assert rows
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        cnts = [r.cnt for r in rs]
        assert cnts == sorted(cnts, reverse=True)


def test_c5_growth_curve_is_monotone(spark):
    """c5: cumulative distinct-URL count is strictly increasing and ends
    at the total number of distinct URLs observed."""
    from spider_spark.operators.crawlops import c5_url_growth

    rows = sorted(c5_url_growth(spark, SF).collect(), key=lambda r: r.day)
    assert rows
    cum = 0
    for r in rows:
        assert r.new_urls >= 1
        cum += r.new_urls
        assert r.cum_urls == cum


def test_c6_traps_thresholds_hold(spark):
    """c6: every flagged host satisfies the reason it is flagged for, and
    the reason string is consistent with the ppm columns."""
    from spider_spark.operators.crawlops import (
        _C6_DEEP_PPM,
        _C6_MIN_URLS,
        _C6_QUERY_PPM,
        c6_crawl_traps,
    )

    rows = c6_crawl_traps(spark, SF).collect()
    for r in rows:
        assert r.n_urls >= _C6_MIN_URLS
        deep = r.deep_ppm >= _C6_DEEP_PPM
        qry = r.query_ppm >= _C6_QUERY_PPM
        assert deep or qry
        expect = "deep+query" if (deep and qry) else ("deep" if deep else "query")
        assert r.reason == expect


def test_c7_audit_counts_are_consistent(spark):
    """c7: violations never exceed fetches-1; min_gap below delay implies
    at least one violation; delay follows the deterministic 1+host%5 rule."""
    from spider_spark.operators.crawlops import c7_politeness_audit

    rows = c7_politeness_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.delay_s == 1 + r.host_id % 5
        assert 0 <= r.n_violations <= max(r.n_fetches - 1, 0)
        if r.min_gap_s is not None and r.min_gap_s < r.delay_s:
            assert r.n_violations >= 1
        if r.n_violations == 0 and r.min_gap_s is not None:
            assert r.min_gap_s >= r.delay_s


def test_t30_split_never_separates_near_dups(spark):
    """t30: every d2 near-dup pair lands on the same side; all members of
    a cluster share one side; both sides are populated; split is stable
    across re-runs (stateless hash)."""
    from spider_spark.operators.dedup import (
        d2_token_jaccard,
        t30_leakage_safe_split,
    )

    rows = t30_leakage_safe_split(spark, SF).collect()
    side = {r.doc_id: r.side for r in rows}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, set()).add(r.side)
    assert all(len(s) == 1 for s in by_cluster.values())
    assert {"train", "heldout"} == {r.side for r in rows}

    for p in d2_token_jaccard(spark, SF).collect():
        assert side[p.id_a] == side[p.id_b], "near-dup pair straddles split"

    rows2 = t30_leakage_safe_split(spark, SF).collect()
    assert {r.doc_id: r.side for r in rows2} == side


def test_c8_budget_sums_exactly_and_respects_floors(spark):
    """Largest-remainder apportionment: quotas are integers summing to
    EXACTLY the round budget, every host gets at least its floor share,
    and at most floor+1 — the invariant that lets each host's quota feed
    the salted dequeue as its per-round K."""
    from spider_spark.operators.crawlops import _C8_BUDGET, c8_fetch_budget

    rows = c8_fetch_budget(spark, SF).collect()
    assert rows
    total_pending = sum(r.pending for r in rows)
    assert sum(r.quota for r in rows) == _C8_BUDGET
    for r in rows:
        floor_q = (_C8_BUDGET * r.pending) // total_pending
        assert r.quota in (floor_q, floor_q + 1), r
