"""Targeted tests for the LM/corpus operators (t21–t24): pure-Python
recomputes on small fixtures and semantic invariants the value-hash oracle
can't express."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spider_spark.operators import QUERIES
from spider_spark.operators.lm import _T21_SCALE, _T22_BUCKETS, _T24_TOPK


def test_bigram_fluency_matches_python_recompute(spark, tmp_path):
    """Exact parity with a sequential recompute on a hand-built corpus —
    the integer fixed-point arithmetic leaves no tolerance to hide in."""
    texts = [
        "a b a b a b",        # doc 0: all hot transitions
        "a b c d a b",        # doc 1: mixed
        "d c b a d c",        # doc 2: mostly rare transitions
        "a a a a",            # doc 3: self loop
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    # sequential model
    bigrams, prefix = Counter(), Counter()
    per_doc = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        bgs = list(zip(toks, toks[1:]))
        per_doc[i] = bgs
        for a, b in bgs:
            bigrams[(a, b)] += 1
            prefix[a] += 1
    want = {}
    for i, bgs in per_doc.items():
        pfps = [
            (bigrams[bg] * _T21_SCALE) // prefix[bg[0]] for bg in bgs
        ]
        want[i] = (len(bgs), sum(pfps) // len(bgs))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["fluency_ppm"])
        for r in QUERIES["t21_bigram_fluency"](spark, str(tmp_path)).collect()
    }
    assert got == want
    # and the scores discriminate: hot-transition doc beats rare-transition
    assert got[0][1] > got[2][1]


def test_mix_rebalance_equalizes_sources(spark, sf_dir):
    """The smallest source keeps everything (rate 1), every source keeps at
    most its size, and kept counts concentrate near the target (binomial
    tail bound at BUCKETS=1000 resolution)."""
    rows = QUERIES["t22_mix_rebalance"](spark, sf_dir).collect()
    target = min(r["n_docs"] for r in rows)
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        if r["n_docs"] == target:
            assert r["n_kept"] == r["n_docs"]
        # 6-sigma binomial tolerance around the expected target count
        exp = r["n_docs"] * ((target * _T22_BUCKETS) // r["n_docs"]) / _T22_BUCKETS
        sigma = max(1.0, (exp * (1 - exp / r["n_docs"])) ** 0.5)
        assert abs(r["n_kept"] - exp) <= 6 * sigma + 1


def test_inverted_index_postings_sorted_and_df_consistent(spark, sf_dir):
    rows = QUERIES["t23_inverted_index"](spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for r in rows:
        ids = [int(x) for x in r["postings"].split(",") if x]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)
        true_df = d.filter(
            F.array_contains(F.split("text", " "), r["term"])
        ).count()
        assert r["df"] == true_df
        assert len(ids) == min(true_df, 100)


def test_bpe_merges_match_python_recompute(spark, sf_dir):
    """Top-20 adjacent-pair counts recomputed sequentially over the same
    corpus, with the same (count desc, pair asc) total order."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cnt = Counter()
    for row in d.select("text").collect():
        for w in row["text"].split(" "):
            for i in range(len(w) - 1):
                cnt[w[i : i + 2]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_T24_TOPK]
    got = sorted(
        QUERIES["t24_bpe_merges"](spark, sf_dir).collect(),
        key=lambda r: r["rk"],
    )
    assert [(r["pair"], r["cnt"]) for r in got] == want


def test_fluency_buckets_respect_per_lang_cutoffs(spark, sf_dir):
    """t34: every t21-scored doc lands in exactly one bucket, and each
    bucket verdict is reproducible from the per-language mean/MAD
    recomputed directly from the t34 rows themselves."""
    rows = QUERIES["t34_fluency_buckets"](spark, sf_dir).collect()
    scored = QUERIES["t21_bigram_fluency"](spark, sf_dir).count()
    assert len(rows) == scored
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        mean = sum(x.fluency_ppm for x in rs) // n
        mad = sum(abs(x.fluency_ppm - mean) for x in rs) // n
        hi, lo = mean + mad // 2, mean - mad // 2
        for x in rs:
            want = (
                "head"
                if x.fluency_ppm > hi
                else "tail" if x.fluency_ppm < lo else "middle"
            )
            assert x.bucket == want, (lang, x)
        if n >= 10:
            assert {x.bucket for x in rs} == {"head", "middle", "tail"}, lang
