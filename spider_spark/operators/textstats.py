"""Text-analysis operators for a training-data pipeline over `documents`.

Language-ID heuristic, quality scoring, token counting, fingerprinting, and
binary-column plumbing — the operations a 100 TB web-text corpus needs after
the crawl lands pages (extract_text output ≙ documents.text).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_spark.operators import load, query, sqlmurmur
from spider_spark.urlnorm import murmur3_32

_STOPWORDS = ("the", "a")


@query(
    "t1_token_count",
    """
    SELECT lang,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)  AS total_tokens,
           count(*)                           AS n_docs
    FROM documents GROUP BY lang
    """,
)
def t1_token_count(spark, sf_dir):
    """Whitespace token counting per language — JVM-side split+size, no UDF."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        F.count("*").alias("n_docs"),
    )


@query(
    "t2_lang_id_heuristic",
    """
    SELECT doc_id,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     x -> x = 'the' OR x = 'a'))
                     >= 0.03 * len(string_split(text, ' '))
                THEN 'en_like' ELSE 'other' END AS pred_lang
    FROM documents
    """,
)
def t2_lang_id_heuristic(spark, sf_dir):
    """Stopword-ratio language ID — higher-order array functions keep it in
    codegen (a real pipeline swaps the stopword list per candidate lang)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_n = F.size(F.filter(toks, lambda x: (x == "the") | (x == "a")))
    return d.select(
        "doc_id",
        F.when(stop_n >= 0.03 * F.size(toks), F.lit("en_like"))
        .otherwise(F.lit("other"))
        .alias("pred_lang"),
    )


@query(
    "t3_text_quality",
    """
    SELECT doc_id,
           length(text)                                     AS n_chars,
           len(string_split(text, ' '))                     AS n_tokens,
           round(length(replace(text, ' ', '')) * 1.0
                 / len(string_split(text, ' ')), 4)         AS avg_token_len,
           round(len(list_filter(string_split(text, ' '),
                                 x -> x = 'the' OR x = 'a')) * 1.0
                 / len(string_split(text, ' ')), 4)         AS stopword_ratio,
           round(least(1.0, len(string_split(text, ' ')) / 100.0)
                 * (1.0 - len(list_filter(string_split(text, ' '),
                                          x -> x = 'the' OR x = 'a')) * 1.0
                        / len(string_split(text, ' '))), 4) AS quality
    FROM documents
    """,
)
def t3_text_quality(spark, sf_dir):
    """Quality-scoring features (length / token stats / stopword ratio) —
    the Gopher-rules-style signals, all as column expressions."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop_n = F.size(F.filter(toks, lambda x: (x == "the") | (x == "a")))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")) * 1.0 / n_tokens, 4
        ).alias("avg_token_len"),
        F.round(stop_n * 1.0 / n_tokens, 4).alias("stopword_ratio"),
        F.round(
            F.least(F.lit(1.0), n_tokens / 100.0)
            * (1.0 - stop_n * 1.0 / n_tokens),
            4,
        ).alias("quality"),
    )


@query(
    "t4_charclass_count",
    """
    SELECT lang,
           CAST(sum(length(regexp_replace(text, '[^aeiou]', '', 'g'))) AS BIGINT) AS vowel_chars
    FROM documents GROUP BY lang
    """,
)
def t4_charclass_count(spark, sf_dir):
    """Character-class counting (the reference counts Han chars via regex
    strip, /root/reference/test.py:217-220 — same op, vowel class here)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.length(F.regexp_replace("text", "[^aeiou]", ""))).alias(
            "vowel_chars"
        )
    )


ROLL_MOD = (1 << 61) - 1  # Mersenne 2^61-1
ROLL_BASE = 131


def rolling_fingerprint(s: str) -> int:
    """Pure-Python reference of the t5 fingerprint (parity-tested against
    the vectorized batch kernel): Horner h = (h·131 + ord(ch)) mod 2^61-1,
    shifted into signed int64."""
    h = 0
    for ch in s:
        h = (h * ROLL_BASE + ord(ch)) % ROLL_MOD
    return h - (ROLL_MOD if h > (ROLL_MOD >> 1) else 0)


def rolling_fingerprint_batch(texts) -> "np.ndarray":
    """Vectorized-across-documents Horner: one numpy pass per character
    POSITION (not per character) — positions iterate python-side, every
    step updates the whole batch column at once. The h·131 step would
    overflow uint64 (h < 2^61, ×131 → 2^68), so it is computed with a
    Mersenne split: h = a·2^30 + b ⇒ h·131 ≡ mul30(131·a) + 131·b, where
    mul30(x < 2^38) = (x>>31) + ((x & (2^31-1)) << 30) mod p uses
    2^61 ≡ 1 (mod p). All intermediates stay < 2^62."""
    import numpy as np

    p = np.uint64(ROLL_MOD)
    mask30 = np.uint64((1 << 30) - 1)
    mask31 = np.uint64((1 << 31) - 1)
    base = np.uint64(ROLL_BASE)
    codes = [
        np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in texts
    ]

    def _chunk(idx: "np.ndarray") -> "np.ndarray":
        lens = np.array([len(codes[i]) for i in idx], dtype=np.int64)
        max_len = int(lens.max()) if len(idx) else 0
        mat = np.zeros((len(idx), max_len), dtype=np.uint64)
        for row, i in enumerate(idx):
            mat[row, : len(codes[i])] = codes[i]
        h = np.zeros(len(idx), dtype=np.uint64)
        for pos in range(max_len):
            a = h >> np.uint64(30)
            b = h & mask30
            x = base * a  # < 2^38
            t1 = ((x >> np.uint64(31)) + ((x & mask31) << np.uint64(30))) % p
            h_new = (t1 + base * b + mat[:, pos]) % p
            h = np.where(pos < lens, h_new, h)
        return h

    # pad-to-max over the WHOLE batch would be O(n_docs · longest_doc) in
    # memory and compute (one 1 MB doc in a 10k-row batch ⇒ an 80 GB
    # matrix). Sort by length and process similar-length chunks under a
    # fixed cell budget, so work stays O(total chars · small constant).
    order = np.argsort([len(c) for c in codes], kind="stable")
    h_out = np.zeros(len(codes), dtype=np.uint64)
    CELL_BUDGET = 1 << 24  # 16M uint64 cells ≈ 128 MB peak per chunk
    start = 0
    while start < len(order):
        end = start + 1
        while end < len(order):
            width = len(codes[order[end]])  # sorted: running max
            if max(1, width) * (end + 1 - start) > CELL_BUDGET:
                break
            end += 1
        idx = order[start:end]
        h_out[idx] = _chunk(idx)
        start = end
    out = h_out.astype(np.int64)
    return np.where(h_out > (ROLL_MOD >> 1), out - np.int64(ROLL_MOD), out)


# the Horner recurrence is SQL-expressible after all: DuckDB's list_reduce
# seeds with the first element, which equals Horner-from-0 (0·131 + c₁ = c₁),
# and HUGEINT keeps acc·131 < 2^68 exact before the mod. unicode(substr())
# recovers the codepoints ord() sees, so the oracle matches on any text.
_T5_ORACLE = """
SELECT doc_id,
       CASE WHEN n = 0 THEN 0
            WHEN h > 1152921504606846975::HUGEINT
            THEN (h - 2305843009213693951::HUGEINT)::BIGINT
            ELSE h::BIGINT END AS fingerprint
FROM (
  SELECT doc_id, length(text) AS n, list_reduce(
    list_transform(range(1, length(text) + 1),
                   i -> unicode(substr(text, i::INT, 1))::HUGEINT),
    (acc, c) -> (acc * 131 + c) % 2305843009213693951::HUGEINT) AS h
  FROM documents
)
"""


@query("t5_doc_fingerprint", _T5_ORACLE)
def t5_doc_fingerprint(spark, sf_dir):
    """Polynomial rolling-hash document fingerprint (mod 2^61-1) as a
    batch-vectorized pandas UDF (numpy per character position across the
    whole Arrow batch — no per-character Python loop in the hot path)."""

    @F.pandas_udf(T.LongType())
    def fingerprint(texts: pd.Series) -> pd.Series:
        return pd.Series(rolling_fingerprint_batch(list(texts)))

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fingerprint"))


@query(
    "t6_binary_stats",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ascii(substr(text, 1, 1))  AS first_byte
    FROM documents
    """,
)
def t6_binary_stats(spark, sf_dir):
    """Opaque-binary-column plumbing (multimodal pattern): treat the payload
    as bytes, compute typed metadata JVM-side."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.ascii(F.substring("text", 1, 1)).alias("first_byte"),
    )


@query(
    "pipeline_clean_corpus",
    """
    WITH keepers AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    scored AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             round(least(1.0, len(string_split(d.text, ' ')) / 100.0)
                   * (1.0 - len(list_filter(string_split(d.text, ' '),
                                            x -> x = 'the' OR x = 'a')) * 1.0
                          / len(string_split(d.text, ' '))), 4) AS quality
      FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    )
    SELECT doc_id, lang, n_chars, quality FROM scored
    WHERE quality >= 0.5 AND n_chars >= 100
    """,
)
def pipeline_clean_corpus(spark, sf_dir):
    """End-to-end corpus cleaning: exact-dedup keepers → quality scoring →
    threshold filter — the composed shape of a training-data prep job
    (dedup + quality + length gates in one declarative plan)."""
    d = load(spark, sf_dir, "documents")
    keepers = d.groupBy(F.md5(F.col("text").cast("binary"))).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    toks = F.split("text", " ")
    stop_n = F.size(F.filter(toks, lambda x: (x == "the") | (x == "a")))
    quality = F.round(
        F.least(F.lit(1.0), F.size(toks) / 100.0) * (1.0 - stop_n * 1.0 / F.size(toks)),
        4,
    )
    return (
        d.join(keepers, "doc_id")
        .withColumn("quality", quality)
        .filter((F.col("quality") >= 0.5) & (F.col("n_chars") >= 100))
        .select("doc_id", "lang", "n_chars", "quality")
    )


@query(
    "t8_repetition_stats",
    """
    WITH t AS (
      SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           round(list_max(list_transform(list_distinct(toks),
                   u -> len(list_filter(toks, x -> x = u)))) * 1.0
                 / len(toks), 4) AS top_token_frac,
           round(CASE WHEN len(toks) >= 2
                 THEN 1.0 - len(list_distinct(list_transform(
                        range(0, len(toks) - 1),
                        i -> toks[(i + 1)::INT] || ' ' || toks[(i + 2)::INT])))
                      * 1.0 / (len(toks) - 1)
                 ELSE 0.0 END, 4) AS dup_bigram_frac,
           round(length(replace(text, ' ', '')) * 1.0 / len(toks), 4)
             AS mean_word_len,
           (list_max(list_transform(list_distinct(toks),
                   u -> len(list_filter(toks, x -> x = u)))) * 1.0
                 / len(toks) <= 0.12
            AND (CASE WHEN len(toks) >= 2
                 THEN 1.0 - len(list_distinct(list_transform(
                        range(0, len(toks) - 1),
                        i -> toks[(i + 1)::INT] || ' ' || toks[(i + 2)::INT])))
                      * 1.0 / (len(toks) - 1)
                 ELSE 0.0 END) <= 0.06
            AND length(replace(text, ' ', '')) * 1.0 / len(toks)
                BETWEEN 3.0 AND 10.0) AS keep
    FROM t
    """,
)
def t8_repetition_stats(spark, sf_dir):
    """Gopher-style repetition rules (Rae et al. 2021, public): most-common-
    token fraction, duplicate-bigram fraction, mean word length, and the
    composed keep gate. Everything is per-row higher-order array math —
    zero shuffles, stays in whole-stage codegen, so at 100 TB this is a
    pure map over the corpus scan (the same shape the reference's per-page
    field cleanup takes in /root/reference/zjj_sz_gov_cn.py:160-208)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    top_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda u: F.size(F.filter(toks, lambda x: x == u)),
            )
        )
        * 1.0
        / n
    )
    bg = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    dup_bg = F.when(
        n >= 2, 1.0 - F.size(F.array_distinct(bg)) * 1.0 / (n - 1)
    ).otherwise(F.lit(0.0))
    mwl = F.length(F.regexp_replace("text", " ", "")) * 1.0 / n
    keep = (top_frac <= 0.12) & (dup_bg <= 0.06) & mwl.between(3.0, 10.0)
    return d.select(
        "doc_id",
        F.round(top_frac, 4).alias("top_token_frac"),
        F.round(dup_bg, 4).alias("dup_bigram_frac"),
        F.round(mwl, 4).alias("mean_word_len"),
        keep.alias("keep"),
    )


# DuckDB has no murmur3, but Spark's hash() is plain integer arithmetic —
# sqlmurmur generates the whole fold+finalizer as SQL (HUGEINT for the two
# overflow-prone multiplies), turning this from rows-only into a full
# value-hash-checked oracle. ASCII-only corpus makes unicode(substr())
# byte access exact (asserted over the testdata in tests).
_T7_ORACLE = f"""
SELECT doc_id, content_hash
FROM (SELECT doc_id, {sqlmurmur.murmur32_string_aliases("text", "content_hash", "t7")}
      FROM documents)
"""


@query("t7_murmur_fingerprint", _T7_ORACLE)
def t7_murmur_fingerprint(spark, sf_dir):
    """Murmur3-32 content hash via Spark's built-in hash() (JVM-side) —
    verified in tests against the pure-Python murmur3_32 (bit parity) and
    against the generated DuckDB murmur SQL (_T7_ORACLE)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.hash("text").alias("content_hash"))


def murmur_fingerprint_py(text: str) -> int:
    """Driver/oracle-side twin of t7 (parity tested)."""
    return murmur3_32(text)
