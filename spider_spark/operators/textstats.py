"""Text-analysis operators for a training-data pipeline over `documents`.

Language-ID heuristic, quality scoring, token counting, fingerprinting, and
binary-column plumbing — the operations a 100 TB web-text corpus needs after
the crawl lands pages (extract_text output ≙ documents.text).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
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
    field cleanup takes in /root/reference/zjj_sz_gov_cn.py:160-208).

    Per-row cost is O(L log L), not O(L²): the most-common-token count is
    the max run length of `array_sort(toks)` (one aggregate pass), and the
    distinct-bigram count is the number of value transitions in the sorted
    bigram array (one aggregate pass) — a 100k-token document costs one
    sort + two linear scans instead of the distinct×length filter and the
    quadratic-worst-case array_distinct the r3 form used. Two traps this
    form avoids: (1) the token array is materialized as a column BEFORE
    any lambda touches it — `element_at(split(text), i)` inside a
    transform re-evaluates the split per element (measured: one 50k-token
    doc never finished); bigrams come from `zip_with` over two slices of
    the materialized array instead. (2) The "" initial sentinel is safe in
    both passes: an empty first TOKEN (double spaces) still yields
    run=0+1=1, and a bigram always contains the joining space so it can
    never equal "".
    """
    d = load(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    toks = F.col("toks")
    n = F.size(toks)
    top_count = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = top_count * 1.0 / n
    bg = F.zip_with(
        F.slice(toks, F.lit(1), n - 1),
        F.slice(toks, F.lit(2), n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    n_distinct_bg = F.aggregate(
        F.array_sort(bg),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("cnt")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            (acc["cnt"] + F.when(x == acc["prev"], 0).otherwise(1)).alias("cnt"),
        ),
        lambda acc: acc["cnt"],
    )
    dup_bg = F.when(
        n >= 2, 1.0 - n_distinct_bg * 1.0 / (n - 1)
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


DECON_N = 4  # n-gram width; 13 in the published recipe, 4 fits the fixture's
# 10-99-token docs (non-degenerate hit counts at sf0.01) while keeping the
# operator shape identical

_T9_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(0, len(toks) - {DECON_N - 1}),
               i -> array_to_string(
                      list_slice(toks, (i + 1)::INT, (i + {DECON_N})::INT),
                      ' ')))) AS gram
      FROM w),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
SELECT g.doc_id,
       count(*)                                        AS n_grams,
       count(ev.gram)                                  AS n_hits,
       round(count(ev.gram) * 1.0 / count(*), 4)       AS contamination,
       count(ev.gram) > 0                              AS contaminated
FROM g LEFT JOIN ev ON g.gram = ev.gram
WHERE g.doc_id % 97 <> 0
GROUP BY g.doc_id
"""


@query("t9_decontaminate", _T9_ORACLE)
def t9_decontaminate(spark, sf_dir):
    """Benchmark decontamination (the GPT-3/PaLM recipe, Brown et al. 2020
    appendix C, public): flag training documents sharing any word n-gram
    with an eval set. The eval set here is the deterministic doc_id%97==0
    slice of `documents` (a stand-in for a benchmark suite's text).

    Scale shape: eval suites are tiny relative to a 100 TB corpus, so the
    distinct eval-gram set is a broadcast — the train side never shuffles
    on the gram; the only wide exchange is the per-doc aggregation on
    doc_id. At real scale the gram string would be xxhash64-ed before the
    join to cut exchange width (kept as the string here so the DuckDB
    oracle is byte-exact)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = F.when(
        F.size(toks) >= DECON_N,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (DECON_N - 1)),
            lambda i: F.array_join(F.slice(toks, i, DECON_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
    ev = (
        g.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
        .withColumn("hit", F.lit(1))
    )
    train = g.filter(F.col("doc_id") % 97 != 0)
    agg = train.join(F.broadcast(ev), "gram", "left").groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "n_hits",
        F.round(F.col("n_hits") * 1.0 / F.col("n_grams"), 4).alias(
            "contamination"
        ),
        (F.col("n_hits") > 0).alias("contaminated"),
    )


_T11_ORACLE = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
d AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT doc_id, term, tf * (n - df + 0.5) / (df + 0.5) AS score
      FROM d, n),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk
      FROM s)
SELECT doc_id, term, CAST(rk AS BIGINT) AS rk, round(score, 4) AS score
FROM r WHERE rk <= 3
"""


@query("t11_tfidf_topk", _T11_ORACLE)
def t11_tfidf_topk(spark, sf_dir):
    """Top-3 characteristic terms per document by tf-idf, with the log-free
    Robertson–Sparck-Jones idf (tf·(N−df+0.5)/(df+0.5), public BM25
    lineage): rational arithmetic over exact integers is correctly rounded
    and therefore bit-identical across engines, where ln() (libm vs
    java.lang.Math) can drift a ULP and flip near-tie rankings.

    Scale shape: document frequency is a vocabulary-sized aggregate over tf
    (map-side partials absorb hot stopwords) joined back by BROADCAST — the
    corpus-sized tf side never shuffles on the skewed term key (a term-
    partitioned window would hot-spot on stopwords, and AQE cannot split a
    window partition). tf's (doc_id, term) exchange is structurally
    identical in both branches, so Catalyst's exchange reuse serves the df
    branch from the same shuffle. Ranking re-partitions by doc_id (evenly
    distributed); the corpus-size scalar N is a broadcast 1-row cross
    join."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    score = (
        F.col("tf") * (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "rk", F.round("score", 4).alias("score"))
    )


_T10_ORACLE = f"""
WITH h AS (SELECT doc_id, lang,
                  {sqlmurmur.hashlong_aliases("doc_id", "42", "mmh", "t10")}
           FROM documents)
SELECT doc_id, lang,
       CAST(((mmh % 100) + 100) % 100 AS BIGINT) AS bucket
FROM h
WHERE ((mmh % 100) + 100) % 100 <
      CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 10 ELSE 25 END
"""


@query("t10_hash_sample", _T10_ORACLE)
def t10_hash_sample(spark, sf_dir):
    """Stratified deterministic sampling for corpus mixing: keep a per-
    language rate (en 50 %, zh 10 %, others 25 %) by bucketing Spark's
    murmur3 hash(doc_id) mod 100 — reproducible across runs and clusters,
    no RNG state, no sort. A pure filter over the scan (no shuffle, no
    sample() nondeterminism); the DuckDB oracle replays the exact murmur
    arithmetic via sqlmurmur.hashlong_aliases."""
    d = load(spark, sf_dir, "documents")
    bucket = F.pmod(F.hash("doc_id"), F.lit(100)).cast("long")
    rate = (
        F.when(F.col("lang") == "en", 50)
        .when(F.col("lang") == "zh", 10)
        .otherwise(25)
    )
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("_r"))
        .filter(F.col("bucket") < F.col("_r"))
        .drop("_r")
    )


_T12_EMAIL = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
_T12_PHONE = "555-[0-9]+"

_T12_ORACLE = f"""
WITH raw AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 <> 0
                 THEN ' ' || source || '.user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' call 555-0' || (doc_id % 89)
                 ELSE '' END AS t
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{_T12_EMAIL}', '<EMAIL>', 'g'),
                      '{_T12_PHONE}', '<PHONE>', 'g')             AS redacted,
       CAST(len(regexp_extract_all(t, '{_T12_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_T12_PHONE}')) AS BIGINT) AS n_phones
FROM raw
"""


@query("t12_pii_redact", _T12_ORACLE)
def t12_pii_redact(spark, sf_dir):
    """PII redaction for a web-text corpus: replace email addresses and
    phone-shaped tokens with placeholder tags and count the hits per doc.
    The synthetic corpus contains no PII, so a deterministic contact
    string is first appended to ~2/3 of the docs (emails) and 1/2 (phone
    numbers) from (source, doc_id) — identically in both engines — and
    the redaction runs over that mixed text. Pure regexp_replace /
    regexp_count column expressions: stays in whole-stage codegen, no
    UDF, no shuffle (a filter-free per-row map over the scan)."""
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(
                F.lit(" "), F.col("source"), F.lit(".user"),
                F.col("doc_id").cast("string"), F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(" call 555-0"),
                     (F.col("doc_id") % 89).cast("string")),
        ).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(raw, _T12_EMAIL, "<EMAIL>"),
            _T12_PHONE, "<PHONE>",
        ).alias("redacted"),
        F.regexp_count(raw, F.lit(_T12_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(_T12_PHONE)).cast("long").alias("n_phones"),
    )


_T13_ORACLE = """
WITH s AS (
  SELECT source,
         CAST(count(*) AS BIGINT)                               AS n_docs,
         round(avg(n_chars), 4)                                 AS avg_chars,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT)      AS total_tokens
  FROM documents GROUP BY source)
SELECT source, n_docs, avg_chars, total_tokens,
       CAST(ntile(3) OVER (ORDER BY avg_chars DESC, source) AS INT) AS tier
FROM s
"""


@query("t13_source_tiers", _T13_ORACLE)
def t13_source_tiers(spark, sf_dir):
    """Crawl-tier assignment: aggregate per source (≙ host/domain in a live
    crawl) and split sources into 3 quality tiers by average document
    length — the host-tiering step a tiered recrawl policy feeds on
    (tier 1 recrawled often, tier 3 rarely). The tiers run over the
    per-source AGGREGATE (|hosts| rows, not the corpus) via the two-phase
    ntile (scalewin.py — range-partition + driver prefix-sum, standard
    SQL bucket sizing), so NO single-partition window exists even at
    10^8-host cardinality; the corpus-sized work is one
    map-side-combinable groupBy(source)."""
    from spider_spark.operators.scalewin import two_phase_ntile

    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
    )
    return two_phase_ntile(
        s, [("avg_chars", True), ("source", False)], 3, "tier"
    )


# ---------------------------------------------------------------------------
# t14: blocklist filter (the C4 "bad words" rule: drop documents whose
# blocklisted-token share crosses a threshold).

_T14_BLOCK = ("slow", "merge")  # stand-in blocklist from the fixture vocab
_T14_THRESH = 0.07

_T14_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(ws, w -> w IN ('slow', 'merge'))) AS BIGINT)
           AS n_blocked,
       round(len(list_filter(ws, w -> w IN ('slow', 'merge')))
             / CAST(len(ws) AS DOUBLE), 6) AS blocked_ratio,
       (len(list_filter(ws, w -> w IN ('slow', 'merge')))
        < 0.07 * len(ws)) AS keep
FROM t
"""


@query("t14_blocklist_filter", _T14_ORACLE)
def t14_blocklist_filter(spark, sf_dir):
    """C4-style blocklist filter: per-document blocklisted-token count and
    share; keep = share under threshold. The list here is a two-token
    stand-in from the fixture vocabulary — a production badwords list is
    a few thousand entries and still ships the same way.

    Scale shape: a zero-exchange per-row map — the blocklist is a literal
    IN-set inside a higher-order `filter` over the token array, entirely
    whole-stage codegen (at real blocklist sizes: a broadcast variable or
    bloom filter, still never a join/shuffle on the corpus side)."""
    bl = ", ".join(f"'{w}'" for w in _T14_BLOCK)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    nb = F.size(F.expr(f"filter(ws, w -> w IN ({bl}))"))
    return d.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        nb.cast("long").alias("n_blocked"),
        F.round(nb / F.size("ws"), 6).alias("blocked_ratio"),
        (nb < _T14_THRESH * F.size("ws")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# t15: BPE-ish token counting (the pre-tokenizer split every byte-pair
# tokenizer applies before merges — GPT-2's pattern without the lookahead,
# ASCII classes since the fixture corpus is ASCII).

_T15_PAT = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


@query(
    "t15_bpe_token_count",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '{_T15_PAT}')) AS BIGINT)
                 AS n_bpe_pieces
      FROM documents)
    SELECT doc_id, n_ws_tokens, n_bpe_pieces,
           round(n_bpe_pieces / CAST(n_ws_tokens AS DOUBLE), 6)
               AS pieces_per_word
    FROM t
    """,
)
def t15_bpe_token_count(spark, sf_dir):
    """Token-budget estimation with a BPE-style pre-tokenizer regex
    (letter runs / digit runs / punctuation runs, each with its optional
    leading space) next to the plain whitespace count — the
    pieces-per-word ratio is the standard tokens-per-word fertility a
    training-data budget is planned against.

    Scale shape: zero-exchange scan+map; the regex runs as a JVM
    `regexp_extract_all` inside whole-stage codegen (the pattern avoids
    lookahead so the same regex runs identically on Java regex and RE2).
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{_T15_PAT}', 0)")
        ).cast("long").alias("n_bpe_pieces"),
    )
    return t.select(
        "doc_id",
        "n_ws_tokens",
        "n_bpe_pieces",
        F.round(F.col("n_bpe_pieces") / F.col("n_ws_tokens"), 6).alias(
            "pieces_per_word"
        ),
    )


_T16_ORACLE = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
pairs AS (SELECT DISTINCT doc_id, term FROM tok),
dft AS (SELECT term, count(*) AS df FROM pairs GROUP BY term),
agg AS (SELECT p.doc_id,
               count(*) AS n_terms,
               sum(d.df) AS sum_df
        FROM pairs p JOIN dft d USING (term) GROUP BY p.doc_id),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id,
       CAST(n_terms AS BIGINT)  AS n_distinct_terms,
       CAST(sum_df AS BIGINT)   AS sum_df,
       round(sum_df / CAST(n_terms * n AS DOUBLE), 6) AS familiarity
FROM agg, n
"""


@query("t16_token_familiarity", _T16_ORACLE)
def t16_token_familiarity(spark, sf_dir):
    """Corpus-familiarity quality score: the mean document frequency of a
    document's distinct tokens (sum of per-term df over n_distinct·N).
    Documents dominated by rare/garbage tokens score near 0, documents of
    common well-formed text score high — the log-free rational analog of
    CCNet's per-language LM-perplexity quality bucketing (Wenzek et al.
    2020, public): integer counts and a single double division are
    correctly rounded and therefore bit-identical across engines, where a
    log-probability sum would drift ULPs.

    Scale shape: the distinct (doc_id, term) set aggregates to a
    vocabulary-sized df table (map-side partials absorb hot stopwords)
    that joins back by BROADCAST — the corpus-sized pair set never
    shuffles on the skewed term key; the per-doc aggregation exchanges on
    evenly-distributed doc_id; N is a broadcast 1-row cross join. Same
    exchange discipline as t11 (tf-idf)."""
    d = load(spark, sf_dir, "documents")
    pairs = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
    )
    dft = pairs.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    return (
        pairs.join(F.broadcast(dft), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_distinct_terms"),
            F.sum("df").cast("long").alias("sum_df"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_distinct_terms",
            "sum_df",
            F.round(
                F.col("sum_df")
                / (F.col("n_distinct_terms") * F.col("n")).cast("double"),
                6,
            ).alias("familiarity"),
        )
    )


_T17_ORACLE = """
WITH f AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT)            AS n_words,
         CAST(length(replace(text, ' ', '')) AS BIGINT)          AS sum_len,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> length(x) > 20)) AS BIGINT)   AS n_giant,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x = 'the' OR x = 'a'))
              AS BIGINT)                                         AS n_stop,
         text LIKE '%{%'                                         AS has_brace,
         contains(lower(text), 'lorem ipsum')                    AS has_lorem
  FROM documents
)
SELECT doc_id, n_words,
       n_words >= 50 AND n_words <= 100000           AS r_word_count,
       sum_len >= 3 * n_words
         AND sum_len <= 10 * n_words                 AS r_mean_word_len,
       n_giant = 0                                   AS r_no_giant_words,
       n_stop >= 2                                   AS r_stopwords,
       NOT has_brace                                 AS r_no_brace,
       NOT has_lorem                                 AS r_no_lorem,
       (n_words >= 50 AND n_words <= 100000)
         AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
         AND n_giant = 0 AND n_stop >= 2
         AND NOT has_brace AND NOT has_lorem         AS keep
FROM f
"""


@query("t17_c4_rules", _T17_ORACLE)
def t17_c4_rules(spark, sf_dir):
    """C4/Gopher-style document-level quality RULES (Raffel et al. 2020
    §2.2; Rae et al. 2021 Gopher rules A.1.1) as per-rule boolean verdicts
    plus the conjunction `keep` — the filter-with-audit-trail shape a real
    pipeline wants (you keep the per-rule flags so removal reasons are
    aggregable). Rules that need sentence/line structure are applied at
    document grain here (the synthetic corpus has no newlines; a real
    corpus splits on '\\n' first — cf. d9's chunking note).

    Everything is integer/boolean column math — mean-word-length bounds
    are cross-multiplied (sum_len vs 3·n and 10·n) so no float division
    can flip the cross-engine hash — and the whole operator is a single
    zero-shuffle projection that stays in whole-stage codegen.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("long")
    sum_len = F.length(F.regexp_replace("text", " ", "")).cast("long")
    n_giant = F.size(F.filter(toks, lambda x: F.length(x) > 20)).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: (x == "the") | (x == "a"))).cast(
        "long"
    )
    has_brace = F.col("text").contains("{")
    has_lorem = F.lower("text").contains("lorem ipsum")
    r_wc = (n_words >= 50) & (n_words <= 100000)
    r_mwl = (sum_len >= 3 * n_words) & (sum_len <= 10 * n_words)
    r_giant = n_giant == 0
    r_stop = n_stop >= 2
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_giant.alias("r_no_giant_words"),
        r_stop.alias("r_stopwords"),
        (~has_brace).alias("r_no_brace"),
        (~has_lorem).alias("r_no_lorem"),
        (r_wc & r_mwl & r_giant & r_stop & ~has_brace & ~has_lorem).alias(
            "keep"
        ),
    )


_T18_W = 32  # tokens per chunk
_T18_S = 24  # stride (overlap = W - S)

_T18_ORACLE = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l,
                    len(string_split(text, ' '))    AS n
             FROM documents),
s AS (SELECT doc_id, l, n,
             unnest(generate_series(0, n - 1, {_T18_S})) AS start
      FROM tok)
SELECT doc_id,
       CAST(start // {_T18_S} AS BIGINT)             AS chunk_idx,
       CAST(least({_T18_W}, n - start) AS BIGINT)    AS n_chunk_tokens,
       array_to_string(l[start + 1 : least(start + {_T18_W}, n)], ' ')
                                                     AS chunk_text
FROM s
"""


@query("t18_chunk_windows", _T18_ORACLE)
def t18_chunk_windows(spark, sf_dir):
    """Fixed-size token-window chunking with overlap (W=32, stride 24 —
    the context-window preprocessing step of an LLM training / RAG
    pipeline): each document becomes ceil(n/stride) chunks of up to W
    whitespace tokens, consecutive chunks sharing W-stride tokens.

    Scale shape: a pure per-row flatMap — split / sequence / explode /
    slice are all JVM column expressions inside whole-stage codegen, no
    UDF, no shuffle, no window. Output partitioning inherits the scan, so
    at 100 TB this is embarrassingly parallel and bounded by read+write
    bandwidth. Chunk text is built by slicing the already-split array
    (1-based in both engines, overrun clamped) so bytes are identical to
    the DuckDB oracle by construction."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    e = d.select(
        "doc_id",
        toks.alias("l"),
        n.alias("n"),
        F.explode(
            F.sequence(F.lit(0), n - 1, F.lit(_T18_S))
        ).alias("start"),
    )
    return e.select(
        "doc_id",
        (F.col("start") / _T18_S).cast("long").alias("chunk_idx"),
        F.least(F.lit(_T18_W), F.col("n") - F.col("start"))
        .cast("long")
        .alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("l"), F.col("start") + 1, F.lit(_T18_W))
        ).alias("chunk_text"),
    )


_T19_CAP = 256  # tokens per packed sequence (bin)
_T19_BUCKET = 64  # doc_ids per prefix-sum bucket (scale knob)

_T19_ORACLE = f"""
WITH tok AS (SELECT doc_id, lang,
                    len(string_split(text, ' ')) AS n_tokens
             FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM tok)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((cum - n_tokens) // {_T19_CAP} AS BIGINT) AS bin_id,
       CAST((cum - n_tokens) % {_T19_CAP} AS BIGINT)  AS bin_offset
FROM c
"""


@query("t19_pack_bins", _T19_ORACLE)
def t19_pack_bins(spark, sf_dir):
    """Sequence packing for LLM pretraining: concatenate each language's
    documents in doc_id order and cut the stream into CAP-token bins; a
    document is assigned to the bin where its first token lands
    (bin_id = exclusive-prefix-sum // CAP, bin_offset = the remainder) —
    the standard concat-then-chunk packing layout.

    Scale shape: the oracle's single window per language would serialize a
    whole language's corpus through one task (en at 100 TB = one
    straggler), so the Spark side computes the prefix sum DISTRIBUTED,
    two-stage like a carry-lookahead adder: (1) group by (lang, bucket =
    doc_id // B) → per-bucket token totals (map-side combinable, tiny
    output), cumulated by a window over the AGGREGATED table (rows =
    n_docs/B, safe on a single task at any corpus size with B sized to
    taste); (2) broadcast the per-bucket carry offsets back and window
    only WITHIN (lang, bucket) — bounded at B rows per partition, no
    skew. Pure integer arithmetic end to end, so bit-exact vs the
    straight-window oracle."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        (F.col("doc_id") / _T19_BUCKET).cast("long").alias("bucket"),
    )
    per_bucket = tok.groupBy("lang", "bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    wb = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "lang",
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(wb), F.lit(0)).alias(
            "carry"
        ),
    )
    wl = (
        Window.partitionBy("lang", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.col("carry") + F.coalesce(
        F.sum("n_tokens").over(wl), F.lit(0)
    )
    return (
        tok.join(F.broadcast(offsets), ["lang", "bucket"])
        .withColumn("excl", cum_excl)
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("excl") / _T19_CAP).cast("long").alias("bin_id"),
            (F.col("excl") % _T19_CAP).cast("long").alias("bin_offset"),
        )
    )


_T20_TERMS = ("scan", "join", "vector")  # fixed query-term set
_T20_K1 = 1.2
_T20_B = 0.75
_T20_TOPK = 10

_T20_ORACLE = f"""
WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term,
                    len(string_split(text, ' ')) AS dl
             FROM documents),
tf AS (SELECT doc_id, lang, term, dl, count(*) AS tf
       FROM tok
       WHERE term IN ('scan', 'join', 'vector')
       GROUP BY 1, 2, 3, 4),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n, sum(len(string_split(text, ' '))) AS tdl
          FROM documents),
s AS (SELECT t.doc_id, t.lang, t.term,
             ((n - df + 0.5) / (df + 0.5))
             * (t.tf * ({_T20_K1} + 1.0))
             / (t.tf + {_T20_K1}
                * ((1.0 - {_T20_B})
                   + {_T20_B} * ((t.dl * n) * 1.0 / tdl))) AS sc
      FROM tf t JOIN df USING (term) CROSS JOIN stats),
p AS (SELECT doc_id, lang,
             coalesce(sum(sc) FILTER (term = 'scan'), 0.0)   AS s_scan,
             coalesce(sum(sc) FILTER (term = 'join'), 0.0)   AS s_join,
             coalesce(sum(sc) FILTER (term = 'vector'), 0.0) AS s_vector,
             count(*) AS n_matched
      FROM s GROUP BY 1, 2),
r AS (SELECT doc_id, lang, n_matched,
             round(s_scan + s_join + s_vector, 4) AS score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY s_scan + s_join + s_vector DESC,
                                         doc_id) AS rk
      FROM p)
SELECT doc_id, lang, CAST(n_matched AS BIGINT) AS n_matched, score,
       CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {_T20_TOPK}
"""


@query("t20_bm25_rank", _T20_ORACLE)
def t20_bm25_rank(spark, sf_dir):
    """BM25 retrieval scoring over a fixed query-term set with top-K per
    language: Okapi BM25 (k1=1.2, b=0.75) with the log-free
    Robertson–Sparck-Jones idf (same lineage as t11) so every factor is a
    rational over exact integers — ln() ULP drift can't flip rankings.

    Float discipline: the per-doc score is NOT a sum over an unordered
    aggregate (3 doubles summed in engine-dependent order can differ in
    the last ULP) — each query term is pivoted to its own conditionally-
    aggregated column (each sum covers ≤1 row, hence exact) and the doc
    score is the fixed-order expression s_scan + s_join + s_vector,
    identical in both engines, then round(4).

    Scale shape: the tf table is filtered to the query terms BEFORE the
    groupBy, so the shuffle is |terms|·|matching docs|, not corpus-sized;
    df over it is tiny and broadcast back; corpus stats (N, total doc
    length) are one broadcast row. Top-K per language re-partitions by
    lang — bounded by TOPK retention per partition under
    TakeOrdered-style eviction."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stats = d.agg(
        F.count("*").alias("n"), F.sum(F.size(toks)).alias("tdl")
    )
    tf = (
        d.select(
            "doc_id",
            "lang",
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        .filter(F.col("term").isin(*_T20_TERMS))
        .groupBy("doc_id", "lang", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    sc = (
        ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (_T20_K1 + 1.0))
        / (
            F.col("tf")
            + _T20_K1
            * (
                (1.0 - _T20_B)
                + _T20_B
                * ((F.col("dl") * F.col("n")) * 1.0 / F.col("tdl"))
            )
        )
    )
    terms = tf.join(F.broadcast(df), "term").crossJoin(
        F.broadcast(stats)
    ).withColumn("sc", sc)
    p = terms.groupBy("doc_id", "lang").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("term") == t, F.col("sc"))), F.lit(0.0)
            ).alias(f"s_{t}")
            for t in _T20_TERMS
        ],
        F.count("*").alias("n_matched"),
    )
    total = F.col("s_scan") + F.col("s_join") + F.col("s_vector")
    w = Window.partitionBy("lang").orderBy(F.desc(total), "doc_id")
    return (
        p.withColumn("score", F.round(total, 4))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _T20_TOPK)
        .select("doc_id", "lang", "n_matched", "score", "rk")
    )


# ---------------------------------------------------------------------------
# t29 — per-host boilerplate paragraph detection (the CCNet/trafilatura
# motivation: navigation bars, cookie banners and footer text repeat on
# most pages of a site and must be stripped before training)
# ---------------------------------------------------------------------------

_T29_CHUNK = 8  # same paragraph grain as d9_paragraph_dedup
_T29_MIN_DOCS = 2
_T29_MIN_PPM = 300_000  # paragraph must appear on >= 30% of the host's pages

_T29_ORACLE = f"""
WITH ex AS (
  SELECT DISTINCT source, doc_id,
         array_to_string(list_slice(string_split(text, ' '),
                                    CAST(i*{_T29_CHUNK}+1 AS BIGINT),
                                    CAST(i*{_T29_CHUNK}+{_T29_CHUNK} AS BIGINT)), ' ') AS para
  FROM documents,
       UNNEST(range(0, CAST(ceil(len(string_split(text, ' '))/{_T29_CHUNK}.0)
                             AS BIGINT))) AS t(i)
),
pages AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
          FROM documents GROUP BY source),
pp AS (SELECT source, para, CAST(count(*) AS BIGINT) AS n_docs
       FROM ex GROUP BY source, para)
SELECT pp.source, pp.para, pp.n_docs, pg.n_pages,
       CAST((1000000 * pp.n_docs) // pg.n_pages AS BIGINT) AS frac_ppm
FROM pp JOIN pages pg ON pg.source = pp.source
WHERE pp.n_docs >= {_T29_MIN_DOCS}
  AND (1000000 * pp.n_docs) // pg.n_pages >= {_T29_MIN_PPM}
"""


@query("t29_boilerplate", _T29_ORACLE)
def t29_boilerplate(spark, sf_dir):
    """Per-host boilerplate paragraph detection: a paragraph (fixed
    8-word chunk, the d9 grain — a real corpus splits on newlines) that
    appears on >= 30% of a host's pages (and at least 2) is site
    boilerplate, not content; emit (source, para, n_docs, n_pages,
    frac_ppm) so a cleaning pass can anti-join it away. The fraction is
    exact integer ppm — no float threshold to defend across engines.

    Scale shape (100 TB): within-document chunk dedup is row-local
    (``array_distinct`` before the explode — no corpus-wide distinct
    shuffle), so the ONLY corpus exchange is the map-side-combinable
    groupBy(source, para): a cookie banner repeated on 10^7 pages of one
    host collapses per map partition before that shuffle. Per-host page
    counts are a plain count (doc_id is unique per row), a |hosts|-sized
    aggregate joined back via broadcast. No window touches row-level
    data. (CCNet, Wenzek et al., LREC 2020 strips repeated paragraphs the
    same way at Common-Crawl scale.)"""
    d = load(spark, sf_dir, "documents")
    # array_distinct: a paragraph repeated WITHIN one doc still counts
    # that doc once — and rows are (source, para, doc_id)-distinct with
    # zero shuffle, since doc_id is row-unique
    ex = d.select(
        "source",
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, cast(ceil(size(split(text,' '))"
                    f"/{_T29_CHUNK}.0) as int) - 1),"
                    f" i -> concat_ws(' ', slice(split(text,' '), i*{_T29_CHUNK}+1, {_T29_CHUNK})))"
                )
            )
        ).alias("para"),
    )
    pages = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_pages"))
    pp = ex.groupBy("source", "para").agg(F.count("*").alias("n_docs"))
    return (
        pp.join(F.broadcast(pages), "source")
        .filter(F.col("n_docs") >= _T29_MIN_DOCS)
        .withColumn(
            "frac_ppm", F.expr("(1000000 * n_docs) div n_pages")
        )
        .filter(F.col("frac_ppm") >= _T29_MIN_PPM)
        .select("source", "para", "n_docs", "n_pages", "frac_ppm")
    )


# ---------------------------------------------------------------------------
# t31 — fastText-shaped hashed linear quality classifier
# ---------------------------------------------------------------------------

_T31_BUCKETS = 2001  # odd prime-ish bucket count; weights span [-1000, 1000]

_T31_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hw AS (
  SELECT doc_id, {sqlmurmur.murmur32_string_aliases("tok", "h32", "tq")}
  FROM tk
),
ws AS (
  SELECT doc_id,
         CAST(sum(((h32 % {_T31_BUCKETS}) + {_T31_BUCKETS}) % {_T31_BUCKETS}
                  - {(_T31_BUCKETS - 1) // 2}) AS BIGINT) AS score_sum
  FROM hw GROUP BY doc_id
)
SELECT d.doc_id,
       ws.score_sum,
       CAST(len(string_split(d.text, ' ')) AS INT) AS n_toks,
       ws.score_sum > 0 AS keep
FROM documents d JOIN ws ON ws.doc_id = d.doc_id
"""


@query("t31_quality_classifier", _T31_ORACLE)
def t31_quality_classifier(spark, sf_dir):
    """Model-based quality filtering, fastText-shaped (Joulin et al. 2016,
    "Bag of Tricks for Efficient Text Classification"; the GPT-3 /
    CCNet-style learned quality gate that follows the t3/t17 heuristics):
    every token is hashed into a fixed bucket space, each bucket carries a
    linear weight, and a document's score is the sum of its token weights
    — keep iff the score clears the decision threshold. Weights here are
    derived deterministically from the bucket hash itself (integer in
    [-1000, 1000]) so both engines share the "model" without a learned
    artifact; a real model swaps in trained weights via the identical
    lookup, either inlined (small vocab) or as a broadcast map.

    Scale shape (100 TB): ZERO shuffle — hashing, weight lookup, and the
    per-document sum are all higher-order array functions over the token
    array (`transform` + `aggregate`), whole-stage codegen, no explode, no
    groupBy. The classic explode → join(weights) → groupBy(doc_id)
    formulation would shuffle every token of the corpus; hash-derived (or
    broadcast) weights make scoring a row-local map, which is why fastText
    inference parallelizes embarrassingly. Integer weights keep the score
    bit-exact across engines (no float-sum order sensitivity)."""
    half = (_T31_BUCKETS - 1) // 2
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    weights = F.transform(
        toks, lambda t: F.pmod(F.hash(t), F.lit(_T31_BUCKETS)) - F.lit(half)
    )
    score = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        score.alias("score_sum"),
        F.size(toks).alias("n_toks"),
        (score > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# t32 — deterministic per-host document cap (salted two-stage top-K)
# ---------------------------------------------------------------------------

_T32_K = 10  # docs kept per host
_T32_SALTS = 32

_T32_ORACLE = f"""
WITH h AS (
  SELECT doc_id, source,
         {sqlmurmur.murmur32_string_aliases("CAST(doc_id AS VARCHAR)", "hk", "tc")}
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
  FROM h
)
SELECT doc_id, source, CAST(rn AS INT) AS host_rank
FROM r WHERE rn <= {_T32_K}
"""


@query("t32_host_cap", _T32_ORACLE)
def t32_host_cap(spark, sf_dir):
    """Per-host document cap: keep at most K documents per host (source),
    chosen by hash rank — the deterministic "downsample hot hosts" step a
    Common-Crawl-scale corpus applies so one mega-host cannot dominate the
    training mix (C4 and Gopher both cap per-domain contributions; hash
    order makes the sample stable across re-runs and incremental crawls,
    unlike an RNG sample).

    Scale shape (100 TB): a naive `row_number() OVER (PARTITION BY host)`
    serializes a 10^7-page host through ONE task. This runs the engine's
    salted two-stage dequeue discipline instead (engine/crawler.py): stage
    1 ranks within (host, salt-of-32) — any single task sees at most
    ~|host|/32 rows — and keeps K per bucket; stage 2 ranks the ≤ 32·K
    survivors per host exactly. The oracle is the single-window
    formulation, identical by construction (stage 1 discards only rows
    that cannot be in the true top-K of their host)."""
    d = load(spark, sf_dir, "documents")
    hk = F.hash(F.col("doc_id").cast("string"))
    base = d.select("doc_id", "source", hk.alias("hk")).withColumn(
        "_salt", F.pmod("hk", F.lit(_T32_SALTS))
    )
    w1 = Window.partitionBy("source", "_salt").orderBy("hk", "doc_id")
    pre = base.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= _T32_K
    )
    w2 = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        pre.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= _T32_K)
        .select("doc_id", "source", "host_rank")
    )


# ---------------------------------------------------------------------------
# t33 — mojibake (double-encoded UTF-8) detection
# ---------------------------------------------------------------------------

# UTF-8 bytes of é / ’ re-decoded as Latin-1/cp1252 — the two highest-
# frequency mojibake signatures in web text (the class of damage ftfy
# repairs; detection only here — repair is a charset round-trip).
_T33_PATTERN = "Ã©|â€™"

_T33_ORACLE = f"""
WITH mixed AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' ' || repeat('caf' || 'Ã©' || ' ',
                                    CAST((doc_id // 3) % 4 AS INT))
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' donâ€™t' ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_T33_PATTERN}')) AS BIGINT) AS n_moji,
       len(regexp_extract_all(t, '{_T33_PATTERN}')) > 0 AS is_mojibake
FROM mixed
"""


@query("t33_mojibake", _T33_ORACLE)
def t33_mojibake(spark, sf_dir):
    """Mojibake detection for a web corpus: count occurrences of
    double-encoded UTF-8 signatures ('Ã©' = é through a Latin-1 round
    trip, 'â€™' = ’) and flag affected documents — the detection half of
    an ftfy-style encoding-repair pass (Speer, 2019; zenodo ftfy), run
    before quality scoring so garbled pages don't pollute n-gram stats.
    The synthetic corpus is clean ASCII, so deterministic damage is first
    injected from doc_id (variable marker counts, including planted
    zero-marker cases via repeat-count 0) — identically in both engines —
    and detection runs over the mixed text.

    Scale shape (100 TB): pure `regexp_count` column expressions in
    whole-stage codegen — a filter-free per-row map over the scan, zero
    shuffle, zero UDF. The alternation deliberately avoids
    prefix-ambiguous alternatives ('â€' vs 'â€œ') so leftmost-match
    semantics agree across regex engines."""
    d = load(spark, sf_dir, "documents")
    mixed = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" "),
                F.expr(
                    "repeat('cafÃ© ', cast((doc_id div 3) % 4 as int))"
                ),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" donâ€™t")).otherwise(
            F.lit("")
        ),
    )
    n = F.regexp_count(mixed, F.lit(_T33_PATTERN)).cast("long")
    return d.select(
        "doc_id", n.alias("n_moji"), (n > 0).alias("is_mojibake")
    )


# ---------------------------------------------------------------------------
# a15 — count-min-sketch heavy hitters (bounded-state frequency estimation)
# ---------------------------------------------------------------------------

_A15_W = 256  # buckets per hash row
_A15_D = 4    # independent hash rows
_A15_TOPK = 20


def _a15_oracle() -> str:
    rows = []
    for j in range(_A15_D):
        rows.append(f"""
  SELECT {j} AS j,
         ((h{j} % {_A15_W}) + {_A15_W}) % {_A15_W} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT {sqlmurmur.murmur32_string_aliases(f"tok || '#{j}'", f"h{j}", f"cs{j}")}
        FROM tk)
  GROUP BY 1, 2""")
    cand = []
    for j in range(_A15_D):
        cand.append(f"""
  SELECT tok, exact_cnt, {j} AS j,
         ((h{j} % {_A15_W}) + {_A15_W}) % {_A15_W} AS bucket
  FROM (SELECT tok, exact_cnt,
               {sqlmurmur.murmur32_string_aliases(f"tok || '#{j}'", f"h{j}", f"cc{j}")}
        FROM top)""")
    return f"""
WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt FROM tk GROUP BY tok),
top AS (SELECT tok, exact_cnt FROM ex
        ORDER BY exact_cnt DESC, tok LIMIT {_A15_TOPK}),
cells AS ({" UNION ALL ".join(rows)}),
cb AS ({" UNION ALL ".join(cand)})
SELECT cb.tok AS token, cb.exact_cnt,
       CAST(min(cells.cnt) AS BIGINT) AS cms_est
FROM cb JOIN cells ON cells.j = cb.j AND cells.bucket = cb.bucket
GROUP BY 1, 2
"""


@query("a15_cms_heavy_hitters", _a15_oracle())
def a15_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch frequency estimation (Cormode & Muthukrishnan,
    J. Algorithms 2005) for the corpus token stream, validated against the
    exact top-K heavy hitters: build a D×W integer sketch (murmur-bucketed
    counts, min-over-rows estimate) and emit, for each exact top-20 token,
    its true count next to the CMS estimate. The CMS one-sided guarantee
    (estimate ≥ truth, overshoot ≤ εN w.h.p.) is what lets a 100 TB
    pipeline answer "is this token/URL/host hot?" from {_A15_D}×{_A15_W}
    integers of state instead of a vocabulary-sized table — the
    streaming/approx counterpart of t11's exact df counts, same family as
    a7's HyperLogLog distinct.

    Scale shape: the sketch build is one map-side-combinable groupBy over
    (row, bucket) with AT MOST {_A15_D}·{_A15_W} = {_A15_D * _A15_W}
    result cells — partials collapse to sketch size per map task, so the
    shuffle is O(cells), not O(vocab). The exact top-K (the validation
    side only) is a TakeOrderedAndProject over the token aggregate;
    estimates join the {_A15_TOPK}-row candidate set against the
    broadcast cell table."""
    d = load(spark, sf_dir, "documents")
    tk = d.select(F.explode(F.split("text", " ")).alias("tok"))
    lanes = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.pmod(
                    F.hash(F.concat(F.col("tok"), F.lit(f"#{j}"))),
                    F.lit(_A15_W),
                ).alias("bucket"),
            )
            for j in range(_A15_D)
        ]
    )
    cells = (
        tk.select(F.explode(lanes).alias("s"))
        .select("s.j", "s.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        tk.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "tok")
        .limit(_A15_TOPK)
    )
    cand = top.select("tok", "exact_cnt", F.explode(lanes).alias("s")).select(
        "tok", "exact_cnt", "s.j", "s.bucket"
    )
    return (
        cand.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            F.col("tok").alias("token"), "exact_cnt", "cms_est"
        )
    )


# ---------------------------------------------------------------------------
# t36 — code-switch / language-mixture detection (chunk-level lang profile)
# ---------------------------------------------------------------------------

_T36_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id,
         [list_slice(ws, i * {_T29_CHUNK} + 1, (i + 1) * {_T29_CHUNK})
          for i in range(0, CAST(ceil(len(ws) / {_T29_CHUNK}.0) AS BIGINT))]
           AS chunks
  FROM w
)
SELECT doc_id,
       CAST(len(chunks) AS INT) AS n_chunks,
       CAST(len([ch for ch in chunks
                 if 100 * len([x for x in ch if x = 'the' OR x = 'a'])
                    >= 3 * len(ch)]) AS INT) AS n_en_chunks,
       len([ch for ch in chunks
            if 100 * len([x for x in ch if x = 'the' OR x = 'a'])
               >= 3 * len(ch)]) > 0
       AND len([ch for ch in chunks
                if 100 * len([x for x in ch if x = 'the' OR x = 'a'])
                   >= 3 * len(ch)]) < len(chunks) AS is_mixed
FROM c
"""


@query("t36_code_switch", _T36_ORACLE)
def t36_code_switch(spark, sf_dir):
    """Chunk-level language-mixture (code-switching) detection: apply the
    t2 stopword-ratio language test to every fixed {_T29_CHUNK}-word
    chunk (t29's paragraph grain) instead of the whole document, and flag
    documents whose chunks DISAGREE — the boilerplate-in-another-language
    / embedded-quotation signal a document-level lang id (t2) averages
    away, and the reason CCNet-class pipelines segment before language
    scoring. Emits per-doc chunk counts so the mixture ratio is
    reconstructible downstream.

    Scale shape (100 TB): ZERO shuffle — chunking, per-chunk stopword
    counting, and the mixture verdict are all nested higher-order array
    functions (`transform`/`filter`/`size`) in whole-stage codegen; a
    filter-free per-row map over the scan, same plan class as t31/t33.
    Integer cross-multiplication (100·stop ≥ 3·len) keeps the per-chunk
    test exact in both engines."""
    d = load(spark, sf_dir, "documents")
    k = _T29_CHUNK
    chunks = F.expr(
        f"transform(sequence(0, cast(ceil(size(split(text, ' ')) / {k}.0)"
        f" as int) - 1), i -> slice(split(text, ' '), i * {k} + 1, {k}))"
    )
    en = lambda ch: (
        100 * F.size(F.filter(ch, lambda x: (x == "the") | (x == "a")))
        >= 3 * F.size(ch)
    )
    n_en = F.size(F.filter(chunks, en))
    n_chunks = F.size(chunks)
    return d.select(
        "doc_id",
        n_chunks.alias("n_chunks"),
        n_en.alias("n_en_chunks"),
        ((n_en > 0) & (n_en < n_chunks)).alias("is_mixed"),
    )


# ---------------------------------------------------------------------------
# t37 — token frequency spectrum (Zipf band profile of the vocabulary)
# ---------------------------------------------------------------------------

_T37_ORACLE = """
WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok)
SELECT CAST(length(bin(cnt)) - 1 AS INT)      AS band,
       CAST(2 ** (length(bin(cnt)) - 1) AS BIGINT) AS band_min_count,
       CAST(count(*) AS BIGINT)               AS n_terms,
       CAST(sum(cnt) AS BIGINT)               AS n_tokens
FROM tf GROUP BY 1, 2
"""


@query("t37_freq_spectrum", _T37_ORACLE)
def t37_freq_spectrum(spark, sf_dir):
    """Token frequency spectrum: how many vocabulary terms fall in each
    power-of-two count band [2^k, 2^(k+1)) and how much of the token mass
    they carry — the corpus-linguistics profile (Zipf tail vs stopword
    head) that sizes tokenizer vocabularies, df-cutoffs (t11), and
    familiarity lists (t16), and flags template-spam corpora (a bulging
    mid-band where near-identical boilerplate inflates mid-frequency
    terms). Banding is by BINARY DIGIT LENGTH (``length(bin(cnt)) - 1``),
    pure integer — no float log2 whose ULP rounding could flip a band
    across engines.

    Scale shape (100 TB): two map-side-combinable groupBys — token counts
    (hot tokens collapse in partials), then the ≤ 64-band rollup of the
    vocabulary-sized aggregate. No window, no join, nothing row-level
    after the first aggregation."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        tf.withColumn("band", F.length(F.expr("bin(cnt)")) - 1)
        .select(
            "band",
            F.expr("shiftleft(1L, band)").alias("band_min_count"),
            "cnt",
        )
        .groupBy("band", "band_min_count")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("cnt").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# w11 — day-over-day trending tokens (burst detection on the term stream)
# ---------------------------------------------------------------------------

_W11_MIN = 3   # both days must reach this count (noise floor)
_W11_TOPK = 3


def _w11_oracle() -> str:
    from spider_spark.operators.sqlmurmur import hashlong_aliases

    return f"""
WITH dd AS (
  SELECT doc_id, text, {hashlong_aliases("doc_id * 5 + 1", "42", "dh", "w11")}
  FROM documents
),
tk AS (
  SELECT ((dh % 7) + 7) % 7 AS day, unnest(string_split(text, ' ')) AS tok
  FROM dd
),
dt AS (SELECT day, tok, CAST(count(*) AS BIGINT) AS cnt
       FROM tk GROUP BY day, tok),
j AS (
  SELECT t.day, t.tok, t.cnt AS cnt_today, p.cnt AS cnt_prev,
         (1000000 * t.cnt) // p.cnt AS growth_ppm
  FROM dt t JOIN dt p ON p.tok = t.tok AND p.day = t.day - 1
  WHERE t.cnt >= {_W11_MIN} AND p.cnt >= {_W11_MIN}
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY day ORDER BY growth_ppm DESC, cnt_today DESC, tok) AS rk
  FROM j
)
SELECT day, tok, cnt_today, cnt_prev, growth_ppm, CAST(rk AS INT) AS rk
FROM r WHERE rk <= {_W11_TOPK}
"""


@query("w11_trending_tokens", _w11_oracle())
def w11_trending_tokens(spark, sf_dir):
    """Day-over-day trending terms: per calendar day, the top-{_W11_TOPK}
    tokens by count growth over the previous day (exact integer ppm ratio,
    noise floor {_W11_MIN} on both days) — burst detection over the term
    stream, the signal news-cycle-aware recrawl scheduling (c1) and
    freshness-weighted corpus mixing consume. Publication days are derived
    deterministically from doc_id (murmur mod 7), identically in both
    engines, since the documents fixture carries no timestamp.

    Scale shape (100 TB): the ONLY corpus-sized exchange is the map-side-
    combinable groupBy(day, token); the day-over-day self-join and the
    per-day top-k window both run on the (day, token) AGGREGATE (vocab-
    sized per day, Zipf-small), joined on its own key — never on row-level
    data. Integer growth ratios, full ordering tie-break (growth, count,
    token), so ranks are deterministic cross-engine."""
    d = load(spark, sf_dir, "documents")
    tk = d.select(
        F.pmod(F.hash(F.expr("doc_id * 5 + 1")), F.lit(7)).alias("day"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    dt = tk.groupBy("day", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    prev = dt.select(
        (F.col("day") + 1).alias("day"),
        F.col("tok"),
        F.col("cnt").alias("cnt_prev"),
    )
    j = (
        dt.withColumnRenamed("cnt", "cnt_today")
        .join(prev, ["day", "tok"])
        .filter(
            (F.col("cnt_today") >= _W11_MIN) & (F.col("cnt_prev") >= _W11_MIN)
        )
        .withColumn(
            "growth_ppm", F.expr("(1000000 * cnt_today) div cnt_prev")
        )
    )
    w = Window.partitionBy("day").orderBy(
        F.desc("growth_ppm"), F.desc("cnt_today"), "tok"
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _W11_TOPK)
        .select("day", "tok", "cnt_today", "cnt_prev", "growth_ppm", "rk")
    )


# ---------------------------------------------------------------------------
# t38 — token-distribution Shannon entropy per document
# ---------------------------------------------------------------------------

_T38_ORACLE = """
WITH tokc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
  GROUP BY doc_id, tok
),
agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT)  AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         list(CAST(c AS DOUBLE) ORDER BY tok) AS arr
  FROM tokc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
       floor((log2(n_tokens)
              - list_sum(list_transform(arr, c -> c * log2(c))) / n_tokens)
             * 10000.0 + 0.5) / 10000.0 AS entropy
FROM agg
"""


@query("t38_token_entropy", _T38_ORACLE)
def t38_token_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the token distribution,
    H = log2(N) − (Σ c·log2 c)/N — the standard gibberish/template
    detector in webtext quality stacks (keyword-stuffed spam and
    generated boilerplate sit at the low-entropy tail, encrypted/binary
    junk at the high tail; C4 and Gopher both gate on related
    repetition signals, t8 covers those — entropy is the
    distribution-level summary).

    Determinism: both engines fold c·log2(c) over the SAME token-sorted
    count array (Spark ``aggregate(array_sort(...))`` is a sequential
    left fold, DuckDB ``list_sum(list_transform(list(... ORDER BY
    tok)))``), so the only cross-engine freedom is libm log2 ULPs —
    error ~1e-14 absolute against a 4-dp rounding grid, negligible.

    Scale shape: one map-side-combinable groupBy(doc_id, tok) exchange
    over the exploded corpus, one groupBy(doc_id); the per-doc count
    array is bounded by document vocabulary (≤ doc length), never
    corpus vocabulary. No window, no driver loop — the same two-exchange
    plan at 10^10 documents."""
    d = load(spark, sf_dir, "documents")
    tokc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tokc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("tok").alias("tok"), F.col("c").cast("double").alias("c")
                )
            )
        ).alias("arr"),
    )
    ssum = F.expr(
        "aggregate(arr, CAST(0.0 AS DOUBLE), (acc, s) -> acc + s.c * log2(s.c))"
    )
    ent = F.log2(F.col("n_tokens")) - ssum / F.col("n_tokens")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (F.floor(ent * 10000.0 + F.lit(0.5)) / 10000.0).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# t39 — readability (Flesch reading ease, exact rational milli-points)
# ---------------------------------------------------------------------------

_T39_ORACLE = """
WITH words AS (
  SELECT doc_id, w,
         regexp_replace(lower(w), '[aeiouy]+', 'V', 'g') AS vw
  FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
),
syl AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(greatest(1, len(vw) - len(replace(vw, 'V', '')))) AS BIGINT)
           AS n_syllables
  FROM words GROUP BY doc_id
),
sent AS (
  SELECT doc_id,
         CAST(greatest(1, len(list_filter(string_split_regex(text, '[.!?]+'),
                                          x -> trim(x) <> ''))) AS BIGINT)
           AS n_sentences
  FROM documents
)
SELECT s.doc_id, s.n_words, s.n_syllables, t.n_sentences,
       CAST(floor((206835.0 * t.n_sentences * s.n_words
                   - 1015.0 * s.n_words * s.n_words
                   - 84600.0 * s.n_syllables * t.n_sentences)
                  / (t.n_sentences * s.n_words) + 0.5) AS BIGINT)
         AS fre_milli
FROM syl s JOIN sent t ON t.doc_id = s.doc_id
"""


@query("t39_readability", _T39_ORACLE)
def t39_readability(spark, sf_dir):
    """Flesch reading ease per document — 206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/word) — the classic readability gate in
    webtext quality stacks (too-low FRE flags legalese/boilerplate,
    implausibly high flags keyword lists). Syllables are approximated as
    vowel-group runs per word (min 1), the standard heuristic; sentences
    as non-empty [.!?]-separated spans (min 1).

    Exactness: all three counts are integers, and the score is evaluated
    over the common denominator — ONE double division of products that
    stay < 2^53 — then floor-rounded to integer milli-points, so the
    engines cannot drift: fre_milli = round((206835·S·W − 1015·W² −
    84600·Syl·S) / (S·W)).

    Scale shape: one explode + map-side-combinable groupBy(doc_id) for
    the word/syllable counts; the sentence count is row-local regex
    math; the final join is doc-keyed. Same two-exchange plan at 10^10
    documents."""
    d = load(spark, sf_dir, "documents")
    vw = F.regexp_replace(F.lower(F.col("w")), "[aeiouy]+", "V")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).select(
        "doc_id",
        F.greatest(
            F.lit(1),
            F.length(vw) - F.length(F.regexp_replace(vw, "V", "")),
        ).alias("syl"),
    )
    syl = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("syl").cast("long").alias("n_syllables"),
    )
    sent = d.select(
        "doc_id",
        F.greatest(
            F.lit(1),
            F.size(
                F.filter(
                    F.split("text", "[.!?]+"),
                    lambda x: F.trim(x) != "",
                )
            ),
        )
        .cast("long")
        .alias("n_sentences"),
    )
    j = syl.join(sent, "doc_id")
    s, w, y = F.col("n_sentences"), F.col("n_words"), F.col("n_syllables")
    fre = (
        206835.0 * s * w - 1015.0 * w * w - 84600.0 * y * s
    ) / (s * w)
    return j.select(
        "doc_id",
        "n_words",
        "n_syllables",
        "n_sentences",
        F.floor(fre + F.lit(0.5)).cast("long").alias("fre_milli"),
    )
