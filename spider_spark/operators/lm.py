"""Language-model-flavored corpus operators: bigram-LM fluency scoring
(the CCNet perplexity-bucketing analog in exact integer arithmetic),
data-derived mixture re-balancing (the Pile/DoReMi-style source
equalization as a deterministic hash filter), an inverted-index build
(posting lists for boolean retrieval), and one round of BPE merge-candidate
mining (adjacent-symbol pair counts — the inner loop of tokenizer vocab
induction, Sennrich et al. 2016, public).

Float discipline: every score here is integer fixed-point (parts-per-
million probabilities, integer cross-multiplied keep tests), so parallel
summation order can never flip a value hash — the same discipline as
t11/t16/t19.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators import load, query, sqlmurmur

# ---------------------------------------------------------------------------
# t21 — bigram-LM fluency score (CCNet-style quality bucketing, integer)
# ---------------------------------------------------------------------------

_T21_SCALE = 1_000_000

# bigram-model CTE chain shared by t21 and the t34 bucketing built on it
_T21_CTES = f"""tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bg AS (SELECT doc_id,
              unnest([toks[i] || ' ' || toks[i+1]
                      for i in range(1, len(toks))]) AS bigram
       FROM tok),
c2 AS (SELECT bigram, count(*) AS n2 FROM bg GROUP BY bigram),
c1 AS (SELECT string_split(bigram, ' ')[1] AS w1,
              CAST(sum(n2) AS BIGINT) AS n1
       FROM c2 GROUP BY 1),
p AS (SELECT bigram, (n2 * {_T21_SCALE}) // n1 AS pfp
      FROM c2 JOIN c1 ON string_split(c2.bigram, ' ')[1] = c1.w1)"""

_T21_ORACLE = f"""
WITH {_T21_CTES}
SELECT doc_id,
       CAST(count(*) AS BIGINT)             AS n_bigrams,
       CAST(sum(pfp) // count(*) AS BIGINT) AS fluency_ppm
FROM bg JOIN p USING (bigram)
GROUP BY doc_id
"""


@query("t21_bigram_fluency", _T21_ORACLE)
def t21_bigram_fluency(spark, sf_dir):
    """Bigram-LM fluency score: train a word-bigram model on the corpus
    itself (conditional probability of each next word, in exact
    parts-per-million fixed point), then score each document by the mean
    conditional probability of its bigrams. High = text whose local word
    transitions are typical of the corpus; near zero = shuffled or
    boilerplate-garbled text. This is the log-free rational analog of
    CCNet's per-language KenLM perplexity bucketing (Wenzek et al. 2020,
    public) — integer counts and floor divisions, so both engines agree
    bit for bit where a log-prob float sum would drift ULPs.

    Scale shape: the bigram-count model is one map-side-combinable
    groupBy (hot bigrams collapse in the partials) producing a
    vocabulary²-bounded (in practice Zipf-small) relation; the prefix
    totals derive from the MODEL, not a second corpus pass; both
    broadcast back onto the per-doc bigram stream, so the corpus never
    shuffles on the skewed bigram key — the only corpus-sized exchange is
    the final per-doc_id aggregation. Same broadcast-back discipline as
    t11/t16."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(toks, 1, size(toks) - 1),"
                " (t, i) -> concat(t, ' ', toks[i + 1]))"
            )
        ).alias("bigram"),
    )
    c2 = bg.groupBy("bigram").agg(F.count("*").alias("n2"))
    c1 = c2.groupBy(
        F.split("bigram", " ").getItem(0).alias("w1")
    ).agg(F.sum("n2").alias("n1"))
    p = (
        c2.withColumn("w1", F.split("bigram", " ").getItem(0))
        .join(F.broadcast(c1), "w1")
        .select(
            "bigram",
            F.expr(f"(n2 * {_T21_SCALE}L) div n1").alias("pfp"),
        )
    )
    return (
        bg.join(F.broadcast(p), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.expr("sum(pfp) div count(1)").cast("long").alias("fluency_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# t34 — CCNet-style head/middle/tail fluency bucketing (per language)
# ---------------------------------------------------------------------------

_T34_ORACLE = f"""
WITH {_T21_CTES},
sc AS (
  SELECT d.doc_id, d.lang,
         CAST(sum(pfp) // count(*) AS BIGINT) AS fluency_ppm
  FROM bg JOIN p USING (bigram) JOIN documents d ON d.doc_id = bg.doc_id
  GROUP BY d.doc_id, d.lang
),
m AS (
  SELECT lang, CAST(sum(fluency_ppm) // count(*) AS BIGINT) AS mean_ppm
  FROM sc GROUP BY lang
),
md AS (
  SELECT s.lang,
         CAST(sum(abs(s.fluency_ppm - m.mean_ppm)) // count(*) AS BIGINT)
           AS mad_ppm
  FROM sc s JOIN m USING (lang) GROUP BY s.lang
)
SELECT s.doc_id, s.lang, s.fluency_ppm,
       CASE WHEN s.fluency_ppm > m.mean_ppm + md.mad_ppm // 2 THEN 'head'
            WHEN s.fluency_ppm < m.mean_ppm - md.mad_ppm // 2 THEN 'tail'
            ELSE 'middle' END AS bucket
FROM sc s JOIN m USING (lang) JOIN md USING (lang)
"""


@query("t34_fluency_buckets", _T34_ORACLE)
def t34_fluency_buckets(spark, sf_dir):
    """CCNet's head/middle/tail split (Wenzek et al., LREC 2020) over the
    t21 bigram-LM fluency score: per language, documents whose fluency
    clears the language mean by half a mean-absolute-deviation are 'head'
    (kept for LM training), symmetric laggards are 'tail' (dropped or
    down-weighted), the rest 'middle'. Mean + MAD stand in for CCNet's
    held-out perplexity terciles: both cutoffs adapt to each language's
    own score distribution, and both are exact integer aggregates — no
    order-statistic sketch, no float percentile to defend cross-engine.

    Scale shape (100 TB): t21's documented shape for scoring, then TWO
    map-side-combinable groupBy(lang) passes (sum/count, then
    sum-of-absolute-deviations with the |langs|-sized mean table
    broadcast back) and a final broadcast of both per-lang cutoff tables
    onto the score stream — no window, no corpus shuffle beyond t21's
    per-doc aggregation. The w6 sketch path is the alternative when true
    percentile cutoffs are required."""
    # persist: the score stream feeds the mean pass, the MAD pass, and the
    # final bucketing — without it each reference re-runs the whole t21
    # model build (16 scans in the unreused plan). The cached relation is
    # one (doc_id, lang, int) row per document.
    sc = (
        t21_bigram_fluency(spark, sf_dir)
        .join(
            load(spark, sf_dir, "documents").select("doc_id", "lang"),
            "doc_id",
        )
        .select("doc_id", "lang", "fluency_ppm")
        .persist()
    )
    m = sc.groupBy("lang").agg(
        F.expr("sum(fluency_ppm) div count(1)").cast("long").alias("mean_ppm")
    )
    md = (
        sc.join(F.broadcast(m), "lang")
        .groupBy("lang")
        .agg(
            F.expr("sum(abs(fluency_ppm - mean_ppm)) div count(1)")
            .cast("long")
            .alias("mad_ppm")
        )
    )
    return (
        sc.join(F.broadcast(m), "lang")
        .join(F.broadcast(md), "lang")
        .select(
            "doc_id",
            "lang",
            "fluency_ppm",
            F.when(
                F.col("fluency_ppm")
                > F.col("mean_ppm") + F.expr("mad_ppm div 2"),
                F.lit("head"),
            )
            .when(
                F.col("fluency_ppm")
                < F.col("mean_ppm") - F.expr("mad_ppm div 2"),
                F.lit("tail"),
            )
            .otherwise(F.lit("middle"))
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# t22 — mixture re-balancing: equalize sources by deterministic hash sample
# ---------------------------------------------------------------------------

_T22_BUCKETS = 1000

_T22_ORACLE = f"""
WITH h AS (SELECT source,
                  {sqlmurmur.hashlong_aliases("doc_id", "42", "mmh", "t22")}
           FROM documents),
b AS (SELECT source, ((mmh % {_T22_BUCKETS}) + {_T22_BUCKETS})
                     % {_T22_BUCKETS} AS bucket FROM h),
c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT min(n_docs) AS target FROM c),
kept AS (SELECT b.source, count(*) AS n_kept
         FROM b JOIN c USING (source), t
         WHERE b.bucket * c.n_docs < t.target * {_T22_BUCKETS}
         GROUP BY b.source)
SELECT c.source, c.n_docs, CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM c LEFT JOIN kept k ON k.source = c.source
"""


@query("t22_mix_rebalance", _T22_ORACLE)
def t22_mix_rebalance(spark, sf_dir):
    """Data-derived mixture re-balancing: downsample every source to the
    size of the SMALLEST source (uniform domain mixing — the degenerate
    temperature=∞ point of Pile-style mixture weighting) with a
    deterministic murmur-bucket filter instead of RNG state. Unlike t10
    (fixed per-language rates), the keep-rate here is COMPUTED FROM THE
    DATA: rate(source) = target / n_docs(source), applied as the exact
    integer cross-multiplication bucket·n_docs < target·BUCKETS — no
    float rate, no sampling nondeterminism, rerunnable on any cluster
    with identical output.

    Scale shape: per-source counts are one map-side-combinable aggregate
    over the |sources|-sized key space; the target is a 1-row min over
    that aggregate; both broadcast back, so the corpus-sized side is a
    pure scan + filter (zero exchange) followed by the |sources|-sized
    kept-count aggregate. The DuckDB oracle replays Spark's hashLong bit
    for bit via sqlmurmur."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    t = c.agg(F.min("n_docs").alias("target"))
    bucket = F.pmod(F.hash("doc_id"), F.lit(_T22_BUCKETS)).cast("long")
    kept = (
        d.select("source", bucket.alias("bucket"))
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
        .filter(
            F.col("bucket") * F.col("n_docs")
            < F.col("target") * _T22_BUCKETS
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        c.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# t23 — inverted index: posting lists for a query vocabulary
# ---------------------------------------------------------------------------

_T23_VOCAB = ("spark", "join", "window", "stream", "hash")
_T23_CAP = 100

_T23_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
hits AS (SELECT DISTINCT term, doc_id FROM tok
         WHERE term IN {_T23_VOCAB!r})
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       array_to_string((list(doc_id ORDER BY doc_id))[1:{_T23_CAP}], ',')
         AS postings
FROM hits GROUP BY term
"""


@query("t23_inverted_index", _T23_ORACLE)
def t23_inverted_index(spark, sf_dir):
    """Inverted-index build for a fixed query vocabulary: per term, the
    document frequency and the posting list (first 100 doc_ids, sorted) —
    the data structure a boolean / BM25 retrieval layer serves from.
    Posting lists render as comma-joined strings so the value hash is
    representation-stable across engines.

    Scale shape: the corpus token stream is filtered to the query vocab
    BEFORE any exchange (the IN-set is a literal pushed into the scan
    projection), so only matching (term, doc_id) pairs — a |vocab|-bounded
    slice — ever shuffle; the distinct + collect aggregate runs on that
    match-sized relation. At index-everything scale the same plan shards
    by term range; the cap keeps driver-visible rows bounded either way."""
    d = load(spark, sf_dir, "documents")
    hits = (
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term").isin(*_T23_VOCAB))
        .distinct()
    )
    return hits.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.expr(
            f"array_join(transform(slice(sort_array(collect_list(doc_id)),"
            f" 1, {_T23_CAP}), x -> cast(x as string)), ',')"
        ).alias("postings"),
    )


# ---------------------------------------------------------------------------
# t24 — BPE merge candidates: one round of pair-count mining
# ---------------------------------------------------------------------------

_T24_TOPK = 20

_T24_ORACLE = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
pairs AS (SELECT unnest([substr(word, i, 2) for i in range(1, length(word))])
                 AS pair
          FROM w WHERE length(word) >= 2),
pc AS (SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rk,
         pair, cnt
  FROM pc)
WHERE rk <= {_T24_TOPK}
"""


@query("t24_bpe_merges", _T24_ORACLE)
def t24_bpe_merges(spark, sf_dir):
    """One round of BPE merge-candidate mining: the corpus-wide counts of
    adjacent character pairs inside words, top-20 by frequency — the inner
    loop of byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
    public). Ties break on the pair string so the ranking is total and
    engine-independent.

    Scale shape: pair extraction is a pure codegen flatMap (no UDF); the
    pair-count groupBy is map-side combinable over a key space bounded by
    |alphabet|² (a few thousand keys however big the corpus), and the
    top-k window runs over THAT aggregate only — the corpus never sorts.
    Full vocab induction iterates this plan with a merge table broadcast
    back; one round is the representative kernel."""
    d = load(spark, sf_dir, "documents")
    pairs = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1),"
                    " i -> substring(word, i, 2))"
                )
            ).alias("pair")
        )
    )
    pc = pairs.groupBy("pair").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), "pair")
    return (
        pc.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _T24_TOPK)
        .select("rk", "pair", "cnt")
    )
