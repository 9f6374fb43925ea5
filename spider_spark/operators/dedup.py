"""Deduplication operators over `documents` — exact, token-Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale notes: every pairwise method is BLOCKED (by (source, lang) or label)
so candidate generation never goes quadratic in the corpus — the blocked
pair join is the shuffle; LSH replaces blocking with banded buckets at
10^9-doc scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_spark.operators import load, query
from spider_spark.urlnorm import murmur3_32

# ---------------------------------------------------------------------------


@query(
    "d1_exact_dedup",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper,
           count(*)    AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def d1_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy, keep min doc_id per content hash — one
    shuffle on the hash, map-side partial agg."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(
        F.md5(F.col("text").cast("binary")).alias("content_hash")
    ).agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))


@query(
    "d2_token_jaccard",
    """
    WITH tok AS (
      SELECT DISTINCT doc_id, source, lang, tok FROM (
        SELECT doc_id, source, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM tok a JOIN tok b
        ON a.tok = b.tok AND a.source = b.source AND a.lang = b.lang
       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
    FROM pairs JOIN sizes sa ON pairs.id_a = sa.doc_id
               JOIN sizes sb ON pairs.id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.82
    """,
)
def d2_token_jaccard(spark, sf_dir):
    """n-gram(1) Jaccard near-dup: distinct-token inverted index, blocked
    pair join on (source, lang), |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold."""
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id", "source", "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        .distinct()
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.82)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


@query(
    "d6_ngram3_jaccard",
    """
    WITH docgrams AS (
      SELECT doc_id, source, lang,
             list_transform(range(1, len(l) - 1),
                            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS grams
      FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS l
            FROM documents)
    ),
    grams AS (
      SELECT DISTINCT doc_id, source, lang, unnest(grams) AS gram FROM docgrams
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM grams a JOIN grams b
        ON a.gram = b.gram AND a.source = b.source AND a.lang = b.lang
       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
    FROM pairs JOIN sizes sa ON pairs.id_a = sa.doc_id
               JOIN sizes sb ON pairs.id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.2
    """,
)
def d6_ngram3_jaccard(spark, sf_dir):
    """True 3-gram (shingle) Jaccard near-dup with exact oracle: shingles
    via higher-order array functions (no UDF), blocked pair join on
    (source, lang) through a shingle inverted index."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams_col = F.array_distinct(
        F.when(
            F.size(toks) >= SHINGLE_W,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - SHINGLE_W),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, SHINGLE_W)),
            ),
        ).otherwise(F.array())
    )
    grams = d.select(
        "doc_id", "source", "lang", F.explode(grams_col).alias("gram")
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = grams.alias("a")
    b = grams.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.2)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (not SQL-expressible → rows-only oracle check; exactness is
# covered by the verify-step Jaccard and by unit tests)
# ---------------------------------------------------------------------------

N_PERM = 32
BAND_SIZE = 4
N_BANDS = N_PERM // BAND_SIZE
SHINGLE_W = 3


def _shingles(text: str) -> list[str]:
    toks = text.split(" ")
    if len(toks) < SHINGLE_W:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + SHINGLE_W]) for i in range(len(toks) - SHINGLE_W + 1)]


_MH_PRIME = (1 << 61) - 1
_mh_rs = __import__("numpy").random.RandomState(1234)
# a < 2^31 keeps a·x + b < 2^63 + 2^31 (x < 2^32) — exact in uint64
_MH_A = _mh_rs.randint(1, 1 << 31, size=N_PERM).astype("uint64")
_MH_B = _mh_rs.randint(0, 1 << 31, size=N_PERM).astype("uint64")


def minhash_signature(text: str) -> list[int]:
    """N_PERM minhashes: one Murmur3 base hash per shingle, then N_PERM
    universal-hash permutations h_i(x) = (a_i·x + b_i) mod p vectorized in
    numpy — the standard trick that avoids N_PERM full hashes per shingle."""
    import numpy as np

    base = np.fromiter(
        (murmur3_32(s) & 0xFFFFFFFF for s in set(_shingles(text))),
        dtype="uint64",
    )
    perms = (base[:, None] * _MH_A + _MH_B) % np.uint64(_MH_PRIME)
    return (perms.min(axis=0) & np.uint64(0xFFFFFFFF)).astype("int64").tolist()


@query("d3_minhash_lsh")
def d3_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup: shingle → 32-perm minhash signature (pandas
    UDF) → 8 bands of 4 → band-bucket self-join for candidates → exact
    shingle-Jaccard verify ≥ 0.35. The band join is the only shuffle; at
    10^10 docs each band bucket is tiny, so no quadratic blowup."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        return texts.map(minhash_signature)

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = d.withColumn("sig", sig_udf("text"))
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(
                            *[
                                F.col("sig").getItem(i * BAND_SIZE + j)
                                for j in range(BAND_SIZE)
                            ]
                        ).alias("bucket"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )

    # exact verify on shingle sets (candidates only)
    sh = d.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(F.split("text", " ")) - SHINGLE_W, F.lit(0)),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split("text", " "), i + 1, SHINGLE_W)
                ),
            )
        ).alias("sh"),
    )
    sha = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter * 1.0 / union
    return (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .filter(jac >= 0.35)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens; bit b set iff the weighted sum
    of token-hash bit b is positive. Signed int64 (Spark LongType domain)."""
    acc = [0] * 64
    for tok in text.split(" "):
        h = (murmur3_32(tok, seed=7) & 0xFFFFFFFF) | (
            (murmur3_32(tok, seed=13) & 0xFFFFFFFF) << 32
        )
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(64):
        if acc[b] > 0:
            v |= 1 << b
    return v - (1 << 64) if v >= (1 << 63) else v


@query("d4_simhash")
def d4_simhash(spark, sf_dir):
    """SimHash fingerprints + near-dup pairs at hamming distance ≤ 12,
    blocked by (source, lang). The hamming check is JVM-side bit_count."""

    @F.pandas_udf(T.LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        return texts.map(simhash64)

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", simhash_udf("text").alias("simhash")
    )
    a = d.alias("a")
    b = d.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= 12)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding near-dup
# ---------------------------------------------------------------------------


@query(
    "d5_embedding_neardup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
             AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.2
    """,
)
def d5_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label — dot products via
    JVM higher-order functions (zip_with/aggregate), double precision to
    match the oracle bit-for-bit after rounding."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "emb", F.transform("embedding", lambda x: x.cast("double"))
    )
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("label"),
        F.col("emb").alias("ea"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("emb").alias("eb"),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(dot(F.col("ea"), F.col("ea"))) * F.sqrt(dot(F.col("eb"), F.col("eb")))
    )
    return (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("id_a") < F.col("id_b")))
        .filter(cos >= 0.2)
        .select("id_a", "id_b", F.round(cos, 4).alias("cos_sim"))
    )
