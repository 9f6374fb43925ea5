"""Similarity search over the `embeddings` table (array<float> column).

Brute-force cosine top-k as the exact baseline; LSH-bucketed variant as the
scale path (candidates per bucket, not per corpus). Query set is broadcast;
the corpus side streams — no corpus×corpus blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_spark.operators import load, query

N_QUERIES = 8
TOP_K = 5
N_PLANES = 12
_PLANE_SEED = 42


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@query(
    "ann_bruteforce_topk",
    f"""
    SELECT query_id, vec_id AS neighbor, round(cos_sim, 4) AS cos_sim
    FROM (
      SELECT q.vec_id AS query_id, v.vec_id,
             list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]) AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]) DESC,
                        v.vec_id
             ) AS rn
      FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ) WHERE rn <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-k: tiny query set broadcast against the full corpus,
    per-query window rank. One scan of the corpus, no shuffle of it."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "emb", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    v = e.select("vec_id", F.col("emb").alias("ve"))
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", _cos(F.col("qe"), F.col("ve")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


N_CENTROIDS = 16
N_PROBE = 4
_KMEANS_ITERS = 5


def hyperplanes(n_planes: int, dim: int = 64) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed) shared by the UDF, the
    tests, and the SQL-literal oracle generator below."""
    rs = np.random.RandomState(_PLANE_SEED)
    return rs.randn(n_planes, dim).astype(np.float64)


def planes_for_corpus(n_vectors: int, target_bucket: int = 32) -> int:
    """Bucket count sized to the corpus: 2^planes ≈ n/target_bucket, so
    expected bucket occupancy stays ~constant as the corpus grows."""
    import math

    return max(3, min(24, int(math.log2(max(2, n_vectors / target_bucket)))))


# ---------------------------------------------------------------------------
# DuckDB oracles for the approximate ANN queries.
#
# Both algorithms are fully deterministic (fixed plane seed / fixed sample
# order / fixed iteration count), so the "approximate" search is still an
# exact function of the input and can be value-hash-checked — the oracle
# replicates the algorithm, not just its intent. The hyperplane matrix is
# inlined as SQL literals (float repr is shortest-round-trip, so DuckDB
# parses back the identical double); the IVF sample order reuses the
# murmur3-for-BIGINT SQL from sqlmurmur (Spark hash() bit parity).
# ---------------------------------------------------------------------------

_MAX_LSH_PLANES = 24  # planes_for_corpus clamps to [3, 24]


def _planes_sql_rows(n: int) -> str:
    """VALUES rows ``(pid, plane DOUBLE[])`` for hyperplanes(n). Relies on
    RandomState.randn's prefix property — hyperplanes(k) == hyperplanes(n)[:k]
    for k <= n — asserted in tests so a numpy change breaks loudly."""
    mat = hyperplanes(n)
    rows = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in row)}]::DOUBLE[])"
        for i, row in enumerate(mat)
    )
    return rows


def _lsh_oracle_sql() -> str:
    """ann_lsh_bucketed replicated in SQL: n_planes from count(*) (same
    clamp/trunc as planes_for_corpus), sign-of-dot-product bucket bits over
    the inlined planes, multi-probe = own bucket + every 1-bit flip, exact
    cosine top-k inside probed buckets."""
    return f"""
    WITH params AS (
      SELECT greatest(3, least({_MAX_LSH_PLANES},
               CAST(trunc(log2(greatest(2.0, count(*) / 32.0))) AS INT))) AS np
      FROM embeddings
    ),
    planes(pid, plane) AS (VALUES {_planes_sql_rows(_MAX_LSH_PLANES)}),
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    buck AS (
      SELECT e.vec_id,
             CAST(sum(CASE WHEN list_dot_product(e.emb, p.plane) > 0
                           THEN 1::BIGINT << p.pid ELSE 0 END) AS INT) AS bucket
      FROM emb e, params, planes p
      WHERE p.pid < params.np
      GROUP BY e.vec_id
    ),
    probes AS (
      SELECT b.vec_id AS query_id,
             unnest([b.bucket] || list_transform(range(0, params.np),
                    i -> CAST(xor(b.bucket::BIGINT, 1::BIGINT << i) AS INT))) AS qb
      FROM buck b, params
      WHERE b.vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT p.query_id, v.vec_id,
             list_cosine_similarity(qe.emb, ve.emb) AS cos_sim,
             row_number() OVER (PARTITION BY p.query_id
                 ORDER BY list_cosine_similarity(qe.emb, ve.emb) DESC,
                          v.vec_id) AS rn
      FROM probes p
      JOIN buck v ON v.bucket = p.qb AND v.vec_id <> p.query_id
      JOIN emb qe ON qe.vec_id = p.query_id
      JOIN emb ve ON ve.vec_id = v.vec_id
    )
    SELECT query_id, vec_id AS neighbor, round(cos_sim, 4) AS cos_sim
    FROM scored WHERE rn <= {TOP_K}
    """


def kmeans_assign_ctes(src_sql: str) -> str:
    """The deterministic IVF quantizer as a DuckDB CTE chain over
    ``src_sql`` (any SELECT producing ``vec_id BIGINT, emb DOUBLE[]``):
    sample = first 512 rows by (murmur3(vec_id), vec_id); centroid init =
    first N_CENTROIDS sample rows; _KMEANS_ITERS unrolled assign/update
    CTE pairs (argmin ties break to the lowest cid, exactly numpy argmin;
    empty cells keep their old centroid via COALESCE); ends with
    ``assign(vec_id, emb, cell)`` = corpus assigned to its nearest final
    centroid ``cent{_KMEANS_ITERS}``. Shared by the ann_ivf and
    d11_semdedup oracles."""
    from spider_spark.operators.sqlmurmur import hashlong_aliases

    iters = []
    for k in range(_KMEANS_ITERS):
        iters.append(f"""
    asg{k} AS (
      SELECT s.sid, s.emb, c.cid AS cell
      FROM sample s CROSS JOIN cent{k} c
      QUALIFY row_number() OVER (PARTITION BY s.sid
          ORDER BY list_distance(s.emb, c.cent), c.cid) = 1
    ),
    cent{k + 1} AS (
      SELECT c.cid, coalesce(m.cent, c.cent) AS cent
      FROM cent{k} c LEFT JOIN (
        SELECT cell, list(avgv ORDER BY i) AS cent FROM (
          SELECT a.cell, dims.i, avg(a.emb[dims.i]) AS avgv
          FROM asg{k} a CROSS JOIN (SELECT unnest(range(1, 65)) AS i) dims
          GROUP BY a.cell, dims.i
        ) GROUP BY cell
      ) m ON m.cell = c.cid
    )""")
    last = f"cent{_KMEANS_ITERS}"
    return f"""emb AS ({src_sql}),
    hashed AS (
      SELECT vec_id, emb, {hashlong_aliases("vec_id", "42", "mmh", "h")}
      FROM emb
    ),
    sample AS (
      SELECT vec_id, emb,
             row_number() OVER (ORDER BY mmh, vec_id) - 1 AS sid
      FROM hashed ORDER BY mmh, vec_id LIMIT 512
    ),
    cent0 AS (SELECT sid AS cid, emb AS cent FROM sample WHERE sid < {N_CENTROIDS}),
    {",".join(iters)},
    assign AS (
      SELECT e.vec_id, e.emb, c.cid AS cell
      FROM emb e CROSS JOIN {last} c
      QUALIFY row_number() OVER (PARTITION BY e.vec_id
          ORDER BY list_distance(e.emb, c.cent), c.cid) = 1
    )"""


def _ivf_oracle_sql() -> str:
    """ann_ivf replicated in SQL: the shared quantizer CTE chain over the
    embeddings table, then queries probe their N_PROBE nearest cells and
    re-rank by exact cosine (top-k)."""
    last = f"cent{_KMEANS_ITERS}"
    ctes = kmeans_assign_ctes(
        "SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings"
    )
    return f"""
    WITH {ctes},
    qprobe AS (
      SELECT q.vec_id AS query_id, q.emb AS qe, c.cid AS probe_cell
      FROM emb q CROSS JOIN {last} c
      WHERE q.vec_id < {N_QUERIES}
      QUALIFY row_number() OVER (PARTITION BY q.vec_id
          ORDER BY list_distance(q.emb, c.cent), c.cid) <= {N_PROBE}
    ),
    scored AS (
      SELECT p.query_id, v.vec_id,
             list_cosine_similarity(p.qe, v.emb) AS cos_sim,
             row_number() OVER (PARTITION BY p.query_id
                 ORDER BY list_cosine_similarity(p.qe, v.emb) DESC,
                          v.vec_id) AS rn
      FROM qprobe p JOIN assign v
        ON v.cell = p.probe_cell AND v.vec_id <> p.query_id
    )
    SELECT query_id, vec_id AS neighbor, round(cos_sim, 4) AS cos_sim
    FROM scored WHERE rn <= {TOP_K}
    """


def train_ivf_centroids(sample: np.ndarray, k: int = N_CENTROIDS) -> np.ndarray:
    """Deterministic mini k-means for the IVF coarse quantizer: init = the
    first k sample rows (sample is taken in vec_id order), fixed iteration
    count, pure numpy. At corpus scale the sample is a tiny driver-side
    reservoir; assignment stays distributed."""
    cent = sample[:k].copy()
    for _ in range(_KMEANS_ITERS):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_assign_cells(spark, corpus):
    """Assign each row of ``corpus`` (vec_id, emb as a DOUBLE array) to its
    nearest IVF centroid: deterministic hash-ordered 512-row sample →
    train_ivf_centroids on the driver → broadcast → one Arrow-batched
    argmin map. Returns corpus + ``cell`` (int). Mirrors
    kmeans_assign_ctes bit-for-bit (same sample order, same quantizer),
    so any oracle built on that CTE chain can check a consumer of this."""
    sample = np.stack(
        [
            np.asarray(r["emb"], dtype=np.float64)
            for r in corpus.select("vec_id", "emb")
            .orderBy(F.hash("vec_id"), "vec_id")
            .limit(512)
            .collect()
        ]
    )
    centroids = train_ivf_centroids(sample)
    b_cent = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf(T.IntegerType())
    def cell_udf(embs: pd.Series) -> pd.Series:
        cent = b_cent.value
        mat = np.stack(embs.map(np.asarray).values).astype(np.float64)
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return corpus.withColumn("cell", cell_udf("emb"))


@query("ann_ivf", _ivf_oracle_sql())
def ann_ivf(spark, sf_dir):
    """IVF ANN: k-means coarse quantizer (driver-trained on an id-ordered
    sample, broadcast), vectors assigned to nearest centroid by a numpy
    UDF, queries probe their N_PROBE nearest cells, exact cosine re-rank
    inside the probed cells. The cell id is the shuffle key; candidates
    per query ≈ corpus·N_PROBE/N_CENTROIDS instead of the full corpus."""
    e = load(spark, sf_dir, "embeddings")
    # deterministic HASH-based sample for the quantizer: ordering by
    # murmur3(vec_id) draws uniformly from the whole corpus (an id-ordered
    # first-N sample is whatever subpopulation writes low ids — at 100 TB
    # that is one day's shard, and the quantizer would be trained on it)
    sample = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in e.select("vec_id", "embedding")
            .orderBy(F.hash("vec_id"), "vec_id")
            .limit(512)
            .collect()
        ]
    )
    centroids = train_ivf_centroids(sample)
    b_cent = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf(T.IntegerType())
    def cell_udf(embs: pd.Series) -> pd.Series:
        cent = b_cent.value
        mat = np.stack(embs.map(np.asarray).values).astype(np.float64)
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(embs: pd.Series) -> pd.Series:
        cent = b_cent.value
        mat = np.stack(embs.map(np.asarray).values).astype(np.float64)
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :N_PROBE].astype(np.int32)
        return pd.Series(list(order))

    corpus = e.withColumn(
        "emb", F.transform("embedding", lambda x: x.cast("double"))
    ).withColumn("cell", cell_udf("embedding"))
    q = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("probe_cell", F.explode(probe_udf("embedding")))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            "probe_cell",
        )
    )
    scored = (
        corpus.select("vec_id", F.col("emb").alias("ve"), "cell")
        .join(
            F.broadcast(q),
            (F.col("cell") == F.col("probe_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cos_sim", _cos(F.col("qe"), F.col("ve")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


@query("ann_lsh_bucketed", _lsh_oracle_sql())
def ann_lsh_bucketed(spark, sf_dir):
    """LSH-bucketed ANN: sign-of-hyperplane-projection bucket id
    (vectorized numpy UDF) with plane count sized to the corpus; queries
    MULTI-PROBE their own bucket plus every distance-1 bit flip, exact
    cosine re-rank inside probed buckets. The bucket id is the shuffle
    key; candidates per query ≈ (1+planes)·target_bucket regardless of
    corpus size."""
    e0 = load(spark, sf_dir, "embeddings")
    n_planes = planes_for_corpus(e0.count())

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(embs: pd.Series) -> pd.Series:
        planes = hyperplanes(n_planes)
        mat = np.stack(embs.map(np.asarray).values).astype(np.float64)
        bits = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    e = (
        e0.withColumn("emb", F.transform("embedding", lambda x: x.cast("double")))
        .withColumn("bucket", bucket_udf("embedding"))
    )
    # multi-probe: own bucket + all single-bit flips
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("int")
            for i in range(n_planes)
        ],
    )
    q = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("qb", F.explode(probes))
        .select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"), "qb"
        )
    )
    v = e.select("vec_id", F.col("emb").alias("ve"), "bucket")
    scored = (
        v.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cos_sim", _cos(F.col("qe"), F.col("ve")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


_RRF_SCALE = 10**6
_RRF_K = 60


def _rrf_oracle_sql() -> str:
    rank = (
        "row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos_sim DESC, neighbor)"
    )
    return f"""
    WITH ivf AS ({_ivf_oracle_sql()}),
    lshr AS ({_lsh_oracle_sql()}),
    ri AS (SELECT query_id, neighbor, {rank} AS rk FROM ivf),
    rl AS (SELECT query_id, neighbor, {rank} AS rk FROM lshr),
    u AS (
      SELECT COALESCE(ri.query_id, rl.query_id) AS query_id,
             COALESCE(ri.neighbor, rl.neighbor) AS neighbor,
             CAST(COALESCE({_RRF_SCALE} // ({_RRF_K} + ri.rk), 0)
                  + COALESCE({_RRF_SCALE} // ({_RRF_K} + rl.rk), 0)
                  AS BIGINT) AS rrf,
             CAST((ri.rk IS NOT NULL)::INT + (rl.rk IS NOT NULL)::INT
                  AS BIGINT) AS n_lists
      FROM ri FULL OUTER JOIN rl
        ON rl.query_id = ri.query_id AND rl.neighbor = ri.neighbor
    )
    SELECT query_id, neighbor, rrf, n_lists,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY rrf DESC, neighbor) AS BIGINT) AS fused_rank
    FROM u
    """


@query("ann_rrf_fusion", _rrf_oracle_sql())
def ann_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of the two ANN
    retrieval paths — IVF and multi-probe LSH — the standard way a real
    retrieval stack combines heterogeneous candidate generators without
    comparable scores. Score = Σ_lists SCALE // (60 + rank) in **integer
    arithmetic** (a float 1/(60+r) sum would hash-differ on addition
    order), ranks taken over each list's (rounded cos_sim DESC, neighbor)
    ordering so both engines rank identical values identically.

    Scale shape: both input lists are per-query top-k — output cardinality
    is queries×(≤2k) regardless of corpus size; the fusion join and both
    window ranks run on that tiny relation, never on the corpus.
    """
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), "neighbor"
    )
    contrib = F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rk)")
    ri = (
        ann_ivf(spark, sf_dir)
        .withColumn("rk", F.row_number().over(rank_w))
        .select("query_id", "neighbor", F.col("rk").alias("rk_i"))
    )
    rl = (
        ann_lsh_bucketed(spark, sf_dir)
        .withColumn("rk", F.row_number().over(rank_w))
        .select(
            F.col("query_id").alias("query_id_l"),
            F.col("neighbor").alias("neighbor_l"),
            F.col("rk").alias("rk_l"),
        )
    )
    u = ri.join(
        rl,
        (ri["query_id"] == rl["query_id_l"]) & (ri["neighbor"] == rl["neighbor_l"]),
        "full_outer",
    ).select(
        F.coalesce("query_id", "query_id_l").alias("query_id"),
        F.coalesce("neighbor", "neighbor_l").alias("neighbor"),
        (
            F.coalesce(
                F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rk_i)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{_RRF_SCALE} div ({_RRF_K} + rk_l)"), F.lit(0)
            )
        ).cast("long").alias("rrf"),
        (
            F.col("rk_i").isNotNull().cast("int")
            + F.col("rk_l").isNotNull().cast("int")
        ).cast("long").alias("n_lists"),
    )
    fused_w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "neighbor")
    return u.withColumn(
        "fused_rank", F.row_number().over(fused_w).cast("long")
    )


# ---------------------------------------------------------------------------
# kNN label voting: classification by nearest-neighbor majority
# ---------------------------------------------------------------------------

_KNN_ORACLE = f"""
WITH nn AS (
  SELECT query_id, label FROM (
    SELECT q.vec_id AS query_id, v.label,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                             v.embedding::DOUBLE[]) DESC,
                      v.vec_id
           ) AS rn
    FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {TOP_K}),
votes AS (SELECT query_id, label, count(*) AS n_votes
          FROM nn GROUP BY query_id, label)
SELECT query_id, label AS predicted, n_votes FROM (
  SELECT query_id, label, n_votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, label) AS rk
  FROM votes) WHERE rk = 1
"""


@query("emb_knn_label", _KNN_ORACLE)
def emb_knn_label(spark, sf_dir):
    """kNN classification by label majority: each query embedding takes
    the modal label of its 5 nearest corpus neighbors (cosine), ties
    broken by the smaller label id — a total order, so the prediction is
    engine-independent. The labeled-corpus lookup every retrieval-
    augmented tagging / weak-supervision pipeline runs.

    Scale shape: identical to ann_bruteforce_topk (tiny query set
    broadcast, one corpus scan, per-query window over TOP_K rows), plus a
    vote aggregate and argmax over the (|queries|·TOP_K)-sized neighbor
    relation only. The IVF/LSH variants drop in as the candidate
    generator at real scale — the vote stage is unchanged."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "emb", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    v = e.select("vec_id", F.col("emb").alias("ve"), "label")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), "vec_id"
    )
    nn = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", _cos(F.col("qe"), F.col("ve")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "label")
    )
    votes = nn.groupBy("query_id", "label").agg(
        F.count("*").alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), "label"
    )
    return (
        votes.withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("label").alias("predicted"), "n_votes")
    )


# ---------------------------------------------------------------------------
# ann_pq — product quantization with ADC (asymmetric distance computation)
# ---------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_SUBDIM = 16  # 64-dim embeddings / 4
_PQ_K = 16  # codes per subspace → 4 bits/code, 2 bytes per vector


def _pq_oracle_sql() -> str:
    """ann_pq replicated in SQL. The codebook is the k-means-free "sample
    codebook": subvectors of the first _PQ_K corpus rows in deterministic
    (murmur3(vec_id), vec_id) order — the same hash-sample convention as
    the IVF quantizer, recomputed here via sqlmurmur so the oracle needs no
    data-dependent literals. Every distance is the identical sequential
    fold the Spark side uses (list_reduce left fold == F.aggregate with 0.0
    init, since 0.0 + x == x), so d2 / ADC values are bit-identical across
    engines and the argmin/rank tie-breaks never diverge."""
    from spider_spark.operators.sqlmurmur import hashlong_aliases

    d2 = """list_reduce(
        list_transform(range(1, {n}), i ->
          (sub[i] - c.cent[i]) * (sub[i] - c.cent[i])),
        (a, b) -> a + b)""".format(n=_PQ_SUBDIM + 1)
    m_vals = ", ".join(f"({m})" for m in range(_PQ_M))
    code_cols = ", ".join(
        f"max(CASE WHEN m = {m} THEN k END) AS c{m}" for m in range(_PQ_M)
    )
    lut_joins = "\n      ".join(
        f"JOIN lut l{m} ON l{m}.query_id = l0.query_id AND l{m}.m = {m} "
        f"AND l{m}.k = c.c{m}"
        for m in range(1, _PQ_M)
    )
    adc = "l0.d2"
    for m in range(1, _PQ_M):
        adc = f"({adc} + l{m}.d2)"
    return f"""
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), hashed AS (
      SELECT vec_id, emb, {hashlong_aliases("vec_id", "42", "mmh", "pq")}
      FROM emb
    ), sample AS (
      SELECT emb, row_number() OVER (ORDER BY mmh, vec_id) - 1 AS sid
      FROM hashed ORDER BY mmh, vec_id LIMIT {_PQ_K}
    ), cb AS (
      SELECT s.sid AS k, mm.m,
             list_slice(s.emb, mm.m * {_PQ_SUBDIM} + 1,
                        mm.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS cent
      FROM sample s CROSS JOIN (VALUES {m_vals}) mm(m)
    ), dists AS (
      SELECT e.vec_id, c.m, c.k, {d2} AS d2
      FROM (SELECT vec_id,
                   list_slice(emb, mm.m * {_PQ_SUBDIM} + 1,
                              mm.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sub,
                   mm.m
            FROM emb CROSS JOIN (VALUES {m_vals}) mm(m)) e
      JOIN cb c ON c.m = e.m
    ), codes AS (
      SELECT vec_id, {code_cols}
      FROM (SELECT vec_id, m, k,
                   row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, k) AS rn
            FROM dists)
      WHERE rn = 1 GROUP BY vec_id
    ), lut AS (
      SELECT vec_id AS query_id, m, k, d2 FROM dists
      WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT l0.query_id, c.vec_id, {adc} AS adc,
             row_number() OVER (PARTITION BY l0.query_id
                 ORDER BY {adc}, c.vec_id) AS rn
      FROM codes c
      JOIN lut l0 ON l0.m = 0 AND l0.k = c.c0
      {lut_joins}
      WHERE c.vec_id <> l0.query_id
    )
    SELECT query_id, vec_id AS neighbor, round(adc, 4) AS adc_dist
    FROM scored WHERE rn <= {TOP_K}
    """


@query("ann_pq", _pq_oracle_sql())
def ann_pq(spark, sf_dir):
    """Product-quantization ANN (Jégou/Douze/Schmid, "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011): the 64-dim embedding is
    split into 4×16-dim subvectors, each quantized to one of 16 sample
    codes (4 codes ≈ 4 small ints per vector — a 32× compression of
    the candidate set), and queries rank the corpus by ADC: the sum of
    per-subspace query→code distances looked up from a tiny per-query
    table. The codebook is the k-means-free sample codebook (subvectors of
    the first 16 rows in murmur3-hash order, the IVF quantizer's sampling
    convention); ann_ivf shows the trained-quantizer variant of the same
    machinery.

    Scale shape: encoding is pure column math over one corpus scan
    (whole-stage codegen, no Python); the corpus thereafter exists only as
    (vec_id, 4 codes) — the PQ memory story; the 8-query LUT is
    broadcast, so the ADC pass is a broadcast join + explicit ordered sum
    with no corpus shuffle; top-k is the same per-query window the exact
    baseline uses. Every distance is a sequential left fold (F.aggregate
    with 0.0 init == DuckDB list_reduce), so ADC values — and therefore
    ranks and ties — are bit-identical to the oracle by construction, not
    by rounding margin."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "emb", F.transform("embedding", lambda x: x.cast("double"))
    )
    cb_rows = (
        e.select("vec_id", "emb")
        .orderBy(F.hash("vec_id"), "vec_id")
        .limit(_PQ_K)
        .collect()
    )
    # cb[m][k] = the m-th subvector of sample row k, as a literal column
    cb = [
        [
            F.array(
                *[
                    F.lit(float(v))
                    for v in r["emb"][m * _PQ_SUBDIM : (m + 1) * _PQ_SUBDIM]
                ]
            )
            for r in cb_rows
        ]
        for m in range(_PQ_M)
    ]

    def d2(sub, cent):
        return F.aggregate(
            F.zip_with(sub, cent, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def sub(m):
        return F.slice("emb", m * _PQ_SUBDIM + 1, _PQ_SUBDIM)

    # encode: per subspace, argmin over the 16 codes (first-min tie-break
    # == the oracle's ORDER BY d2, k)
    codes = e.select(
        "vec_id",
        *[
            (
                F.array_position(
                    F.array(*[d2(sub(m), cb[m][k]) for k in range(_PQ_K)]),
                    F.array_min(
                        F.array(*[d2(sub(m), cb[m][k]) for k in range(_PQ_K)])
                    ),
                ).cast("int")
                - 1
            ).alias(f"c{m}")
            for m in range(_PQ_M)
        ],
    )
    # per-query LUT: distances from each query subvector to all 16 codes
    lut = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        *[
            F.array(*[d2(sub(m), cb[m][k]) for k in range(_PQ_K)]).alias(
                f"lut{m}"
            )
            for m in range(_PQ_M)
        ],
    )
    adc = F.element_at("lut0", F.col("c0") + 1)
    for m in range(1, _PQ_M):
        adc = adc + F.element_at(f"lut{m}", F.col(f"c{m}") + 1)
    w = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    return (
        codes.join(F.broadcast(lut), F.col("vec_id") != F.col("query_id"))
        .withColumn("adc", adc)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor"),
            F.round("adc", 4).alias("adc_dist"),
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified rerank (Carbonell & Goldstein, SIGIR 1998): greedy
# relevance-vs-redundancy top-k over the embedding corpus
# ---------------------------------------------------------------------------

_MMR_POOL = 12
_MMR_K = 4
_MMR_Q = 0  # query vector id


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as chained CTEs — one sel_k per pick, each an
    argmax over the remaining pool with max-sim-to-selected from the
    precomputed pool×pool pair table (same unrolling discipline as the
    ann_ivf k-means oracle)."""
    steps = []
    for k in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{i}" for i in range(1, k)
        )
        steps.append(f"""
sel{k} AS (
  SELECT p.vec_id, p.rel, 0.7 * p.rel - 0.3 * ms.ms AS mmr
  FROM pool p
  JOIN (SELECT va AS vec_id, max(sim) AS ms
        FROM pairs WHERE vb IN ({prev}) GROUP BY va) ms
    ON ms.vec_id = p.vec_id
  WHERE p.vec_id NOT IN ({prev})
  ORDER BY mmr DESC, p.vec_id LIMIT 1
)""")
    finals = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS pick, vec_id, rel,"
        f" round(mmr, 4) AS mmr FROM sel{i}"
        for i in range(1, _MMR_K + 1)
    )
    return f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = {_MMR_Q}
),
cand AS (
  SELECT v.vec_id,
         round(list_cosine_similarity(q.qe, v.embedding::DOUBLE[]), 4) AS rel
  FROM embeddings v CROSS JOIN q WHERE v.vec_id <> {_MMR_Q}
),
pool AS (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT {_MMR_POOL}),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                      eb.embedding::DOUBLE[]), 4) AS sim
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
),
sel1 AS (
  SELECT vec_id, rel, 0.7 * rel AS mmr
  FROM pool ORDER BY rel DESC, vec_id LIMIT 1
),{",".join(steps)}
{finals}
"""


@query("sim_mmr_rerank", _mmr_oracle())
def sim_mmr_rerank(spark, sf_dir):
    """MMR diversified top-k (Carbonell & Goldstein 1998): greedily pick
    argmax of 0.7·relevance − 0.3·max-similarity-to-already-picked from a
    relevance top-12 pool — the rerank step a retrieval pipeline runs
    after ANN so the k results aren't 4 near-copies of each other.

    Float discipline: relevance and pair similarities are rounded to 4 dp
    BEFORE any greedy comparison (ties then broken by vec_id), so both
    engines take identical argmax branches — the greedy chain never
    compares unrounded engine-local floats (the d5/ADVICE lesson).

    Scale shape: the only corpus-sized work is the pool construction —
    one scan, broadcast 1-row query, TakeOrderedAndProject top-12.
    Everything after (pool×pool pair table, 4 chained argmax steps) is
    column math over ≤12-row DataFrames; the greedy recursion is
    inherently sequential but runs on pool-cardinality data, never the
    corpus. Left lazy (pool re-derives per step) to keep the query a pure
    plan; a production run would .persist() pool first."""
    from pyspark.sql import functions as F

    e = load(spark, sf_dir, "embeddings").withColumn(
        "emb", F.transform("embedding", lambda x: x.cast("double"))
    )
    q = e.filter(F.col("vec_id") == _MMR_Q).select(F.col("emb").alias("qe"))
    cand = (
        e.filter(F.col("vec_id") != _MMR_Q)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_cos(F.col("qe"), F.col("emb")), 4).alias("rel"),
            "emb",
        )
    )
    pool = cand.orderBy(F.desc("rel"), "vec_id").limit(_MMR_POOL)
    a = pool.select(
        F.col("vec_id").alias("va"), F.col("emb").alias("ea")
    )
    b = pool.select(
        F.col("vec_id").alias("vb"), F.col("emb").alias("eb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            F.round(_cos(F.col("ea"), F.col("eb")), 4).alias("sim"),
        )
    )
    sel = (
        pool.orderBy(F.desc("rel"), "vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("pick"),
            "vec_id",
            "rel",
            F.round(F.col("rel") * 0.7, 4).alias("mmr"),
        )
    )
    picked = sel
    for k in range(2, _MMR_K + 1):
        ids = picked.select(F.col("vec_id").alias("vb"))
        ms = (
            pairs.join(F.broadcast(ids), "vb")
            .groupBy("va")
            .agg(F.max("sim").alias("ms"))
        )
        step = (
            pool.join(
                F.broadcast(picked.select("vec_id")), "vec_id", "left_anti"
            )
            .join(ms, F.col("vec_id") == F.col("va"))
            .select(
                "vec_id",
                "rel",
                (F.col("rel") * 0.7 - F.col("ms") * 0.3).alias("mmr_raw"),
            )
            .orderBy(F.desc("mmr_raw"), "vec_id")
            .limit(1)
            .select(
                F.lit(k).cast("long").alias("pick"),
                "vec_id",
                "rel",
                F.round("mmr_raw", 4).alias("mmr"),
            )
        )
        picked = picked.unionByName(step)
    return picked
