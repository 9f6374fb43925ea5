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


def hyperplanes(dim: int = 64) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed) shared by the UDF and
    the tests."""
    rs = np.random.RandomState(_PLANE_SEED)
    return rs.randn(N_PLANES, dim).astype(np.float64)


@query("ann_lsh_bucketed")  # hyperplane signs not SQL-expressible → rows-only
def ann_lsh_bucketed(spark, sf_dir):
    """LSH-bucketed ANN: sign-of-hyperplane-projection bucket id (vectorized
    numpy UDF), candidates = same-bucket pairs, exact cosine re-rank within
    bucket. At 10^10 vectors the bucket id is the shuffle key and each
    bucket is ~corpus/2^planes — bounded candidate sets."""

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(embs: pd.Series) -> pd.Series:
        planes = hyperplanes()
        mat = np.stack(embs.map(np.asarray).values).astype(np.float64)
        bits = (mat @ planes.T) > 0  # (n, N_PLANES)
        weights = (1 << np.arange(N_PLANES)).astype(np.int64)
        return pd.Series((bits @ weights).astype(np.int32))

    e = (
        load(spark, sf_dir, "embeddings")
        .withColumn("emb", F.transform("embedding", lambda x: x.cast("double")))
        .withColumn("bucket", bucket_udf("embedding"))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qe"),
        F.col("bucket").alias("qb"),
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
