"""Streaming incremental near-dup: d8's corpus-vs-batch MinHash dedup as a
Structured Streaming pipeline.

Each arriving micro-batch of documents is deduped against the signature
store accumulated from all EARLIER batches (never batch×itself — that is
d3's pre-ingest job), then appended to the store — the daily-ingest
production shape, run continuously. Per-batch work is
O(batch · bucket-occupancy), independent of corpus size, exactly like the
batch d8 operator (`operators/dedup.py`).

Exactly-once: every sink is written to a `batch=<id>` subdirectory with
idempotent overwrite, so a micro-batch replayed after a crash rewrites the
same bytes; the checkpoint directory carries the source offsets. This is
the same marker-and-overwrite discipline the crawl engine's round commits
use (`engine/crawler.py`) — on a real cluster both map to Iceberg
appends with replace-partition semantics.

Reference semantics: the reference dedups implicitly by disjoint ID ranges
(/root/reference/suplicmap_vector.py:146-151); this is the content-level
generalization a 100 TB web corpus needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_spark.operators.dedup import (
    _jaccard_verify,
    _minhash_bands,
    _shingle_sets,
    minhash_signatures_df,
)


def _dedup_one_batch(
    batch_df: DataFrame, batch_id: int, store_dir: str, out_dir: str
) -> None:
    """foreachBatch body: batch bands ⋈ store bands → exact-Jaccard verify
    → append pairs + batch signatures/shingles to the store. All writes are
    per-batch-overwrite (idempotent on replay)."""
    spark = batch_df.sparkSession
    docs = batch_df.select("doc_id", "text")
    bands = _minhash_bands(minhash_signatures_df(docs))
    shingles = _shingle_sets(docs)

    store_bands_dir = os.path.join(store_dir, "bands")
    store_sh_dir = os.path.join(store_dir, "shingles")
    have_store = _has_parquet(store_bands_dir, exclude_batch=batch_id)
    if have_store:
        # the store may contain this batch's own subdir from a crashed
        # previous attempt — exclude it so replay can't pair a doc with
        # itself (exactly-once under retry, tested)
        corpus_bands = _read_store(spark, store_bands_dir, batch_id).alias("a")
        corpus_sh = _read_store(spark, store_sh_dir, batch_id).select(
            "doc_id", "sh"
        )
        cand = (
            corpus_bands.join(
                bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket")),
            )
            .select(
                F.col("a.doc_id").alias("corpus_id"),
                F.col("b.doc_id").alias("batch_id"),
            )
            .distinct()
        )
        # verify against the union of stores so both sides' shingle sets
        # resolve (corpus side from the store, batch side from this batch)
        all_sh = corpus_sh.unionByName(shingles)
        pairs = _jaccard_verify(cand, all_sh, "corpus_id", "batch_id")
    else:
        pairs = spark.createDataFrame(
            [], "corpus_id long, batch_id long, jaccard double"
        )
    pairs.withColumn("micro_batch", F.lit(batch_id)).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, f"batch={batch_id}"))
    bands.write.mode("overwrite").parquet(
        os.path.join(store_bands_dir, f"batch={batch_id}")
    )
    shingles.write.mode("overwrite").parquet(
        os.path.join(store_sh_dir, f"batch={batch_id}")
    )


def _has_parquet(d: str, exclude_batch: int) -> bool:
    if not os.path.isdir(d):
        return False
    return any(
        e.startswith("batch=") and e != f"batch={exclude_batch}"
        for e in os.listdir(d)
    )


def _read_store(spark, d: str, exclude_batch: int) -> DataFrame:
    subs = [
        os.path.join(d, e)
        for e in sorted(os.listdir(d))
        if e.startswith("batch=") and e != f"batch={exclude_batch}"
    ]
    return spark.read.parquet(*subs)


def run_dedup_stream(
    spark,
    docs_dir: str,
    work_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """availableNow micro-batch run: readStream over a directory of document
    parquet files (one file ≙ one arriving ingest batch), foreachBatch
    incremental dedup, returns the accumulated duplicate-pair table
    (corpus_id, batch_id, jaccard, micro_batch). Re-running with the same
    work_dir resumes from the checkpoint: already-processed files are not
    re-deduped (exactly-once, tested)."""
    store_dir = os.path.join(work_dir, "store")
    out_dir = os.path.join(work_dir, "dup_pairs")
    ckpt = os.path.join(work_dir, "ckpt")
    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: _dedup_one_batch(df, bid, store_dir, out_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame(
            [], "corpus_id long, batch_id long, jaccard double, micro_batch long"
        )
    return spark.read.option("basePath", out_dir).parquet(out_dir)
