"""End-to-end composition: the crawl engine's output table IS a corpus the
operator layer can consume. A user of the reference who switches to this
repo runs exactly this chain: crawl → extracted-text table → boilerplate
detection → exact dedup → near-dup cluster representative selection.

The adapter is four column expressions (doc_id from the stable crawl seq,
source from the URL host, n_chars from the text) — no reshaping, which is
the point: the engine's results() schema and the operators' `documents`
contract were designed to meet."""

from __future__ import annotations

import os

import pytest

from spider_spark.oracle import CrawlPolicy

POLICY = CrawlPolicy(max_per_host=6, round_ms=2_000, max_retries=2, max_rounds=8)


@pytest.fixture(scope="module")
def corpus_dir(spark, world_dir, tmp_path_factory):
    """Crawl the fixture world, adapt results() to the documents contract,
    and land it as a one-table sf_dir the operator layer can load."""
    from pyspark.sql import functions as F

    from spider_spark.engine import CrawlEngine

    ckpt = str(tmp_path_factory.mktemp("e2e_ckpt"))
    out = tmp_path_factory.mktemp("e2e_corpus")
    eng = CrawlEngine(
        spark,
        pages_path=os.path.join(world_dir, "pages.parquet"),
        robots_path=os.path.join(world_dir, "robots.parquet"),
        checkpoint_dir=ckpt,
        policy=POLICY,
        n_partitions=4,
    )
    seeds = spark.read.parquet(os.path.join(world_dir, "seeds.parquet"))
    eng.run(seeds=seeds)
    docs = eng.results().select(
        F.col("seq").alias("doc_id"),
        F.col("text"),
        F.lit("en").alias("lang"),
        F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("source"),
        F.length("text").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def test_crawled_corpus_is_nonempty_and_well_formed(spark, corpus_dir):
    d = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    n = d.count()
    assert n > 50, "fixture crawl should yield a real corpus"
    assert d.filter("text IS NULL OR source = ''").count() == 0
    assert d.select("doc_id").distinct().count() == n, "seq must be unique"


def test_boilerplate_detector_runs_on_crawled_corpus(spark, corpus_dir):
    """t29 over real extracted text: every flagged paragraph must actually
    occur in >= 2 distinct documents of its host (re-verified row by row
    against the corpus, not the operator's own counts)."""
    from pyspark.sql import functions as F

    from spider_spark.operators.textstats import _T29_CHUNK, t29_boilerplate

    flagged = t29_boilerplate(spark, corpus_dir).collect()
    d = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    ex = d.select(
        "source",
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, cast(ceil(size(split(text,' '))"
                f"/{_T29_CHUNK}.0) as int) - 1),"
                f" i -> concat_ws(' ', slice(split(text,' '), i*{_T29_CHUNK}+1,"
                f" {_T29_CHUNK})))"
            )
        ).alias("para"),
    ).distinct()
    occ = {
        (r.source, r.para): r.n
        for r in ex.groupBy("source", "para")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    for r in flagged:
        assert occ[(r.source, r.para)] == r.n_docs
        assert r.n_docs >= 2


def test_dedup_chain_partitions_crawled_corpus(spark, corpus_dir):
    """d1 then d14 over the crawled corpus: exact-dup groups and near-dup
    cluster representatives must both partition the corpus exactly."""
    from spider_spark.operators.dedup import d1_exact_dedup, d14_cluster_keep_best

    d = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    n = d.count()

    groups = d1_exact_dedup(spark, corpus_dir).collect()
    assert sum(g.n_copies for g in groups) == n

    reps = d14_cluster_keep_best(spark, corpus_dir).collect()
    assert sum(r.n_docs for r in reps) == n
    keepers = {r.keeper for r in reps}
    assert len(keepers) == len(reps), "one distinct keeper per cluster"
