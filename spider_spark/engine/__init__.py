"""Distributed crawl engine: frontier, seen-filter, politeness, rounds.

The execution model (SURVEY.md §3-§4): one crawl round = one Spark job —
the scale-correct analog of the reference's bounded-concurrency barrier
batches (/root/reference/suplicmap_vector2.py:107-128). All state lives in
partitioned parquet tables under a checkpoint directory with per-round
atomic commit markers (the sandbox stand-in for Iceberg snapshot commits;
the table layout — append-only deltas for `seen`/`results`/`metrics`,
snapshot-per-round for the pending frontier — maps 1:1 onto Iceberg
MoR deltas + CoW compaction on a real cluster).
"""

from spider_spark.engine.crawler import CrawlEngine  # noqa: F401
