"""CrawlEngine: the distributed crawl-round loop.

One round = one Spark job DAG (SURVEY.md §3.1 engine equivalent):

    pending frontier ──salted top-K per host (politeness budget)──►
    fetch (pages-table join | mapInPandas transport) ──►
    extract_text / extract_links (Arrow UDFs) ──►
    global seq assignment (range-partitioned two-phase rank) ──►
    link dedup vs seen (bloom pre-screen + exact left_anti) ──►
    atomic commit: results Δ + seen Δ + dead Δ + metrics Δ + frontier snapshot

Semantics are the oracle contract in spider_spark/oracle.py — byte-for-byte:
crawl order is a pure function of (priority, discovery_time, url), never of
scheduling, so the distributed run reproduces the single-threaded reference
ordering exactly (north_rule).

Scale notes (designed for 10^10-URL frontier / 1000 executors):
- Hot-host skew: the per-host top-K dequeue is TWO-stage — stage 1 ranks
  within (host, salt) buckets (32 salts) and keeps ≤ max_per_host per
  bucket, so no single task ever sees a whole hot host's pending set;
  stage 2 ranks the ≤ 32·K survivors per host. The politeness budget then
  caps per-host work per round, so fetch/extract stages are skew-free by
  construction.
- Global crawl-order seq avoids a single-partition window: rows are
  range-partitioned on the sort key, per-partition counts are prefix-summed
  on the driver (one tiny collect of ≤ P longs), and seq = offset + local
  rank via mapInPandas.
- All state tables are parquet laid out like Iceberg: append-only deltas
  partitioned by round= for seen/results/dead/metrics, snapshot-per-round
  for the (bounded) pending frontier; a JSON commit marker written LAST
  makes each round atomic — a killed job resumes from the last marker and
  simply overwrites any partial round directory (idempotent; hard part #3).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_spark.engine import seen as seen_mod
from spider_spark.engine.politeness import with_robots
from spider_spark.engine.udfs import (
    canonicalize_udf,
    extract_text_links_udf,
    host_col,
)
from spider_spark.oracle import CrawlPolicy

N_SALTS = 32

_STATE_COLS = ["url", "host", "host_hash", "priority", "discovery_time", "retries"]


def assign_global_seq(df: DataFrame, sort_cols: list[str], start: int, n_parts: int):
    """Dense global sequence over total order of ``sort_cols`` without a
    single-partition window: range-partition on the key, prefix-sum the
    per-partition counts on the driver, add offsets per partition.
    Returns (df_with_seq, persisted_handle) — caller unpersists after write.
    """
    import pandas as pd

    d = (
        df.repartitionByRange(n_parts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in d.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(d.schema.fields + [T.StructField("seq", T.LongType())])

    def _gen(batches):
        nxt = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if nxt is None:
                nxt = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.copy()
            pdf["seq"] = pd.array(range(nxt, nxt + len(pdf)), dtype="int64")
            nxt += len(pdf)
            yield pdf

    return d.mapInPandas(_gen, schema=out_schema).drop("_pid"), d, acc


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages_path: str,
        robots_path: str,
        checkpoint_dir: str,
        policy: CrawlPolicy = CrawlPolicy(),
        n_partitions: int = 8,
        use_bloom: bool = True,
        fetch_mode: str = "join",  # "join" | "mapinpandas"
        bench_mode: bool = False,
    ):
        """``bench_mode`` drops per-round observability writes (metrics,
        dead table, disposition counts) to measure steady-state crawl
        throughput; correctness-relevant state (results/seen/frontier) is
        untouched."""
        assert fetch_mode in ("join", "mapinpandas")
        self.bench_mode = bench_mode
        self.spark = spark
        self.pages_path = pages_path
        self.robots_path = robots_path
        self.ckpt = checkpoint_dir
        self.policy = policy
        self.n_partitions = n_partitions
        self.use_bloom = use_bloom
        self.fetch_mode = fetch_mode
        os.makedirs(os.path.join(self.ckpt, "commits"), exist_ok=True)
        self.robots = spark.read.parquet(robots_path)
        # the page store is probed twice per round (hits + miss anti-join);
        # cache it across rounds — the sandbox stand-in for a page-store
        # service / Iceberg scan with pushdown (real clusters don't re-read
        # cold storage per round either)
        self._pages_cache: DataFrame | None = None
        self._round_handles: list[DataFrame] = []

    # ---------- commit protocol ----------
    def _marker(self, r: int) -> str:
        return os.path.join(self.ckpt, "commits", f"round_{r}.json")

    def _commit(self, r: int, meta: dict) -> None:
        tmp = self._marker(r) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._marker(r))  # atomic: marker appears last

    def last_committed_round(self) -> int | None:
        d = os.path.join(self.ckpt, "commits")
        rounds = [
            int(f[len("round_") : -len(".json")])
            for f in os.listdir(d)
            if f.startswith("round_") and f.endswith(".json")
        ]
        return max(rounds) if rounds else None

    def _read_commit(self, r: int) -> dict:
        with open(self._marker(r)) as f:
            return json.load(f)

    def _path(self, table: str, r: int) -> str:
        return os.path.join(self.ckpt, table, f"round={r}")

    def _read_delta_table(self, table: str, upto: int) -> DataFrame | None:
        root = os.path.join(self.ckpt, table)
        if not os.path.isdir(root):
            return None
        return (
            self.spark.read.option("basePath", root)
            .parquet(root)
            .filter(F.col("round") <= upto)
        )

    # ---------- round 0: seeds ----------
    def init_seeds(self, seeds: DataFrame) -> dict:
        """Canonicalize + dedup seeds (min priority on ties), split by
        robots into pending frontier vs blocked; commit round 0."""
        canon = (
            seeds.withColumn("url", canonicalize_udf("url"))
            .filter(F.col("url").isNotNull())
            .groupBy("url")
            .agg(F.min("priority").cast("int").alias("priority"))
            .withColumn("host", host_col("url"))
        )
        flagged = with_robots(canon, self.robots, self.policy).persist()
        pending = (
            flagged.filter(~F.col("blocked"))
            .select(
                "url",
                "host",
                F.hash("host").alias("host_hash"),
                "priority",
                F.lit(0).alias("discovery_time"),
                F.lit(0).alias("retries"),
            )
        )
        pending.repartition(self.n_partitions, "host_hash").write.mode(
            "overwrite"
        ).parquet(self._path("state", 0))
        seen_delta = flagged.select(
            "url",
            F.when(F.col("blocked"), F.lit("blocked"))
            .otherwise(F.lit("frontier"))
            .alias("disposition"),
        )
        seen_delta.write.mode("overwrite").parquet(self._path("seen_delta", 0))
        if self.use_bloom:
            seen_mod.build_blobs(
                seen_delta.select("url"), self.n_partitions
            ).write.mode("overwrite").parquet(self._path("seen_blob", 0))
        n_pending = self.spark.read.parquet(self._path("state", 0)).count()
        n_blocked = seen_delta.filter(F.col("disposition") == "blocked").count()
        flagged.unpersist()
        meta = {"round": 0, "next_seq": 0, "pending": n_pending, "blocked": n_blocked}
        self._commit(0, meta)
        return meta

    # ---------- dequeue ----------
    def _dequeue(self, pending: DataFrame) -> DataFrame:
        """Two-stage salted top-K per host under the politeness budget
        (O5 in SURVEY.md §2.6). Order within host: (priority,
        discovery_time, url) — identical to oracle."""
        order = [F.col("priority"), F.col("discovery_time"), F.col("url")]
        budgeted = with_robots(pending, self.robots, self.policy)
        # stage 1: cap per (host, salt) bucket — bounds any task's rank input
        salted = budgeted.withColumn("_salt", F.pmod(F.hash("url"), F.lit(N_SALTS)))
        w1 = Window.partitionBy("host", "_salt").orderBy(*order)
        pre = salted.withColumn("_r1", F.row_number().over(w1)).filter(
            F.col("_r1") <= self.policy.max_per_host
        )
        # stage 2: exact top-budget per host over ≤ N_SALTS·K survivors
        w2 = Window.partitionBy("host").orderBy(*order)
        return (
            pre.withColumn("_r2", F.row_number().over(w2))
            .filter(F.col("_r2") <= F.col("budget"))
            .drop("_salt", "_r1", "_r2", "blocked", "budget")
        )

    # ---------- fetch ----------
    def _fetch(self, dequeued: DataFrame) -> DataFrame:
        """Returns dequeued + html column (null = fetch miss).

        Join mode broadcasts the (budget-bounded, hence small) dequeued set
        into the pages scan — the big table is never shuffled; misses are
        recovered with a second broadcast anti-join. At real scale this is
        the 'probe the page store' pattern; the store side only streams.
        """
        if self.fetch_mode == "join":
            if self._pages_cache is None:
                self._pages_cache = (
                    self.spark.read.parquet(self.pages_path)
                    .select("url", "html")
                    .persist()
                )
            pages = self._pages_cache
            # persist hits: it feeds both the union and the miss anti-join —
            # without this the big page-store probe runs twice per round
            hits = (
                pages.join(F.broadcast(dequeued), "url", "inner")
                .select(*dequeued.columns, "html")
                .persist()
            )
            self._round_handles.append(hits)
            misses = dequeued.join(
                F.broadcast(hits.select("url")), "url", "left_anti"
            ).withColumn("html", F.lit(None).cast("binary"))
            return hits.unionByName(misses)
        from spider_spark.engine.fetch import (
            PagesTableTransport,
            fetch_map_in_pandas,
        )

        path = self.pages_path
        fetched = fetch_map_in_pandas(
            dequeued, lambda: PagesTableTransport(path), retries=3
        ).select("url", "html")
        return dequeued.join(fetched, "url", "left")

    # ---------- one round ----------
    def run_round(self, r: int, next_seq: int) -> dict:
        import time as _time

        timings: dict[str, float] = {}

        def _mark(key: str, t0: float) -> float:
            t1 = _time.time()
            timings[key] = round(t1 - t0, 2)
            return t1

        t = _time.time()
        pending = self.spark.read.parquet(self._path("state", r - 1))
        dequeued = self._dequeue(pending).persist()

        fetched = self._fetch(dequeued).persist()
        ok = fetched.filter(F.col("html").isNotNull())
        miss = fetched.filter(F.col("html").isNull())

        # --- extract (Arrow UDFs), html dropped immediately: only text/links
        #     flow further, never page bytes. Explicit repartition on url:
        #     the broadcast fetch preserves the page store's layout, where
        #     one host's pages are contiguous — without this, a hot host's
        #     whole round lands in one task and the UDF stage stragglers.
        enriched = (
            ok.repartition(self.n_partitions, "url")
            .withColumn("tl", extract_text_links_udf("html", "url"))
            .withColumn("text", F.col("tl.text"))
            .withColumn("links", F.col("tl.links"))
            .drop("html", "tl")
            .persist()
        )

        # --- crawl-order seq (pure function of data): rank only the slim
        #     (priority, discovery_time, url) projection, broadcast it back —
        #     text/links are never range-shuffled
        slim = enriched.select("priority", "discovery_time", "url")
        with_seq_slim, seq_handle, seq_end = assign_global_seq(
            slim,
            ["priority", "discovery_time", "url"],
            next_seq,
            self.n_partitions,
        )
        t = _mark("seq_counts", t)
        results = enriched.join(
            F.broadcast(with_seq_slim.select("url", "seq")), "url"
        ).select(
            "url",
            "seq",
            "text",
            F.size("links").alias("n_links"),
            F.col("priority").alias("fetch_priority"),
        )
        results.write.mode("overwrite").parquet(self._path("results", r))
        n_fetched = seq_end - next_seq  # from assign_global_seq's count pass
        t = _mark("fetch_extract_write", t)

        # --- discovered links → min(parent prio)+1, dedup vs seen
        links = (
            enriched.select(
                F.explode("links").alias("url"),
                (F.col("priority") + 1).alias("p"),
            )
            .groupBy("url")
            .agg(F.min("p").cast("int").alias("priority"))
        )
        seen_all = self._read_delta_table("seen_delta", r - 1).select("url")
        blob = None
        if self.use_bloom:
            blob_rows = (
                self._read_delta_table("seen_blob", r - 1)
                .select("filter_blob")
                .collect()
            )
            blob = seen_mod.bloom_merge([row["filter_blob"] for row in blob_rows])
        new_urls = (
            seen_mod.dedup_new_urls(links, seen_all, blob)
            .withColumn("host", host_col("url"))
        )
        new_flagged = with_robots(new_urls, self.robots, self.policy).persist()
        new_frontier = new_flagged.filter(~F.col("blocked")).select(
            "url",
            "host",
            F.hash("host").alias("host_hash"),
            "priority",
            F.lit(r).alias("discovery_time"),
            F.lit(0).alias("retries"),
        )
        seen_delta = new_flagged.select(
            "url",
            F.when(F.col("blocked"), F.lit("blocked"))
            .otherwise(F.lit("frontier"))
            .alias("disposition"),
        )
        seen_delta.write.mode("overwrite").parquet(self._path("seen_delta", r))
        if self.use_bloom:
            seen_mod.build_blobs(
                seen_delta.select("url"), self.n_partitions
            ).write.mode("overwrite").parquet(self._path("seen_blob", r))
        t = _mark("links_seen_write", t)
        if self.bench_mode:
            n_new = n_blocked = -1
        else:
            disp_counts = {
                row["blocked"]: row["c"]
                for row in new_flagged.groupBy("blocked").agg(
                    F.count("*").alias("c")
                ).collect()
            }
            n_new = disp_counts.get(False, 0)
            n_blocked = disp_counts.get(True, 0)

        # --- retry / dead accounting (reference: failed_urls drain +
        #     dead_link tally, suplicmap_vector2.py:131-142,155-158)
        retry_rows = (
            miss.filter(F.col("retries") + 1 <= self.policy.max_retries)
            .select(
                "url", "host", "host_hash", "priority", "discovery_time",
                (F.col("retries") + 1).alias("retries"),
            )
        )
        dead_rows = None
        if self.bench_mode:
            n_dead = -1
        else:
            dead_rows = miss.filter(
                F.col("retries") + 1 > self.policy.max_retries
            ).select("url").persist()
            dead_rows.write.mode("overwrite").parquet(self._path("dead", r))
            n_dead = dead_rows.count()

        # --- next frontier snapshot, co-partitioned by host_hash
        remaining = pending.join(dequeued.select("url"), "url", "left_anti")
        state_next = (
            remaining.select(*_STATE_COLS)
            .unionByName(retry_rows.select(*_STATE_COLS))
            .unionByName(new_frontier.select(*_STATE_COLS))
            .repartition(self.n_partitions, "host_hash")
            .persist()
        )
        state_next.write.mode("overwrite").parquet(self._path("state", r))
        t = _mark("state_write", t)

        n_pending = state_next.count()
        if self.bench_mode:
            n_dequeued = n_fetched
            n_failed = -1
        else:
            n_dequeued = dequeued.count()
            n_failed = n_dequeued - n_fetched
            metrics = self.spark.createDataFrame(
                [
                    (
                        r, n_dequeued, n_fetched, n_failed, n_new, n_blocked,
                        n_dead, n_pending,
                    )
                ],
                "round int, dequeued long, fetched long, failed long, "
                "new_urls long, blocked long, dead long, pending long",
            )
            metrics.write.mode("overwrite").parquet(self._path("metrics", r))
            # per-partition lineage (north-star: "per-partition lineage +
            # metrics"): which seen-partition produced how many pages/links
            # this round — the audit trail a resume/debug reads
            lineage = (
                enriched.select(
                    F.pmod(F.hash("url"), F.lit(self.n_partitions)).alias(
                        "partition_id"
                    ),
                    F.size("links").alias("n_links"),
                )
                .groupBy("partition_id")
                .agg(
                    F.count("*").alias("fetched"),
                    F.sum("n_links").alias("links_emitted"),
                )
            )
            lineage.write.mode("overwrite").parquet(self._path("lineage", r))

        timings["counts"] = round(_time.time() - t, 2)
        meta = {
            "round": r,
            "next_seq": seq_end,
            "pending": n_pending,
            "dequeued": n_dequeued,
            "fetched": n_fetched,
            "failed": n_failed,
            "new_urls": n_new,
            "blocked": n_blocked,
            "dead": n_dead,
            "timings": timings,
        }
        self._commit(r, meta)
        for h in (
            dequeued, fetched, enriched, new_flagged, seq_handle,
            dead_rows, state_next, *self._round_handles,
        ):
            if h is not None:
                h.unpersist()
        self._round_handles = []
        return meta

    # ---------- maintenance ----------
    def compact(self) -> dict:
        """Merge accumulated seen deltas and bloom blobs into the last
        committed round's directory and prune superseded frontier
        snapshots — the Iceberg-compaction analog that keeps per-round
        read fan-in O(1) instead of O(rounds).

        Crash-safe by idempotence: the compacted `round=last` directory is
        written first; duplicate URLs that would appear if a crash leaves
        older delta dirs behind are harmless (seen is used via anti-join,
        blobs via OR-merge)."""
        import shutil

        last = self.last_committed_round()
        if not last:
            return {"compacted": 0}
        seen = self._read_delta_table("seen_delta", last).select(
            "url", "disposition"
        )
        compacted_rows = seen.count()
        seen.coalesce(max(1, self.n_partitions // 4)).write.mode(
            "overwrite"
        ).parquet(self._path("seen_delta", last) + "_compact")
        if self.use_bloom:
            blob_rows = self._read_delta_table("seen_blob", last).collect()
            merged: dict[int, list] = {}
            for row in blob_rows:
                merged.setdefault(row["partition_id"], []).append(row)
            out = [
                (
                    pid,
                    sum(r["n_urls"] for r in rows),
                    seen_mod.bloom_merge([r["filter_blob"] for r in rows]),
                )
                for pid, rows in merged.items()
            ]
            self.spark.createDataFrame(
                out, "partition_id int, n_urls long, filter_blob binary"
            ).write.mode("overwrite").parquet(
                self._path("seen_blob", last) + "_compact"
            )
        # swap: compacted dir becomes round=last; older deltas removed
        for table in ("seen_delta",) + (("seen_blob",) if self.use_bloom else ()):
            for r in range(0, last + 1):
                shutil.rmtree(self._path(table, r), ignore_errors=True)
            os.replace(self._path(table, last) + "_compact", self._path(table, last))
        for r in range(0, last):  # only the newest frontier snapshot is live
            shutil.rmtree(self._path("state", r), ignore_errors=True)
        return {"compacted": compacted_rows, "upto_round": last}

    # ---------- driver loop ----------
    def run(self, seeds: DataFrame | None = None, max_rounds: int | None = None) -> dict:
        """Run rounds until the frontier drains (or ``max_rounds`` this
        call). Resumes from the last committed round automatically."""
        last = self.last_committed_round()
        if last is None:
            if seeds is None:
                raise ValueError("fresh checkpoint dir needs a seeds DataFrame")
            meta = self.init_seeds(seeds)
            last = 0
        else:
            meta = self._read_commit(last)
        budget = max_rounds if max_rounds is not None else self.policy.max_rounds
        r = last + 1
        executed = 0
        while executed < budget and r <= self.policy.max_rounds and meta["pending"] > 0:
            meta = self.run_round(r, meta["next_seq"])
            executed += 1
            r += 1
        return meta

    # ---------- readers for verification ----------
    def results(self) -> DataFrame:
        last = self.last_committed_round() or 0
        return self._read_delta_table("results", last)

    def seen(self) -> DataFrame:
        last = self.last_committed_round() or 0
        return self._read_delta_table("seen_delta", last)

    def dead(self) -> DataFrame:
        last = self.last_committed_round() or 0
        df = self._read_delta_table("dead", last)
        return df

    def metrics(self) -> DataFrame:
        last = self.last_committed_round() or 0
        return self._read_delta_table("metrics", last)
