"""CrawlEngine: the distributed crawl-round loop.

One round = one Spark job DAG (SURVEY.md §3.1 engine equivalent):

    pending frontier ──salted top-K per host (politeness budget)──►
    fetch (co-partitioned page-store join | broadcast probe | mapInPandas) ──►
    extract_text / extract_links (Arrow UDFs) ──►
    link dedup vs seen (partition-wise bloom pre-screen + exact left_anti) ──►
    atomic commit: results Δ + seen Δ + dead Δ + metrics Δ + frontier snapshot

Semantics are the oracle contract in spider_spark/oracle.py — byte-for-byte:
crawl order is a pure function of (round, priority, discovery_time, url),
never of scheduling, so the distributed run reproduces the single-threaded
reference ordering exactly (north_rule).

Scale notes (designed for 10^10-URL frontier / 1000 executors):
- Hot-host skew: the per-host top-K dequeue is TWO-stage — stage 1 ranks
  within (host, salt) buckets (32 salts) and keeps ≤ max_per_host per
  bucket, so no single task ever sees a whole hot host's pending set;
  stage 2 ranks the ≤ 32·K survivors per host. The politeness budget then
  caps per-host work per round, so fetch/extract stages are skew-free by
  construction.
- Global crawl-order seq is NOT materialized per round. It is a pure
  function of the stored data — rank over (round, priority,
  discovery_time, url) — assigned lazily by ``results()`` with a
  range-partitioned two-phase rank (no single-partition window). This
  removes three per-round serial costs a 1000-executor round would also
  pay on the driver: the range-partitioner sampling pass, the per-round
  count collect, and a broadcast of the round's full URL set.
- The page store is cached hash-partitioned AND sorted on url, so the
  per-round fetch join shuffles only the (budget-bounded, small) dequeued
  side — the Iceberg analog is a page store bucketed+sorted by url, which
  makes this join co-located with zero page-store shuffle per round.
- One persist per round (``processed``: frontier cols + ok flag + text +
  links). Page html is never cached or shuffled past the extract UDF.
- Row counts for commit metadata come from parquet footer metadata of the
  files just written (driver-side, milliseconds) — not from extra Spark
  count jobs.
- All state tables are parquet laid out like Iceberg: append-only deltas
  partitioned by round= for seen/results/dead/metrics, snapshot-per-round
  for the (bounded) pending frontier; a JSON commit marker written LAST
  makes each round atomic — a killed job resumes from the last marker and
  simply overwrites any partial round directory (idempotent; hard part #3).
"""

from __future__ import annotations

import json
import os
import shutil

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


def parquet_rowcount(path: str) -> int:
    """Total rows of a written parquet dir from footer metadata only —
    a driver-side metadata read (the Iceberg-manifest analog), replacing a
    whole Spark count job per table per round."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def assign_global_seq(df: DataFrame, sort_cols: list[str], start: int, n_parts: int):
    """Dense global sequence over total order of ``sort_cols`` without a
    single-partition window: range-partition on the key, prefix-sum the
    per-partition counts on the driver, add offsets per partition.
    Returns (df_with_seq, persisted_handle, end) — caller unpersists the
    handle after consuming the output.
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
        bloom_partitions: int = 64,
        use_bloom: bool = True,
        fetch_mode: str = "join",  # "join" | "probe" | "mapinpandas"
        bench_mode: bool = False,
    ):
        """``bench_mode`` drops per-round observability writes (metrics,
        dead table, disposition counts) to measure steady-state crawl
        throughput; correctness-relevant state (results/seen/frontier) is
        untouched.

        ``fetch_mode``:
        - "join" (default): dequeued LEFT JOIN the page store cached
          hash-partitioned+sorted on url — only the small dequeued side
          shuffles per round (co-located-join scale pattern).
        - "probe": broadcast the dequeued URL set into the page-store scan
          (inner hits + anti-join misses) — for stores too large to keep
          partitioned-cached but cheap to re-scan with pushdown.
        - "mapinpandas": per-batch transport UDF (the real-HTTP slot).
        """
        assert fetch_mode in ("join", "probe", "mapinpandas")
        self.bench_mode = bench_mode
        self.spark = spark
        self.pages_path = pages_path
        self.robots_path = robots_path
        self.ckpt = checkpoint_dir
        self.policy = policy
        self.n_partitions = n_partitions
        # bloom blob keying must be STABLE across resumes even if the
        # engine is restarted with a different n_partitions — a blob built
        # under one key mod and probed under another would let the
        # pre-screen claim a seen URL is "definitely new" and skip the
        # exact confirm. The round-0 commit records the value; resume
        # overrides the constructor arg with the recorded one.
        self.bloom_partitions = bloom_partitions
        self.use_bloom = use_bloom
        self.fetch_mode = fetch_mode
        os.makedirs(os.path.join(self.ckpt, "commits"), exist_ok=True)
        self._recover_compaction()
        # adopt the blob keying recorded at round 0 (here, not in run(), so
        # direct run_round()/compact() callers get it too)
        if os.path.isfile(self._marker(0)):
            recorded = self._read_commit(0).get("bloom_partitions")
            if recorded:
                self.bloom_partitions = recorded
        # resolve the robots as-of view ONCE and cache the one-row-per-host
        # result: with_robots broadcasts it twice per round, and without
        # this every broadcast re-runs the max_by aggregation shuffle
        from spider_spark.engine.politeness import robots_asof

        self.robots = (
            robots_asof(spark.read.parquet(robots_path))
            .drop("fetched_ts")
            .persist()
        )
        # the page store is probed every round; cache it partitioned+sorted
        # on url so per-round joins are co-located (sandbox stand-in for an
        # Iceberg page store bucketed+sorted by url — real clusters don't
        # re-shuffle cold storage per round either)
        self._pages_cache: DataFrame | None = None
        self._round_handles: list[DataFrame] = []
        self._reader_handle: DataFrame | None = None

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
        flagged.count()  # materialize the canonicalize+robots pipeline once
        seen_delta = flagged.select(
            "url",
            F.when(F.col("blocked"), F.lit("blocked"))
            .otherwise(F.lit("frontier"))
            .alias("disposition"),
        )
        # independent writes off the cache → concurrent jobs (same pattern
        # as the round tail)
        from concurrent.futures import ThreadPoolExecutor

        writes = [
            lambda: pending.repartition(self.n_partitions, "host_hash")
            .write.mode("overwrite")
            .parquet(self._path("state", 0)),
            lambda: seen_delta.write.mode("overwrite").parquet(
                self._path("seen_delta", 0)
            ),
        ]
        if self.use_bloom:
            writes.append(
                lambda: seen_mod.build_blobs(
                    seen_delta.select("url"), self.bloom_partitions
                ).write.mode("overwrite").parquet(self._path("seen_blob", 0))
            )
        with ThreadPoolExecutor(max_workers=len(writes)) as ex:
            for fut in [ex.submit(w) for w in writes]:
                fut.result()
        n_pending = parquet_rowcount(self._path("state", 0))
        # seed-scale table: count blocked from the written file driver-side
        # rather than spending another Spark job
        import pyarrow.dataset as pa_ds

        n_blocked = (
            pa_ds.dataset(self._path("seen_delta", 0), format="parquet")
            .to_table(columns=["disposition"])
            .column("disposition")
            .to_pylist()
            .count("blocked")
        )
        flagged.unpersist()
        meta = {
            "round": 0,
            "next_seq": 0,
            "pending": n_pending,
            "blocked": n_blocked,
            "bloom_partitions": self.bloom_partitions,
        }
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
    def _pages(self) -> DataFrame:
        if self._pages_cache is None:
            self._pages_cache = (
                self.spark.read.parquet(self.pages_path)
                .select("url", "html")
                .repartition(self.n_partitions, "url")
                .sortWithinPartitions("url")
                .persist()
            )
        return self._pages_cache

    def warm_page_store(self) -> int:
        """Materialize the partitioned+sorted page-store cache now (it is
        otherwise built lazily inside round 1). The store models data at
        rest — an Iceberg table bucketed+sorted by url in production, the
        web behind HTTP in a live crawl — so benchmarks call this before
        the timed window: the one-time bucketing shuffle of the synthetic
        stand-in is fixture prep, not per-round engine work. Returns the
        store row count (which forces the persist)."""
        return self._pages().count()

    def _fetch(self, dequeued: DataFrame) -> DataFrame:
        """Returns dequeued + html column (null = fetch miss)."""
        if self.fetch_mode == "join":
            # LEFT join against the partitioned+sorted cache: Catalyst sees
            # the cache's hash partitioning/ordering on url, so only the
            # dequeued side shuffles+sorts — the page store side streams
            # from cache with no exchange (asserted in tests).
            return dequeued.join(self._pages(), "url", "left")
        if self.fetch_mode == "probe":
            pages = (
                self.spark.read.parquet(self.pages_path).select("url", "html")
            )
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

    def _process(self, dequeued: DataFrame) -> DataFrame:
        """dequeued → frontier cols + ok flag + extracted text/links.
        Page html exists only inside this plan segment — it is neither
        persisted nor shuffled downstream of the extract UDF."""
        fetched = self._fetch(dequeued)
        if self.fetch_mode != "join":
            # the probe path preserves the page store's physical layout,
            # where one host's pages are contiguous — rebalance before the
            # UDF so a hot host's round doesn't straggle in one task. (The
            # join path is already hash-partitioned on url by the join.)
            fetched = fetched.repartition(self.n_partitions, "url")
        return fetched.withColumn(
            "tl", extract_text_links_udf("html", "url")
        ).select(
            *_STATE_COLS,
            F.col("html").isNotNull().alias("ok"),
            F.col("tl.text").alias("text"),
            F.col("tl.links").alias("links"),
        )

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
        processed = self._process(dequeued).persist()
        ok = processed.filter(F.col("ok"))
        miss = processed.filter(~F.col("ok"))

        # --- job 1 (the round's heavy job): dequeue→fetch→extract→write.
        #     No seq column: global crawl order is a pure function of
        #     (round, priority, discovery_time, url), assigned at read time
        #     by results(). This write also populates both caches.
        ok.select(
            "url",
            "priority",
            "discovery_time",
            "text",
            F.size("links").alias("n_links"),
            F.col("priority").alias("fetch_priority"),
        ).write.mode("overwrite").parquet(self._path("results", r))
        n_fetched = parquet_rowcount(self._path("results", r))
        t = _mark("fetch_extract_write", t)

        # --- discovered links → min(parent prio)+1, dedup vs seen
        exploded = ok.select(
            F.explode("links").alias("url"),
            (F.col("priority") + 1).alias("p"),
        )
        if self.policy.trap_filter:
            # trap-shaped links die BEFORE the seen set (urlfilter.py):
            # pure column math fused into this projection, mirrored
            # exactly by the oracle's is_trap_url
            from spider_spark.engine.urlfilter import drop_traps

            exploded = drop_traps(exploded)
        links = exploded.groupBy("url").agg(
            F.min("p").cast("int").alias("priority")
        )
        seen_all = self._read_delta_table("seen_delta", r - 1).select("url")
        blobs_df = (
            self._read_delta_table("seen_blob", r - 1) if self.use_bloom else None
        )
        new_urls = seen_mod.dedup_new_urls(
            links, seen_all, blobs_df=blobs_df,
            n_partitions=self.bloom_partitions,
        ).withColumn("host", host_col("url"))
        new_flagged = with_robots(new_urls, self.robots, self.policy).persist()
        new_frontier = new_flagged.filter(~F.col("blocked")).select(
            "url",
            "host",
            F.hash("host").alias("host_hash"),
            "priority",
            F.lit(r).alias("discovery_time"),
            F.lit(0).alias("retries"),
        )
        # materialize the links→dedup→robots pipeline once; the writes below
        # all read this cache
        new_flagged.count()
        t = _mark("links_dedup", t)

        seen_delta = new_flagged.select(
            "url",
            F.when(F.col("blocked"), F.lit("blocked"))
            .otherwise(F.lit("frontier"))
            .alias("disposition"),
        )
        # --- retry / dead accounting (reference: failed_urls drain +
        #     dead_link tally, suplicmap_vector2.py:131-142,155-158)
        retry_rows = (
            miss.filter(F.col("retries") + 1 <= self.policy.max_retries)
            .select(
                "url", "host", "host_hash", "priority", "discovery_time",
                (F.col("retries") + 1).alias("retries"),
            )
        )
        # --- next frontier snapshot, co-partitioned by host_hash
        remaining = pending.join(dequeued.select("url"), "url", "left_anti")
        state_next = (
            remaining.select(*_STATE_COLS)
            .unionByName(retry_rows.select(*_STATE_COLS))
            .unionByName(new_frontier.select(*_STATE_COLS))
            .repartition(self.n_partitions, "host_hash")
        )

        # --- commit writes: mutually independent (all inputs are cached or
        #     on disk), so submit them as CONCURRENT Spark jobs — the
        #     scheduler interleaves their small stages instead of paying
        #     each job's submission/commit latency serially. On a real
        #     cluster these are concurrent Iceberg appends to different
        #     tables.
        from concurrent.futures import ThreadPoolExecutor

        writes = {
            "seen_delta": lambda: seen_delta.write.mode("overwrite").parquet(
                self._path("seen_delta", r)
            ),
            "state": lambda: state_next.write.mode("overwrite").parquet(
                self._path("state", r)
            ),
        }
        if self.use_bloom:
            writes["seen_blob"] = lambda: seen_mod.build_blobs(
                seen_delta.select("url"), self.bloom_partitions
            ).write.mode("overwrite").parquet(self._path("seen_blob", r))
        if not self.bench_mode:
            dead_rows = miss.filter(
                F.col("retries") + 1 > self.policy.max_retries
            ).select("url")
            writes["dead"] = lambda: dead_rows.write.mode("overwrite").parquet(
                self._path("dead", r)
            )
        with ThreadPoolExecutor(max_workers=len(writes)) as ex:
            futures = {k: ex.submit(fn) for k, fn in writes.items()}
            for k, fut in futures.items():
                fut.result()
        n_pending = parquet_rowcount(self._path("state", r))
        if self.bench_mode:
            n_new = n_blocked = -1
            n_dead = -1
        else:
            disp_counts = {
                row["blocked"]: row["c"]
                for row in new_flagged.groupBy("blocked").agg(
                    F.count("*").alias("c")
                ).collect()
            }
            n_new = disp_counts.get(False, 0)
            n_blocked = disp_counts.get(True, 0)
            n_dead = parquet_rowcount(self._path("dead", r))
        t = _mark("parallel_writes", t)

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
                ok.select(
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
            "next_seq": next_seq + n_fetched,
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
        for h in (dequeued, processed, new_flagged, *self._round_handles):
            if h is not None:
                h.unpersist()
        self._round_handles = []
        return meta

    # ---------- maintenance ----------
    def _staging(self, table: str) -> str:
        # dot-prefixed: invisible to Spark/Hadoop partition discovery, so a
        # half-written staging dir can never corrupt a concurrent read
        return os.path.join(self.ckpt, table, ".compact_staging")

    def _compact_marker(self) -> str:
        return os.path.join(self.ckpt, "commits", "compact.json")

    def _finish_compaction(self, plan: dict) -> None:
        """Apply a committed compaction plan. Idempotent: safe to re-run
        from any point after the marker exists."""
        last = plan["last"]
        for table in plan["tables"]:
            staging = self._staging(table)
            if os.path.isdir(staging):
                for r in range(0, last + 1):
                    shutil.rmtree(self._path(table, r), ignore_errors=True)
                os.replace(staging, self._path(table, last))
        for r in range(0, last):  # only the newest frontier snapshot is live
            shutil.rmtree(self._path("state", r), ignore_errors=True)
        os.remove(self._compact_marker())

    def _recover_compaction(self) -> None:
        """Crash recovery at engine start: a compact marker means staged
        data is complete — finish the swap; staging without a marker means
        the compaction never committed — discard it (originals intact)."""
        marker = self._compact_marker()
        if os.path.isfile(marker):
            with open(marker) as f:
                self._finish_compaction(json.load(f))
            return
        for table in ("seen_delta", "seen_blob"):
            shutil.rmtree(self._staging(table), ignore_errors=True)

    def compact(self) -> dict:
        """Merge accumulated seen deltas and bloom blobs into the last
        committed round's directory and prune superseded frontier
        snapshots — the Iceberg-compaction analog that keeps per-round
        read fan-in O(1) instead of O(rounds).

        Crash-safe commit protocol: (1) write compacted data to
        dot-prefixed staging dirs (invisible to readers, originals
        untouched); (2) atomically write a compact marker — the commit
        point; (3) swap staging into place and delete superseded round
        dirs. A crash before (2) discards staging on next start; a crash
        after (2) is finished idempotently on next start."""
        last = self.last_committed_round()
        if last is None:  # round 0 (seeds committed) still compacts deltas
            return {"compacted": 0}
        tables = ["seen_delta"] + (["seen_blob"] if self.use_bloom else [])
        seen = self._read_delta_table("seen_delta", last).select(
            "url", "disposition"
        )
        compacted_rows = seen.count()
        seen.coalesce(max(1, self.n_partitions // 4)).write.mode(
            "overwrite"
        ).parquet(self._staging("seen_delta"))
        if self.use_bloom:
            # one blob per partition_id, OR-merged executor-side per group
            seen_mod.merge_blob_rounds(
                self._read_delta_table("seen_blob", last)
            ).write.mode("overwrite").parquet(self._staging("seen_blob"))
        plan = {"last": last, "tables": tables}
        tmp = self._compact_marker() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(plan, f)
        os.replace(tmp, self._compact_marker())  # commit point
        self._finish_compaction(plan)
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
            if os.path.isfile(self._marker(0)):
                recorded = self._read_commit(0).get("bloom_partitions")
                if recorded:
                    self.bloom_partitions = recorded
            if self.use_bloom:
                self._ensure_blob_coverage(last)
        budget = max_rounds if max_rounds is not None else self.policy.max_rounds
        r = last + 1
        executed = 0
        while executed < budget and r <= self.policy.max_rounds and meta["pending"] > 0:
            meta = self.run_round(r, meta["next_seq"])
            executed += 1
            r += 1
        return meta

    def _ensure_blob_coverage(self, last: int) -> None:
        """Partition-wise probing makes blob COVERAGE correctness-critical:
        a seen URL absent from its partition's blobs would be declared
        "definitely new" and skip the exact confirm (duplicate crawl). A
        committed round can legitimately lack a blob dir — earlier rounds
        run with use_bloom=False, or a checkpoint from before blobs
        existed — so on resume, backfill blobs for any such round from its
        seen_delta (idempotent: blobs are a pure function of the delta)."""
        for r in range(0, last + 1):
            if os.path.isdir(self._path("seen_delta", r)) and not os.path.isdir(
                self._path("seen_blob", r)
            ):
                delta = self.spark.read.parquet(self._path("seen_delta", r))
                seen_mod.build_blobs(
                    delta.select("url"), self.bloom_partitions
                ).write.mode("overwrite").parquet(self._path("seen_blob", r))

    # ---------- readers for verification ----------
    def results(self, as_of_round: int | None = None) -> DataFrame:
        """Crawled pages with their global crawl-order ``seq`` — assigned
        here (rank over (round, priority, discovery_time, url), the oracle's
        exact order) rather than stored, so every round avoids a global
        ordering barrier. Output schema is stable across calls.

        ``as_of_round`` is the Iceberg-snapshot-read analog: every table in
        the checkpoint is round-partitioned deltas under an atomic commit
        marker, so "the results as of committed round r" is just the delta
        union filtered to ``round <= r`` — no stored snapshot needed, and
        the crawl-order ``seq`` of a page never changes once its round is
        committed (the sort key is (round, priority, discovery_time, url),
        all frozen at commit), so a time-travel read is a strict prefix of
        the live read."""
        last = self._resolve_round(as_of_round)
        df = self._read_delta_table("results", last)
        if df is None:
            return None
        # rank ONLY the slim sort-key projection — the text column never
        # enters the range shuffle or the persisted handle; it joins back
        # on url (unique) afterwards
        slim = df.select("round", "priority", "discovery_time", "url")
        with_seq, handle, _end = assign_global_seq(
            slim, ["round", "priority", "discovery_time", "url"], 0,
            self.n_partitions,
        )
        if self._reader_handle is not None:
            self._reader_handle.unpersist()
        self._reader_handle = handle
        return df.join(with_seq.select("url", "seq"), "url").select(
            "url", "seq", "text", "n_links", "fetch_priority", "round"
        )

    def _resolve_round(self, as_of_round: int | None) -> int:
        """Validate a time-travel target: it must be a COMMITTED round (a
        marker exists), else the read would see a torn, uncommitted delta."""
        last = self.last_committed_round() or 0
        if as_of_round is None:
            return last
        if as_of_round < 0 or as_of_round > last:
            raise ValueError(
                f"round {as_of_round} is not committed (last={last})"
            )
        return as_of_round

    def seen(self, as_of_round: int | None = None) -> DataFrame:
        return self._read_delta_table(
            "seen_delta", self._resolve_round(as_of_round)
        )

    def dead(self, as_of_round: int | None = None) -> DataFrame:
        df = self._read_delta_table("dead", self._resolve_round(as_of_round))
        return df

    def metrics(self, as_of_round: int | None = None) -> DataFrame:
        return self._read_delta_table(
            "metrics", self._resolve_round(as_of_round)
        )

    def lineage(self, as_of_round: int | None = None) -> DataFrame:
        return self._read_delta_table(
            "lineage", self._resolve_round(as_of_round)
        )

    def frontier_at(self, as_of_round: int | None = None) -> DataFrame:
        """The pending frontier exactly as committed at round r — the one
        table stored as a per-round SNAPSHOT rather than deltas (the
        frontier shrinks as well as grows, so a delta union can't replay
        it). Compaction prunes superseded snapshots to keep the
        checkpoint O(live-frontier)-sized, so after ``compact()`` only the
        newest round remains time-travelable — same retention contract as
        expiring old Iceberg snapshots."""
        r = self._resolve_round(as_of_round)
        path = self._path("state", r)
        if not os.path.isdir(path):
            raise ValueError(
                f"frontier snapshot for round {r} was pruned by compaction"
            )
        return self.spark.read.parquet(path)
