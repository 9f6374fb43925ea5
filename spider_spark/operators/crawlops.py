"""Crawl-scheduling operators: the web-scale control loop the reference's
sequential fetch scripts imply but never need — freshness-aware recrawl
scheduling, registrable-domain (eTLD+1) rollups for per-site politeness
budgets, PageRank-driven frontier re-prioritization, and a quality-filter
cascade with reason attribution for the corpus the crawl feeds.

Provenance: the reference re-fetches a fixed ID universe every run
(/root/reference/suplicmap_vector.py:94-110 walks all windows each time;
/root/reference/suplicmap_tilemap.py:93-116 re-GETs every tile) — at
10^10-URL scale a crawler must instead decide *when* each page is worth
re-fetching (c1), budget per registered site rather than per hostname
(c2), order the frontier by authority rather than discovery order (c3),
watch what changed between snapshots (c4), watch discovery saturate
(c5), cap trap hosts (c6), and prove politeness after the fact (c7).
All queries follow the repo's float discipline: every
comparison and output is integer-exact, so JVM and DuckDB hash-agree with
no rounding margin to defend.

Fixture derivations are deterministic functions of existing columns (the
same pattern as :mod:`spider_spark.operators.graph`): synthetic fetch
observations from ``events`` via Spark ``hash()`` (reproduced bit-exactly
in DuckDB by :mod:`spider_spark.operators.sqlmurmur`), synthetic hostnames
from ``documents.source`` plus hash-chosen subdomain/public-suffix parts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_spark.operators import load, query
from spider_spark.operators.sqlmurmur import hashlong_aliases

# ---------------------------------------------------------------------------
# c1 — freshness-aware recrawl scheduling (Cho & Garcia-Molina, "Effective
# Page Refresh Policies for Web Crawlers", ACM TODS 28(4), 2003)
# ---------------------------------------------------------------------------

_C1_PAGES = 500
_C1_PPM = 1_000_000
# (ratio_ppm floor, tier, revisit hours) — highest floor wins.
_C1_TIERS = (
    (400_000, "hot", 1),
    (200_000, "warm", 6),
    (50_000, "cool", 24),
    (0, "cold", 168),
)


def _c1_tier_case(col: str) -> str:
    """Shared CASE text (valid in both Spark SQL and DuckDB)."""
    arms = " ".join(
        f"WHEN {col} >= {floor} THEN '{name}'" for floor, name, _ in _C1_TIERS[:-1]
    )
    return f"CASE {arms} ELSE '{_C1_TIERS[-1][1]}' END"


def _c1_hours_case(col: str) -> str:
    arms = " ".join(
        f"WHEN '{name}' THEN {hours}" for _, name, hours in _C1_TIERS[:-1]
    )
    return f"CASE {col} {arms} ELSE {_C1_TIERS[-1][2]} END"


_C1_ORACLE = f"""
WITH obs AS (
  SELECT ((ph % {_C1_PAGES}) + {_C1_PAGES}) % {_C1_PAGES} AS page_id,
         CASE WHEN ((ch % 5) + 5) % 5 = 0 THEN 1 ELSE 0 END AS changed,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM (SELECT ts, {hashlong_aliases("event_id", "42", "ph", "c1a")},
               {hashlong_aliases("event_id * 31 + 7", "42", "ch", "c1b")}
        FROM events)
), agg AS (
  SELECT page_id,
         count(*) AS n_fetches,
         sum(changed) AS n_changes,
         max(ts_s) AS last_seen_s
  FROM obs GROUP BY page_id
), rated AS (
  SELECT *, CAST(({_C1_PPM} * n_changes) // n_fetches AS BIGINT)
              AS change_ppm FROM agg
), tiered AS (
  SELECT *, {_c1_tier_case("change_ppm")} AS revisit_tier FROM rated
)
SELECT page_id, n_fetches, CAST(n_changes AS BIGINT) AS n_changes,
       change_ppm, revisit_tier,
       CAST({_c1_hours_case("revisit_tier")} AS BIGINT) AS revisit_hours,
       last_seen_s + 3600 * {_c1_hours_case("revisit_tier")} AS next_due_s
FROM tiered
"""


def c1_observations(e):
    """(page_id, changed, ts_s) fetch observations derived from an events
    DataFrame — shared by the batch scheduler below and the streaming
    incremental updater (streaming/schedule_stream.py), so stream⇄batch
    parity is definitional."""
    return e.select(
        F.pmod(F.hash("event_id"), F.lit(_C1_PAGES)).alias("page_id"),
        F.when(F.pmod(F.hash(F.expr("event_id * 31 + 7")), F.lit(5)) == 0, 1)
        .otherwise(0)
        .alias("changed"),
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_s"),
    )


def schedule_from_obs_agg(agg):
    """Tier + due-time columns over a (page_id, n_fetches, n_changes,
    last_seen_s) aggregate — the post-aggregation half of c1, shared with
    the streaming updater's merge-on-read compaction."""
    rated = agg.withColumn(
        "change_ppm", F.expr(f"({_C1_PPM} * n_changes) div n_fetches")
    )
    tiered = rated.withColumn(
        "revisit_tier", F.expr(_c1_tier_case("change_ppm"))
    )
    hours = F.expr(_c1_hours_case("revisit_tier"))
    return tiered.select(
        "page_id",
        "n_fetches",
        "n_changes",
        "change_ppm",
        "revisit_tier",
        hours.cast("long").alias("revisit_hours"),
        (F.col("last_seen_s") + F.lit(3600) * hours).alias("next_due_s"),
    )


@query("c1_recrawl_schedule", _C1_ORACLE)
def c1_recrawl_schedule(spark, sf_dir):
    """Freshness-aware recrawl scheduling (Cho & Garcia-Molina 2003): each
    fetch observation of a page either saw it changed or unchanged; the
    empirical change ratio (scaled to ppm — exact integer division, no
    Poisson log needed for a *relative* schedule) buckets the page into a
    revisit tier, and next-due = last observation + the tier's interval.
    Observations are derived deterministically from ``events``: page =
    pmod(hash(event_id), 500) and changed = pmod(hash(event_id*31+7),
    5) = 0 — both murmur3, reproduced bit-exactly in the DuckDB oracle.

    Scale shape (10^10 URLs): one map-side-combinable groupBy on page_id
    (count/sum/max all partial-aggregate before the exchange); tiering and
    due-time are per-row column CASEs after the agg — zero further
    shuffles. The schedule table this emits is exactly what the engine's
    frontier would consume as its priority column on re-enqueue.
    """
    obs = c1_observations(load(spark, sf_dir, "events"))
    agg = obs.groupBy("page_id").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum("changed").cast("long").alias("n_changes"),
        F.max("ts_s").alias("last_seen_s"),
    )
    return schedule_from_obs_agg(agg)


# ---------------------------------------------------------------------------
# c2 — registrable-domain (eTLD+1) rollup with an embedded public-suffix
# sample: per-site page/host counts for politeness budgeting
# ---------------------------------------------------------------------------

# Embedded sample of multi-label public suffixes (the PSL shape that makes
# naive "last two labels" wrong: co.uk is a *suffix*, not a site).
_C2_PSL2 = ("co.uk", "com.cn", "github.io")
_C2_SUBS = ("www", "cdn", "img", "a.b")  # a.b: multi-label subdomain
_C2_SUFFIXES = (".co.uk", ".com.cn", ".github.io", ".org", ".com")


def _case_from(col: str, choices: tuple[str, ...]) -> str:
    n = len(choices)
    arms = " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(choices[:-1])
    )
    return f"CASE (({col} % {n}) + {n}) % {n} {arms} ELSE '{choices[-1]}' END"


_C2_PSL_IN = ", ".join(f"'{s}'" for s in _C2_PSL2)

_C2_ORACLE = f"""
WITH hosts AS (
  SELECT doc_id,
         {_case_from("sh", _C2_SUBS)} || '.' || source
           || {_case_from("xh", _C2_SUFFIXES)} AS host
  FROM (SELECT doc_id, source,
               {hashlong_aliases("doc_id", "42", "sh", "c2a")},
               {hashlong_aliases("doc_id * 17 + 3", "42", "xh", "c2b")}
        FROM documents)
), parsed AS (
  SELECT host, string_split(host, '.') AS labels,
         len(string_split(host, '.')) AS n
  FROM hosts
), reg AS (
  SELECT host,
         array_to_string(
           labels[n - (CASE WHEN array_to_string(labels[n-1:n], '.')
                                 IN ({_C2_PSL_IN})
                            THEN 2 ELSE 1 END):n],
           '.') AS registrable_domain
  FROM parsed
)
SELECT registrable_domain,
       count(*) AS n_pages,
       count(DISTINCT host) AS n_hosts,
       min(host) AS min_host
FROM reg GROUP BY registrable_domain
"""


@query("c2_etld1_rollup", _C2_ORACLE)
def c2_etld1_rollup(spark, sf_dir):
    """Registrable-domain rollup: extract eTLD+1 from each hostname using
    an embedded public-suffix sample (``co.uk``-style multi-label suffixes
    make "last two labels" wrong — the exact mistake a per-host politeness
    budget at web scale cannot afford, since one registered site can spawn
    millions of hostnames). Hostnames are derived deterministically:
    hash-chosen subdomain (including a multi-label one) + ``source`` +
    hash-chosen suffix. Extraction sees only the final host string.

    Scale shape: per-row split/slice column math (no UDF), then ONE
    map-side-combinable groupBy on the registrable domain. The distinct-
    host count is exact here; at 10^10 rows you would swap it for
    ``approx_count_distinct`` (the a7 pattern) — the group key and shuffle
    shape are unchanged. In the live engine this feeds the politeness
    scheduler (engine/politeness.py) with per-*site* rather than per-host
    budgets."""
    d = load(spark, sf_dir, "documents")
    n_subs, n_suf = len(_C2_SUBS), len(_C2_SUFFIXES)
    sub = F.element_at(
        F.array(*[F.lit(s) for s in _C2_SUBS]),
        (F.pmod(F.hash("doc_id"), F.lit(n_subs)) + 1).cast("int"),
    )
    suf = F.element_at(
        F.array(*[F.lit(s) for s in _C2_SUFFIXES]),
        (F.pmod(F.hash(F.expr("doc_id * 17 + 3")), F.lit(n_suf)) + 1).cast(
            "int"
        ),
    )
    hosts = d.select(
        F.concat(sub, F.lit("."), F.col("source"), suf).alias("host")
    )
    labels = F.split("host", "\\.")
    psl_in = ", ".join(f"'{s}'" for s in _C2_PSL2)
    parsed = hosts.select(
        "host",
        labels.alias("labels"),
        F.expr(
            "CASE WHEN array_join(slice(split(host, '\\\\.'), -2, 2), '.')"
            f" IN ({psl_in}) THEN 3 ELSE 2 END"
        ).alias("keep"),
    )
    reg = parsed.select(
        "host",
        F.array_join(
            F.expr("slice(labels, -keep, keep)"), "."
        ).alias("registrable_domain"),
    )
    return reg.groupBy("registrable_domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("host").alias("n_hosts"),
        F.min("host").alias("min_host"),
    )


# ---------------------------------------------------------------------------
# c3 — PageRank-driven frontier re-prioritization: authority-first ordering
# ---------------------------------------------------------------------------


def _c3_oracle() -> str:
    from spider_spark.operators import graph

    return f"""
WITH ranks AS (SELECT * FROM ({graph._oracle().strip()}) g1),
tiers AS (
  SELECT source, ntile(4) OVER (ORDER BY pr DESC, source) AS host_tier
  FROM ranks
),
frontier AS (
  SELECT doc_id, source,
         ((dh % 6) + 6) % 6 AS depth,
         ((th % 10000) + 10000) % 10000 AS tie
  FROM (SELECT doc_id, source,
               {hashlong_aliases("doc_id", "42", "dh", "c3a")},
               {hashlong_aliases("doc_id * 13 + 5", "42", "th", "c3b")}
        FROM documents)
)
SELECT f.source || '/page/' || f.doc_id AS url,
       f.source, f.depth, CAST(t.host_tier AS BIGINT) AS host_tier,
       CAST(t.host_tier * 1000000 + f.depth * 10000 + f.tie AS BIGINT)
         AS priority
FROM frontier f JOIN tiers t ON t.source = f.source
"""


@query("c3_frontier_reprioritize", _c3_oracle())
def c3_frontier_reprioritize(spark, sf_dir):
    """Authority-first frontier ordering: re-key every queued URL by
    (host PageRank quartile, crawl depth, hash tiebreak) — the OPIC/
    authority-ordered crawl policy (Cho, Garcia-Molina & Page 1998,
    "Efficient Crawling Through URL Ordering") expressed as a join of the
    g1 fixed-point PageRank onto the frontier. The reference crawls in
    literal ID order; a 10^10-URL frontier crawls important sites first.

    Scale shape: ranks/tiers live at host cardinality and the quartile
    assignment is the two-phase ntile (scalewin.py), so no
    single-partition window exists at any host count; the frontier-sized
    work is a single broadcast hash join plus per-row integer column
    math. The composite priority is exactly the engine's dequeue key
    shape (engine/crawler.py salted top-K per host), so this plugs in as
    the priority recompute step between crawl rounds — integer-exact,
    hash-stable across engines."""
    from spider_spark.operators.graph import g1_host_pagerank
    from spider_spark.operators.scalewin import two_phase_ntile

    ranks = g1_host_pagerank(spark, sf_dir)
    tiers = two_phase_ntile(
        ranks.select("source", "pr"),
        [("pr", True), ("source", False)],
        4,
        "host_tier",
    ).select("source", "host_tier")
    d = load(spark, sf_dir, "documents")
    frontier = d.select(
        "doc_id",
        "source",
        F.pmod(F.hash("doc_id"), F.lit(6)).alias("depth"),
        F.pmod(F.hash(F.expr("doc_id * 13 + 5")), F.lit(10000)).alias("tie"),
    )
    return frontier.join(F.broadcast(tiers), "source").select(
        F.concat_ws("/", F.col("source"), F.lit("page"), F.col("doc_id")).alias(
            "url"
        ),
        "source",
        "depth",
        F.col("host_tier").cast("long").alias("host_tier"),
        (
            F.col("host_tier").cast("long") * 1_000_000
            + F.col("depth") * 10_000
            + F.col("tie")
        ).alias("priority"),
    )


# ---------------------------------------------------------------------------
# t27 — quality-filter cascade with reason attribution (first failing rule)
# ---------------------------------------------------------------------------

_T27_STOPS = ("the", "a", "and", "of", "to")
_T27_STOP_IN = ", ".join(f"'{s}'" for s in _T27_STOPS)

_T27_ORACLE = f"""
WITH feats AS (
  SELECT doc_id, n_chars,
         len(toks) AS n_toks,
         len(list_distinct(toks)) AS n_distinct,
         list_sum(list_transform(toks, x -> len(x))) AS sum_len,
         len(list_filter(toks, x -> x IN ({_T27_STOP_IN}))) AS stop_hits
  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
        FROM documents)
), judged AS (
  SELECT doc_id, n_toks, n_distinct, stop_hits,
         CASE WHEN n_chars < 80 THEN 'min_length'
              WHEN n_toks < 15 THEN 'min_words'
              WHEN 10 * sum_len < 20 * n_toks
                   OR 10 * sum_len > 120 * n_toks THEN 'word_length'
              WHEN stop_hits < 2 THEN 'stopword'
              WHEN 10 * n_distinct < 3 * n_toks THEN 'diversity'
              ELSE 'kept' END AS reason
  FROM feats
)
SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(stop_hits AS BIGINT) AS stop_hits, reason,
       reason = 'kept' AS kept
FROM judged
"""


@query("t27_filter_cascade", _T27_ORACLE)
def t27_filter_cascade(spark, sf_dir):
    """Quality-filter cascade with reason attribution: the C4/Gopher-style
    keep/drop decision (t3/t17 compute scores; production filters log WHY
    each document fell) — rules fire in a fixed order and the verdict is
    the FIRST failing rule, giving the per-reason drop histogram every
    corpus-curation run reports (cf. RefinedWeb, arXiv:2306.01116 §3,
    whose pipeline tables report exactly these stage-attrition counts).

    Rules (all integer-exact): min length, min word count, mean word
    length in [2, 12] (compared as 10·Σlen vs 20·n and 120·n — no
    division), ≥2 stopword hits, distinct-token fraction ≥ 0.3 (10·d vs
    3·n). Scale shape: per-row higher-order column math, zero exchanges —
    the whole cascade is one scan and widens no shuffle anywhere; the
    downstream drop histogram is a tiny groupBy(reason) count."""
    d = load(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        "n_chars",
        F.expr("size(split(text, ' '))").alias("n_toks"),
        F.expr("size(array_distinct(split(text, ' ')))").alias("n_distinct"),
        F.expr(
            "aggregate(split(text, ' '), 0L, (acc, x) -> acc + length(x))"
        ).alias("sum_len"),
        F.expr(
            f"size(filter(split(text, ' '), x -> x IN ({_T27_STOP_IN})))"
        ).alias("stop_hits"),
    )
    judged = feats.withColumn(
        "reason",
        F.expr(
            """CASE WHEN n_chars < 80 THEN 'min_length'
                    WHEN n_toks < 15 THEN 'min_words'
                    WHEN 10 * sum_len < 20 * n_toks
                         OR 10 * sum_len > 120 * n_toks THEN 'word_length'
                    WHEN stop_hits < 2 THEN 'stopword'
                    WHEN 10 * n_distinct < 3 * n_toks THEN 'diversity'
                    ELSE 'kept' END"""
        ),
    )
    return judged.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("stop_hits").cast("long").alias("stop_hits"),
        "reason",
        (F.col("reason") == "kept").alias("kept"),
    )


# ---------------------------------------------------------------------------
# w9 — host concentration (Lorenz curve): how skewed the corpus is
# ---------------------------------------------------------------------------

_W9_ORACLE = """
WITH per AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS host_bytes
  FROM documents GROUP BY source
), tot AS (SELECT sum(host_bytes) AS t FROM per)
SELECT p.source, p.host_bytes,
       CAST(row_number() OVER (ORDER BY p.host_bytes DESC, p.source)
            AS BIGINT) AS rk,
       CAST((1000000 * sum(p.host_bytes) OVER (
              ORDER BY p.host_bytes DESC, p.source
              ROWS UNBOUNDED PRECEDING)) // tot.t AS BIGINT) AS cum_ppm
FROM per p CROSS JOIN tot
"""


@query("w9_host_concentration", _W9_ORACLE)
def w9_host_concentration(spark, sf_dir):
    """Host concentration curve (Lorenz): rank hosts by total bytes and
    report each rank's cumulative corpus share in exact ppm — the skew
    diagnostic that tells a crawl operator "the top 40 hosts are 80 % of
    the corpus", which is precisely the hot-host condition the engine's
    salted dequeue (O5) and AQE skew handling exist for.

    Scale shape: the corpus-sized work is ONE map-side-combinable
    groupBy(source) sum; the rank and the running share come from the
    two-phase cumulative sum (scalewin.py — per-partition local cumsums
    plus a driver prefix of the O(partitions) partition totals), so no
    single-partition window exists even at 10^8-host cardinality.
    Integer ppm floors keep the hash margin-free."""
    from spider_spark.operators.scalewin import two_phase_cumsum

    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("host_bytes")
    )
    tot = per.agg(F.sum("host_bytes").alias("t"))
    cum = two_phase_cumsum(
        per,
        [("host_bytes", True), ("source", False)],
        "host_bytes",
        "cum_bytes",
        out_idx="rk",
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "host_bytes",
            F.col("rk").cast("long").alias("rk"),
            F.expr("CAST((1000000 * cum_bytes) div t AS BIGINT)").alias(
                "cum_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# c4 — crawl snapshot diff: added / removed / changed / unchanged between
# two crawls of the same site (the change detector that FEEDS c1)
# ---------------------------------------------------------------------------

_C4_MOD = 20  # 1/20 of pages removed, 1/20 changed, 1/20 duplicated-as-new

_C4_ORACLE = f"""
WITH a AS (
  SELECT source || '/page/' || doc_id AS url, text FROM documents
), fate AS (
  SELECT source || '/page/' || doc_id AS url, text,
         ((fh % {_C4_MOD}) + {_C4_MOD}) % {_C4_MOD} AS f
  FROM (SELECT doc_id, source, text,
               {hashlong_aliases("doc_id * 7 + 1", "42", "fh", "c4")}
        FROM documents)
), b AS (
  SELECT url, CASE WHEN f = 1 THEN text || ' <updated>' ELSE text END AS text
  FROM fate WHERE f <> 0
  UNION ALL
  SELECT url || '?v=2', text FROM fate WHERE f = 2
), diff AS (
  SELECT CASE WHEN a.url IS NULL THEN 'added'
              WHEN b.url IS NULL THEN 'removed'
              WHEN a.text <> b.text THEN 'changed'
              ELSE 'unchanged' END AS status,
         COALESCE(a.url, b.url) AS url
  FROM a FULL OUTER JOIN b ON a.url = b.url
)
SELECT status, count(*) AS n_urls, min(url) AS min_url
FROM diff GROUP BY status
"""


@query("c4_snapshot_diff", _C4_ORACLE)
def c4_snapshot_diff(spark, sf_dir):
    """Crawl snapshot diff: FULL OUTER JOIN two crawls of the same site on
    url and classify every page added / removed / changed / unchanged —
    the change detector whose per-page verdicts are exactly the
    "changed?" observations c1's freshness scheduler consumes. The second
    snapshot is derived deterministically (hash fate per doc: 1/20
    removed, 1/20 text-mutated, 1/20 re-published under a ?v=2 url), so
    all four statuses occur on any fixture and both engines agree
    bit-for-bit (change detection is string equality, no content hash to
    keep in parity).

    Scale shape: ONE co-partitioned shuffle — the full outer join keys
    both snapshots on url; status is per-row CASE; the report is a
    4-key map-side-combinable groupBy. At 10^10 URLs you would bucket
    both snapshot tables by url so even that join is shuffle-free."""
    d = load(spark, sf_dir, "documents")
    url = F.concat_ws("/", F.col("source"), F.lit("page"), F.col("doc_id"))
    a = d.select(url.alias("url"), "text")
    fate = d.select(
        url.alias("url"),
        "text",
        F.pmod(F.hash(F.expr("doc_id * 7 + 1")), F.lit(_C4_MOD)).alias("f"),
    )
    b = (
        fate.filter(F.col("f") != 0)
        .select(
            "url",
            F.when(
                F.col("f") == 1, F.concat(F.col("text"), F.lit(" <updated>"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            fate.filter(F.col("f") == 2).select(
                F.concat(F.col("url"), F.lit("?v=2")).alias("url"), "text"
            )
        )
    )
    diff = a.alias("a").join(
        b.alias("b"), F.col("a.url") == F.col("b.url"), "full_outer"
    ).select(
        F.when(F.col("a.url").isNull(), "added")
        .when(F.col("b.url").isNull(), "removed")
        .when(F.col("a.text") != F.col("b.text"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        F.coalesce(F.col("a.url"), F.col("b.url")).alias("url"),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_urls"), F.min("url").alias("min_url")
    )


# ---------------------------------------------------------------------------
# c5 — frontier growth curve: new distinct URLs discovered per day and the
# cumulative frontier size over time
# ---------------------------------------------------------------------------

_C5_URLS = 2_000

_C5_ORACLE = f"""
WITH obs AS (
  SELECT ((uh % {_C5_URLS}) + {_C5_URLS}) % {_C5_URLS} AS url_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM (SELECT ts, {hashlong_aliases("event_id * 17 + 3", "42", "uh", "c5")}
        FROM events)
),
first_seen AS (SELECT url_id, min(day) AS day FROM obs GROUP BY url_id),
per_day AS (SELECT day, CAST(count(*) AS BIGINT) AS new_urls
            FROM first_seen GROUP BY day)
SELECT day, new_urls,
       CAST(sum(new_urls) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_urls
FROM per_day
"""


@query("c5_url_growth", _C5_ORACLE)
def c5_url_growth(spark, sf_dir):
    """Frontier growth curve: per UTC day, how many URLs were seen for the
    FIRST time, and the cumulative distinct-URL total — the crawl-ops
    dashboard number that says whether discovery is saturating (the curve
    flattens) or the frontier is still exploding. Fetch observations are
    derived deterministically from ``events`` (url = pmod(hash(event_id*17
    + 3), 2000), day = epoch seconds div 86400 — integer end to end,
    timezone-free).

    Scale shape (10^10 URLs): first-seen is a map-side-combinable
    groupBy(url).min(day); the per-day rollup and its running sum operate
    on a |days|-sized aggregate (thousands of rows), so the unpartitioned
    window is a deliberate single-task step over tiny data — the
    documents-scale pattern this repo forbids never appears."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    obs = e.select(
        F.pmod(F.hash(F.expr("event_id * 17 + 3")), F.lit(_C5_URLS)).alias(
            "url_id"
        ),
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            " div 86400"
        ).alias("day"),
    )
    first_seen = obs.groupBy("url_id").agg(F.min("day").alias("day"))
    per_day = first_seen.groupBy("day").agg(F.count("*").alias("new_urls"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day", "new_urls", F.sum("new_urls").over(w).alias("cum_urls")
    )


# ---------------------------------------------------------------------------
# c6 — crawl-trap detection (calendar pages, faceted search, session-id
# URL spaces): hosts whose URL space keeps expanding with path depth, or
# is dominated by query-string permutations
# ---------------------------------------------------------------------------

_C6_HOSTS = 40
_C6_DEEP_DEPTH = 4  # depth >= this counts as "deep"
_C6_DEEP_PPM = 500_000  # trap if >= 50% of a host's URLs are deep
_C6_QUERY_PPM = 500_000  # or >= 50% carry query strings
_C6_MIN_URLS = 20

_C6_ORACLE = f"""
WITH urls AS (
  SELECT DISTINCT
    ((hh % {_C6_HOSTS}) + {_C6_HOSTS}) % {_C6_HOSTS} AS host_id,
    ((dh % 7) + 7) % 7 AS depth,
    CASE WHEN ((qh % 4) + 4) % 4 = 0 THEN 1 ELSE 0 END AS has_query,
    event_id AS url_id
  FROM (SELECT event_id,
               {hashlong_aliases("event_id * 11 + 2", "42", "hh", "c6a")},
               {hashlong_aliases("event_id * 7 + 1", "42", "dh", "c6b")},
               {hashlong_aliases("event_id * 13 + 5", "42", "qh", "c6c")}
        FROM events)
),
per_host AS (
  SELECT host_id,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(sum(CASE WHEN depth >= {_C6_DEEP_DEPTH} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_deep,
         CAST(sum(has_query) AS BIGINT) AS n_query
  FROM urls GROUP BY host_id
),
rated AS (
  SELECT host_id, n_urls,
         CAST((1000000 * n_deep) // n_urls AS BIGINT) AS deep_ppm,
         CAST((1000000 * n_query) // n_urls AS BIGINT) AS query_ppm
  FROM per_host WHERE n_urls >= {_C6_MIN_URLS}
)
SELECT host_id, n_urls, deep_ppm, query_ppm,
       CASE WHEN deep_ppm >= {_C6_DEEP_PPM}
              AND query_ppm >= {_C6_QUERY_PPM} THEN 'deep+query'
            WHEN deep_ppm >= {_C6_DEEP_PPM} THEN 'deep'
            ELSE 'query' END AS reason
FROM rated
WHERE deep_ppm >= {_C6_DEEP_PPM} OR query_ppm >= {_C6_QUERY_PPM}
"""


@query("c6_crawl_traps", _C6_ORACLE)
def c6_crawl_traps(spark, sf_dir):
    """Crawl-trap detection: hosts whose discovered URL space is dominated
    by deep paths (calendar pages, pagination chains) or query-string
    permutations (faceted search, session ids) — the hosts a frontier
    must budget-cap before they eat the crawl. URL observations are
    derived deterministically from ``events`` (host/depth/has_query all
    murmur3 of event_id, reproduced bit-exactly in DuckDB); thresholds
    are exact integer ppm. Emits (host_id, n_urls, deep_ppm, query_ppm,
    reason) for flagged hosts.

    Scale shape (10^10 URLs): one distinct + one map-side-combinable
    groupBy(host) — counts and conditional sums all partial-aggregate;
    flagging is row-local arithmetic on the |hosts|-sized aggregate. No
    window, no row-level join. (Heritrix's 'pathological path' and
    max-query-string rules apply the same signals crawl-side; this is
    the corpus-side audit.)"""
    e = load(spark, sf_dir, "events")
    urls = e.select(
        F.pmod(F.hash(F.expr("event_id * 11 + 2")), F.lit(_C6_HOSTS)).alias(
            "host_id"
        ),
        F.pmod(F.hash(F.expr("event_id * 7 + 1")), F.lit(7)).alias("depth"),
        F.when(
            F.pmod(F.hash(F.expr("event_id * 13 + 5")), F.lit(4)) == 0, 1
        )
        .otherwise(0)
        .alias("has_query"),
        F.col("event_id").alias("url_id"),
    ).distinct()
    per_host = urls.groupBy("host_id").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(
            F.when(F.col("depth") >= _C6_DEEP_DEPTH, 1).otherwise(0)
        ).alias("n_deep"),
        F.sum("has_query").alias("n_query"),
    )
    rated = (
        per_host.filter(F.col("n_urls") >= _C6_MIN_URLS)
        .withColumn("deep_ppm", F.expr("(1000000 * n_deep) div n_urls"))
        .withColumn("query_ppm", F.expr("(1000000 * n_query) div n_urls"))
    )
    deep = F.col("deep_ppm") >= _C6_DEEP_PPM
    qry = F.col("query_ppm") >= _C6_QUERY_PPM
    return (
        rated.filter(deep | qry)
        .withColumn(
            "reason",
            F.when(deep & qry, "deep+query")
            .when(deep, "deep")
            .otherwise("query"),
        )
        .select("host_id", "n_urls", "deep_ppm", "query_ppm", "reason")
    )


# ---------------------------------------------------------------------------
# c7 — politeness compliance audit: re-derive per-host inter-fetch gaps
# from the fetch log and count crawl-delay violations
# ---------------------------------------------------------------------------

_C7_HOSTS = 50

_C7_ORACLE = f"""
WITH fetches AS (
  SELECT ((hh % {_C7_HOSTS}) + {_C7_HOSTS}) % {_C7_HOSTS} AS host_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id
  FROM (SELECT ts, event_id,
               {hashlong_aliases("event_id * 3 + 11", "42", "hh", "c7")}
        FROM events)
),
gaps AS (
  SELECT host_id, ts_s,
         ts_s - lag(ts_s) OVER (PARTITION BY host_id
                                ORDER BY ts_s, event_id) AS gap_s
  FROM fetches
),
audit AS (
  SELECT host_id,
         1 + host_id % 5 AS delay_s,
         CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(sum(CASE WHEN gap_s IS NOT NULL
                        AND gap_s < 1 + host_id % 5
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         min(gap_s) AS min_gap_s
  FROM gaps GROUP BY host_id
)
SELECT host_id, CAST(delay_s AS BIGINT) AS delay_s, n_fetches,
       n_violations, min_gap_s
FROM audit
"""


@query("c7_politeness_audit", _C7_ORACLE)
def c7_politeness_audit(spark, sf_dir):
    """Politeness compliance audit — the lineage-side proof a crawl
    respected per-host crawl-delay: re-derive every host's inter-fetch
    gaps from the fetch log and count gaps shorter than the host's
    crawl-delay (here delay = 1 + host_id % 5 seconds, a deterministic
    stand-in for the robots.txt value the engine's politeness table
    carries). Emits (host_id, delay_s, n_fetches, n_violations,
    min_gap_s).

    Scale shape: the lag window partitions by host over the fetch log —
    bounded per partition BY THE POLITENESS INVARIANT ITSELF (a host
    fetched once per delay_s accumulates at most 86400/delay_s rows per
    day), so the one row-level window in this module rides on the very
    property it audits; the rollup after it is map-side combinable."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    fetches = e.select(
        F.pmod(F.hash(F.expr("event_id * 3 + 11")), F.lit(_C7_HOSTS)).alias(
            "host_id"
        ),
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_s"),
        "event_id",
    )
    w = Window.partitionBy("host_id").orderBy("ts_s", "event_id")
    gaps = fetches.withColumn(
        "gap_s", F.col("ts_s") - F.lag("ts_s").over(w)
    )
    delay = 1 + F.col("host_id") % 5
    return gaps.groupBy("host_id").agg(
        F.first(delay).cast("long").alias("delay_s"),
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum(
            F.when(
                F.col("gap_s").isNotNull() & (F.col("gap_s") < delay), 1
            ).otherwise(0)
        ).alias("n_violations"),
        F.min("gap_s").alias("min_gap_s"),
    )


# ---------------------------------------------------------------------------
# c8 — per-host fetch-budget apportionment (largest-remainder method)
# ---------------------------------------------------------------------------

_C8_BUDGET = 1000  # fetch slots per crawl round

_C8_ORACLE = f"""
WITH pend AS (
  SELECT source, CAST(count(*) AS BIGINT) AS pending
  FROM documents GROUP BY source
),
t AS (SELECT CAST(sum(pending) AS BIGINT) AS total FROM pend),
q AS (
  SELECT p.source, p.pending,
         ({_C8_BUDGET} * p.pending) // t.total AS floor_q,
         ({_C8_BUDGET} * p.pending) % t.total  AS rem
  FROM pend p, t
),
l AS (SELECT {_C8_BUDGET} - CAST(sum(floor_q) AS BIGINT) AS leftover FROM q),
r AS (
  SELECT source, pending, floor_q,
         row_number() OVER (ORDER BY rem DESC, source) AS rk
  FROM q
)
SELECT r.source, r.pending,
       CAST(r.floor_q + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r, l
"""


@query("c8_fetch_budget", _C8_ORACLE)
def c8_fetch_budget(spark, sf_dir):
    """Per-host fetch-budget apportionment for one crawl round: split a
    global budget of B fetch slots across hosts proportionally to their
    pending-frontier size, using the largest-remainder (Hamilton) method
    so quotas are integers that sum EXACTLY to B — the allocation step
    between c3's frontier ordering and the engine's salted top-K-per-host
    dequeue (each host's K becomes its quota). Pending counts are stood in
    by documents-per-source, ≙ the frontier's per-host backlog.

    Scale shape (100 TB): the corpus-sized work is ONE map-side-combinable
    groupBy(host); everything after (total, floor quotas, remainder
    ranking, leftover distribution) runs on the |hosts|-sized aggregate,
    and the remainder rank is the two-phase order index (scalewin.py) so
    no single-partition window exists at any host count. The two 1-row
    aggregates (grand total, leftover) come back as broadcasts. Integer
    cross-multiplication throughout: no float shares to defend across
    engines."""
    from spider_spark.operators.scalewin import two_phase_order_index

    d = load(spark, sf_dir, "documents")
    pend = d.groupBy("source").agg(F.count(F.lit(1)).alias("pending"))
    tot = pend.agg(F.sum("pending").alias("total"))
    q = (
        pend.crossJoin(F.broadcast(tot))
        .withColumn("floor_q", F.expr(f"({_C8_BUDGET} * pending) div total"))
        .withColumn("rem", F.expr(f"({_C8_BUDGET} * pending) % total"))
    )
    leftover = q.agg(
        (F.lit(_C8_BUDGET) - F.sum("floor_q")).alias("leftover")
    )
    ranked, _ = two_phase_order_index(
        q, [("rem", True), ("source", False)], "rk", start=1
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "pending",
            (
                F.col("floor_q")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )


# ---------------------------------------------------------------------------
# c9 — URL template mining (pattern-level frontier compression)
# ---------------------------------------------------------------------------

_C9_MIN_URLS = 5

_C9_ORACLE = f"""
WITH urls AS (
  SELECT DISTINCT
         source || '/sec' || (doc_id % 5) || '/page/' || doc_id ||
         CASE WHEN doc_id % 4 = 0 THEN '?ref=' || (doc_id % 100) ELSE '' END
           AS url,
         source
  FROM documents
),
tpl AS (
  SELECT source,
         regexp_replace(url, '[0-9]+', '{{d}}', 'g') AS template,
         url
  FROM urls
)
SELECT source, template,
       count(*) AS n_urls,
       min(url) AS sample_url
FROM tpl
GROUP BY source, template
HAVING count(*) >= {_C9_MIN_URLS}
"""


@query("c9_url_templates", _C9_ORACLE)
def c9_url_templates(spark, sf_dir):
    """URL template mining: collapse every discovered URL to its digit
    template (``regexp_replace(url, '[0-9]+', '{d}')``) and count URLs
    per (host, template). Templates with huge URL counts are pattern
    families — pagination chains, calendar pages, faceted-search
    permutations — that a frontier should budget at the *template* level
    rather than URL-by-URL (the generalization of c6's per-host trap
    flags: c6 says WHICH host is a trap, c9 says WHICH url shape). URL
    observations are derived deterministically from ``documents``
    (path section = doc_id % 5, every 4th URL carries a ?ref= query),
    so both engines see the identical URL multiset.

    Scale shape (10^10 URLs): one distinct on url, one row-local
    regexp_replace (codegen, zero exchange), one map-side-combinable
    groupBy(source, template) — template cardinality is orders of
    magnitude below URL cardinality, so the aggregate output is small
    enough to broadcast back as a frontier-side budget table."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.col("source"),
        F.lit("/sec"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("/page/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("?ref="), (F.col("doc_id") % 100).cast("string")),
        ).otherwise(F.lit("")),
    )
    urls = d.select(url.alias("url"), "source").distinct()
    tpl = urls.select(
        "source",
        F.regexp_replace("url", "[0-9]+", "{d}").alias("template"),
        "url",
    )
    return (
        tpl.groupBy("source", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"), F.min("url").alias("sample_url"))
        .filter(F.col("n_urls") >= _C9_MIN_URLS)
    )
