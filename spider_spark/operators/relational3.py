"""Third batch of relational operators: the remaining classic TPC-H query
shapes (customer-order distribution, top-supplier-vs-global-max, group
share vs a global scalar, dormant-customer anti join) plus event-stream
analytics (conversion funnel, weekly retention cohorts) over the events
table.

These widen the §2.3/§2.4 join/aggregate families with the decorrelation
patterns a warehouse workload needs: LEFT OUTER + double aggregation,
HAVING against a broadcast global scalar, and NOT-EXISTS-in-window as a
left anti join. The funnel/retention pair is the product-analytics shape
(ordered multi-stage conversion, cohorted activity) the reference's
progress/metrics tables gesture at (/root/reference/log4p.py progress
accounting) re-expressed as declarative plans.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators import load, query

# ---------------------------------------------------------------------------
# q9 — TPC-H-Q13 shape: customer order-count distribution
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
WITH oc AS (SELECT o_custkey, count(*) AS c_count FROM orders GROUP BY o_custkey)
SELECT c_count, count(*) AS custdist
FROM (SELECT c.c_custkey, coalesce(oc.c_count, 0) AS c_count
      FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey)
GROUP BY c_count
"""


@query("q9_custdist", _Q9_ORACLE)
def q9_custdist(spark, sf_dir):
    """TPC-H-Q13-shape order-count distribution: how many customers placed
    exactly k orders, including k = 0 (the LEFT OUTER row).

    Scale shape: orders pre-aggregates to per-custkey counts FIRST (the
    map-side-combinable form — the raw order rows never meet customer),
    then the |customers|-sized count relation left-joins onto customer on
    the natural custkey, and the second aggregate is over the tiny
    (distinct c_count)-sized key space. Naively left-joining customer to
    raw orders then double-grouping would shuffle every order row twice.
    All-integer outputs — nothing to round."""
    oc = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(oc, c.c_custkey == oc.o_custkey, "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# q10 — TPC-H-Q15 shape: supplier(s) with maximum window revenue
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey),
mx AS (SELECT max(total_revenue) AS best FROM rev)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey, mx
WHERE r.total_revenue = mx.best
"""


@query("q10_top_supplier", _Q10_ORACLE)
def q10_top_supplier(spark, sf_dir):
    """TPC-H-Q15-shape top supplier: revenue per supplier over one quarter,
    keep the supplier(s) achieving the global maximum (the view + scalar
    MAX subquery, decorrelated to a broadcast 1-row aggregate).

    Scale shape: the shipdate predicate reaches the parquet scan, the
    per-suppkey aggregate is map-side combinable and |suppliers|-sized,
    the MAX is a 1-row agg CROSS-joined (broadcast) — no second pass over
    lineitem and no window over the whole revenue relation. supplier is a
    dim → broadcast. Float discipline: the max-equality compares the
    2dp-ROUNDED revenue on both sides and both engines, so a ULP of
    summation-order drift cannot disagree about who is top."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("best"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("best"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q11 — TPC-H-Q11 shape: groups whose value exceeds a global-share threshold
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS value_cents
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT sum(value_cents) AS total_cents FROM pv)
SELECT l_partkey, value_cents
FROM pv, tot
WHERE value_cents * 1000 > total_cents * 6
"""


@query("q11_important_parts", _Q11_ORACLE)
def q11_important_parts(spark, sf_dir):
    """TPC-H-Q11-shape 'important stock': parts whose lineitem value
    exceeds 0.6 % of the global total — a HAVING clause against a scalar
    subquery over the same aggregate.

    Scale shape: one map-side-combinable per-partkey aggregate; the global
    total is a second 1-row aggregate OVER THE |parts|-SIZED RELATION (not
    a second lineitem scan) broadcast back via crossJoin; the share test
    is a pure filter. Float discipline: prices go to integer cents per ROW
    (floor(x*100+0.5) — identical on the identical input double in both
    engines, no HALF_UP-vs-HALF_EVEN ambiguity), so every sum is an int64
    whose value is independent of partition order, and the threshold
    compare is an exact integer cross-multiplication — no epsilon
    anywhere."""
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    pv = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", cents.alias("c"))
        .groupBy("l_partkey")
        .agg(F.sum("c").alias("value_cents"))
    )
    tot = pv.agg(F.sum("value_cents").alias("total_cents"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents") * 6)
        .select("l_partkey", "value_cents")
    )


# ---------------------------------------------------------------------------
# q12 — TPC-H-Q22 shape: wealthy dormant customers (scalar avg + anti join)
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
WITH ab AS (SELECT round(avg(c_acctbal), 2) AS thresh
            FROM customer WHERE c_acctbal > 0.0),
recent AS (SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '2000-01-01')
SELECT n.n_name,
       count(*)                   AS n_cust,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey, ab
WHERE c.c_acctbal > ab.thresh
  AND NOT EXISTS (SELECT 1 FROM recent r WHERE r.o_custkey = c.c_custkey)
GROUP BY n.n_name
"""


@query("q12_dormant_customers", _Q12_ORACLE)
def q12_dormant_customers(spark, sf_dir):
    """TPC-H-Q22-shape: above-average-balance customers with NO recent
    orders (dormant capital), counted per nation — the scalar-AVG
    subquery + NOT EXISTS pattern. NOT EXISTS decorrelates to a LEFT ANTI
    join against the distinct recent-customer keys.

    Scale shape: the anti join's build side is pre-filtered by the date
    predicate (reaches the orders scan) and reduced to DISTINCT keys
    before the exchange; the avg threshold is a 1-row broadcast; nation
    is a broadcast dim. Float margin: the threshold is the 2dp-rounded
    avg, and balances carry 2 decimals, so a cross-engine disagreement
    would need the unrounded avgs to straddle a half-cent rounding
    boundary — ~ULP probability, same discipline q1/q3 rely on."""
    c = load(spark, sf_dir, "customer")
    ab = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("thresh")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
        .distinct()
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("thresh"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# e1 — ordered conversion funnel over the events stream
# ---------------------------------------------------------------------------

_E1_ORACLE = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2
       FROM events e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'view' AND e.ts > s1.t1
         AND e.ts <= s1.t1 + INTERVAL 48 HOUR
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3
       FROM events e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
         AND e.ts <= s2.t2 + INTERVAL 48 HOUR
       GROUP BY e.user_id)
SELECT stage, count(*) AS n_users FROM (
  SELECT s1.user_id,
         1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
           + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS stage
  FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
          LEFT JOIN s3 ON s1.user_id = s3.user_id)
GROUP BY stage
"""


@query("e1_event_funnel", _E1_ORACLE)
def e1_event_funnel(spark, sf_dir):
    """Ordered conversion funnel signup → view → purchase: each stage
    counts only events STRICTLY AFTER the user completed the previous
    stage and within a 48-hour conversion window (first-touch
    attribution), then users are histogrammed by the deepest stage
    reached. The ordered-sequence semantics is what plain per-type counts
    can't express and what funnel products implement as a stateful scan;
    here it is three min-aggregates chained through inequality joins.

    Scale shape: every join and aggregate keys on user_id — one natural
    co-partitioning key throughout, so AQE can reuse the exchange; the
    stage tables shrink monotonically (s3 ⊆ s2 ⊆ s1). The per-stage
    relations are per-user aggregates (bounded by |users|), joined back
    to raw events on the same key — no window over the full event log, no
    event-time sort. Timestamps compare as exact microsecond integers —
    bit-identical cross-engine."""
    e = load(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    win = F.expr("INTERVAL 48 HOURS")
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("t2").isNull(), 0).otherwise(1)
        + F.when(F.col("t3").isNull(), 0).otherwise(1)
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# e2 — weekly retention cohorts
# ---------------------------------------------------------------------------

_E2_ORACLE = """
WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
           FROM events GROUP BY user_id),
act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
SELECT strftime(f.cohort, '%Y-%m-%d')                          AS cohort_week,
       CAST(date_diff('day', f.cohort, a.wk) // 7 AS BIGINT)   AS week_offset,
       count(*)                                                AS n_active
FROM f JOIN act a ON a.user_id = f.user_id
GROUP BY 1, 2
"""


@query("e2_retention_cohorts", _E2_ORACLE)
def e2_retention_cohorts(spark, sf_dir):
    """Weekly retention cohort matrix: users are cohorted by the ISO week
    of their first event; n_active counts distinct cohort members active
    k weeks later — the triangle every growth dashboard draws.

    Scale shape: first-seen is a map-side-combinable min per user; the
    activity set is the DISTINCT (user, week) projection (weeks-per-user
    bounded, so this is the small multiple of |users|); the join keys on
    user_id like e1 and the final aggregate's key space is
    |cohorts| × |offsets| — tiny. Week arithmetic is integer throughout:
    both engines truncate to Monday-start ISO weeks and the offset is an
    exact day-difference floor-divided by 7 (differences are multiples of
    7 by construction)."""
    e = load(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = e.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        f.join(act, "user_id")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# e3 — RFM customer segmentation over the purchase stream
# ---------------------------------------------------------------------------

_E3_ORACLE = """
WITH anchor AS (SELECT max(ts) AS mx FROM events),
rfm AS (
  SELECT e.user_id,
         CAST(date_diff('day', max(e.ts), a.mx) AS BIGINT) AS recency_days,
         count(*)                                          AS frequency,
         round(sum(e.value), 2)                            AS monetary
  FROM events e, anchor a
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id, a.mx)
SELECT user_id, recency_days, frequency, monetary,
       CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_score,
       CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS BIGINT) AS f_score
FROM rfm
"""


@query("e3_rfm_segments", _E3_ORACLE)
def e3_rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation: per-user
    purchase stats against a global as-of anchor, quartile-scored — the
    classic CRM cut. Scores order by (metric, user_id) so the ntile is a
    total order and engine-independent; monetary is the only float and is
    2dp-rounded per the house discipline.

    Scale shape: the purchase filter reaches the scan; per-user stats are
    one map-side-combinable aggregate; the anchor is a broadcast 1-row
    max; the quartiles run over the |users|-sized AGGREGATE via the
    two-phase ntile (scalewin.py), never the raw event log and never a
    single-partition window — so the shape holds even at web-scale user
    cardinality. At unbounded |users| the w6 sketch path
    (approx_percentile boundaries) remains the cheaper alternative,
    exactly as documented there."""
    from spider_spark.operators.scalewin import two_phase_ntile

    e = load(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("mx"))
    rfm = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.datediff(F.first("mx"), F.max("ts"))
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
    )
    scored = two_phase_ntile(
        rfm, [("recency_days", False), ("user_id", False)], 4, "r_score"
    )
    scored = two_phase_ntile(
        scored, [("frequency", True), ("user_id", False)], 4, "f_score"
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
    )


# ---------------------------------------------------------------------------
# e4 — anomaly days per event type: z-score test in exact integers
# ---------------------------------------------------------------------------

_E4_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n_events
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type,
         count(*)                            AS n_days,
         CAST(sum(n_events) AS BIGINT)       AS s,
         CAST(sum(n_events * n_events) AS BIGINT) AS q
  FROM daily GROUP BY event_type)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n_events,
       (d.n_events * t.n_days - t.s) * (d.n_events * t.n_days - t.s)
         > 4 * (t.n_days * t.q - t.s * t.s)              AS is_anomaly
FROM daily d JOIN stats t USING (event_type)
"""


@query("e4_anomaly_days", _E4_ORACLE)
def e4_anomaly_days(spark, sf_dir):
    """Daily-volume anomaly detection per event type: flag days more than
    two standard deviations from that type's mean — with the z-test
    cross-multiplied into pure integers, (n·x − S)² > 4·(n·Q − S²), so no
    float mean/variance ever exists and both engines agree bit for bit
    (the same exactness trick as q11's share threshold).

    Scale shape: daily counts are one map-side-combinable aggregate
    (|types|·|days| keys); per-type moment stats aggregate THAT relation
    and broadcast back — the event log is scanned once and never joined
    or windowed."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.count("*").alias("n_events"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("q"),
    )
    dev = F.col("n_events") * F.col("n_days") - F.col("s")
    var_n2 = F.col("n_days") * F.col("q") - F.col("s") * F.col("s")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            (dev * dev > 4 * var_n2).alias("is_anomaly"),
        )
    )


# ---------------------------------------------------------------------------
# e5 — bot / scraper detection by sustained request rate
# ---------------------------------------------------------------------------

_E5_BURST = 25   # planted bots fire this many requests per event
_E5_BOT_MOD = 7   # 1-in-7 users is a planted bot (chosen so every
                  # test SF, including sf0.001's 15 users, contains some)
_E5_THRESH = 10   # requests/hour that flags a user


def _e5_oracle() -> str:
    from spider_spark.operators.sqlmurmur import hashlong_aliases

    return f"""
WITH req AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
         {hashlong_aliases("user_id * 7 + 3", "42", "uh", "e5")}
  FROM events
),
hourly AS (
  SELECT user_id, hr,
         CAST(sum(CASE WHEN ((uh % {_E5_BOT_MOD}) + {_E5_BOT_MOD})
                              % {_E5_BOT_MOD} = 0
                       THEN {_E5_BURST} ELSE 1 END) AS BIGINT) AS n_req
  FROM req GROUP BY user_id, hr
)
SELECT user_id,
       CAST(count(*) AS BIGINT)  AS n_hours,
       CAST(sum(n_req) AS BIGINT) AS total_req,
       CAST(max(n_req) AS BIGINT) AS max_hourly,
       max(n_req) >= {_E5_THRESH} AS is_bot
FROM hourly GROUP BY user_id
"""


@query("e5_bot_rate", _e5_oracle())
def e5_bot_rate(spark, sf_dir):
    """Bot/scraper detection from the request log — the server-side twin
    of the crawler's own politeness discipline (c7 audits OUR gaps; this
    finds clients that would fail that audit): per-user peak hourly
    request rate against a threshold. The events fixture averages ~1
    event/user/hour, so bot behavior is planted deterministically: one
    user in {_E5_BOT_MOD} (by murmur of user_id) fires {_E5_BURST} requests per event
    — identically derived in both engines — and detection flags any user
    whose peak hour reaches {_E5_THRESH}.

    Scale shape (10^10 requests/day): request multiplicity is row-local
    arithmetic (no explode — the burst factor is SUMMED, not
    materialized), so the pipeline is two map-side-combinable groupBys —
    (user, hour) then (user), the second riding on a prefix of the
    first's key — and nothing else. No window, no join; skewed bot users
    collapse in map-side partials exactly like hot hosts in A4."""
    e = load(spark, sf_dir, "events")
    is_bot_user = (
        F.pmod(F.hash(F.expr("user_id * 7 + 3")), F.lit(_E5_BOT_MOD)) == 0
    )
    hourly = (
        e.select(
            "user_id",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " ts) div 3600"
            ).alias("hr"),
            F.when(is_bot_user, F.lit(_E5_BURST))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("m"),
        )
        .groupBy("user_id", "hr")
        .agg(F.sum("m").alias("n_req"))
    )
    return hourly.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n_req").alias("total_req"),
        F.max("n_req").alias("max_hourly"),
        (F.max("n_req") >= _E5_THRESH).alias("is_bot"),
    )


# ---------------------------------------------------------------------------
# e6 — event-type transition matrix (first-order Markov over user streams)
# ---------------------------------------------------------------------------

_E6_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
tot AS (SELECT prev_type, sum(n) AS row_n FROM trans GROUP BY prev_type)
SELECT t.prev_type, t.next_type, t.n,
       floor(t.n * 10000.0 / tot.row_n + 0.5) / 10000.0 AS p
FROM trans t JOIN tot ON tot.prev_type = t.prev_type
"""


@query("e6_event_transitions", _E6_ORACLE)
def e6_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams:
    for every (prev_type → next_type) adjacent pair (ordered by ts,
    event_id tie-break) the global count and the row-normalized
    transition probability. The session-modeling companion to w4's
    sessionize and e1's funnel — funnels check ONE path, the transition
    matrix scores ALL paths (and its stationary behavior feeds bot
    detection: uniform rows are scripted traffic).

    Exactness: counts are integers; p is the shared 4-dp rational
    rounding (one multiply/divide/floor), so engines agree bit-for-bit.

    Scale shape (10^10 events): the lag window shuffles once on user_id
    (each user's stream sorts independently — no global sort); the pair
    counts collapse to |event_type|² rows via a map-side-combinable
    groupBy, and the row-total join runs on that tiny aggregate, not on
    events. This is the plan a 1000-executor cluster wants: one exchange
    over the big table, everything after it at matrix cardinality."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from spider_spark.operators.dedup import _jac4

    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    p4 = _jac4(F.col("n"), F.col("row_n"))
    return trans.join(F.broadcast(tot), "prev_type").select(
        "prev_type", "next_type", "n", p4.alias("p")
    )


# ---------------------------------------------------------------------------
# e7 — top event paths (most common length-3 subsequences)
# ---------------------------------------------------------------------------

_E7_TOPK = 20

_E7_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type, 2) OVER w AS p2,
         lag(event_type, 1) OVER w AS p1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT p2 || ' > ' || p1 || ' > ' || event_type AS path, count(*) AS n
  FROM ordered
  WHERE p2 IS NOT NULL AND p1 IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rk
  FROM paths
)
SELECT path, n, rk FROM ranked WHERE rk <= {_E7_TOPK}
"""


@query("e7_top_paths", _E7_ORACLE)
def e7_top_paths(spark, sf_dir):
    """Top-K most frequent length-3 event paths across all user streams
    (ordered by ts, event_id tie-break) — the path-mining companion to
    e6: the transition matrix scores individual hops, e7 surfaces whole
    journeys ('view > view > purchase'). Rank ties break on the path
    string so the answer is total-order deterministic.

    Scale shape (10^10 events): the double-lag window is ONE shuffle on
    user_id (both lags share the frame); path counts collapse to
    |event_type|³ rows max via map-side-combinable groupBy; the final
    rank is a window over that tiny aggregate — Catalyst turns the
    rk <= K filter into a per-partition top-K before the single-task
    sort, so nothing big ever sorts globally."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("event_type", 1).over(w).alias("p1"),
    )
    paths = (
        ordered.filter(
            F.col("p2").isNotNull()
            & F.col("p1").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            F.concat_ws(" > ", "p2", "p1", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("path")))
    return (
        paths.select("path", "n", rk.alias("rk"))
        .filter(F.col("rk") <= _E7_TOPK)
    )
