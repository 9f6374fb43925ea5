"""Fourth batch of relational operators: the TPC-H query shapes not yet
covered (returned-items report, promo share, nation-pair volume, supplier
count per part class, large-volume orders, disjunctive pushdown, the
waiting-suppliers multi-EXISTS decorrelation, min-cost-supplier correlated
subquery), plus the scale patterns a 100 TB warehouse needs spelled out as
first-class, oracle-checked operators: two-stage salted aggregation over a
skewed key, CUBE grouping sets, and SCD2 validity-interval construction.

Like relational3.py, these widen the SURVEY.md §2.3/§2.4 join/aggregate
families with decorrelation patterns (the reference's sequential scripts
never need them, but a warehouse user of the engine does): EXISTS/NOT
EXISTS pairs become aggregate-then-join, correlated scalar MIN becomes
groupBy-min + equality join back, and IN-subquery-with-HAVING becomes a
semi join against a pre-aggregate.

Float discipline per the package convention: money sums either rounded
(2 dp, both engines) or carried as exact integer cents; ratio outputs
rounded 4 dp; timestamps compared as epoch-ms longs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators import load, ntz_epoch_ms, query

# ---------------------------------------------------------------------------
# q13 — TPC-H-Q10 shape: returned-item revenue per customer
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1995-07-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
"""


@query("q13_returned_items", _Q13_ORACLE)
def q13_returned_items(spark, sf_dir):
    """TPC-H-Q10 shape: revenue lost to returned items per customer over
    one half-year of orders, with the customer's nation name.

    Scale shape: both date predicates reach the orders scan and the
    returnflag predicate reaches the lineitem scan (PushedFilters); the
    orderkey join is the one big shuffle; revenue (exact integer cents — per-row half-up is one
    deterministic IEEE multiply, so engines agree) is aggregated down to
    custkey-size BEFORE customer joins in (so customer rows meet an
    aggregate, not raw lineitems); nation is a 25-row broadcast."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_cents")
        )
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue_cents")
    )


# ---------------------------------------------------------------------------
# q14 — TPC-H-Q14 shape: promo revenue share over one month
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1996-03-01'
"""


@query("q14_promo_share", _Q14_ORACLE)
def q14_promo_share(spark, sf_dir):
    """TPC-H-Q14 shape: what share of two months' revenue came from PROMO
    parts — a conditional-sum ratio against a dimension attribute.

    Scale shape: the shipdate window reaches the lineitem scan; part is a
    dim → broadcast (the fact never shuffles); the ratio is one map-side
    combinable aggregate to a single row. Ratio rounded 4 dp in both
    engines so summation-order ULPs can't flip the hash."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-03-01")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                / F.sum(rev),
                4,
            ).alias("promo_share")
        )
    )


# ---------------------------------------------------------------------------
# q15 — TPC-H-Q7 shape: shipping volume between nation pairs by year
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS volume_cents
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
"""


@query("q15_volume_shipping", _Q15_ORACLE)
def q15_volume_shipping(spark, sf_dir):
    """TPC-H-Q7 shape generalized: shipping volume between every
    (supplier-nation, customer-nation) pair by ship year over a two-year
    window. (The classic query filters to one nation pair; the pair
    filter is incidental to the shape — this keeps the full matrix so the
    result is non-degenerate at every SF, where nation membership of the
    small supplier table varies.)

    Scale shape: the shipdate window reaches the lineitem scan; supplier
    and customer each pre-join their 25-row nation broadcast so the fact
    side meets two slim (key → nation-name) dims — supplier broadcast,
    customer shuffled once on custkey after orders reduce to
    (orderkey → custkey); the only big-big exchange is lineitem ⋈ orders
    on the natural orderkey."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("volume_cents")
        )
    )


# ---------------------------------------------------------------------------
# q16 — TPC-H-Q16 shape: supplier count per part class, minus an exclusion
# list (adapted: no partsupp table — lineitem is the part⇄supplier relation,
# and the synthetic supplier table has no negative balances, so the NOT-IN
# side is a deterministic "complaint list" of every 7th suppkey)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_size,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#11'
  AND ps.l_suppkey % 7 <> 0
GROUP BY p.p_brand, p.p_size
"""


@query("q16_supplier_cnt", _Q16_ORACLE)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H-Q16 shape: how many distinct (non-excluded) suppliers ship
    each (brand, size) part class — count-distinct over a deduplicated
    many-to-many relation with a NOT-IN exclusion pushed down as a cheap
    key predicate.

    Scale shape: lineitem projects to two key columns before the distinct
    (column pruning keeps the exchange narrow); the exclusion predicate is
    a pure column filter evaluated pre-shuffle; part is a dim → broadcast;
    the count-distinct re-uses the (partkey, suppkey) distinct exchange."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .filter(F.col("l_suppkey") % 7 != 0)
        .distinct()
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#11"
    ).select("p_partkey", "p_brand", "p_size")
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q17 — TPC-H-Q18 shape: large-volume orders (HAVING + IN-subquery → semi)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS totalprice, b.total_qty
FROM big b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@query("q17_large_orders", _Q17_ORACLE)
def q17_large_orders(spark, sf_dir):
    """TPC-H-Q18 shape: orders whose total line quantity exceeds 300, with
    their customer — the IN-(GROUP BY … HAVING) subquery decorrelated to a
    pre-aggregate joined back.

    Scale shape: the HAVING aggregate is map-side combinable and reduces
    lineitem to the handful of qualifying orderkeys FIRST; the tiny
    survivor set then broadcasts onto orders (the orders table never
    shuffles on a speculative key), and customer joins the tiny result.
    The naive form — join orders⋈lineitem then filter a window sum —
    would shuffle every line twice."""
    big = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# q18 — TPC-H-Q19 shape: disjunction-of-conjunctions revenue
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND l.l_quantity BETWEEN 1  AND 20
        AND p.p_size BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#22' AND l.l_quantity BETWEEN 10 AND 30
        AND p.p_size BETWEEN 1 AND 30)
   OR (p.p_brand = 'Brand#3'  AND l.l_quantity BETWEEN 20 AND 50
        AND p.p_size BETWEEN 1 AND 40)
"""


@query("q18_disjunctive", _Q18_ORACLE)
def q18_disjunctive(spark, sf_dir):
    """TPC-H-Q19 shape: revenue under a disjunction of brand/size/quantity
    conjunctions spanning both tables — the pushdown stress test.

    Scale shape: Catalyst splits the OR into the derivable per-table
    conjuncts — the quantity envelope (1..50 here spans all, but each
    branch's bound still prunes inside the broadcast-join filter) and the
    brand/size envelope on the part side; part is a dim → broadcast so
    the disjunction never forces a fact shuffle. One-row output."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, z = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#11") & q.between(1, 20) & z.between(1, 20))
        | ((b == "Brand#22") & q.between(10, 30) & z.between(1, 30))
        | ((b == "Brand#3") & q.between(20, 50) & z.between(1, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                ).cast("long")
            )
            .cast("long")
            .alias("revenue_cents")
        )
    )


# ---------------------------------------------------------------------------
# q19 — TPC-H-Q21 shape: suppliers who alone shipped an order last
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
WITH g AS (
  SELECT l_orderkey, max(l_shipdate) AS max_ship,
         count(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY l_orderkey),
last AS (
  SELECT l.l_orderkey, count(DISTINCT l.l_suppkey) AS n_last,
         max(l.l_suppkey) AS last_supp
  FROM lineitem l JOIN g ON g.l_orderkey = l.l_orderkey
                        AND l.l_shipdate = g.max_ship
  GROUP BY l.l_orderkey)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM g
JOIN last ON last.l_orderkey = g.l_orderkey
JOIN supplier s ON s.s_suppkey = last.last_supp
WHERE g.n_supp > 1 AND last.n_last = 1
GROUP BY s.s_suppkey, s.s_name
"""


@query("q19_waiting_suppliers", _Q19_ORACLE)
def q19_waiting_suppliers(spark, sf_dir):
    """TPC-H-Q21 shape: per supplier, the number of multi-supplier orders
    where that supplier ALONE shipped the last line — the classic
    EXISTS(another supplier) / NOT-EXISTS(another equally-late supplier)
    pair, decorrelated into two per-order aggregates joined back.
    (Adapted to this schema: lateness is the order's max l_shipdate; the
    reference-TPC-H receipt/commit columns don't exist here.)

    Scale shape: both EXISTS branches collapse into groupBy(orderkey)
    aggregates — map-side combinable, one exchange each on the same
    orderkey key (co-partitioned, AQE reuses the layout); the blame
    assignment is an equality join on (orderkey, max_ship), never a
    window over raw lines; supplier is a dim → broadcast. The correlated
    form would rescan lineitem per order."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    g = li.groupBy(F.col("l_orderkey").alias("gk")).agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    last = (
        li.join(
            g,
            (li.l_orderkey == g.gk) & (li.l_shipdate == g.max_ship),
        )
        .groupBy(F.col("gk").alias("ok"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_last"),
            F.max("l_suppkey").alias("last_supp"),
        )
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        g.filter(F.col("n_supp") > 1)
        .join(last, g.gk == last.ok)
        .filter(F.col("n_last") == 1)
        .join(F.broadcast(s), F.col("last_supp") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q20 — TPC-H-Q2 shape: min-cost supplier per part (correlated scalar MIN)
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(min(l_extendedprice / l_quantity) * 100 + 0.5)
              AS BIGINT) AS unit_cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey),
best AS (SELECT l_partkey, min(unit_cost_cents) AS best_cost
         FROM costs GROUP BY l_partkey)
SELECT p.p_partkey, s.s_suppkey, s.s_name, c.unit_cost_cents
FROM costs c
JOIN best b ON b.l_partkey = c.l_partkey AND c.unit_cost_cents = b.best_cost
JOIN part p ON p.p_partkey = c.l_partkey AND p.p_size < 10
JOIN supplier s ON s.s_suppkey = c.l_suppkey
"""


@query("q20_min_cost_supplier", _Q20_ORACLE)
def q20_min_cost_supplier(spark, sf_dir):
    """TPC-H-Q2 shape: for each small part, the supplier(s) offering the
    minimum unit cost — the correlated scalar-MIN subquery, decorrelated
    to a per-part aggregate joined back on equality. (Adapted: lineitem
    is the part⇄supplier price relation — no partsupp table here.)

    Scale shape: unit costs pre-aggregate to (partkey, suppkey) size in
    one map-side-combinable pass; the per-part MIN re-shuffles only that
    reduced relation on partkey (co-partitioned with the join-back —
    one exchange reused); part and supplier are dims → broadcast; the
    p_size predicate prunes the part broadcast before the join. The
    min comparison runs on INTEGER CENTS (floor(x·100 + 0.5), the a12
    discipline) in BOTH engines: at sf0.1 a half-cent-boundary cost hit
    the Spark-vs-DuckDB round() disagreement on doubles, which integer
    cents make impossible."""
    costs = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.floor(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 100
                + 0.5
            )
            .cast("long")
            .alias("unit_cost_cents")
        )
    )
    best = costs.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("unit_cost_cents").alias("best_cost")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") < 10)
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        costs.join(
            best,
            (costs.l_partkey == best.bk)
            & (costs.unit_cost_cents == best.best_cost),
        )
        .join(F.broadcast(p), costs.l_partkey == p.p_partkey)
        .join(F.broadcast(s), costs.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_suppkey", "s_name", "unit_cost_cents")
    )


# ---------------------------------------------------------------------------
# a12 — two-stage salted aggregation over a skewed key
# ---------------------------------------------------------------------------

_A12_ORACLE = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY event_type
"""


@query("a12_salted_agg", _A12_ORACLE)
def a12_salted_agg(spark, sf_dir):
    """Skew-mitigation pattern as a first-class operator: aggregate a
    stream keyed by event_type — FIVE distinct values over billions of
    rows at real scale, the textbook hot-key aggregate — via an explicit
    two-stage salted plan: stage 1 groups on (event_type, salt-of-32) so
    every hot key fans across 32 reducers; stage 2 combines the 5×32
    partials. Results are bit-identical to the direct GROUP BY (the
    oracle), which is the point: salting changes the exchange topology,
    never the answer. Salt is derived from event_id (deterministic — no
    rand(), so re-runs and retried tasks agree). Sums are exact integer
    cents, immune to re-association.

    (Spark's partial aggregation already map-side-combines a plain
    groupBy; the explicit salt matters when the combine ratio is poor —
    high-cardinality aggregation state such as collect_set/percentile
    per hot key — and is the same pattern the engine's O5 salted
    dequeue uses at crawler.py.)"""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("event_id") % 32).alias("salt"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    partial = ev.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"), F.sum("cents").alias("pc")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pc").cast("long").alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# a13 — CUBE grouping sets (completes the a8 ROLLUP family)
# ---------------------------------------------------------------------------

_A13_ORACLE = """
SELECT coalesce(lang, 'ALL')   AS lang_g,
       coalesce(source, 'ALL') AS source_g,
       count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY CUBE (lang, source)
"""


@query("a13_cube", _A13_ORACLE)
def a13_cube(spark, sf_dir):
    """Full CUBE over (lang, source): all four grouping sets — the
    per-cell, two marginals, and the grand total — in ONE pass with
    grouping-set expansion (no self-union of four scans). Exact integer
    outputs. Completes the grouping-set family next to a8's ROLLUP."""
    d = load(spark, sf_dir, "documents")
    return (
        d.cube("lang", "source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang_g"),
            F.coalesce("source", F.lit("ALL")).alias("source_g"),
            "n",
            "chars",
        )
    )


# ---------------------------------------------------------------------------
# w8 — SCD2 validity intervals from an event stream
# ---------------------------------------------------------------------------

_W8_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
c AS (
  SELECT user_id, event_id, event_type, ts_ms,
         lag(event_type) OVER
           (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
  FROM e),
s AS (
  SELECT user_id, event_id, event_type, ts_ms FROM c
  WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type AS state, ts_ms AS valid_from,
       coalesce(lead(ts_ms) OVER
                  (PARTITION BY user_id ORDER BY ts_ms, event_id), -1)
         AS valid_to
FROM s
"""


@query("w8_scd2_intervals", _W8_ORACLE)
def w8_scd2_intervals(spark, sf_dir):
    """SCD2 (slowly-changing-dimension type 2) interval construction: turn
    each user's event stream into validity intervals of their current
    state (event_type) — a row per state CHANGE carrying
    [valid_from, valid_to) in epoch-ms, open intervals as -1. The
    change-detection is lag() ≠ current; the interval close is lead()
    over the change rows only (gaps-and-islands, two windows, zero
    joins).

    Scale shape: both windows partition by user_id — per-user state fits
    a task trivially and the key is as wide as the user population, so no
    single task ever sees more than one user's timeline (contrast a
    global ORDER BY ts). Ordering ties broken by event_id so the result
    is deterministic even when two events share a millisecond."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        ntz_epoch_ms("ts").alias("ts_ms"),
    )
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .drop("prev")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_ms").alias("valid_from"),
        F.coalesce(F.lead("ts_ms").over(w), F.lit(-1)).alias("valid_to"),
    )


# ---------------------------------------------------------------------------
# u7 — CDC changelog apply (MERGE INTO snapshot semantics)
# ---------------------------------------------------------------------------

_U7_ORACLE = """
WITH log AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END
           AS op,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
  FROM events),
latest AS (
  SELECT user_id, op, value_cents, ts_ms,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_ms DESC, event_id DESC) AS rn
  FROM log)
SELECT user_id, value_cents AS last_value_cents, ts_ms AS last_ts_ms
FROM latest WHERE rn = 1 AND op <> 'delete'
"""


@query("u7_apply_changelog", _U7_ORACLE)
def u7_apply_changelog(spark, sf_dir):
    """CDC changelog application — MERGE INTO snapshot semantics: the
    event stream read as a keyed changelog (every event upserts the key's
    (value, ts); 'error' events are delete markers), collapsed to the
    current snapshot: latest operation per key wins, and a key whose
    latest operation is a delete is ABSENT from the snapshot (not a null
    row) — the upsert/delete compaction an Iceberg/Hudi-style merge
    performs on write.

    Scale shape: last-writer-wins is ONE map-side-combinable
    max(struct(ts, event_id, …)) aggregate — the changelog never feeds a
    row_number window (which would sort every key group), and the delete
    filter runs on the |keys|-sized aggregate, not the log. Ordering ties
    broken by event_id; money as exact integer cents."""
    log = load(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            ntz_epoch_ms("ts").alias("ts_ms"),
            F.col("event_id").alias("event_id"),
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("upsert")
            .alias("op"),
            F.floor(F.col("value") * 100 + 0.5)
            .cast("long")
            .alias("value_cents"),
        ).alias("rec"),
    )
    latest = log.groupBy("user_id").agg(F.max("rec").alias("rec"))
    return latest.filter(F.col("rec.op") != "delete").select(
        "user_id",
        F.col("rec.value_cents").alias("last_value_cents"),
        F.col("rec.ts_ms").alias("last_ts_ms"),
    )


# ---------------------------------------------------------------------------
# a14 — equi-width histogram: 16 integer buckets over documents.n_chars
# ---------------------------------------------------------------------------

_A14_NBUCKETS = 16

_A14_ORACLE = f"""
WITH ext AS (
  SELECT min(n_chars) AS lo, max(n_chars) AS hi, count(*) AS total
  FROM documents
)
SELECT CAST(least({_A14_NBUCKETS - 1},
            ({_A14_NBUCKETS} * (d.n_chars - e.lo)) // (e.hi - e.lo + 1))
       AS BIGINT) AS bucket,
       CAST(e.lo + (least({_A14_NBUCKETS - 1},
            ({_A14_NBUCKETS} * (d.n_chars - e.lo)) // (e.hi - e.lo + 1))
            * (e.hi - e.lo + 1)) // {_A14_NBUCKETS} AS BIGINT) AS bucket_lo,
       count(*) AS n_docs,
       CAST(min(d.n_chars) AS BIGINT) AS min_val,
       CAST(max(d.n_chars) AS BIGINT) AS max_val
FROM documents d CROSS JOIN ext e
GROUP BY 1, 2
"""


@query("a14_equiwidth_hist", _A14_ORACLE)
def a14_equiwidth_hist(spark, sf_dir):
    """Equi-width histogram of documents.n_chars in 16 integer buckets —
    the profiling primitive behind every "distribution of page sizes"
    dashboard and behind choosing partition split points. bucket =
    16·(x−lo) div (hi−lo+1), clamped to 15 — pure integer math, so both
    engines bucket identically with no float edge at the boundaries.

    Scale shape: the extent (min/max/count) is ONE map-side-combinable
    aggregate broadcast back onto the scan (1-row build side); the
    histogram itself is a groupBy on ≤16 keys — partial aggregation
    collapses each task to ≤16 rows before the exchange. Two scans
    total, a constant-size shuffle."""
    d = load(spark, sf_dir, "documents")
    ext = d.agg(
        F.min("n_chars").alias("lo"),
        F.max("n_chars").alias("hi"),
        F.count(F.lit(1)).alias("total"),
    )
    n = _A14_NBUCKETS
    bucketed = d.crossJoin(F.broadcast(ext)).select(
        F.expr(
            f"CAST(least({n - 1}, ({n} * (n_chars - lo)) div (hi - lo + 1))"
            " AS BIGINT)"
        ).alias("bucket"),
        F.expr(
            f"CAST(lo + (least({n - 1}, ({n} * (n_chars - lo))"
            f" div (hi - lo + 1)) * (hi - lo + 1)) div {n} AS BIGINT)"
        ).alias("bucket_lo"),
        "n_chars",
    )
    return bucketed.groupBy("bucket", "bucket_lo").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_val"),
        F.max("n_chars").cast("long").alias("max_val"),
    )


# ---------------------------------------------------------------------------
# q21 — TPC-H-Q22 shape: global sales opportunity (anti-join vs avg gate)
# ---------------------------------------------------------------------------

_Q21_CODES = (1, 4, 9, 12, 15, 20, 23)  # the "country code" pool (Q22's I7)

_Q21_ORACLE = f"""
WITH pool AS (
  SELECT c_custkey, c_nationkey % 10 AS cntrycode,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer
  WHERE c_nationkey IN {_Q21_CODES}
),
gate AS (
  SELECT sum(bal_cents) AS tot, count(*) AS n
  FROM pool WHERE bal_cents > 0
)
SELECT cntrycode,
       count(*) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
FROM pool, gate
WHERE bal_cents * n > tot
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = pool.c_custkey)
GROUP BY cntrycode
"""


@query("q21_sales_opportunity", _Q21_ORACLE)
def q21_sales_opportunity(spark, sf_dir):
    """TPC-H-Q22 shape: per country-code count and balance mass of
    customers whose balance beats the pool's positive-balance average but
    who have never placed an order — the classic scalar-subquery +
    NOT-EXISTS decorrelation (reference scripts never need it; a
    warehouse user of the engine does). With no phone column in the
    fixture, cntrycode := c_nationkey % 10 and the Q22 'substring IN
    (...)' pool is a nationkey IN-list that reaches the scan.

    Exactness: the average gate is never materialized as a double —
    balances become integer cents per row (one deterministic IEEE
    multiply + half-up), the gate is the exact integer pair (sum, count),
    and 'bal > avg' is the cross-multiplied integer test
    ``bal_cents * n > tot`` — so Spark and DuckDB cannot disagree on a
    boundary customer no matter the summation order.

    Scale shape: the IN-list predicate is pushed to the customer scan;
    the 1-row gate crossJoins in as a broadcast; NOT EXISTS is a
    left_anti join on custkey (the one shuffle — at 10^10 rows both
    sides bucket on custkey and it is co-partitioned); the final groupBy
    is 10 keys, map-side combinable."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(*_Q21_CODES)
    )
    pool = c.select(
        "c_custkey",
        (F.col("c_nationkey") % 10).alias("cntrycode"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("bal_cents"),
    )
    gate = pool.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    o = load(spark, sf_dir, "orders").select("o_custkey")
    rich = pool.crossJoin(F.broadcast(gate)).filter(
        F.col("bal_cents") * F.col("n") > F.col("tot")
    )
    no_orders = rich.join(
        o, rich.c_custkey == o.o_custkey, "left_anti"
    )
    return no_orders.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal_cents").alias("totacctbal_cents"),
    )
