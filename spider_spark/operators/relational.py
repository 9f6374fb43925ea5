"""Relational operators from SURVEY.md §2 over the TPC-H-ish test tables.

Each function re-expresses one reference behavior (file:line cited) as a
declarative DataFrame plan — filters/projections reach the parquet scan,
small dimensions broadcast, window specs replace Python loops.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spider_spark.operators import load, query

# ---------------------------------------------------------------------------
# Flagship + headline aggregations
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_discount), 6)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_rollup(spark, sf_dir):
    """Flagship grouped rollup (map-side partial agg + single shuffle); the
    engine analog of the reference's per-response accumulation counters
    (/root/reference/suplicmap_vector.py:72,97)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q3_order_revenue",
    """
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d')                   AS orderdate
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def q3_order_revenue(spark, sf_dir):
    """Join-heavy top-k: customer dim broadcast, lineitem↔orders shuffle on
    orderkey (the natural co-partitioning key)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_nation_volume",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
)
def q5_nation_volume(spark, sf_dir):
    """Star join: every dimension (supplier/nation/region) broadcast — one
    big-table scan, zero big-side shuffles before the final agg."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q7_market_share",
    """
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN s.s_nationkey = 2
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 2)      AS nation_volume,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                                               AS total_volume,
           round(round(sum(CASE WHEN s.s_nationkey = 2
                                THEN l.l_extendedprice * (1 - l.l_discount)
                                ELSE 0 END), 2)
                 / round(sum(l.l_extendedprice * (1 - l.l_discount)), 2), 6)
                                               AS mkt_share
    FROM orders o
    JOIN customer l2c ON o.o_custkey = l2c.c_custkey
    JOIN nation cn    ON l2c.c_nationkey = cn.n_nationkey
    JOIN region r     ON cn.n_regionkey = r.r_regionkey
    JOIN lineitem l   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s   ON l.l_suppkey = s.s_suppkey
    WHERE r.r_name = 'ASIA'
    GROUP BY year(o.o_orderdate)
    """,
)
def q7_market_share(spark, sf_dir):
    """TPC-H-Q8-shape market share: NATION_2 suppliers' volume fraction of
    all ASIA-customer order volume per year — the two-level conditional
    aggregate every BI layer runs. All four dimensions broadcast; the only
    big-side exchange is orders x lineitem on orderkey (their natural
    co-partitioning key) plus the final per-year aggregate.

    Float-hash discipline: the share divides the two ALREADY-2dp-ROUNDED
    sums (the rounding that q3/q5 prove hash-stable) and rounds the ratio
    at 6dp — dividing identical doubles is bit-identical cross-engine,
    where a ratio of raw parallel sums could differ in the last ulp."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load(spark, sf_dir, "supplier")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nvol = F.when(F.col("s_nationkey") == 2, vol).otherwise(F.lit(0))
    agg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(F.sum(nvol), 2).alias("nation_volume"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias(
            "mkt_share"
        ),
    )


# ---------------------------------------------------------------------------
# S2 — scan-range planning (ID-window probe)
# ---------------------------------------------------------------------------


@query(
    "s2_scan_windows",
    """
    SELECT min(l_orderkey)                                     AS min_id,
           max(l_orderkey)                                     AS max_id,
           count(DISTINCT l_orderkey)                          AS n_ids,
           CAST(ceil((max(l_orderkey) - min(l_orderkey) + 1) / 1000.0) AS BIGINT)
                                                               AS n_windows
    FROM lineitem
    """,
)
def s2_scan_windows(spark, sf_dir):
    """ID-window scan planning (getIds: sort ids, windows of num_return=1000,
    /root/reference/suplicmap_vector.py:114-163) as a planning-stats agg."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_orderkey").alias("min_id"),
        F.max("l_orderkey").alias("max_id"),
        F.countDistinct("l_orderkey").alias("n_ids"),
        F.ceil((F.max("l_orderkey") - F.min("l_orderkey") + 1) / 1000.0)
        .cast("long")
        .alias("n_windows"),
    )


# ---------------------------------------------------------------------------
# P — projections / filters
# ---------------------------------------------------------------------------


@query(
    "p1_project_rename",
    """
    SELECT p_partkey AS id, p_name AS name, p_brand AS brand,
           p_retailprice AS price
    FROM part WHERE p_size > 20
    """,
)
def p1_project_rename(spark, sf_dir):
    """Column copy with rename + key skip (addField,
    /root/reference/suplicmap_vector.py:166-191) → a pruned projection: the
    scan must read only 5 of 6 columns (ReadSchema check in tests)."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") > 20)
        .select(
            F.col("p_partkey").alias("id"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("brand"),
            F.col("p_retailprice").alias("price"),
        )
    )


@query(
    "p2_name_sanitize",
    r"""
    SELECT p_partkey,
           replace(regexp_replace(p_name, '[-!&<>"''?@=$~^`#%*()/\\:;{}\[\]|+.]', '_', 'g'),
                   ' ', '') AS clean_name
    FROM part
    """,
)
def p2_name_sanitize(spark, sf_dir):
    """check_name sanitization (/root/reference/suplicmap_vector.py:273-277):
    punctuation → '_', spaces stripped. Pure codegen expressions."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_replace(
            F.regexp_replace(
                F.col("p_name"), r"""[-!&<>"'?@=$~^`#%*()/\\:;{}\[\]|+.]""", "_"
            ),
            " ",
            "",
        ).alias("clean_name"),
    )


@query(
    "p4_range_filter",
    """
    SELECT p_partkey, p_size, p_retailprice FROM part
    WHERE p_size BETWEEN 10 AND 30 AND p_retailprice BETWEEN 500 AND 1500
    """,
)
def p4_range_filter(spark, sf_dir):
    """bbox filter (/root/reference/getSuggestionPlace.py:31-34) — pushed
    predicates on two range dimensions."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 30))
        .filter(F.col("p_retailprice").between(500, 1500))
        .select("p_partkey", "p_size", "p_retailprice")
    )


@query(
    "p6_first_match_per_group",
    """
    SELECT c_custkey, o_orderkey AS first_f_order
    FROM (
      SELECT c.c_custkey, o.o_orderkey,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_orderdate, o.o_orderkey) AS rn
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      WHERE o.o_orderstatus = 'F'
    ) WHERE rn = 1
    """,
)
def p6_first_match_per_group(spark, sf_dir):
    """First-match-with-key filter (/root/reference/getGeocode.py:38-48):
    first qualifying row per group via a window rank."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    w = Window.partitionBy("c_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", F.col("o_orderkey").alias("first_f_order"))
    )


@query(
    "p7_preference_first",
    """
    SELECT o_custkey, o_orderkey AS picked_order, o_totalprice AS picked_price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_totalprice <= 200000 AS INT), o_orderdate, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def p7_preference_first(spark, sf_dir):
    """price>0-preference pick (/root/reference/getDirection.py:251-254):
    first row satisfying the predicate, else first row — one ordered rank."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        (F.col("o_totalprice") <= 200000).cast("int"), "o_orderdate", "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("picked_order"),
            F.col("o_totalprice").alias("picked_price"),
        )
    )


@query(
    "p9_placeholder_skip",
    """
    SELECT event_id, event_type, round(value, 2) AS value
    FROM events WHERE event_type <> 'error'
    """,
)
def p9_placeholder_skip(spark, sf_dir):
    """'--' cell skip (/root/reference/zjj_sz_gov_cn.py:219-221) as a
    pushed inequality filter."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") != "error")
        .select("event_id", "event_type", F.round("value", 2).alias("value"))
    )


@query(
    "p10_trailing_strip",
    """
    SELECT n_nationkey,
           CASE WHEN substr(n_name, length(n_name), 1) IN ('A','E','O')
                THEN substr(n_name, 1, length(n_name) - 1) ELSE n_name END AS stem
    FROM nation
    """,
)
def p10_trailing_strip(spark, sf_dir):
    """Trailing-direction-char strip (/root/reference/getSuggestionPlace.py:21-22)."""
    n = load(spark, sf_dir, "nation")
    last = F.substring(F.col("n_name"), -1, 1)
    return n.select(
        "n_nationkey",
        F.when(
            last.isin("A", "E", "O"),
            F.expr("substring(n_name, 1, length(n_name) - 1)"),
        )
        .otherwise(F.col("n_name"))
        .alias("stem"),
    )


@query(
    "p11_split_substring",
    """
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS type_head,
           split_part(p_type, ' ', -1) AS type_tail
    FROM part
    """,
)
def p11_split_substring(spark, sf_dir):
    """Region/address split around a delimiter (/root/reference/getGeocode.py:26-28)."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.element_at(F.split(F.col("p_type"), " "), -1).alias("type_tail"),
    )


# ---------------------------------------------------------------------------
# J — joins
# ---------------------------------------------------------------------------


@query(
    "j1_listing_detail",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def j1_listing_detail(spark, sf_dir):
    """List→detail fetch join (/root/reference/zjj_sz_gov_cn.py:197-227):
    pre-crawled details become a broadcast equi-join on the href key."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = load(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "j2_cross_modes",
    """
    SELECT r.r_name, m.event_type AS mode
    FROM region r CROSS JOIN (SELECT DISTINCT event_type FROM events) m
    """,
)
def j2_cross_modes(spark, sf_dir):
    """OD-pair × travel-mode expansion (/root/reference/getDirection.py:242-352)
    as an explicit small-small cross join."""
    r = load(spark, sf_dir, "region")
    m = load(spark, sf_dir, "events").select("event_type").distinct()
    return r.crossJoin(m).select("r_name", F.col("event_type").alias("mode"))


@query(
    "j3_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j3_anti_join(spark, sf_dir):
    """Failed-set / not-yet-done anti-join (retry drain,
    /root/reference/suplicmap_vector2.py:131-142; the frontier's
    'discovered minus done' primitive)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


@query(
    "j4_broadcast_lookup",
    """
    SELECT n.n_name AS nation, r.r_name AS region
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j4_broadcast_lookup(spark, sf_dir):
    """Tiny-dim lod lookup (/root/reference/suplicmap_tilemap.py:182-185) —
    broadcast hash join, no shuffle."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    )


@query(
    "j6_union_by_name",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def j6_union_by_name(spark, sf_dir):
    """Header-union over varying record keys (json2csv,
    /root/reference/zjj_sz_gov_cn.py:40-58) → unionByName with missing
    columns null-filled."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_totalprice")
    return a.unionByName(b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# A — aggregations
# ---------------------------------------------------------------------------


@query(
    "a1_conditional_rollup",
    """
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
             AS purchase_value,
           count(CASE WHEN event_type = 'view' THEN 1 END)  AS views,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks
    FROM events GROUP BY user_id
    """,
)
def a1_conditional_rollup(spark, sf_dir):
    """Per-route step rollup with type predicates (cal_steps,
    /root/reference/getDirection.py:18-37): sum-where / count-where."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0)),
            2,
        ).alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
    )


@query(
    "a2_count_pages",
    """
    SELECT count(*) AS n_records,
           CAST(ceil(count(*) / 20.0) AS BIGINT) AS n_pages
    FROM orders
    """,
)
def a2_count_pages(spark, sf_dir):
    """Record-count probe → pageCount = ceil(n/20)
    (/root/reference/zjj_sz_gov_cn.py:80-85,130-133)."""
    return load(spark, sf_dir, "orders").agg(
        F.count("*").alias("n_records"),
        F.ceil(F.count("*") / 20.0).cast("long").alias("n_pages"),
    )


@query(
    "a3_distinct_set",
    "SELECT DISTINCT c_mktsegment FROM customer",
)
def a3_distinct_set(spark, sf_dir):
    """Distinct-set accumulation (land_type.add,
    /root/reference/zjj_sz_gov_cn.py:152-175)."""
    return load(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@query(
    "a5_progress_counters",
    """
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def a5_progress_counters(spark, sf_dir):
    """Progress/dead-link tallies (/root/reference/suplicmap_vector2.py:155-158)
    as observable per-class counters."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )


@query(
    "a6_schema_union_keys",
    """
    SELECT DISTINCT unnest(json_keys(props)) AS key FROM events
    """,
)
def a6_schema_union_keys(spark, sf_dir):
    """Schema-union fold over open-schema dict rows
    (/root/reference/zjj_sz_gov_cn.py:40-44): union of JSON keys."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.explode(
                F.map_keys(F.from_json(F.col("props"), "map<string,string>"))
            ).alias("key")
        )
        .distinct()
    )


@query(
    "a7_approx_distinct",
    """
    SELECT CAST(approx_count_distinct(l_partkey) AS BIGINT) >= 1 AS nonzero,
           count(DISTINCT l_partkey) AS exact_distinct
    FROM lineitem
    """,
)
def a7_approx_distinct(spark, sf_dir):
    """approx_count_distinct for URL-cardinality-style metrics (SURVEY.md
    §2.4 note). HLL sketches differ across engines, so only the exactness
    bound is compared; the exact count anchors the value hash."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        (F.approx_count_distinct("l_partkey") >= 1).alias("nonzero"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
    )


# ---------------------------------------------------------------------------
# W — windows
# ---------------------------------------------------------------------------


@query(
    "w1_adjacent_pairs",
    """
    SELECT user_id, count(*) AS transfers
    FROM (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ) WHERE event_type = 'purchase' AND prev = 'purchase'
    GROUP BY user_id
    """,
)
def w1_adjacent_pairs(spark, sf_dir):
    """Adjacent-pair transfer count (/root/reference/getDirection.py:19-35):
    lag over an ordered per-group window."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter((F.col("event_type") == "purchase") & (F.col("prev") == "purchase"))
        .groupBy("user_id")
        .agg(F.count("*").alias("transfers"))
    )


@query(
    "w2_latest_per_group",
    """
    SELECT user_id, event_id AS latest_event, event_type AS latest_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def w2_latest_per_group(spark, sf_dir):
    """First/last-per-group selection (W2; /root/reference/getDirection.py:251-254)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event"),
            F.col("event_type").alias("latest_type"),
        )
    )


@query(
    "w3_sliding_avg",
    """
    SELECT event_id,
           floor((avg(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
           ) / 100.0) * 10000 + 0.5) / 10000 AS avg_24h
    FROM events
    """,
)
def w3_sliding_avg(spark, sf_dir):
    """24h sliding average (the reference scrapes it pre-computed,
    /root/reference/getRJWData.py:16-24; here recomputed as a range-frame
    window). Averaged over exact integer cents so the cross-engine float
    summation order can't shift the rounded result."""
    from spider_spark.operators import ntz_epoch_s

    e = (
        load(spark, sf_dir, "events")
        .withColumn("ts_s", ntz_epoch_s("ts").cast("long"))
        .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-86400, Window.currentRow)
    )
    # floor(x·1e4+0.5)/1e4 instead of round(): floor on identical doubles is
    # engine-agnostic, while round() differs (JVM BigDecimal HALF_UP vs
    # DuckDB binary rounding) exactly on .xxxx5 halves.
    return e.select(
        "event_id",
        (F.floor((F.avg("cents").over(w) / 100.0) * 10000 + 0.5) / 10000).alias(
            "avg_24h"
        ),
    )


# ---------------------------------------------------------------------------
# O — sort / top-k
# ---------------------------------------------------------------------------


@query(
    "o1_sorted_scan",
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
)
def o1_sorted_scan(spark, sf_dir):
    """ids.sort() ascending crawl order (/root/reference/suplicmap_vector.py:138-140)."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "o2_global_top1",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    """,
)
def o2_global_top1(spark, sf_dir):
    """routes[0] top-1 (/root/reference/getDirection.py:105,249) — Spark
    plans TakeOrderedAndProject, no full sort."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(1)
    )


@query(
    "o5_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def o5_topk_per_group(spark, sf_dir):
    """Dequeue-top-K-per-host generalization (SURVEY.md O5): windowed top-3
    per customer — the same shape the frontier dequeue uses."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# U — set ops
# ---------------------------------------------------------------------------


@query(
    "u1_union_all",
    """
    SELECT l_orderkey, l_extendedprice FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT l_orderkey, l_extendedprice FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def u1_union_all(spark, sf_dir):
    """Per-batch page union (feaColl concatenation,
    /root/reference/suplicmap_pnr_sz.py:49)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_extendedprice")
    b = li.filter(F.col("l_returnflag") == "A").select("l_orderkey", "l_extendedprice")
    return a.union(b)


@query(
    "u2_except",
    """
    SELECT o_orderkey FROM orders
    EXCEPT
    SELECT l_orderkey AS o_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def u2_except(spark, sf_dir):
    """Retry-queue drain / except (failed_urls.pop,
    /root/reference/suplicmap_vector2.py:134-141)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    done = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return o.subtract(done)  # EXCEPT (distinct) semantics


@query(
    "u5_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderdate <  TIMESTAMP '1995-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    """,
)
def u5_intersect(spark, sf_dir):
    """INTERSECT (distinct) — customers active in both halves of the order
    history (the 'seen in both crawls' retained-host primitive, the dual
    of u2's drain). Spark plans intersect as a distinct-aggregated semi
    join on the full row — one exchange per side on the natural key."""
    o = load(spark, sf_dir, "orders")
    early = o.filter(F.col("o_orderdate") < F.lit("1995-01-01")).select(
        "o_custkey"
    )
    late = o.filter(F.col("o_orderdate") >= F.lit("1995-01-01")).select(
        "o_custkey"
    )
    return early.intersect(late)


@query(
    "u6_except_all",
    """
    SELECT l_suppkey AS suppkey FROM lineitem
    EXCEPT ALL
    SELECT s_suppkey AS suppkey FROM supplier
    """,
)
def u6_except_all(spark, sf_dir):
    """EXCEPT ALL — bag-semantics difference (each left occurrence consumes
    at most one matching right occurrence), the multiset dual of u2's
    distinct EXCEPT: re-fetch queues where the SAME url can be pending
    multiple times and one completion retires one attempt
    (/root/reference/suplicmap_vector2.py:134-141 pops one failure per
    success). Spark plans ``exceptAll`` as a count-difference generate —
    one exchange per side on the row key, no join blowup; identical
    multiset semantics to DuckDB's EXCEPT ALL."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey")
    )
    return li.exceptAll(s)


# ---------------------------------------------------------------------------
# F — scalar functions
# ---------------------------------------------------------------------------


@query(
    "f2_regexp_extract_num",
    r"""
    SELECT event_id,
           CAST(coalesce(nullif(regexp_extract(props, '(\d+(\.\d+)?)', 1), ''), '0') AS DOUBLE)
             AS num
    FROM events
    """,
)
def f2_regexp_extract_num(spark, sf_dir):
    """get_num (/root/reference/zjj_sz_gov_cn.py:178-184): first numeric
    token, 0 when absent."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(
            F.nullif(F.regexp_extract("props", r"(\d+(\.\d+)?)", 1), F.lit("")),
            F.lit("0"),
        )
        .cast("double")
        .alias("num"),
    )


@query(
    "f5_epoch_ms_date",
    """
    SELECT o_orderkey,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS epoch_ms,
           strftime(o_orderdate, '%Y-%m-%d')     AS day
    FROM orders
    """,
)
def f5_epoch_ms_date(spark, sf_dir):
    """Epoch-ms ↔ yyyy-MM-dd (/root/reference/suplicmap_vector.py:183-186)."""
    from spider_spark.operators import ntz_epoch_ms

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        ntz_epoch_ms("o_orderdate").alias("epoch_ms"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
    )


@query(
    "f6_date_parts",
    """
    SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
           count(*) AS n
    FROM events GROUP BY 1, 2, 3, 4
    """,
)
def f6_date_parts(spark, sf_dir):
    """strftime partition parts (/root/reference/getRJWData.py:25-30) — the
    partitioned-write key derivation (S16)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
    ).agg(F.count("*").alias("n"))


@query(
    "f7_hour_sequence",
    """
    SELECT CAST(h AS BIGINT) AS hour_idx,
           strftime(TIMESTAMP '2024-01-01 00:00:00' + h * INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:00') AS hour_ts
    FROM generate_series(0, 23) t(h)
    """,
)
def f7_hour_sequence(spark, sf_dir):
    """Hourly time-range scan enumeration
    (/root/reference/getRJWData.py:141-146): sequence + explode replaces the
    timedelta loop."""
    return spark.range(0, 24).select(
        F.col("id").alias("hour_idx"),
        F.date_format(
            F.expr(
                "timestampadd(HOUR, id, TIMESTAMP_NTZ '2024-01-01 00:00:00')"
            ),
            "yyyy-MM-dd HH:00",
        ).alias("hour_ts"),
    )


@query(
    "f8_md5_token",
    "SELECT c_custkey, md5(c_name) AS token FROM customer",
)
def f8_md5_token(spark, sf_dir):
    """md5 request token (/root/reference/getRJWData2.py:66-70)."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey", F.md5(F.col("c_name").cast("binary")).alias("token")
    )


@query(
    "f9_tile_math",
    """
    SELECT p_partkey,
           CAST(floor(abs((2000.0 - p_retailprice) / 256.0)) AS BIGINT) AS tile_row,
           CAST(floor(abs(p_size / 4.0)) AS BIGINT)                     AS tile_col
    FROM part
    """,
)
def f9_tile_math(spark, sf_dir):
    """Tile col/row arithmetic floor(abs((x0-x)/(size*res)))
    (/root/reference/suplicmap_tilemap.py:188-192)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.floor(F.abs((F.lit(2000.0) - F.col("p_retailprice")) / 256.0))
        .cast("long")
        .alias("tile_row"),
        F.floor(F.abs(F.col("p_size") / 4.0)).cast("long").alias("tile_col"),
    )


@query(
    "f10_mercator_math",
    """
    SELECT c_custkey,
           floor(ln(tan(pi() / 4 + (abs(c_acctbal) % 80) * pi() / 360)) * 1e6 + 0.5) / 1e6
             AS merc_y,
           floor(cos((abs(c_acctbal) % 80) * pi() / 180) * 1e6 + 0.5) / 1e6
             AS cos_lat
    FROM customer
    """,
)
def f10_mercator_math(spark, sf_dir):
    """WebMercator tile math log/tan/cos (/root/reference/tianditu.py:12-22).

    floor(x·1e6+0.5)/1e6 instead of round(x, 6) on BOTH sides: floor on
    identical doubles is engine-agnostic, while round() goes through JVM
    BigDecimal HALF_UP vs DuckDB binary rounding and diverges on half-way
    values (the round-1 driver hash mismatch)."""
    c = load(spark, sf_dir, "customer")
    lat = F.abs(F.col("c_acctbal")) % 80
    pi = 3.141592653589793
    merc = F.log(F.tan(F.lit(pi / 4) + lat * pi / 360))
    cosl = F.cos(lat * pi / 180)
    return c.select(
        "c_custkey",
        (F.floor(merc * 1e6 + 0.5) / 1e6).alias("merc_y"),
        (F.floor(cosl * 1e6 + 0.5) / 1e6).alias("cos_lat"),
    )


@query(
    "f13_round_cost",
    """
    SELECT o_orderkey, round(0.56 * o_totalprice / 1000, 6) AS cost
    FROM orders
    """,
)
def f13_round_cost(spark, sf_dir):
    """Cost formula 0.56·distance/1000 with 6-dp rounding
    (/root/reference/getDirection.py:185,331; rounding
    /root/reference/coordsTransform.py:8,37-39)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(0.56 * F.col("o_totalprice") / 1000, 6).alias("cost")
    )


@query(
    "f15_format_url",
    """
    SELECT r_regionkey,
           printf('http://api.test/query?region=%s&key=%05d', lower(r_name), r_regionkey)
             AS url
    FROM region
    """,
)
def f15_format_url(spark, sf_dir):
    """URL construction from format templates
    (/root/reference/suplicmap_tilemap.py:91; /root/reference/getDirection.py:99-100)."""
    return load(spark, sf_dir, "region").select(
        "r_regionkey",
        F.format_string(
            "http://api.test/query?region=%s&key=%05d",
            F.lower(F.col("r_name")),
            F.col("r_regionkey"),
        ).alias("url"),
    )


@query(
    "f16_url_parse",
    """
    SELECT r_regionkey,
           split_part(printf('http://h%d.test/a/b/c', r_regionkey), '/', 3) AS host,
           split_part(printf('http://h%d.test/a/b/c', r_regionkey), '/', -1) AS leaf
    FROM region
    """,
)
def f16_url_parse(spark, sf_dir):
    """URL path-segment split (/root/reference/suplicmap_vector2.py:63-66)."""
    r = load(spark, sf_dir, "region")
    url = F.format_string("http://h%d.test/a/b/c", F.col("r_regionkey"))
    return r.select(
        "r_regionkey",
        F.split(url, "/").getItem(2).alias("host"),
        F.element_at(F.split(url, "/"), -1).alias("leaf"),
    )


@query(
    "f17_json_access",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total
    FROM events GROUP BY event_type
    """,
)
def f17_json_access(spark, sf_dir):
    """Nested JSON field access (/root/reference/getDirection.py:44-48,105-118)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("k_total")
    )


@query(
    "j9_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 150000)
    """,
)
def j9_semi_join(spark, sf_dir):
    """Existence probe as LEFT SEMI join — the dual of j3's anti-join
    (reference shape: 'only hosts with at least one pending high-priority
    URL enter this round', the frontier's budget pre-filter). A semi join
    carries no payload columns from the probe side, so Spark never
    materializes or deduplicates the orders rows — at 10^10 orders that is
    the difference between a semi-join exchange of keys and a join+distinct
    that shuffles the whole fact table twice."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_name")


@query(
    "q6_selective_agg",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
               AS revenue_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate <  TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_selective_agg(spark, sf_dir):
    """Highly selective scan-to-scalar aggregate (TPC-H Q6 shape): all four
    predicates must reach the parquet scan as PushedFilters and the read
    schema must shrink to the four referenced columns — the canonical
    pushdown-or-die query. The sum is taken over exact integers (price
    cents × discount percent, both 2-dp values recovered by round()) so
    the result is independent of float fold order and bit-identical across
    engines. One partial-agg exchange of a single row per partition; no
    shuffle of data."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(cents * pct).cast("long").alias("revenue_e4"))
    )
