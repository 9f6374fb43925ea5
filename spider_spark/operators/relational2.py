"""Second batch of relational operators: sessionization, rollup cubes,
nested-JSON route analytics (the Baidu directions shape), catalog and
tile-grid scans — the remaining SURVEY.md §2 rows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_spark.operators import load, query

# ---------------------------------------------------------------------------
# W4 — sessionization (gaps-and-islands): the stateful-streaming shape
# (SURVEY.md §2.9 applyInPandasWithState analog) expressed as lag+cumsum
# ---------------------------------------------------------------------------


@query(
    "w4_sessionize",
    """
    SELECT user_id, session_id,
           count(*)                                       AS n_events,
           CAST(floor(epoch(max(ts))) AS BIGINT)
             - CAST(floor(epoch(min(ts))) AS BIGINT)      AS duration_s
    FROM (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id))
                    > 1800 OR lag(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events)
    ) GROUP BY user_id, session_id
    """,
)
def w4_sessionize(spark, sf_dir):
    """30-min-gap sessionization via lag + running sum — the batch
    equivalent of a stateful streaming session operator."""
    from spider_spark.operators import ntz_epoch_s

    e = load(spark, sf_dir, "events").withColumn("ts_s", ntz_epoch_s("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "new_session",
        F.when(
            F.col("ts_s") - F.lag("ts_s").over(w) > 1800, F.lit(1)
        ).when(F.lag("ts_s").over(w).isNull(), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.floor(F.max("ts_s")) - F.floor(F.min("ts_s")))
        .cast("long")
        .alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# A8 — rollup (the engine's metrics-cube; absent in the reference, SURVEY §2.4)
# ---------------------------------------------------------------------------


@query(
    "a8_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL')  AS flag,
           coalesce(l_linestatus, 'ALL')  AS status,
           count(*)                       AS n,
           round(sum(l_quantity), 2)      AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a8_rollup(spark, sf_dir):
    """Hierarchical ROLLUP aggregate — one pass, grouping-set expansion."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n",
            "qty",
        )
    )


# ---------------------------------------------------------------------------
# F17/A1/W1 on the real nested shape: Baidu routes JSON
# (/root/reference/getDirection.py:18-37,99-118) — build the nested doc with
# to_json(collect_list(struct)), parse back with from_json, explode, roll up.
# The oracle computes the same result from the flat tables directly, proving
# the JSON round-trip preserves semantics.
# ---------------------------------------------------------------------------

_ROUTES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("line", T.IntegerType()),
            T.StructField("dist", T.DoubleType()),
            T.StructField("mode", T.StringType()),
        ]
    )
)


@query(
    "f18_nested_routes",
    """
    SELECT l_orderkey AS trip_id,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END), 2)
             AS walk_dist,
           count(*) AS n_steps
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def f18_nested_routes(spark, sf_dir):
    """Nested array<struct> round-trip: lineitem rows → JSON 'route steps'
    per order → from_json → explode → conditional rollup (the cal_steps
    walk-distance sum, /root/reference/getDirection.py:18-37)."""
    li = load(spark, sf_dir, "lineitem")
    docs = li.groupBy("l_orderkey").agg(
        F.to_json(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("line"),
                    F.col("l_quantity").alias("dist"),
                    F.col("l_returnflag").alias("mode"),
                )
            )
        ).alias("routes_json")
    )
    steps = docs.select(
        F.col("l_orderkey").alias("trip_id"),
        F.explode(F.from_json("routes_json", _ROUTES_SCHEMA)).alias("step"),
    )
    return steps.groupBy("trip_id").agg(
        F.round(
            F.sum(F.when(F.col("step.mode") == "R", F.col("step.dist")).otherwise(0.0)),
            2,
        ).alias("walk_dist"),
        F.count("*").alias("n_steps"),
    )


# ---------------------------------------------------------------------------
# S5 — service-catalog scan (meta-crawl): explode a catalog JSON document
# into a layer worklist (/root/reference/suplicmap_vector_batch.py:49-93)
# ---------------------------------------------------------------------------

_CATALOG_JSON = (
    '{"services":['
    '{"name":"PNR","layers":[{"id":0,"type":"Feature Layer"},'
    '{"id":1,"type":"Group Layer"},{"id":2,"type":"Feature Layer"}]},'
    '{"name":"BASE","layers":[{"id":0,"type":"Feature Layer"}]},'
    '{"name":"TILE","layers":[]}]}'
)

_CATALOG_SCHEMA = (
    "struct<services:array<struct<name:string,"
    "layers:array<struct<id:int,type:string>>>>>"
)


@query(
    "s5_catalog_scan",
    """
    SELECT 'PNR' AS service, 0 AS layer_id
    UNION ALL SELECT 'PNR', 2
    UNION ALL SELECT 'BASE', 0
    """,
)
def s5_catalog_scan(spark, sf_dir):
    """Catalog JSON → crawl worklist: explode services → explode layers →
    keep 'Feature Layer' (P5 layer-type filter,
    /root/reference/suplicmap_vector2.py:264-266). The oracle pins the
    expected worklist, proving the explode+filter pipeline."""
    doc = spark.range(1).select(
        F.from_json(F.lit(_CATALOG_JSON), _CATALOG_SCHEMA).alias("cat")
    )
    svc = doc.select(F.explode("cat.services").alias("svc"))
    layers = svc.select(
        F.col("svc.name").alias("service"), F.explode("svc.layers").alias("layer")
    )
    return layers.filter(F.col("layer.type") == "Feature Layer").select(
        "service", F.col("layer.id").alias("layer_id")
    )


# ---------------------------------------------------------------------------
# S6 — tile-grid scan: enumerate (level, row, col) from grid metadata
# (/root/reference/suplicmap_tilemap.py:88-103,188-192)
# ---------------------------------------------------------------------------


@query(
    "s6_tile_grid",
    """
    SELECT lvl AS level, r AS row, c AS col,
           printf('%d/%d_%d.png', lvl, r, c) AS tile_path
    FROM generate_series(3, 4) t(lvl),
         generate_series(0, 7) t2(r),
         generate_series(0, 7) t3(c)
    WHERE r < CAST(pow(2, lvl - 1) AS BIGINT) AND c < CAST(pow(2, lvl) AS BIGINT)
    """,
)
def s6_tile_grid(spark, sf_dir):
    """Tile-pyramid enumeration as range crossJoin — the fetch worklist the
    reference builds with nested loops; {row}_{col}.png naming
    (/root/reference/suplicmap_tilemap.py:168-179)."""
    levels = spark.range(3, 5).select(F.col("id").cast("int").alias("level"))
    rows = spark.range(0, 8).select(F.col("id").cast("int").alias("row"))
    cols = spark.range(0, 8).select(F.col("id").cast("int").alias("col"))
    grid = levels.crossJoin(rows).crossJoin(cols)
    return grid.filter(
        (F.col("row") < F.pow(F.lit(2.0), F.col("level") - 1).cast("long"))
        & (F.col("col") < F.pow(F.lit(2.0), F.col("level")).cast("long"))
    ).select(
        "level",
        "row",
        "col",
        F.format_string("%d/%d_%d.png", "level", "row", "col").alias("tile_path"),
    )


# ---------------------------------------------------------------------------
# O3 — stable order-of-first-appearance (header sort,
# /root/reference/zjj_sz_gov_cn.py:42-44: headers sorted by first index)
# ---------------------------------------------------------------------------


@query(
    "o3_first_appearance",
    """
    SELECT event_type, min(event_id) AS first_seen
    FROM events GROUP BY event_type ORDER BY first_seen
    """,
)
def o3_first_appearance(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.min("event_id").alias("first_seen"))
        .orderBy("first_seen")
    )


# ---------------------------------------------------------------------------
# F21 — ESRIJSON/GeoJSON feature parse (/root/reference/suplicmap_vector.py:87-95,
# /root/reference/suplicmap_pnr_sz.py:96-99): nested geometry JSON → typed
# struct → per-feature vertex counts + bbox
# ---------------------------------------------------------------------------

_FEATURES_JSON = (
    '{"features":['
    '{"attributes":{"OBJECTID":1,"NAME":"宗地A"},'
    '"geometry":{"rings":[[[113.9,22.5],[113.91,22.5],[113.91,22.51],[113.9,22.5]]]}},'
    '{"attributes":{"OBJECTID":2,"NAME":"宗地B"},'
    '"geometry":{"rings":[[[114.0,22.6],[114.02,22.6],[114.02,22.62],'
    '[114.0,22.62],[114.0,22.6]]]}}]}'
)

_FEATURES_SCHEMA = (
    "struct<features:array<struct<"
    "attributes:struct<OBJECTID:bigint,NAME:string>,"
    "geometry:struct<rings:array<array<array<double>>>>>>>"
)


@query(
    "f21_esrijson_parse",
    """
    SELECT 1 AS objectid, '宗地A' AS name, 4 AS n_vertices,
           113.9 AS xmin, 113.91 AS xmax
    UNION ALL
    SELECT 2, '宗地B', 5, 114.0, 114.02
    """,
)
def f21_esrijson_parse(spark, sf_dir):
    """Parse the ESRIJSON feature page shape into typed structs, explode
    features, compute ring vertex count and x-extent with higher-order
    array functions (no UDF). Oracle pins the expected values."""
    doc = spark.range(1).select(
        F.from_json(F.lit(_FEATURES_JSON), _FEATURES_SCHEMA).alias("d")
    )
    feats = doc.select(F.explode("d.features").alias("f"))
    ring = F.col("f.geometry.rings").getItem(0)
    xs = F.transform(ring, lambda pt: pt.getItem(0))
    return feats.select(
        F.col("f.attributes.OBJECTID").cast("int").alias("objectid"),
        F.col("f.attributes.NAME").alias("name"),
        F.size(ring).alias("n_vertices"),
        F.array_min(xs).alias("xmin"),
        F.array_max(xs).alias("xmax"),
    )


# ---------------------------------------------------------------------------
# J5 — tile-name → mosaic pixel offset (theta join via arithmetic,
# /root/reference/merge_tiles.py:87-92): parse "{row}_{col}.png", place at
# ((col-min_col)·256, (row-min_row)·256)
# ---------------------------------------------------------------------------


@query(
    "j5_tile_placement",
    """
    WITH tiles AS (
      SELECT printf('%d_%d.png', r, c) AS fname
      FROM generate_series(5, 9) t(r), generate_series(12, 15) t2(c)
    ),
    parsed AS (
      SELECT fname,
             CAST(split_part(fname, '_', 1) AS BIGINT) AS row,
             CAST(split_part(split_part(fname, '_', 2), '.', 1) AS BIGINT) AS col
      FROM tiles
    )
    SELECT fname, (col - min(col) OVER ()) * 256 AS px,
                  (row - min(row) OVER ()) * 256 AS py
    FROM parsed
    """,
)
def j5_tile_placement(spark, sf_dir):
    rows = spark.range(5, 10).select(F.col("id").alias("r"))
    cols = spark.range(12, 16).select(F.col("id").alias("c"))
    tiles = rows.crossJoin(cols).select(
        F.format_string("%d_%d.png", "r", "c").alias("fname")
    )
    parsed = tiles.select(
        "fname",
        F.split("fname", "_").getItem(0).cast("long").alias("row"),
        F.split(F.split("fname", "_").getItem(1), r"\.").getItem(0)
        .cast("long")
        .alias("col"),
    )
    # global min via a 1-row aggregate broadcast-cross-joined back — an
    # unpartitioned window would funnel the whole mosaic through one task
    origin = parsed.agg(
        F.min("col").alias("min_col"), F.min("row").alias("min_row")
    )
    return parsed.crossJoin(F.broadcast(origin)).select(
        "fname",
        ((F.col("col") - F.col("min_col")) * 256).alias("px"),
        ((F.col("row") - F.col("min_row")) * 256).alias("py"),
    )


@query(
    "w5_quality_deciles",
    """
    SELECT doc_id, lang,
           CAST(ntile(10) OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS BIGINT)
               AS decile
    FROM documents
    """,
)
def w5_quality_deciles(spark, sf_dir):
    """Per-language quality deciles (ntile) over document length — the
    bucket assignment a CCNet-style per-language quality-filtered corpus
    cut consumes (keep deciles 8–10 of each language, drop the tail).
    The (n_chars, doc_id) order is total, so the assignment is
    deterministic and engine-independent.

    Scale note: exact ntile needs a total order per language, and a
    window PARTITION BY lang puts each whole language in one task — fine
    at oracle scale, a hot-spot at 10^9 docs/language. The 100 TB path is
    :func:`w6_decile_sketch` below (approx_percentile boundaries broadcast
    back as a range filter — same downstream contract, boundaries off by
    the sketch error); tests/test_operators2.py pins sketch-vs-exact
    agreement at oracle scale — the same exact-oracle-vs-scale-path split
    as d2/d3."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "lang",
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


# w6's oracle reproduces Spark's Greenwald-Khanna approx_percentile
# exactly: below the accuracy threshold (10k samples/group) the sketch
# retains every value, and the returned boundary is the element at
# 1-based rank ceil(p·n) computed in DOUBLE arithmetic (p = k/10 as an
# IEEE double, so e.g. 0.1·70 = 7.000000000000001 → rank 8, not 7).
# CAST(k AS DOUBLE)/10 rounds to the same double as the literal Spark
# sees, keeping both engines bit-identical — verified at sf0.001/0.01/0.1
# across every language before this was committed.
_W6_ORACLE = """
WITH g AS (
  SELECT lang, list_sort(list(n_chars)) AS v, count(*) AS n
  FROM documents GROUP BY lang
), b AS (
  SELECT lang,
         list_transform(range(1, 10),
                        k -> v[CAST(ceil(CAST(k AS DOUBLE) / 10 * n) AS INT)])
           AS bounds
  FROM g
)
SELECT d.doc_id, d.lang,
       CAST(1 + len(list_filter(b.bounds, x -> d.n_chars > x)) AS BIGINT)
         AS decile
FROM documents d JOIN b USING (lang)
"""


@query("w6_decile_sketch", _W6_ORACLE)
def w6_decile_sketch(spark, sf_dir):
    """w5's 100 TB path: per-language decile assignment WITHOUT a
    per-language window. approx_percentile (Greenwald-Khanna, mergeable
    map-side — each partition sketches locally, partials merge on the
    driver-sized |langs|-row aggregate) produces the 9 boundary values per
    language; that tiny table broadcasts back and the decile is a pure
    range count (1 + #boundaries below n_chars) — zero-exchange on the
    corpus beyond the one boundary agg. Ties all land in one decile
    (threshold semantics) where exact ntile splits them by doc_id, which
    is the documented sketch-vs-exact tolerance; at 10^9 docs/language the
    boundaries are off by at most the sketch's rank error ε·n
    (ε = 1/accuracy), and no task ever holds a whole language.

    Validated against exact w5 (bucket sizes, per-doc drift) in
    tests/test_operators2.py."""
    d = load(spark, sf_dir, "documents")
    bounds = d.groupBy("lang").agg(
        F.percentile_approx(
            "n_chars", [i / 10 for i in range(1, 10)], 10000
        ).alias("bounds")
    )
    return d.join(F.broadcast(bounds), "lang").select(
        "doc_id",
        "lang",
        (
            1
            + F.size(
                F.filter("bounds", lambda b: F.col("n_chars") > b)
            )
        )
        .cast("long")
        .alias("decile"),
    )


@query(
    "a9_group_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6)      AS qty_p50,
           round(quantile_cont(l_quantity, 0.9), 6)      AS qty_p90,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS price_p50
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a9_group_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`: both use lower + (upper−lower)·frac over the
    sorted group, verified value-hash-identical). The per-host latency /
    per-layer feature-count distribution summaries the reference eyeballs
    from logs, as one aggregate.

    Scale note: exact percentile buffers each group's values — fine for
    bounded groups (3 return flags; hosts; layers), the wrong tool for
    10^9-row groups, where the swap is approx_percentile (t-digest sketch,
    mergeable map-side) at a documented error bound; this query is the
    exact form that sketch is validated against."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("qty_p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("qty_p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias(
            "price_p50"
        ),
    )


@query(
    "a10_pivot_status",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (o_orderstatus = 'F') AS BIGINT)          AS cents_f
    FROM orders GROUP BY o_orderpriority
    """,
)
def a10_pivot_status(spark, sf_dir):
    """Pivot (long→wide) with an EXPLICIT value list — the status-by-
    priority progress matrix the reference prints as nested counters.
    Listing the pivot values up front matters at scale: without it Spark
    runs an extra distinct job over the corpus to discover the columns
    (and the result schema becomes data-dependent, which breaks writers
    expecting a fixed table). Counts and exact cents sums only, so the
    wide cells are bit-identical to the oracle's FILTER aggregates."""
    o = load(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
        )
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).cast("long").alias("n_f"),
        F.coalesce("O_n", F.lit(0)).cast("long").alias("n_o"),
        F.coalesce("P_n", F.lit(0)).cast("long").alias("n_p"),
        F.col("F_cents").cast("long").alias("cents_f"),
    )


@query(
    "a11_unpivot_metrics",
    """
    WITH s AS (SELECT lang,
                      CAST(count(*) AS BIGINT)     AS n_docs,
                      CAST(sum(n_chars) AS BIGINT) AS total_chars
               FROM documents GROUP BY lang)
    SELECT lang, 'n_docs' AS metric, n_docs AS value FROM s
    UNION ALL
    SELECT lang, 'total_chars' AS metric, total_chars AS value FROM s
    """,
)
def a11_unpivot_metrics(spark, sf_dir):
    """Unpivot (wide→long melt, the inverse of a10): per-language corpus
    stats flattened to (lang, metric, value) rows — the tall shape a
    metrics store or dashboard ingests. Uses the DataFrame `unpivot` API
    (expression-only: a zero-exchange map over the aggregate — the melt
    itself never shuffles; the only exchange is the groupBy that built
    the wide input)."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    return s.unpivot(
        ids=["lang"],
        values=["n_docs", "total_chars"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_W7_ORACLE = """
SELECT doc_id, lang,
       round(cume_dist() OVER (PARTITION BY lang ORDER BY n_chars), 6)
         AS size_cdf,
       round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars), 6)
         AS size_prank
FROM documents
"""


@query("w7_size_cdf", _W7_ORACLE)
def w7_size_cdf(spark, sf_dir):
    """Per-language empirical CDF of document size — cume_dist /
    percent_rank window functions, the distribution-position primitive a
    quality pipeline uses to express "drop the bottom x% by length per
    language" without materializing quantile tables. Both functions are
    rank-over-count ratios of integers computed identically by Spark and
    DuckDB (k/n as one double division), so the 6dp rounding is belt and
    braces, not a requirement. Partitioned window — each language sorts
    independently; the 100-TB path for unbounded groups is w6's sketch."""
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("n_chars")
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.round(F.cume_dist().over(w), 6).alias("size_cdf"),
        F.round(F.percent_rank().over(w), 6).alias("size_prank"),
    )


@query(
    "q4_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark, sf_dir):
    """TPC-H-Q4-shape EXISTS aggregate: orders having at least one returned
    lineitem, counted per priority. The correlated EXISTS decorrelates to
    a LEFT SEMI join — the probe (orders) never duplicates however many
    lineitems match, the build side is filtered to the 'R' flag BEFORE the
    exchange (predicate reaches the scan), and the semi join carries only
    l_orderkey, so neither lineitem payload nor duplicate keys cross the
    wire. Shuffle keys: orderkey (the natural co-partitioning key), then
    the 5-value priority aggregate is map-side combinable."""
    o = load(spark, sf_dir, "orders")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q8_BRANDS = ("Brand#11", "Brand#22", "Brand#33")

_Q8_ORACLE = f"""
WITH pa AS (
  SELECT p.p_brand, l.l_quantity, l.l_extendedprice,
         avg(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand IN {_Q8_BRANDS!r}
)
SELECT p_brand, count(*) AS n_small,
       round(sum(l_extendedprice), 2) AS small_qty_revenue
FROM pa WHERE l_quantity < 0.2 * avg_qty
GROUP BY p_brand
"""


@query("q8_small_quantity", _Q8_ORACLE)
def q8_small_quantity(spark, sf_dir):
    """TPC-H-Q17-shape correlated scalar subquery (lineitems below 20 % of
    their part's average quantity), decorrelated by hand: the per-partkey
    average that SQL writes as `(SELECT avg(..) WHERE l_partkey =
    p.p_partkey)` becomes a window over l_partkey AFTER the brand filter
    — equivalent because each partkey has exactly one brand, so filtering
    first only removes partitions the outer query never asks about.

    Scale shape: part is filtered to 3 brands then BROADCAST (never
    shuffle the fact table to meet a dim); the only big-side exchange is
    the window's partkey hash, whose partitions are lineitems-per-part
    (bounded, unskewed). Float discipline: l_quantity is integer-valued,
    so the window avg is an exact-integer sum divided once — immune to
    summation order; the final revenue sum uses the 2dp rounding q1/q3
    prove hash-stable."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin(*_Q8_BRANDS))
        .select("p_partkey", "p_brand")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# w12 — dense coverage calendar with zero-filled gaps + trailing window
# ---------------------------------------------------------------------------

_W12_ORACLE = """
WITH bounds AS (
  SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi FROM events
),
cal AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
grid AS (SELECT t.event_type, c.day FROM types t CROSS JOIN cal c)
SELECT g.event_type,
       CAST(g.day AS VARCHAR) AS day,
       CAST(COALESCE(cn.n, 0) AS BIGINT) AS n,
       CAST(sum(COALESCE(cn.n, 0)) OVER (
              PARTITION BY g.event_type ORDER BY g.day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail7
FROM grid g LEFT JOIN counts cn
  ON cn.event_type = g.event_type AND cn.day = g.day
"""


@query("w12_coverage_calendar", _W12_ORACLE)
def w12_coverage_calendar(spark, sf_dir):
    """Dense per-type daily activity calendar: every (event_type, day)
    cell between the global min and max day — INCLUDING zero days — with
    the 7-day trailing total. The crawl-coverage audit shape: a fetch
    pipeline that silently stalls for a day shows a zero cell here,
    where a plain groupBy(day) simply omits the row and nobody notices
    (the reference's hourly scan S7 has the same blind spot; its
    sequence+explode is the fix, applied at day grain).

    Determinism: all counts are integers; the trailing window is ROWS
    BETWEEN 6 PRECEDING on a gap-free calendar (dense by construction),
    so both engines see the identical frame.

    Scale shape: the calendar is |days| rows from a 1-row bound
    aggregate (sequence+explode, broadcastable); the grid crossJoin is
    |types|·|days| — tiny; the only big-table work is one map-side-
    combinable groupBy(event_type, day) on events. The final window
    partitions by event_type over day-count rows, never over events."""
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    types = e.select("event_type").distinct()
    counts = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    grid = types.crossJoin(F.broadcast(cal))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    dense = (
        grid.join(counts, ["event_type", "day"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)).cast("long"))
    )
    return dense.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "n",
        F.sum("n").over(w).cast("long").alias("trail7"),
    )
