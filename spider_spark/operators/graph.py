"""Host-graph analytics: PageRank over a deterministically derived link
graph.

The reference walks a site graph — service catalogs → layers → tile/page
fetches (/root/reference/suplicmap_tilemap.py:33-96 discovers children from
a parent listing; getHtml.py follows extracted links) — and ranking hosts
by incoming link mass is the canonical iterative-graph workload over that
crawl output. The fixture has no edge table, so ``g1`` derives one
deterministically from ``documents``: each document contributes one edge

    src = its ``source`` host
    dst = hosts[pmod(murmur3(doc_id), |hosts|)]

where murmur3 is Spark's ``hash()`` over a BIGINT, reproduced bit-exactly
in DuckDB by :mod:`spider_spark.operators.sqlmurmur` (the same parity layer
d3/d4/ann_ivf oracles use). Multi-edges and self-loops are kept.

PageRank runs in **fixed-point bigint arithmetic** (SCALE = 10^12, floor
division, ``_ITERS`` iterations, damping 85/100): every per-iteration sum
is over integers, hence order-invariant, hence bit-identical between
Spark's parallel partial aggregation and the DuckDB unrolled-CTE oracle.
A float PageRank would flip the driver's value hash on summation order
alone. Dangling mass (hosts with no out-edges) is dropped by definition —
the same convention on both engines — so ranks are a relative ordering,
not a probability distribution.

Scale shape (100 TB): ``hosts``/``ranks`` are |domains|-sized (millions of
rows, ~16 bytes each — broadcastable), so each iteration is a broadcast
hash join of ranks onto the edge table plus ONE map-side-combinable SUM
shuffle keyed on ``dst``. The edge table itself is computed once; the
host-id assignment via a global ``row_number`` window is a single-task
step over the *distinct-host* table only (never the documents table) —
fine at domain cardinality, and swappable for ``zipWithIndex`` if hosts
ever outgrow one task.
"""

from __future__ import annotations

from spider_spark.operators import load, query
from spider_spark.operators.sqlmurmur import hashlong_aliases

_SCALE = 10**12
_DAMP_NUM, _DAMP_DEN = 85, 100
_ITERS = 5


def _oracle() -> str:
    iters = []
    for k in range(_ITERS):
        iters.append(f"""
  r{k + 1} AS (
    SELECT hs.host_id,
           ((({_DAMP_DEN - _DAMP_NUM} * {_SCALE}) // ({_DAMP_DEN} * hn.h))
            + ({_DAMP_NUM} * COALESCE(i.inc, 0)) // {_DAMP_DEN})::BIGINT AS pr
    FROM hosts hs CROSS JOIN hn
    LEFT JOIN (
      SELECT e.dst AS host_id, SUM(r.pr // e.deg) AS inc
      FROM edges e JOIN r{k} r ON r.host_id = e.src
      GROUP BY e.dst
    ) i ON i.host_id = hs.host_id
  )""")
    return f"""
WITH hosts AS (
  SELECT source, ROW_NUMBER() OVER (ORDER BY source) - 1 AS host_id
  FROM (SELECT DISTINCT source FROM documents)
),
hn AS (SELECT COUNT(*) AS h FROM hosts),
hashed AS (
  SELECT doc_id, source, {hashlong_aliases("doc_id", "42", "mh", "g")}
  FROM documents
),
edges0 AS (
  SELECT hs.host_id AS src, ((d.mh % hn.h) + hn.h) % hn.h AS dst
  FROM hashed d JOIN hosts hs ON hs.source = d.source CROSS JOIN hn
),
edges AS (
  SELECT src, dst, COUNT(*) OVER (PARTITION BY src) AS deg FROM edges0
),
r0 AS (
  SELECT host_id, ({_SCALE} // hn.h)::BIGINT AS pr FROM hosts CROSS JOIN hn
),{",".join(iters)}
SELECT hs.source, r.pr,
       DENSE_RANK() OVER (ORDER BY r.pr DESC) AS rk
FROM r{_ITERS} r JOIN hosts hs ON hs.host_id = r.host_id
"""


@query("g1_host_pagerank", _oracle())
def g1_host_pagerank(spark, sf_dir: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents")
    w = Window.orderBy("source")
    hosts = (
        d.select("source")
        .distinct()
        .select("source", (F.row_number().over(w) - 1).alias("host_id"))
    )
    n_hosts = hosts.count()

    edges = (
        d.join(F.broadcast(hosts), "source")
        .select(
            F.col("host_id").alias("src"),
            F.pmod(F.hash("doc_id"), F.lit(n_hosts)).alias("dst"),
        )
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Lazily returned, so no persist here: each iteration re-derives the
    # (column-pruned) edge subtree. In a materialized production run you
    # would .persist() edges once before the loop.
    edges = edges.join(F.broadcast(deg), "src")

    base = ((_DAMP_DEN - _DAMP_NUM) * _SCALE) // (_DAMP_DEN * n_hosts)
    ranks = hosts.select("host_id", F.lit(_SCALE // n_hosts).alias("pr"))
    for _ in range(_ITERS):
        incoming = (
            edges.join(F.broadcast(ranks), edges["src"] == ranks["host_id"])
            .select(edges["dst"].alias("host_id"), F.expr("pr div deg").alias("c"))
            .groupBy("host_id")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            hosts.select("host_id")
            .join(incoming, "host_id", "left")
            .select(
                "host_id",
                (
                    F.lit(base)
                    + F.expr(f"({_DAMP_NUM} * coalesce(inc, 0L)) div {_DAMP_DEN}")
                ).alias("pr"),
            )
        )

    out = (
        ranks.join(F.broadcast(hosts), "host_id")
        .select(
            "source",
            "pr",
            F.dense_rank().over(Window.orderBy(F.desc("pr"))).alias("rk"),
        )
    )
    return out
