"""Error-bound property tests for the approximate-sketch family (round-5
close of the round-4 verdict's ask #6): a15's count-min sketch and w6's
Greenwald-Khanna decile sketch are validated against exact counterparts at
fixture scale elsewhere — here their PUBLISHED error bounds are pinned on
planted adversarial skew (one key carrying ~50% of the mass), so the
docstring claims are enforced by asserts, not prose.

Both tests drive the real registered query code paths over a synthetic
documents.parquet shaped like the fixture table.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spider_spark.operators import QUERIES


@pytest.fixture(scope="module")
def cms_dir(tmp_path_factory):
    """Adversarial token stream: one token = 50% of all mass, plus a
    2,000-token tail — hot-key collisions are the worst case for CMS
    overshoot because every bucket sharing a lane with the hot token
    inherits its full count."""
    from spider_spark.session import get_spark

    spark = get_spark(app="sketch_fixtures", master="local[8]",
                      shuffle_partitions=8)
    d = tmp_path_factory.mktemp("cms_world")
    tail = [f"t{i:04d}" for i in range(2000)]
    docs = []
    # 20 docs x 1000 hot tokens = 20k hot; 10 docs x 2000 tail = 20k tail
    for i in range(20):
        docs.append((i, " ".join(["hot"] * 1000)))
    for i in range(10):
        docs.append((100 + i, " ".join(tail)))
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return str(d)


def test_cms_one_sided_and_epsilon_bound(spark, cms_dir):
    """CMS guarantees (Cormode & Muthukrishnan 2005): estimates never
    undershoot, and overshoot stays within eps*N for eps = e/W — asserted
    for every reported heavy hitter, hot key included, on the planted
    50%-skew stream."""
    from spider_spark.operators.textstats import _A15_W

    rows = QUERIES["a15_cms_heavy_hitters"](spark, cms_dir).collect()
    assert rows, "no heavy hitters returned"
    n_total = 20 * 1000 + 10 * 2000
    eps_n = math.e / _A15_W * n_total
    by_tok = {r["token"]: r for r in rows}
    assert by_tok["hot"]["exact_cnt"] == 20000
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], r  # one-sided, structural
        assert r["cms_est"] - r["exact_cnt"] <= eps_n, (
            f"{r['token']}: overshoot {r['cms_est'] - r['exact_cnt']} "
            f"> eps*N {eps_n:.1f}"
        )


@pytest.fixture(scope="module")
def gk_dir(tmp_path_factory):
    """60k docs, one language: 30k share n_chars=5000 (a massive tie
    straddling several decile boundaries — the adversarial case for a
    rank sketch) and 30k spread deterministically over [0, 10007)."""
    from spider_spark.session import get_spark

    spark = get_spark(app="sketch_fixtures", master="local[8]",
                      shuffle_partitions=8)
    d = tmp_path_factory.mktemp("gk_world")
    df = spark.range(60000).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.when(F.col("id") < 30000, F.lit(5000))
        .otherwise(F.pmod(F.col("id") * 7919, F.lit(10007)))
        .cast("long")
        .alias("n_chars"),
    )
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def test_gk_decile_rank_error_bound(spark, gk_dir):
    """Greenwald-Khanna (SIGMOD 2001) rank guarantee at accuracy=10000:
    each returned decile boundary's rank is within eps*n = n/10000 of the
    target rank, and w6's per-doc decile equals 1 + #boundaries strictly
    below n_chars for those boundaries — checked against an exact
    in-python sort of the 60k planted values."""
    rows = QUERIES["w6_decile_sketch"](spark, gk_dir).collect()
    n = 60000
    got = {r["doc_id"]: r["decile"] for r in rows}
    assert len(got) == n

    # recompute the boundaries exactly as w6 does (same call, same params
    # -> deterministic same sketch) and the exact value multiset
    from spider_spark.session import get_spark

    sp = get_spark(app="sketch_fixtures", master="local[8]",
                   shuffle_partitions=8)
    d = sp.read.parquet(f"{gk_dir}/documents.parquet")
    bounds = d.groupBy("lang").agg(
        F.percentile_approx("n_chars", [i / 10 for i in range(1, 10)], 10000)
        .alias("bounds")
    ).collect()[0]["bounds"]
    vals = sorted(r["n_chars"] for r in d.select("n_chars").collect())

    eps_n = n / 10000  # GK rank error at accuracy=10000
    import bisect

    for i, b in enumerate(bounds, start=1):
        target = i * n / 10
        lo = bisect.bisect_left(vals, b)   # #{x < b}
        hi = bisect.bisect_right(vals, b)  # #{x <= b}
        # the boundary value's rank interval must overlap
        # [target - eps_n, target + eps_n] (ties widen the interval on
        # the data side, never shrink the guarantee)
        assert lo <= target + eps_n + 1, (i, b, lo, target)
        assert hi >= target - eps_n - 1, (i, b, hi, target)

    # per-doc decile is exactly the broadcast-back range count
    chars = {r["doc_id"]: r["n_chars"] for r in d.collect()}
    for doc_id, dec in got.items():
        want = 1 + sum(1 for b in bounds if chars[doc_id] > b)
        assert dec == want, (doc_id, dec, want)

    # the massive tie lands in ONE decile (threshold semantics)
    tie_deciles = {got[i] for i in range(30000)}
    assert len(tie_deciles) == 1
