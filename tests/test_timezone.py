"""Timezone robustness: the driver's session may not run UTC — every
oracle-checked query must produce identical results under a shifted
session timezone (NTZ-safe epoch/date math)."""

from __future__ import annotations

import pytest

from spider_spark.operators import ORACLE, QUERIES
from spider_spark.verify import compare, duckdb_run

TZ_SENSITIVE = [
    "w3_sliding_avg",
    "w4_sessionize",
    "f5_epoch_ms_date",
    "f6_date_parts",
    "f7_hour_sequence",
    "f19_hypertable_rollup",
    "j7_asof_join",
    "q1_pricing_rollup",
    "w1_adjacent_pairs",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_invariant_under_session_tz(spark, sf_dir, name):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    try:
        sdf = QUERIES[name](spark, sf_dir)
        ddf = duckdb_run(ORACLE[name], sf_dir)
        ok, msg = compare(sdf, ddf)
        assert ok, f"{name} under Asia/Shanghai: {msg}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
