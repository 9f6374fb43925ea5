"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY.md §2 plus the training-data-pipeline ops
(dedup / similarity / text analysis), registered in spider_spark.operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make spider_spark importable regardless of the caller's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spider_spark.operators import QUERIES

    return QUERIES["q1_pricing_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spider_spark.operators import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spider_spark.operators import ORACLE

    return dict(ORACLE)
