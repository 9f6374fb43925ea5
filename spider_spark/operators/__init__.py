"""Operator surface: every SQL-expressible operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable, registered together with its DuckDB
oracle SQL. ``QUERIES`` / ``ORACLE`` feed ``__spark_entry__.queries()`` /
``oracle_sql()`` directly.

Conventions (driver compare is column-name-sorted value-hash):
- every computed column aliased identically in Spark and SQL;
- aggregate doubles rounded (2–6 dp) so JVM vs DuckDB float summation
  order can't flip the hash;
- timestamp outputs rendered as ISO strings.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLE: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    """Register a query; ``sql=None`` → non-SQL-expressible (driver does a
    rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ntz_epoch_s(col):
    """Seconds since epoch for a TIMESTAMP_NTZ column, independent of the
    session timezone (a cast to TIMESTAMP would shift by the session
    offset; NTZ-to-NTZ timestampdiff matches DuckDB's epoch() on naive
    timestamps)."""
    from pyspark.sql import functions as F

    name = col if isinstance(col, str) else None
    expr = name or "ts"
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {expr})"
    )


def ntz_epoch_ms(col_name: str):
    from pyspark.sql import functions as F

    return (
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"{col_name}) / 1000"
        )
    ).cast("long")


def _register_all():
    from spider_spark.operators import (  # noqa: F401
        asof,
        coords,
        crawlops,
        dedup,
        graph,
        lm,
        multimodal,
        rangejoin,
        relational,
        relational2,
        relational3,
        relational4,
        selection,
        similarity,
        textstats,
    )


_register_all()
