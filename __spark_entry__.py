"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything delegates to :mod:`fintech_etl_spark.registry`, the single
source of truth each operator module registers into.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fintech_etl_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the TPC-H Q1-style pricing summary —
    filter + multi-aggregate hash agg, the engine's bread and butter."""
    from fintech_etl_spark.operators.relational import q1_pricing_summary

    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_DIR", SMOKE_SF_DIR)
    return q1_pricing_summary(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + north-star
    families); each callable takes (spark, sf_dir) → DataFrame."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query name. Non-SQL-expressible ops
    (nested array<struct> docs, UDF-backed media ops) are omitted and
    get the driver's weaker rows-only check."""
    return registry.oracle_sql()
