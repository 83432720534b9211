"""Star-schema table loader (driver testdata / any parquet lake).

Parquet is the engine's canonical columnar format: Catalyst pushes
filters and prunes columns into the scan, and at 100 TB the row-group
statistics give partition pruning for free. No schema inference — the
parquet footers carry the schema, and STAR_SCHEMAS documents the
contract for other formats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fintech_etl_spark.schemas import TABLE_NAMES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every star-schema table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so SQL-form operators can run."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
