"""Source-level operators (SURVEY §2.1): distributed object listing.

The reference lists GCS client-side, one page at a time, and filters
.csv names in Python (/root/reference/main.py:172-192, R8). Spark's
binaryFile source performs the listing inside the cluster and exposes
typed metadata columns — at 100 TB a landing zone listing is itself a
big-data problem (millions of objects), which is why it's an operator
and not a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import list_objects


@register(
    "filesource_listing",
    # The correctness gate is fixed at sf0.01 (TESTDATA.md), so the
    # oracle lists the same directory with DuckDB's glob() — an actual
    # second listing implementation, not a hardcoded name set.
    r"""
    SELECT regexp_extract(file, '([^/]+)$', 1) AS object_name
    FROM glob('/root/testdata/sf0.01/*.parquet')
    """,
    doc=(
        "Distributed object listing + suffix filter (R8 analogue): "
        "binaryFile metadata scan, payload column pruned away."
    ),
    tags=("source",),
)
def filesource_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    objs = list_objects(spark, f"{sf_dir}/*.parquet")
    return objs.filter(F.col("path").endswith(".parquet")).select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("object_name")
    )
