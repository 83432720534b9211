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


@register(
    "inbox_source_scan",
    # Fixed-dir oracle like filesource_listing: a genuinely independent
    # second listing (DuckDB read_blob) of the same directory. The raw
    # size is NOT projected — file sizes differ per scale factor, and
    # the oracle string is run verbatim at the gate's sf0.01 while the
    # Spark side lists whatever sf_dir the sweep points at. Projecting
    # the scale-independent ``nonempty`` flag instead keeps the check
    # directory-portable while still value-checking that the source
    # plumbs a real, positive size for every object.
    r"""
    SELECT regexp_extract(filename, '([^/]+)$', 1) AS name,
           CAST(size > 0 AS BOOLEAN) AS nonempty
    FROM read_blob('/root/testdata/sf0.01/*.parquet')
    """,
    doc=(
        "Custom Python DataSource scan (PySpark 4 extension API): the "
        "inbox listing as a pluggable `invoice_inbox` format with one "
        "input partition per object and planner-level filter pushdown "
        "— the `.parquet` suffix predicate reaches the reader's "
        "pushFilters and prunes the listing BEFORE partitions launch, "
        "the same contract a parquet scan honors. The reference pages "
        "its bucket client-side on the driver; this distributes."
    ),
    tags=("source", "connector"),
)
def inbox_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fintech_etl_spark.sources.inbox import register_inbox_source

    register_inbox_source(spark)
    return (
        spark.read.format("invoice_inbox")
        .option("path", sf_dir)
        .load()
        .filter(F.col("name").endswith(".parquet"))
        .select("name", (F.col("size") > 0).alias("nonempty"))
    )
