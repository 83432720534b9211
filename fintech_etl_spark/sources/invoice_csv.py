"""Vendor-invoice CSV source.

Replaces the reference's eager ``pd.read_csv`` of a whole in-memory
payload (/root/reference/stream/util.py:97-100, :181-184) with a
declarative Spark CSV scan: declared schema (SURVEY §1.3/§1.5),
PERMISSIVE mode so garbage cells degrade instead of failing the file,
and a file-order row index so "first row of the group" semantics
(/root/reference/stream/processor.py:43) survive distribution.

The same reader works for local paths, ``gs://`` (GCS Hadoop
connector), ``s3a://`` — storage is a URI concern, not an operator
concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.schemas import INVOICE_CSV_SCHEMA

ROW_IDX = "_row_idx"
SOURCE_PATH = "_source_path"


def read_invoice_csv(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Scan one or many vendor-invoice CSVs.

    Adds:
      - ``_row_idx``     — monotonically increasing within each file split,
        preserving CSV file order for first-row header extraction. CSVs are
        read as a single split per file (they are small push payloads), so
        this is total file order.
      - ``_source_path`` — originating file URI (drives ``source_file`` and
        per-file receipt grouping when many files are scanned at once).
    """
    df = (
        spark.read.option("header", True)
        .option("inferSchema", False)  # everything string, like the schema
        .option("mode", "PERMISSIVE")
        # utf-8 decode with replacement, same stance as the reference's
        # bytes.decode(errors="replace").
        .option("encoding", "UTF-8")
        .csv(path)
    )
    # Match columns BY HEADER NAME, not position: a declared schema would
    # bind positionally, but the reference reads by name with per-column
    # defaults (row.get(key, default)), tolerating reordered or partial
    # exports. Missing columns become nulls (the rule expressions supply
    # defaults); unknown extra columns are dropped. Catalyst still prunes
    # unused columns out of the scan.
    present = set(df.columns)
    cols = [
        F.col(f.name) if f.name in present else F.lit(None).cast(f.dataType).alias(f.name)
        for f in INVOICE_CSV_SCHEMA.fields
    ]
    return df.select(*cols).withColumn(
        ROW_IDX, F.monotonically_increasing_id()
    ).withColumn(SOURCE_PATH, F.input_file_name())
