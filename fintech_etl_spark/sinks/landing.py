"""Raw-file landing sink (SURVEY S4).

The reference uploads the original CSV bytes to GCS best-effort, with
failures logged and ignored (/root/reference/intake/handlers.py:59-73).
Here landing is a first-class, idempotent step: the payload plus typed
intake metadata as one parquet row, keyed by the same
``intake/{received_date}_{gmail_id}_{name}`` object-name rule (F25).

Storage is a URI concern — the same writer lands to local paths in
tests and ``gs://``/``s3a://`` through the Hadoop connectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.functions.rules import landing_object_name


def land_raw_files(
    spark: SparkSession,
    files: list[tuple[bytes, str, str, str]],
    landing_path: str,
) -> DataFrame:
    """Land raw payloads: ``files`` is (payload, received_date, gmail_id,
    original_name) tuples. Returns the landed-manifest DataFrame after
    writing it (payload included) to ``landing_path``.

    One parquet row per file keeps tiny push payloads from becoming a
    small-files problem on the object store: the landing zone compacts
    naturally per micro-batch, and the manifest is queryable.
    """
    df = spark.createDataFrame(
        files, "payload binary, received_date string, gmail_id string, original_name string"
    ).select(
        landing_object_name("received_date", "gmail_id", "original_name").alias(
            "object_name"
        ),
        "payload",
        F.length("payload").alias("n_bytes"),
        "received_date",
        "gmail_id",
        "original_name",
    )
    df.write.mode("append").parquet(landing_path)
    return df
