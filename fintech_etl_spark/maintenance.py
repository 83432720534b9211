"""Partitioned-dataset maintenance: small-file compaction.

The append half of the index lifecycle (``append_lsh_index`` /
``append_ivf_pq_index``, streaming/ann.py) writes each batch as new
files inside the existing partition dirs — exactly right for
batch-proportional ingest cost, and exactly how small files accumulate
at lake scale (N appends → N files per touched partition; scan-side
task counts and file-open overhead grow with file count, not data).
The other half is this periodic compaction pass: rewrite every
partition down to a target file count with the row multiset unchanged.

Mechanics: one read of the dataset, a hash repartition on the
partition columns (each key lands wholly in one task → exactly one
output file per partition dir; ``files_per_partition > 1`` adds a
deterministic salt for partitions too large for one file), a write to
a sibling temp dir, then a directory swap. The swap is two renames —
atomic enough for POSIX/HDFS-style stores; on an object store or under
concurrent readers the real deployment wraps this in a table-format
transaction (Delta/Iceberg rewrite) — the Spark plan is the same, only
the commit protocol changes. Serving streams re-list the index per
micro-batch, so they pick up the compacted layout at the next batch.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession, functions as F


def _parquet_file_count(root: str) -> int:
    n = 0
    for _dirpath, _dirs, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> dict:
    """Compact a ``partitionBy(partition_cols)`` parquet dataset in
    place to ``files_per_partition`` files per partition dir. Returns
    {files_before, files_after, rows}. Row multiset is preserved
    bit-for-bit (pinned by tests/test_index_maintenance.py)."""
    files_before = _parquet_file_count(path)
    df = spark.read.parquet(path)
    keys = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        # deterministic salt from the non-partition payload so large
        # partitions split reproducibly across the target file count
        payload = [c for c in df.columns if c not in partition_cols]
        salt = F.pmod(
            F.xxhash64(*[F.col(c).cast("string") for c in payload]),
            F.lit(files_per_partition),
        )
        out = df.withColumn("_salt", salt).repartition(*keys, F.col("_salt")).drop(
            "_salt"
        )
    else:
        out = df.repartition(*keys)

    tmp = f"{path.rstrip('/')}.compact-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    rows = spark.read.parquet(tmp).count()

    old = f"{path.rstrip('/')}.old-{uuid.uuid4().hex[:8]}"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return {
        "files_before": files_before,
        "files_after": _parquet_file_count(path),
        "rows": rows,
    }


def compact_lsh_index(spark: SparkSession, index_path: str, **kw) -> dict:
    """Compact an LSH index's (band, bucket) partition layout."""
    return compact_partitioned(spark, index_path, ["band", "bucket"], **kw)


def compact_ivf_pq_index(spark: SparkSession, index_path: str, **kw) -> dict:
    """Compact an IVF-PQ index's per-cell codes and vectors datasets
    (coarse/codebooks are single tiny files — never compacted)."""
    return {
        "codes": compact_partitioned(
            spark, index_path + "/codes", ["cell"], **kw
        ),
        "vectors": compact_partitioned(
            spark, index_path + "/vectors", ["cell"], **kw
        ),
    }
