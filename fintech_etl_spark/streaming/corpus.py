"""Streaming corpus intake with incremental dedup — the production
crawl-ingest shape: JSONL document batches land continuously; each
micro-batch is fingerprinted, deduped against everything already in
the corpus (and within itself), and only novel documents are appended.

This is the streaming twin of the batch ``dedup_incremental_batch``
operator: the corpus side reduces to a distinct-fingerprint parquet
table that is tiny relative to the corpus (128-bit keys vs full text),
maintained incrementally — never recomputed from the lake. At 100 TB
the fingerprint table is bucketed by fingerprint so the per-batch
anti-join is a one-sided shuffle of just the (small) incoming batch.

Delivery: the file source is checkpoint-exactly-once; the two writes
per batch (corpus append, fingerprint append) are individually atomic
but not jointly transactional — a crash between them can leave a
fingerprint without its document for that batch, which re-ingest then
skips. We order corpus-first so the failure mode is a re-appendable
document, never a lost one; the corpus itself stays duplicate-free
either way because re-delivered batches re-dedup against the
fingerprint table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window


def _fingerprint(df: DataFrame) -> DataFrame:
    # coalesce: null-text docs must still dedup (against each other),
    # not silently pass the anti-join as always-novel
    return df.withColumn("fp", F.md5(F.coalesce(F.col("text"), F.lit(""))))


def start_corpus_intake(
    spark: SparkSession,
    landing_glob: str,
    corpus_dir: str,
    fingerprints_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 32,
) -> StreamingQuery:
    """Watch ``landing_glob`` for JSONL document files; append novel
    (never-seen-fingerprint) documents to ``corpus_dir`` and their
    fingerprints to ``fingerprints_dir``. Returns the started query
    (``availableNow`` drains pending files then stops — call repeatedly
    for cron-style intake, or swap the trigger for continuous)."""
    from fintech_etl_spark.schemas import STAR_SCHEMAS

    incoming = (
        spark.readStream.schema(STAR_SCHEMAS["documents"])
        .option("mode", "PERMISSIVE")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_glob)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch = _fingerprint(batch_df)
        # within-batch dedup first: one doc per fingerprint (min doc_id,
        # deterministic), so a batch containing its own duplicates
        # contributes exactly one survivor
        batch = (
            batch.withColumn(
                "_rn",
                F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # then against the corpus fingerprint table (anti-join on fp)
        if os.path.exists(fingerprints_dir):
            seen = spark.read.parquet(fingerprints_dir).select("fp").distinct()
            novel = batch.join(seen, "fp", "left_anti")
        else:
            novel = batch
        novel = novel.persist()
        try:
            if novel.limit(1).count() == 0:
                return
            # corpus first: see module docstring for the crash ordering
            novel.drop("fp").write.mode("append").parquet(corpus_dir)
            novel.select("fp").write.mode("append").parquet(fingerprints_dir)
        finally:
            novel.unpersist()

    return (
        incoming.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
