"""Streaming corpus intake with incremental dedup — the production
crawl-ingest shape: JSONL document batches land continuously; each
micro-batch is fingerprinted, deduped against everything already in
the corpus (and within itself), and only novel documents are appended.

This is the streaming twin of the batch ``dedup_incremental_batch``
operator, now at BOTH tiers the batch side offers:

- **exact**: md5 fingerprint anti-join (byte-identical text);
- **near**: 60-bit SimHash (same per-row fold as the batch
  ``dedup_simhash`` operator) banded into 4×15-bit chunks; an
  incoming doc agreeing with any corpus doc on ≥1 chunk AND within
  Hamming ≤ 3 is dropped as a near-duplicate. The chunk agreement
  catches Hamming ≤ 3 exactly (pigeonhole), so streaming and batch
  verdicts coincide — pinned by the batch-parity test.

The corpus side reduces to a fingerprint parquet table ((fp, sim) —
24 bytes/doc vs full text), maintained incrementally — never
recomputed from the lake. Per batch the probe explodes the corpus
sims into chunks and joins against the BROADCAST batch chunks; at
100 TB the layout upgrade is to materialize the 4-rows-per-doc banded
index partitioned by chunk prefix, turning the probe into a pruned
partition read instead of a full fingerprint scan. Within-batch
near-dups use a greedy min-id rule (a doc drops iff a smaller-id
batch doc is within Hamming ≤ 3); full transitive components remain
the batch ``dedup_cluster_components`` operator's job.

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

from fintech_etl_spark.operators.dedup import (
    _SIMHASH_BUCKET_CAP,
    _SIMHASH_CHUNK_BITS,
    _SIMHASH_CHUNK_MASK,
    _SIMHASH_CHUNKS,
    simhash_column,
)

_NEAR_HAMMING = 3  # same verify threshold as the batch dedup_simhash


def _cap_buckets(chunks: DataFrame, cap: int) -> DataFrame:
    """Band buckets with more than ``cap`` members sit out candidate
    generation — the same rule (and the same shared constant) as the
    batch ``dedup_simhash_capped`` tier. On a saturated stream the
    boilerplate cluster collapses thousands of fingerprints into a few
    buckets and the probe join goes quadratic in bucket size; the cap
    bounds per-batch candidate work at O(cap · batch). One window
    count over the chunk key — no extra join."""
    w = Window.partitionBy("chunk_no", "chunk")
    return (
        chunks.withColumn("_m", F.count(F.lit(1)).over(w))
        .filter(F.col("_m") <= cap)
        .drop("_m")
    )


def _fingerprint(df: DataFrame) -> DataFrame:
    # coalesce: null-text docs must still dedup (against each other),
    # not silently pass the anti-join as always-novel. The SimHash is
    # computed over the same coalesced text so both tiers see one doc.
    text = F.coalesce(F.col("text"), F.lit(""))
    df = df.withColumn("fp", F.md5(text))
    return simhash_column(df, F.split(F.lower(F.trim(text)), r"\s+"))


def _chunks(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Explode the 60-bit ``sim`` into its 4 15-bit LSH chunks."""
    return df.select(
        *cols,
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sim", _SIMHASH_CHUNK_BITS * i).bitwiseAND(
                        F.lit(_SIMHASH_CHUNK_MASK)
                    )
                    for i in range(_SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk_no", "chunk"),
    )


def start_corpus_intake(
    spark: SparkSession,
    landing_glob: str,
    corpus_dir: str,
    fingerprints_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 32,
    redact_pii: bool = False,
    min_chars: int = 0,
    bucket_cap: int = _SIMHASH_BUCKET_CAP,
) -> StreamingQuery:
    """Watch ``landing_glob`` for JSONL document files; append novel
    (no exact or near duplicate already seen) documents to
    ``corpus_dir`` and their (fp, sim) fingerprints to
    ``fingerprints_dir``. Returns the started query (``availableNow``
    drains pending files then stops — call repeatedly for cron-style
    intake, or swap the trigger for continuous).

    Optional production stages, applied BEFORE fingerprinting so two
    docs differing only in PII or trailing junk dedup as one:

    - ``redact_pii`` — the same email/phone/SSN rewrite as the batch
      ``text_pii_redact`` operator; the corpus stores redacted text.
    - ``min_chars`` — quality gate: drop docs whose (post-redaction)
      text is shorter; the reject never fingerprints, so a later
      longer version of the same doc is not shadowed.
    - ``bucket_cap`` — band buckets (within the batch AND on the
      corpus fingerprint side) with more members sit out near-dup
      candidate generation, mirroring ``dedup_simhash_capped``: an
      incoming doc whose only agreements with a corpus twin are in
      over-dense boilerplate buckets passes as novel, which is the
      same bounded-recall trade the batch tier makes. The exact tier
      is uncapped — byte-identical re-ingest is always dropped.
    """
    from fintech_etl_spark.schemas import STAR_SCHEMAS

    incoming = (
        spark.readStream.schema(STAR_SCHEMAS["documents"])
        .option("mode", "PERMISSIVE")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_glob)
    )

    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if redact_pii:
            from fintech_etl_spark.operators.text_analysis import (
                _EMAIL_RE,
                _IDLIKE_RE,
                _PHONE_RE,
            )

            red = F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.coalesce(F.col("text"), F.lit("")),
                        _EMAIL_RE,
                        "<EMAIL>",
                    ),
                    _PHONE_RE,
                    "<PHONE>",
                ),
                _IDLIKE_RE,
                "<ID>",
            )
            batch_df = batch_df.withColumn("text", red)
        if min_chars > 0:
            batch_df = batch_df.filter(
                F.length(F.coalesce(F.col("text"), F.lit(""))) >= min_chars
            )
        batch = _fingerprint(batch_df)
        # within-batch exact dedup first: one doc per fingerprint (min
        # doc_id, deterministic), so a batch containing its own
        # duplicates contributes exactly one survivor
        batch = (
            batch.withColumn(
                "_rn",
                F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # within-batch NEAR dedup (greedy min-id): drop any doc with a
        # smaller-id batch doc inside the hamming radius; over-dense
        # buckets sit out pair generation (shared cap with the batch
        # capped tier)
        bc = _cap_buckets(_chunks(batch, ("doc_id",)), bucket_cap)
        ba = bc.select(
            F.col("doc_id").alias("doc_a"), F.col("sim").alias("sim_a"),
            "chunk_no", "chunk",
        )
        bb = bc.select(
            F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"),
            "chunk_no", "chunk",
        )
        near_in_batch = (
            ba.join(bb, ["chunk_no", "chunk"])
            .filter((F.col("doc_a") < F.col("doc_b")) & (ham <= _NEAR_HAMMING))
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        batch = batch.join(near_in_batch, "doc_id", "left_anti")

        if os.path.exists(fingerprints_dir):
            seen = spark.read.parquet(fingerprints_dir)
            # exact tier: anti-join on md5
            batch = batch.join(seen.select("fp").distinct(), "fp", "left_anti")
            # near tier: banded probe — corpus chunks stream past the
            # BROADCAST batch chunks, so the per-batch cost is one scan
            # of the (tiny) fingerprint table and zero shuffles of it
            probe = _chunks(batch, ("doc_id",)).select(
                F.col("doc_id").alias("doc_b"), F.col("sim").alias("sim_b"),
                "chunk_no", "chunk",
            )
            # the corpus fingerprint table is the unbounded side: a
            # boilerplate bucket grows with corpus size and would make
            # every later batch's probe pay its full membership. Cap it
            # with the same rule — at 100 TB the banded-index layout
            # upgrade precomputes these counts instead of windowing
            # per batch.
            corpus_chunks = _cap_buckets(
                _chunks(seen, ()).select(
                    F.col("sim").alias("sim_a"), "chunk_no", "chunk"
                ),
                bucket_cap,
            )
            near_hits = (
                corpus_chunks.join(F.broadcast(probe), ["chunk_no", "chunk"])
                .filter(ham <= _NEAR_HAMMING)
                .select(F.col("doc_b").alias("doc_id"))
                .distinct()
            )
            batch = batch.join(near_hits, "doc_id", "left_anti")

        novel = batch.persist()
        try:
            if novel.limit(1).count() == 0:
                return
            # corpus first: see module docstring for the crash ordering
            novel.drop("fp", "sim").write.mode("append").parquet(corpus_dir)
            novel.select("fp", "sim").write.mode("append").parquet(fingerprints_dir)
        finally:
            novel.unpersist()

    return (
        incoming.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
