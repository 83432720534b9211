"""Streaming Pub/Sub delivery: the reference's advertised (never
shipped) "Processing → Pub/Sub" stage as a live pipeline.

The reference README promises receipt events on a ``receipt-processing``
topic (/root/reference/README.md:66,85-87,192) but contains zero
implementing code. Here the real shape: the checkpointed file-arrival
stream (``streaming.intake`` — exactly-once source semantics) feeds
``to_pubsub_events`` micro-batch by micro-batch, and every batch is
published through the ledger-gated sink (``PubSubSink.
publish_with_ledger``), so the end-to-end contract is:

- source exactly-once (streaming checkpoint — a restart re-reads no
  consumed file);
- publish at-least-once with a cross-restart parquet ledger: a batch
  redelivered by foreachBatch after a driver crash anti-joins away the
  already-published messages before any request, and within-partition
  fail-stop keeps every ordering key's published prefix gap-free, so
  a retry resumes each key in order;
- ``document_id`` rides as an attribute for receiver-side dedupe on
  the residual at-least-once window (crash between publish and ledger
  append).

This is the same layered design as the webhook stream
(``sinks.webhook`` + ``streaming.intake``) — one delivery philosophy,
two transports.
"""

from __future__ import annotations

import datetime as _dt
import json

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from fintech_etl_spark.operators.receipts import to_pubsub_events
from fintech_etl_spark.sinks.pubsub import PubSubSink
from fintech_etl_spark.streaming.intake import start_invoice_stream


def start_receipt_event_stream(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    sink: PubSubSink,
    ledger_path: str,
    *,
    run_date: _dt.date,
    run_ts: int = 0,
    gcs_bucket: str = "",
    max_files_per_trigger: int = 32,
    ledger_keep_batches: int | None = 64,
    maintenance_every: int = 8,
) -> StreamingQuery:
    """Watch ``landing_dir`` for invoice CSVs; publish each micro-batch's
    receipt events to ``sink`` with cross-restart idempotency recorded
    at ``ledger_path``.

    Events keep per-source-file ordering (``ordering_key =
    source_file``, receipts sorted by ``receipt_id`` within the key —
    the projection ``to_pubsub_events`` defines).

    Ledger retention runs INSIDE the stream (r8: it used to be an
    operator's manual step): every ``maintenance_every`` batches the
    ledger keeps only its most recent ``ledger_keep_batches``
    partitions. Safe by construction — foreachBatch can only ever
    retry the CURRENT batch; once later batches committed, an old
    partition exists purely as listing weight. ``ledger_keep_batches=
    None`` disables the hook (back to a manual
    ``sinks.maintenance.expire_ledger_batches`` schedule).
    """
    if ledger_keep_batches is not None and ledger_keep_batches < 1:
        raise ValueError("ledger_keep_batches must be >= 1 (or None)")
    if maintenance_every < 1:
        raise ValueError("maintenance_every must be >= 1")

    def on_receipts(receipts, batch_id: int) -> None:
        events = to_pubsub_events(receipts)
        stats = sink.publish_with_ledger(
            events,
            batch_id,
            ledger_path,
            ordering_col="ordering_key",
            order_by=["receipt_id"],
        )
        print(json.dumps({"pubsub_stream": {"batch_id": batch_id, **stats}}))
        if ledger_keep_batches is not None and batch_id % maintenance_every == 0:
            from fintech_etl_spark.sinks.maintenance import expire_ledger_batches

            removed = expire_ledger_batches(
                ledger_path, keep_last=ledger_keep_batches
            )
            if removed:
                print(
                    json.dumps(
                        {
                            "ledger_vacuum": {
                                "batch_id": batch_id,
                                "removed_batches": removed,
                            }
                        }
                    )
                )

    return start_invoice_stream(
        spark,
        landing_dir,
        checkpoint_dir,
        on_receipts,
        gcs_bucket=gcs_bucket,
        run_date=run_date,
        run_ts=run_ts,
        max_files_per_trigger=max_files_per_trigger,
    )
