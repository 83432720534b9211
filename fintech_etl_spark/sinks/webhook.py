"""Webhook sink: one JSON document per receipt, POSTed per partition.

The reference sends sequentially from a single process and swallows
errors — at-most-once delivery (/root/reference/stream/util.py:48-60,
:153-158). Ours runs ``foreachPartition`` so executors deliver in
parallel, and pairs with checkpointed streaming for at-least-once;
``document_id`` is the idempotency key receivers dedupe on (SURVEY
§2.6 — a documented improvement, not a parity bug).

Network I/O is injectable (``poster``) so tests exercise the batching,
error accounting, and payload shape without sockets. The default
poster uses urllib from the Python stdlib — executors have no extra
deps.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row

Poster = Callable[[str, bytes, dict[str, str]], int]  # (url, body, headers) -> status


def _default_poster(url: str, body: bytes, headers: dict[str, str]) -> int:
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return resp.status


@dataclass
class WebhookSink:
    url: str
    headers: dict[str, str] | None = None
    timeout_s: int = 30
    poster: Poster | None = None

    def send_batch(self, payloads: DataFrame) -> dict[str, int]:
        """payloads: (document_id, payload) — see receipts.to_webhook_payloads.

        Runs on executors via foreachPartition; each partition posts its
        documents sequentially (per-doc webhook semantics), partitions in
        parallel. Failures are counted and logged per partition, never
        raised — delivery retry belongs to the streaming checkpoint
        layer (re-running the whole micro-batch = at-least-once), and
        receivers dedupe on ``document_id``, which is deterministic for
        a given (receipt, run_ts), so a re-sent document carries the
        SAME idempotency key.

        Returns the batch accounting ``{"sent": n, "failed": m}``,
        aggregated across partitions via accumulators — the driver-side
        signal a caller uses to decide whether to retry the batch.
        """
        url = self.url
        headers = {"Content-Type": "application/json", **(self.headers or {})}
        poster = self.poster or _default_poster
        sc = payloads.sparkSession.sparkContext
        sent_acc = sc.accumulator(0)
        failed_acc = sc.accumulator(0)

        def deliver(rows: Iterator[Row]) -> None:
            sent = failed = 0
            for row in rows:
                try:
                    status = poster(url, row.payload.encode("utf-8"), headers)
                    if 200 <= status < 300:
                        sent += 1
                    else:
                        failed += 1
                except Exception:  # noqa: BLE001 — per-doc isolation
                    failed += 1
            sent_acc.add(sent)
            failed_acc.add(failed)
            if failed:
                print(
                    json.dumps(
                        {"webhook_sink": {"sent": sent, "failed": failed}}
                    )
                )

        payloads.foreachPartition(deliver)
        return {"sent": sent_acc.value, "failed": failed_acc.value}
