"""Streaming event analytics: watermarked windows + custom stateful ops.

The reference has no event-time operators at all (SURVEY §2.6: its
"stream" is one stateless micro-batch per pushed file). These are the
Spark-native event-stream counterparts of the batch queries in
operators/relational.py — ``events_hourly_rollup`` and
``window_lag_sessionize`` — expressed over an unbounded source with
late-data handling, so the same semantics hold on a real feed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 3600


def read_events_stream(
    spark, sf_dir: str, max_files: int = 1, glob: str = "events.parquet"
) -> DataFrame:
    """Stream the events table (parquet file source) — used by tests to
    replay the batch testdata through the streaming operators.

    The ``ts`` unit is detected from the parquet footer, not assumed:
    a TIMESTAMP(NANOS) file must be read as raw INT64 and truncated to
    µs (Spark's reader rejects NANOS), while a TIMESTAMP(MICROS) file
    reads as a plain timestamp. Hardcoding the NANOS path silently
    divided µs data by 1000 — every event landed in Jan 1970 and all
    session gaps compressed 1000×, so downstream semantics broke with
    NO read error. Footer sniffing (one driver-side metadata read, no
    data pages) keeps the source correct for both generations of
    testdata.
    """
    import os

    import pyarrow.parquet as pq

    import glob as _glob

    matches = sorted(_glob.glob(os.path.join(sf_dir, glob)))
    if not matches:
        raise FileNotFoundError(
            f"no files match {glob!r} under {sf_dir!r} (schema probe needs one)"
        )
    path = matches[0]
    ts_type = pq.ParquetFile(path).schema_arrow.field("ts").type
    ts_unit = getattr(ts_type, "unit", "us")

    if ts_unit == "ns":
        from fintech_etl_spark.session import ensure_nanos_as_long

        ensure_nanos_as_long(spark)
        raw = (
            spark.readStream.schema(
                "event_id long, ts long, user_id long, event_type string, "
                "value double, props string"
            )
            .option("maxFilesPerTrigger", max_files)
            .option("pathGlobFilter", glob)
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )


def streaming_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time windows with late-data watermark —
    the streaming twin of the batch ``events_hourly_rollup``. State for
    windows older than the watermark is dropped, so memory is bounded
    no matter how long the stream runs."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("win.start").alias("hour"), "event_type", "n", "total_value")
    )


_SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long"


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom session-window logic via applyInPandasWithState: events in
    one session are ≤ 1h apart; a processing-time timeout flushes the
    open session when the group goes quiet."""
    (user_id,) = key

    def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
            }
        )

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield emit(start_us, last_us, n)
        return

    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value // 1000) for t in pdf["ts"])
    ts_us.sort()

    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    closed: list[pd.DataFrame] = []
    for t in ts_us:
        if start_us is None:
            start_us, last_us, n = t, t, 1
        elif t - last_us > SESSION_GAP_S * 1_000_000:
            closed.append(emit(start_us, last_us, n))
            start_us, last_us, n = t, t, 1
        else:
            last_us, n = t, n + 1
    state.update((start_us, last_us, n))
    state.setTimeoutDuration(60_000)
    yield from closed


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Arbitrary stateful sessionization (applyInPandasWithState) — the
    custom-operator escape hatch the built-in window functions can't
    express on a stream. State is one (start, last, n) triple per user:
    O(users) memory, partitioned by user_id across executors."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def join_purchase_after_signup_stream(
    events: DataFrame,
    horizon: str = "24 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream–stream inner join: purchases matched to the same user's
    signups within a bounded event-time horizon.

    Both sides carry watermarks and the join condition bounds signup_ts
    to [purchase_ts − horizon, purchase_ts], so the state store can
    evict rows once the watermark passes the bound — without the time
    bound a stream–stream join would buffer both streams forever. This
    is the streaming twin of the batch as-of join
    (operators/relational.py::asof_join_signup_before_purchase) minus
    the latest-prior reduction, which append-mode stream joins cannot
    express exactly (every in-horizon signup pairs, not just the last)."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark)
    )
    return purchases.join(
        signups,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("signup_ts") <= F.col("purchase_ts"))
        & (F.col("signup_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select("purchase_id", "user_id", "purchase_ts", "signup_ts")


def enrich_events_stream(events: DataFrame, user_profile: DataFrame) -> DataFrame:
    """Stream–static enrichment join: each micro-batch of events picks up
    per-user profile columns from a static (batch) DataFrame.

    The static side re-resolves per micro-batch, so a refreshed profile
    table is picked up without restarting the query. Broadcast keeps the
    join stateless and shuffle-free — correct for a dimension-sized
    profile (≤ broadcast threshold per executor); a fact-scale profile
    should instead be pre-bucketed on user_id and the hint dropped.
    """
    prof = F.broadcast(
        user_profile.select(
            F.col("user_id").alias("p_user_id"),
            *[c for c in user_profile.columns if c != "user_id"],
        )
    )
    return events.join(
        prof, events["user_id"] == prof["p_user_id"], "left"
    ).drop("p_user_id")


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once-per-event dedup: drop duplicate event ids
    within a watermark horizon — the streaming twin of the batch
    ``dedup_exact`` operator.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) is
    load-bearing: with ``dropDuplicates(['event_id'])`` Spark only
    evicts state when the event-time column is part of the dedup
    subset, so keying on event_id alone would grow state unboundedly
    despite the watermark. The WithinWatermark variant expires each key
    once the watermark passes its first-seen event time, so memory is
    bounded by arrival rate × horizon, not stream length.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# ---------------------------------------------------------------------------
# Stateful first-order transitions (streaming twin of
# operators/events_analytics.events_markov_transitions)
# ---------------------------------------------------------------------------

_TRANSITION_OUT_SCHEMA = "user_id long, prev string, cur string"
_TRANSITION_STATE_SCHEMA = "last_type string"


def _transitions_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit one (prev, cur) row per consecutive event pair for this
    user. State is ONE string — the last event type seen — so the
    file-boundary transition (last event of batch N → first of batch
    N+1) is emitted exactly once, which a per-batch lag window cannot
    do. Events sort by (ts, event_id) within the batch, the same tie
    break as the batch operator."""
    (user_id,) = key
    rows: list[tuple[int, int, str]] = []
    for pdf in pdfs:
        for t, eid, et in zip(pdf["ts"], pdf["event_id"], pdf["event_type"]):
            rows.append((int(t.value), int(eid), str(et)))
    rows.sort()
    last = state.get[0] if state.exists else None
    prevs: list[str] = []
    curs: list[str] = []
    for _, _, et in rows:
        if last is not None:
            prevs.append(last)
            curs.append(et)
        last = et
    if rows:
        state.update((last,))
    if prevs:
        yield pd.DataFrame(
            {"user_id": [user_id] * len(prevs), "prev": prevs, "cur": curs}
        )


def markov_transitions_stateful(events: DataFrame) -> DataFrame:
    """Per-user event-type transitions on an unbounded stream
    (applyInPandasWithState). The batch twin is a lag window; on a
    stream the lag must survive micro-batch boundaries, so the last
    type per user lives in keyed state — O(users) strings, partitioned
    by user_id across executors, no timeout (a quiet user just holds
    one string until their next event). Downstream transition-matrix
    aggregation composes as a normal streaming groupBy on the output.

    Contract: per-user event-time order across micro-batches (the
    intake path's time-partitioned landing guarantees it); an
    out-of-order straggler would append its transition in processing
    order rather than re-splicing history — same trade every
    last-value-state operator makes.
    """
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transitions_fn,
            outputStructType=_TRANSITION_OUT_SCHEMA,
            stateStructType=_TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
