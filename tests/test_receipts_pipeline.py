"""Golden end-to-end test: vendor-invoice CSV → receipt documents →
webhook payloads (SURVEY §5.2(2),(4)). Pins every N1/N2 edge the survey
calls out: beer pack {4,6,12,24} explosion, wine×units, bottle
short-circuit, packs 0→1, UPC priority+zfill, unparseable date→run
date, null invoice-key drop, notes assembly, total≠subtotal asymmetry,
key-ordered emission."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F

from fintech_etl_spark.operators.receipts import build_receipts, to_webhook_payloads
from fintech_etl_spark.sources.invoice_csv import read_invoice_csv

RUN_DATE = dt.date(2024, 6, 1)

HEADER = (
    "Invoice Number,Vendor Name,Invoice Date,Invoice Amount,"
    "Quantity,Packs Per Case,Units Per Pack,Unit Of Measure,GL Code,Product Class,"
    "Product Description,Extended Price,Discount Adjustment Total,"
    "DepositAdjustmentTotal,Miscellaneous Adjustment Total,Tax Adjustment Total,"
    "Delivery Adjustment Total,Pack UPC,Clean UPC,Case UPC"
)

ROWS = [
    # INV2 first in file: emission must still be key-sorted (INV1 first)
    'INV2,Acme Beer Co,06/15/2024,500.00,2,6,4,CA,BEER-4000,ALE,Sixpack,120.00,-5.5,0,0,3.25,0,123,456,789',
    # beer with non-special pack (5): qty*packs only
    'INV2,Acme Beer Co,06/15/2024,500.00,3,5,4,CA,BEER-4000,ALE,Oddpack,80.00,0,0,0,3.25,0,,,42',
    # bottle short-circuit: beer sold by bottle NOT exploded
    'INV2,Acme Beer Co,06/15/2024,500.00,7,6,4,BO,BEER-4000,ALE,Bottle,30.00,0,2.5,0,3.25,0,,,',
    # INV1: wine explodes by packs*units; garbage amount; bad date
    'INV1,,13/45/2024,not-a-number,2,3,6,CA,WINE-55,RED,Pinot,200.00,0,0,1.5,0,4.0,,987654321098765,111',
    # packs=0 -> 1; spirits qty*packs
    'INV1,,13/45/2024,not-a-number,4,0,9,EA,SPIRITS,RUM,Rum,60.00,0,0,0,0,0,,,',
    # null invoice key: dropped like pandas groupby
    ',Ghost Vendor,01/01/2024,9.99,1,1,1,EA,BEER,X,Ghost,9.99,0,0,0,0,0,,,',
]


def _write_fixture(tmp_path):
    p = tmp_path / "fixture.csv"
    p.write_text(HEADER + "\n" + "\n".join(ROWS) + "\n")
    return str(p)


def test_receipts_golden(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_invoice_csv(spark, path)
    receipts = build_receipts(
        df,
        gcs_bucket="landing",
        gcs_path="intake/x.csv",
        gmail_id="g42",
        run_date=RUN_DATE,
        run_ts=1700000000,
    ).collect()

    assert [r.receipt_id for r in receipts] == ["INV1", "INV2"]  # key order

    inv1, inv2 = receipts
    # header extraction + defaults
    assert inv1.vendor == "Unknown Vendor"  # empty Vendor Name → default
    assert inv2.vendor == "Acme Beer Co"
    assert inv1.transaction_date == RUN_DATE  # 13/45/2024 unparseable
    assert inv2.transaction_date == dt.date(2024, 6, 15)
    # total (header field) ≠ subtotal (computed Σ Extended Price)
    assert inv1.total_amount == 0.0  # 'not-a-number' degrades
    assert inv2.total_amount == 500.0
    assert round(inv1.subtotal, 2) == 260.0
    assert round(inv2.subtotal, 2) == 230.0
    assert inv1.item_count == 2 and inv2.item_count == 3
    assert inv1.document_id == "fnt-g42-INV1-1700000000"
    assert inv1.source_file == "gs://landing/intake/x.csv"

    # line items preserve file order within the invoice
    li2 = inv2.line_items
    assert [i.name for i in li2] == ["Sixpack", "Oddpack", "Bottle"]
    # beer special pack 6: 2*6*4 = 48
    assert li2[0].qty == 48
    # beer non-special pack 5: 3*5 = 15
    assert li2[1].qty == 15
    # bottle short-circuit: int(7), NOT exploded
    assert li2[2].qty == 7
    assert li2[2].unitOfMeasure == "bottle"
    # UPC priority pack→clean→case, zfilled to 14
    assert li2[0].upc == "123".zfill(14)
    assert li2[1].upc == "42".zfill(14)
    assert li2[1].sku == "42".zfill(14)
    assert li2[2].upc is None
    # notes: only nonzero adjustments, '; '-joined, tax excluded
    assert li2[0].notes == "Discount: -5.5"
    assert li2[2].notes == "Deposit: 2.5"
    assert li2[1].notes is None

    li1 = inv1.line_items
    # wine: 2*3*6 = 36 ; spirits with packs 0→1: 4*1 = 4
    assert li1[0].qty == 36
    assert li1[1].qty == 4
    # 15-char clean UPC left-truncated to 14
    assert li1[0].upc == "98765432109876"
    assert li1[0].category == "WINE"
    assert li1[1].category == "SPIRITS"


def test_webhook_payloads(spark, tmp_path):
    path = _write_fixture(tmp_path)
    receipts = build_receipts(
        read_invoice_csv(spark, path),
        gcs_bucket="landing",
        gcs_path="intake/x.csv",
        gmail_id="g42",
        run_date=RUN_DATE,
        run_ts=1700000000,
    )
    payloads = {r.document_id: json.loads(r.payload) for r in to_webhook_payloads(receipts).collect()}
    doc = payloads["fnt-g42-INV2-1700000000"]
    # wire projection renames (code wins over README: transactionDate)
    assert doc["receiptId"] == "INV2"
    assert doc["transactionDate"] == "2024-06-15"
    assert doc["totalAmount"] == 500.0
    assert doc["itemCount"] == 3
    assert [i["name"] for i in doc["lineItems"]] == ["Sixpack", "Oddpack", "Bottle"]
    assert "date" not in doc


def test_permissive_csv_garbage_rows(spark, tmp_path):
    """PERMISSIVE scan + null-tolerant rules: malformed lines degrade
    per-cell (defaults) instead of failing the file — the reference's
    row.get(default) contract at scan level."""
    p = tmp_path / "garbage.csv"
    p.write_text(
        HEADER + "\n"
        + ROWS[0] + "\n"
        + "INVX,only,three\n"                      # short row
        + ",,,,,,,,,,,,,,,,,,,\n"                  # all-empty row (null key → dropped)
        + 'INVX,V,06/01/2024,xx,zz,aa,bb,??,GLB,PC,Desc,not-a-price,0,0,0,0,0,,,\n'
    )
    from fintech_etl_spark.operators.receipts import build_receipts
    from fintech_etl_spark.sources.invoice_csv import read_invoice_csv

    receipts = {r.receipt_id: r for r in build_receipts(
        read_invoice_csv(spark, str(p)), run_date=RUN_DATE
    ).collect()}
    assert set(receipts) == {"INV2", "INVX"}
    invx = receipts["INVX"]
    assert invx.item_count == 2           # short row + garbage row both kept
    assert invx.total_amount == 0.0       # 'xx' degrades to default
    assert invx.subtotal == 0.0           # 'not-a-price' degrades
    qtys = [i.qty for i in invx.line_items]
    assert qtys == [0, 0]                 # garbage quantities → 0


# ---------------------------------------------------------------------------
# transactional receipt lake — the manifest layer's third client
# ---------------------------------------------------------------------------


def _golden_receipts(spark, tmp_path):
    return build_receipts(
        read_invoice_csv(spark, _write_fixture(tmp_path)), run_date=RUN_DATE
    )


def test_receipt_lake_exactly_once_per_batch_key(spark, tmp_path):
    """A replayed batch (same batch_key — the foreachBatch checkpoint-
    loss scenario) publishes nothing: count and manifest version are
    unchanged. A NEW key appends."""
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet

    receipts = _golden_receipts(spark, tmp_path)
    lake = str(tmp_path / "lake")
    write_receipts_parquet(receipts, lake, transactional=True, batch_key="b0")
    assert mf.is_transactional(lake)
    n = read_receipts(spark, lake).count()
    v = mf.current(lake)["version"]
    write_receipts_parquet(receipts, lake, batch_key="b0")  # replay
    assert read_receipts(spark, lake).count() == n
    assert mf.current(lake)["version"] == v
    write_receipts_parquet(receipts, lake, batch_key="b1")  # new batch
    assert read_receipts(spark, lake).count() == 2 * n
    assert mf.current(lake)["version"] == v + 1


def test_receipt_lake_overwrite_is_replace_commit(spark, tmp_path):
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet

    receipts = _golden_receipts(spark, tmp_path)
    lake = str(tmp_path / "lake")
    for key in ("b0", "b1", "b2"):
        write_receipts_parquet(
            receipts, lake, transactional=True, batch_key=key
        )
    n = read_receipts(spark, lake).count()
    write_receipts_parquet(receipts, lake, mode="overwrite")
    assert len(mf.dataset_segments(lake, "receipts")) == 1
    assert read_receipts(spark, lake).count() == n // 3


def test_receipt_lake_readers_never_see_partial_batches(spark, tmp_path):
    """THE window this client closes: a reader racing the writer sees
    only committed snapshots — every observed count is an exact
    multiple of the batch size, never a partially-listed batch (the
    plain directory append can expose one part file of a
    month-partitioned batch mid-write)."""
    import threading

    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet

    receipts = _golden_receipts(spark, tmp_path)
    batch_n = receipts.count()
    assert batch_n > 0
    lake = str(tmp_path / "lake")
    write_receipts_parquet(receipts, lake, transactional=True, batch_key="b0")

    done = threading.Event()
    bad: list[int] = []

    def writer():
        try:
            for i in range(1, 7):
                write_receipts_parquet(receipts, lake, batch_key=f"b{i}")
        finally:
            done.set()

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    observed = set()
    while not done.is_set():
        c = read_receipts(spark, lake).count()
        observed.add(c)
        if c % batch_n != 0:
            bad.append(c)
            break
    t.join(timeout=120)
    assert not bad, f"partial batch visible: {bad} (batch size {batch_n})"
    assert read_receipts(spark, lake).count() == 7 * batch_n
    assert len(observed) >= 1


def test_cli_transactional_lake_exactly_once(spark, tmp_path, capsys, monkeypatch):
    """`process-csv --transactional-lake` twice on the SAME csv: the
    second run's content-derived batch key matches and publishes
    nothing (exactly-once per source-file set); a different csv
    appends. The guard refuses to force tx mode onto an existing
    plain lake."""
    from fintech_etl_spark import cli
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet

    monkeypatch.setattr(cli, "build_session", lambda *a, **k: spark)
    csv = _write_fixture(tmp_path)
    lake = str(tmp_path / "lake")
    assert cli.main(
        ["process-csv", csv, "--lake", lake, "--transactional-lake"]
    ) == 0
    assert mf.is_transactional(lake)
    n = read_receipts(spark, lake).count()
    v = mf.current(lake)["version"]
    # same file again — flag not even needed, the lake auto-detects,
    # but the CLI passes the same content key so nothing publishes
    assert cli.main(
        ["process-csv", csv, "--lake", lake, "--transactional-lake"]
    ) == 0
    assert read_receipts(spark, lake).count() == n
    assert mf.current(lake)["version"] == v
    # a different file appends
    other = tmp_path / "other.csv"
    other.write_text(HEADER + "\n" + ROWS[0] + "\n")
    assert cli.main(
        ["process-csv", str(other), "--lake", lake, "--transactional-lake"]
    ) == 0
    assert read_receipts(spark, lake).count() > n
    assert mf.current(lake)["version"] == v + 1

    # migration guard: tx mode onto an existing plain lake is loud
    plain = str(tmp_path / "plain_lake")
    receipts = _golden_receipts(spark, tmp_path)
    write_receipts_parquet(receipts, plain)
    with pytest.raises(ValueError, match="PLAIN parquet lake"):
        write_receipts_parquet(receipts, plain, transactional=True)


def test_receipt_lake_month_range_manifest_pruning(spark, tmp_path):
    """months= excludes whole segments from the committed month stats
    (one pointer read, zero listings) and the pruned result equals the
    unpruned filter's exactly; a stats-less segment is always kept."""
    import datetime as dt2

    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet

    lake = str(tmp_path / "lake")
    base = _golden_receipts(spark, tmp_path)  # months 2024-06 only
    write_receipts_parquet(base, lake, transactional=True, batch_key="b0")
    shifted = base.withColumn(
        "transaction_date", F.add_months(F.col("transaction_date"), 6)
    )
    write_receipts_parquet(shifted, lake, batch_key="b1")  # 2024-12

    pairs = mf.dataset_segments_with_stats(lake, "receipts")
    assert len(pairs) == 2 and all(
        st and "transaction_month" in st for _, st in pairs
    )
    # range covering only the shifted batch: one segment admitted
    pruned = read_receipts(spark, lake, months=("2024-10", "2024-12"))
    unpruned = read_receipts(spark, lake).filter(
        F.col("transaction_month").between("2024-10", "2024-12")
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, unpruned.collect())
    )
    assert pruned.count() == base.count()
    # range hitting nothing: schema-only, zero rows, no error
    assert read_receipts(spark, lake, months=("1990-01", "1990-02")).count() == 0
    # a foreign segment without stats is must-scan, never may-skip
    seg = mf.new_segment_path(lake)
    base.withColumn(
        "transaction_month", F.date_format("transaction_date", "yyyy-MM")
    ).write.parquet(seg)
    mf.commit(lake, add={"receipts": [seg]})
    with_foreign = read_receipts(spark, lake, months=("2024-10", "2024-12"))
    # the stats-less segment is scanned (its rows are 2024-06 → filtered
    # out), and the committed-range rows still all arrive
    assert with_foreign.count() == base.count()


def test_months_filter_on_non_month_partitioned_lake(spark, tmp_path):
    """A lake written with partition_by_month=False has NO
    transaction_month column; months= used to raise an
    unresolved-column AnalysisException (r12 ADVICE). It must instead
    translate to half-open transaction_date bounds — in BOTH the plain
    and the transactional shapes — and return exactly the rows a
    month-partitioned lake's filter would."""
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet

    base = _golden_receipts(spark, tmp_path)  # 2024-06
    shifted = base.withColumn(
        "transaction_date", F.add_months(F.col("transaction_date"), 6)
    )  # 2024-12
    both = base.unionByName(shifted)
    plain = str(tmp_path / "plain_nm")
    tx = str(tmp_path / "tx_nm")
    write_receipts_parquet(both, plain, partition_by_month=False)
    write_receipts_parquet(
        both, tx, partition_by_month=False, transactional=True, batch_key="b0"
    )
    want = sorted(r.receipt_id for r in shifted.collect())
    for lake in (plain, tx):
        got = read_receipts(spark, lake, months=("2024-10", "2024-12"))
        assert "transaction_month" not in got.columns
        assert sorted(r.receipt_id for r in got.collect()) == want
    # December edge: the hi month's last day is INSIDE the range
    # (half-open translation must not clip it) and January is outside
    assert (
        read_receipts(spark, plain, months=("2024-12", "2024-12")).count()
        == shifted.count()
    )
    assert read_receipts(spark, plain, months=("2025-01", "2025-02")).count() == 0


def test_receipt_lake_compaction_time_travel_vacuum(
    spark, tmp_path, capsys, monkeypatch
):
    """The full table-format story for the lake: compaction folds the
    fragments into one segment WITH month stats re-committed (ranged
    pruning survives), time travel reads the pre-compact snapshot,
    and vacuum bounds the window — all through the CLI where it has
    one."""
    from fintech_etl_spark import cli
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet

    monkeypatch.setattr(cli, "build_session", lambda *a, **k: spark)
    lake = str(tmp_path / "lake")
    base = _golden_receipts(spark, tmp_path)
    shifted = base.withColumn(
        "transaction_date", F.add_months(F.col("transaction_date"), 6)
    )
    write_receipts_parquet(base, lake, transactional=True, batch_key="b0")
    write_receipts_parquet(shifted, lake, batch_key="b1")
    write_receipts_parquet(base, lake, batch_key="b2")
    total = read_receipts(spark, lake).count()
    v_pre = mf.current(lake)["version"]
    assert len(mf.dataset_segments(lake, "receipts")) == 3

    # a plain (non-manifest) lake is loud, not a FileNotFoundError
    plain = str(tmp_path / "plain_for_compact")
    write_receipts_parquet(base, plain)
    assert cli.main(["lake-compact", "--path", plain]) == 2
    capsys.readouterr()

    # cron mode: below the fragmentation threshold it is a no-op
    rc = cli.main(
        ["lake-compact", "--path", lake, "--when-segments-above", "10"]
    )
    assert rc == 0
    noop = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert noop["compacted"] is False and noop["segments"] == 3
    assert len(mf.dataset_segments(lake, "receipts")) == 3
    # above it (3 > 2) the same invocation compacts
    rc = cli.main(
        ["lake-compact", "--path", lake, "--when-segments-above", "2"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_after"] <= out["files_before"]
    assert out["rows"] == total
    segs = mf.dataset_segments_with_stats(lake, "receipts")
    assert len(segs) == 1
    _, st = segs[0]
    assert st["transaction_month"] == ["2024-06", "2024-12"]
    # ranged manifest pruning still exact after compaction
    pruned = read_receipts(spark, lake, months=("2024-10", "2024-12"))
    assert pruned.count() == shifted.count()
    # time travel: the pre-compact snapshot is intact
    old = read_receipts(spark, lake, version=v_pre)
    assert old.count() == total
    # vacuum through the generic CLI bounds the window
    rc = cli.main(["manifest-vacuum", "--path", lake, "--keep", "1"])
    assert rc == 0
    vac = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert vac["removed_segments"]
    with pytest.raises(ValueError, match="vacuumed"):
        read_receipts(spark, lake, version=v_pre).count()
    assert read_receipts(spark, lake).count() == total


def test_file_key_exactly_once_survives_rebatching_and_glob_growth(
    spark, tmp_path
):
    """The r13 review catch: a whole-batch set digest breaks when a
    replay RE-BATCHES the same files or a backfill glob GROWS. The
    per-file granularity (file_key_col) must: append only the new
    files' rows from a mixed batch, skip a re-batched full replay
    entirely, report what it did (for side-effect gating), and refuse
    the reverse plain-write on a manifest-backed lake."""
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet

    base = _golden_receipts(spark, tmp_path)
    fa = base.withColumn("source_file", F.lit("gs://b/a.csv"))
    fb = base.withColumn(
        "source_file", F.lit("gs://b/b.csv")
    ).withColumn("receipt_id", F.concat(F.col("receipt_id"), F.lit("-b")))
    lake = str(tmp_path / "lake_fk")
    n = base.count()

    # batch 1: {a}
    res = write_receipts_parquet(
        fa, lake, transactional=True, file_key_col="source_file"
    )
    assert res["published"] and res["files_published"] == ["gs://b/a.csv"]
    assert read_receipts(spark, lake).count() == n

    # the glob grew: batch {a, b} — only b's rows land, a is reported
    res = write_receipts_parquet(
        fa.unionByName(fb), lake, file_key_col="source_file"
    )
    assert res["published"]
    assert res["files_published"] == ["gs://b/b.csv"]
    assert res["files_skipped"] == ["gs://b/a.csv"]
    assert read_receipts(spark, lake).count() == 2 * n

    # checkpoint-loss replay RE-BATCHED as {b} alone: full no-op
    res = write_receipts_parquet(fb, lake, file_key_col="source_file")
    assert res == {
        "published": False,
        "files_published": [],
        "files_skipped": ["gs://b/b.csv"],
    }
    assert read_receipts(spark, lake).count() == 2 * n
    from fintech_etl_spark.sinks import manifest as mf2

    assert mf2.ingested_count(lake) == 2

    # reverse-migration guard: an explicit plain write on a
    # manifest-backed lake is refused (append would hide rows,
    # overwrite would destroy the commit log)
    with pytest.raises(ValueError, match="manifest-backed"):
        write_receipts_parquet(fa, lake, transactional=False)
    # and the two exactly-once granularities are mutually exclusive
    with pytest.raises(ValueError, match="not both"):
        write_receipts_parquet(
            fa, lake, batch_key="x", file_key_col="source_file"
        )


def test_month_bounds_translation_equivalence_property(spark):
    """Property: for ANY inclusive 'yyyy-MM' range, the half-open
    transaction_date translation (_apply_month_filter on a lake
    without the month column) selects exactly the rows the
    month-string filter would — including December year-rollover and
    single-month ranges."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fintech_etl_spark.sinks.receipts import _apply_month_filter

    # one static frame spanning 4 years of month edges: the 1st, the
    # 28th, and every month's LAST day (the clipping hazard)
    import datetime as dt2

    dates = []
    d = dt2.date(2022, 1, 1)
    while d < dt2.date(2026, 1, 1):
        nxt = (d.replace(day=28) + dt2.timedelta(days=4)).replace(day=1)
        dates += [d, d.replace(day=28), nxt - dt2.timedelta(days=1)]
        d = nxt
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(dates)],
        "receipt_id long, transaction_date date",
    ).cache()
    df.count()

    months_st = st.tuples(
        st.integers(2022, 2025), st.integers(1, 12)
    ).map(lambda t: f"{t[0]}-{t[1]:02d}")

    @settings(max_examples=20, deadline=None)
    @given(lo=months_st, hi=months_st)
    def check(lo, hi):
        if lo > hi:
            lo, hi = hi, lo
        got = sorted(
            r.receipt_id for r in _apply_month_filter(df, lo, hi).collect()
        )
        want = sorted(
            r.receipt_id
            for r in df.filter(
                F.date_format("transaction_date", "yyyy-MM").between(lo, hi)
            ).collect()
        )
        assert got == want, (lo, hi)

    try:
        check()
    finally:
        df.unpersist()


def test_webhook_outbox_atomic_intent_and_recoverable_delivery(
    spark, tmp_path
):
    """The r13 ADVICE medium finding, closed: batch webhook delivery
    was at-most-once with no recovery (failures swallowed; a replay
    skips the webhook entirely because the files are already
    ingested). Here the notification INTENT commits atomically with
    the lake batch (outbox segment, same pointer swap), a blip leaves
    the batch in the outbox, and the next drain re-posts ONLY the
    failures — with the ORIGINAL document_ids, pinned at publish time
    (a re-run would mint different run_ts-derived ids)."""
    import os as _os

    from fintech_etl_spark.sinks import (
        WebhookSink,
        read_receipts,
        write_receipts_parquet,
    )
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.receipts import (
        _OUTBOX_DS,
        drain_webhook_outbox,
    )

    base = _golden_receipts(spark, tmp_path)
    n = base.count()
    fa = base.withColumn("source_file", F.lit("gs://b/a.csv"))
    lake = str(tmp_path / "lake_ob")

    res = write_receipts_parquet(
        fa,
        lake,
        transactional=True,
        file_key_col="source_file",
        outbox=to_webhook_payloads,
    )
    assert res["published"]
    # intent committed atomically with the data: one pointer read
    # shows BOTH the receipts segment and the staged payloads
    segs = mf.dataset_segments(lake, _OUTBOX_DS)
    assert len(segs) == 1
    staged = spark.read.parquet(segs[0])
    staged_ids = {r.document_id for r in staged.collect()}
    assert len(staged_ids) == n

    wire_log = tmp_path / "wire.log"
    outage = tmp_path / "outage_done"

    def poster(url, body, headers, _log=str(wire_log), _m=str(outage)):
        doc = json.loads(body)
        with open(_log, "a") as f:
            f.write(doc["document_id"] + "\n")
        if doc["receiptId"] == "INV2" and not _os.path.exists(_m):
            open(_m, "w").close()
            raise ConnectionError("endpoint down mid-batch")
        return 200

    ledger = str(tmp_path / "wh_ledger")
    mk = lambda: WebhookSink(  # noqa: E731 — fresh instance = restart
        url="http://example.invalid/hook", poster=poster, ledger_path=ledger
    )
    # the ledger is not optional on this path
    with pytest.raises(ValueError, match="ledger_path"):
        drain_webhook_outbox(
            spark, lake, WebhookSink(url="http://example.invalid/hook")
        )

    # drain 1: blip mid-batch — failures stay in the outbox
    d1 = drain_webhook_outbox(spark, lake, mk())
    assert d1["batches"] == 1 and d1["failed"] == 1 and d1["sent"] == n - 1
    assert len(mf.dataset_segments(lake, _OUTBOX_DS)) == 1  # not drained

    # drain 2 ("after the crash/blip", fresh sink): ledger skips the
    # delivered doc, re-posts only the failure, outbox empties
    d2 = drain_webhook_outbox(spark, lake, mk())
    assert d2 == {
        "batches": 1, "sent": 1, "failed": 0, "skipped": n - 1,
        "drained": d2["drained"],
    }
    assert len(d2["drained"]) == 1
    assert mf.dataset_segments(lake, _OUTBOX_DS) == []
    wire = wire_log.read_text().splitlines()
    assert len(wire) == n + 1  # INV2 twice, everything else once
    assert set(wire) == staged_ids  # the ORIGINAL idempotency keys

    # full replay: nothing publishes, nothing stages, nothing sends
    res = write_receipts_parquet(
        fa, lake, file_key_col="source_file", outbox=to_webhook_payloads
    )
    assert not res["published"]
    assert mf.dataset_segments(lake, _OUTBOX_DS) == []
    d3 = drain_webhook_outbox(spark, lake, mk())
    assert d3["batches"] == 0 and d3["sent"] == 0
    assert len(wire_log.read_text().splitlines()) == n + 1  # wire silent

    # mixed batch {a, b}: the outbox stages payloads for b's docs ONLY
    fb = fa.withColumn("source_file", F.lit("gs://b/b.csv")).withColumn(
        "receipt_id", F.concat(F.col("receipt_id"), F.lit("-b"))
    )
    res = write_receipts_parquet(
        fa.unionByName(fb),
        lake,
        file_key_col="source_file",
        outbox=to_webhook_payloads,
    )
    assert res["files_published"] == ["gs://b/b.csv"]
    segs = mf.dataset_segments(lake, _OUTBOX_DS)
    assert len(segs) == 1
    # b's docs only (n, not 2n): the outbox callable sees the frame
    # AFTER the already-ingested file's rows were filtered out
    assert spark.read.parquet(segs[0]).count() == n
    assert read_receipts(spark, lake).count() == 2 * n


def test_cli_webhook_outbox_end_to_end(spark, tmp_path, capsys, monkeypatch):
    """process-csv --transactional-lake --webhook: delivery goes
    through the outbox + ledger; a replay run sends nothing; a batch
    left undelivered by a 'crash' (staged, never drained) is delivered
    by the NEXT run's drain — recoverability the old gate-on-published
    path did not have."""
    import os as _os

    from fintech_etl_spark import cli
    from fintech_etl_spark.sinks import WebhookSink, write_receipts_parquet
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.receipts import _OUTBOX_DS

    monkeypatch.setattr(cli, "build_session", lambda *a, **k: spark)
    store = tmp_path / "receiver"
    store.mkdir()

    def poster(url, body, headers, _store=str(store)):
        doc = json.loads(body)
        path = _os.path.join(_store, doc["document_id"].replace("/", "_"))
        if not _os.path.exists(path):
            with open(path, "w") as f:
                f.write(body.decode())
        return 200

    real_sink = cli.WebhookSink
    monkeypatch.setattr(
        cli,
        "WebhookSink",
        lambda url, **kw: real_sink(url=url, poster=poster, **kw),
    )

    csv = _write_fixture(tmp_path)
    lake = str(tmp_path / "lake")
    hook = "http://example.invalid/hook"
    assert cli.main(
        ["process-csv", csv, "--lake", lake, "--transactional-lake",
         "--webhook", hook]
    ) == 0
    delivered = set(_os.listdir(store))
    assert len(delivered) == 2  # INV1, INV2
    assert mf.dataset_segments(lake, _OUTBOX_DS) == []  # drained

    # replay: publishes nothing, sends nothing
    assert cli.main(
        ["process-csv", csv, "--lake", lake, "--transactional-lake",
         "--webhook", hook]
    ) == 0
    assert set(_os.listdir(store)) == delivered

    # 'crash between commit and send': a batch staged via the library
    # with NO drain — the next CLI run (different csv) delivers BOTH
    orphan = _golden_receipts(spark, tmp_path).withColumn(
        "source_file", F.lit("gs://b/orphan.csv")
    ).withColumn(
        "receipt_id", F.concat(F.col("receipt_id"), F.lit("-o"))
    )
    write_receipts_parquet(
        orphan, lake, file_key_col="source_file",
        outbox=to_webhook_payloads,
    )
    assert len(mf.dataset_segments(lake, _OUTBOX_DS)) == 1  # pending
    other = tmp_path / "other.csv"
    other.write_text(HEADER + "\n" + ROWS[0] + "\n")
    assert cli.main(
        ["process-csv", str(other), "--lake", lake, "--transactional-lake",
         "--webhook", hook]
    ) == 0
    assert mf.dataset_segments(lake, _OUTBOX_DS) == []  # all drained
    # orphan's 2 docs + other.csv's 1 doc joined the receiver store
    assert len(_os.listdir(store)) == 5


def test_overwrite_rebuild_preserves_pending_outbox(spark, tmp_path):
    """r14 self-review catch: a rebuild (mode='overwrite') REPLACES the
    receipts dataset but must carry pending outbox segments FORWARD —
    they are undelivered notification intent from earlier batches, and
    replacing the outbox dataset too would silently drop them,
    re-opening the exact at-most-once loss the outbox closes."""
    import os as _os

    from fintech_etl_spark.sinks import WebhookSink, write_receipts_parquet
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.receipts import (
        _OUTBOX_DS,
        drain_webhook_outbox,
    )

    base = _golden_receipts(spark, tmp_path)
    n = base.count()
    fa = base.withColumn("source_file", F.lit("gs://b/a.csv"))
    lake = str(tmp_path / "lake_owb")
    write_receipts_parquet(
        fa, lake, transactional=True, file_key_col="source_file",
        outbox=to_webhook_payloads,
    )
    assert len(mf.dataset_segments(lake, _OUTBOX_DS)) == 1  # pending
    # rebuild from scratch (replace-commit) WITH its own outbox
    write_receipts_parquet(
        fa, lake, mode="overwrite", transactional=True,
        file_key_col="source_file", outbox=to_webhook_payloads,
    )
    segs = mf.dataset_segments(lake, _OUTBOX_DS)
    assert len(segs) == 2  # old pending intent carried forward + new
    # one drain delivers BOTH batches' documents, then empties — and
    # the fully-delivered removals land as ONE commit
    store = tmp_path / "receiver"
    store.mkdir()
    posts = []

    def poster(url, body, headers, _store=str(store)):
        doc = json.loads(body)
        path = _os.path.join(_store, doc["document_id"].replace("/", "_"))
        with open(path + f".{len(_os.listdir(_store))}", "w") as f:
            f.write("1")
        return 200

    v_before = mf.current(lake)["version"]
    sink = WebhookSink(
        url="http://example.invalid/hook", poster=poster,
        ledger_path=str(tmp_path / "ledger"),
    )
    d = drain_webhook_outbox(spark, lake, sink)
    assert d["batches"] == 2 and d["failed"] == 0 and d["sent"] == 2 * n
    assert mf.dataset_segments(lake, _OUTBOX_DS) == []
    assert mf.current(lake)["version"] == v_before + 1  # one remove-commit


# ---------------------------------------------------------------------------
# r15: batched drain, membership-keyed ledger retention, maintain-drain,
# lock provider passthrough
# ---------------------------------------------------------------------------


def _stage_outbox_batches(spark, tmp_path, lake, tags):
    """Publish one transactional batch per tag, each staging its own
    outbox segment (no drain). Returns receipts-per-batch."""
    from fintech_etl_spark.sinks import write_receipts_parquet

    base = _golden_receipts(spark, tmp_path)
    n = base.count()
    for t in tags:
        fa = base.withColumn(
            "source_file", F.lit(f"gs://b/{t}.csv")
        ).withColumn(
            "receipt_id", F.concat(F.col("receipt_id"), F.lit(f"-{t}"))
        )
        write_receipts_parquet(
            fa,
            lake,
            transactional=True,
            file_key_col="source_file",
            outbox=to_webhook_payloads,
        )
    return n


def test_outbox_drain_is_constant_jobs_in_pending_segments(spark, tmp_path):
    """r14 verdict drain-latency note, closed: a drain over N pending
    outbox segments must issue O(1) Spark jobs (one unioned read, one
    anti-join, one delivery action, one accounting read) — not
    O(N) sequential per-segment jobs. Pinned by counting jobs for
    N=2 vs N=6 under identical fresh-ledger conditions."""
    import uuid as _uuid

    from fintech_etl_spark.sinks import WebhookSink
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.receipts import _OUTBOX_DS, drain_webhook_outbox

    sc = spark.sparkContext

    def drain_jobs(n_batches):
        lake = str(tmp_path / f"lake_jobs_{n_batches}")
        _stage_outbox_batches(
            spark, tmp_path, lake, [f"s{i}" for i in range(n_batches)]
        )
        assert len(mf.dataset_segments(lake, _OUTBOX_DS)) == n_batches
        sink = WebhookSink(
            url="http://example.invalid/hook",
            poster=lambda url, body, headers: 200,
            ledger_path=str(tmp_path / f"ledger_jobs_{n_batches}"),
        )
        group = f"drain-{_uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, "job-count pin")
        try:
            d = drain_webhook_outbox(spark, lake, sink)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        assert d["batches"] == n_batches and d["failed"] == 0
        assert mf.dataset_segments(lake, _OUTBOX_DS) == []
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j2 = drain_jobs(2)
    j6 = drain_jobs(6)
    assert j6 == j2, (j2, j6)  # constant in pending-segment count
    assert j2 <= 8, j2  # and small in absolute terms


def test_drain_self_retains_ledger_by_outbox_membership(spark, tmp_path):
    """The r14 verdict's sharpest latent edge, closed: outbox batch
    ids are segment-name hashes with NO keep-last order, so ledger
    retention is keyed on manifest MEMBERSHIP — the drain drops a
    segment's ledger partition exactly when its remove-commit takes
    the segment out of the outbox, and a PENDING segment's partition
    (the retry skip records) is never touched."""
    import os as _os

    from fintech_etl_spark.sinks import WebhookSink
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.receipts import (
        _OUTBOX_DS,
        drain_webhook_outbox,
        outbox_batch_id,
    )

    lake = str(tmp_path / "lake_ret")
    _stage_outbox_batches(spark, tmp_path, lake, ["ok", "down"])
    ledger = str(tmp_path / "ledger_ret")

    def poster(url, body, headers):
        doc = json.loads(body)
        if doc["receiptId"].endswith("-down"):
            raise ConnectionError("receiver rejects batch 'down'")
        return 200

    sink = WebhookSink(
        url="http://example.invalid/hook", poster=poster, ledger_path=ledger
    )
    d = drain_webhook_outbox(spark, lake, sink)
    assert d["batches"] == 2 and d["failed"] > 0 and d["sent"] > 0
    pending = mf.dataset_segments(lake, _OUTBOX_DS)
    assert len(pending) == 1  # 'down' stays
    pend_id = outbox_batch_id(_os.path.relpath(pending[0], lake))
    parts = (
        {e for e in _os.listdir(ledger) if e.startswith("batch_id=")}
        if _os.path.isdir(ledger)
        else set()
    )
    # delivered segment's partition dropped with its remove-commit;
    # the pending segment here has no successes recorded (all its
    # posts failed), so at most the pending id's partition may exist —
    # and an entirely-empty ledger is removed outright
    assert parts <= {f"batch_id={pend_id}"}, parts
    # a retry with a healed receiver delivers ONLY the pending batch
    ok_sink = WebhookSink(
        url="http://example.invalid/hook",
        poster=lambda url, body, headers: 200,
        ledger_path=ledger,
    )
    d2 = drain_webhook_outbox(spark, lake, ok_sink)
    assert d2["batches"] == 1 and d2["failed"] == 0
    assert mf.dataset_segments(lake, _OUTBOX_DS) == []


def test_expire_ledger_batches_refuses_outbox_ledger(spark, tmp_path):
    """keep-last expiry over hash-derived outbox ids could delete a
    PENDING segment's skip records while keeping delivered ones — the
    exact silent downgrade the r14 verdict led with. The generic
    expiry must refuse an outbox lake's ledger loudly and point at
    the membership-keyed sweep."""
    import os as _os

    from fintech_etl_spark.sinks.maintenance import (
        expire_ledger_batches,
        expire_outbox_ledger,
    )
    from fintech_etl_spark.sinks.receipts import outbox_batch_id
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.receipts import _OUTBOX_DS

    lake = str(tmp_path / "lake_exp")
    _stage_outbox_batches(spark, tmp_path, lake, ["p"])
    ledger = _os.path.join(lake, "_webhook_ledger")
    pend = mf.dataset_segments(lake, _OUTBOX_DS)
    pend_id = outbox_batch_id(_os.path.relpath(pend[0], lake))
    # simulate pre-r15 residue: a delivered batch's leftover partition
    # (id not in the live outbox) plus the pending segment's partition
    _os.makedirs(_os.path.join(ledger, f"batch_id={pend_id}"))
    _os.makedirs(_os.path.join(ledger, "batch_id=12345"))
    with pytest.raises(ValueError, match="expire_outbox_ledger"):
        expire_ledger_batches(ledger, keep_last=1)
    # a CUSTOM-pathed ledger holding a pending segment's partition is
    # refused too (the well-known name is not the only detector)
    custom = _os.path.join(lake, "my_ledger")
    _os.makedirs(_os.path.join(custom, f"batch_id={pend_id}"))
    with pytest.raises(ValueError, match="expire_outbox_ledger"):
        expire_ledger_batches(custom, keep_last=1)
    # ...but a STREAMING ledger (monotone epoch ids, none pending)
    # inside the same outbox lake keeps its keep-last retention — the
    # in-stream maintenance must not crash micro-batches just because
    # the lake once committed an outbox (the r15 self-review catch)
    stream = _os.path.join(lake, "stream_ledger")
    for b in (1, 2, 3):
        _os.makedirs(_os.path.join(stream, f"batch_id={b}"))
    assert expire_ledger_batches(stream, keep_last=1) == [1, 2]
    # membership-keyed sweep: residue goes, the pending partition stays
    assert expire_outbox_ledger(lake) == [12345]
    assert _os.listdir(ledger) == [f"batch_id={pend_id}"]
    # non-lake ledgers keep working unchanged
    other = str(tmp_path / "stream_ledger")
    for b in (1, 2, 3):
        _os.makedirs(_os.path.join(other, f"batch_id={b}"))
    assert expire_ledger_batches(other, keep_last=1) == [1, 2]


def test_maintain_drains_outbox_on_quiesced_lake(spark, tmp_path):
    """r14 verdict ask #3: pending webhook notifications on a lake
    that stops receiving batch runs must be deliverable by the SAME
    cron verb that compacts it — maintain(webhook_sink=...) drains the
    outbox and sweeps the delivered ledger partitions; without a
    webhook config the backlog is surfaced, never hidden."""
    import os as _os

    from fintech_etl_spark.sinks import WebhookSink
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.maintenance import maintain
    from fintech_etl_spark.sinks.receipts import _OUTBOX_DS

    lake = str(tmp_path / "lake_mnt")
    n = _stage_outbox_batches(spark, tmp_path, lake, ["a", "b"])
    # no webhook config: the cron reports the backlog
    out = maintain(spark, lake)
    assert out["kind"] == "lake" and out["outbox_pending"] == 2

    wire_log = tmp_path / "wire_mnt.log"

    def poster(url, body, headers, _log=str(wire_log)):
        doc = json.loads(body)
        with open(_log, "a") as f:
            f.write(doc["document_id"] + "\n")
        return 200

    sink = WebhookSink(
        url="http://example.invalid/hook",
        poster=poster,
        ledger_path=_os.path.join(lake, "_webhook_ledger"),
    )
    out = maintain(spark, lake, webhook_sink=sink)
    assert out["outbox"]["batches"] == 2
    assert out["outbox"]["sent"] == 2 * n and out["outbox"]["failed"] == 0
    assert len(wire_log.read_text().splitlines()) == 2 * n
    assert mf.dataset_segments(lake, _OUTBOX_DS) == []
    # drained ledger partitions swept in the same pass
    assert not _os.path.isdir(_os.path.join(lake, "_webhook_ledger"))
    # idempotent at any cron frequency
    out = maintain(spark, lake, webhook_sink=sink)
    assert out["outbox"]["batches"] == 0
    assert len(wire_log.read_text().splitlines()) == 2 * n


def test_receipts_lake_threads_cas_lock_provider(spark, tmp_path):
    """r14 ADVICE: write/drain/compact must accept the lake's lock
    provider — a CAS-locked lake's committers would otherwise not
    mutually exclude with these entry points. Proven by observing the
    version CLAIMS land in the CAS store (the conditional commit
    point only the injected provider writes there)."""
    import os as _os

    from fintech_etl_spark.sinks import WebhookSink, write_receipts_parquet
    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.locks import CASLockProvider, CASStore
    from fintech_etl_spark.sinks.receipts import (
        compact_receipts_lake,
        drain_webhook_outbox,
    )

    store = CASStore(str(tmp_path / "cas"))
    provider = CASLockProvider(store)
    lake = str(tmp_path / "lake_cas")
    base = _golden_receipts(spark, tmp_path).withColumn(
        "source_file", F.lit("gs://b/a.csv")
    )
    n = base.count()
    write_receipts_parquet(
        base,
        lake,
        transactional=True,
        file_key_col="source_file",
        outbox=to_webhook_payloads,
        lock=provider,
    )
    mdir = mf.manifests_dir(lake)
    assert provider.read_claim(mdir, 0) is not None  # claim in the STORE
    sink = WebhookSink(
        url="http://example.invalid/hook",
        poster=lambda url, body, headers: 200,
        ledger_path=str(tmp_path / "ledger_cas"),
    )
    d = drain_webhook_outbox(spark, lake, sink, lock=provider)
    assert d["sent"] == n and d["failed"] == 0
    assert provider.read_claim(mdir, 1) is not None  # remove-commit claim
    stats = compact_receipts_lake(spark, lake, lock=provider)
    assert stats["rows"] == n
    assert provider.read_claim(mdir, 2) is not None  # compaction claim
    # maintain threads the provider to every commit IT issues too:
    # stage a new outbox batch, let the cron drain it under the lock
    from fintech_etl_spark.sinks.maintenance import maintain

    write_receipts_parquet(
        base.withColumn("source_file", F.lit("gs://b/b.csv")),
        lake, file_key_col="source_file", outbox=to_webhook_payloads,
        lock=provider,
    )
    out = maintain(spark, lake, webhook_sink=sink, lock=provider)
    assert out["outbox"]["batches"] == 1 and out["outbox"]["failed"] == 0
    assert provider.read_claim(mdir, 4) is not None  # drain remove-commit
    # and no file-provider claims were minted anywhere along the way
    assert not [x for x in _os.listdir(mdir) if x.startswith("claim-")]


def test_cluster_by_month_regime_and_layout(spark, tmp_path):
    """The pre-write month clustering picks its regime from the
    batch's PLANNED size: a tiny batch hash-repartitions on month (so
    distinct months write in parallel instead of one coalesced task
    creating every month directory serially), a batch past the AQE
    advisory partition size keeps the REBALANCE hint (skew-splitting a
    hot month). Both regimes land exactly one file per month."""
    import datetime as dt2
    import glob
    import os as _os

    from fintech_etl_spark.sinks.receipts import (
        _cluster_by_month,
        _with_month,
        write_receipts_parquet,
    )

    rows = [
        (i, dt2.date(2024, 1 + (i % 12), 1 + (i % 27)), float(i))
        for i in range(200)
    ]
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        rows, "receipt_id long, transaction_date date, total_amount double"
    ).write.parquet(src)
    # parquet-backed so the optimizer has a REAL size estimate — an
    # in-memory LogicalRDD reports the default (huge) size and the
    # helper conservatively keeps the REBALANCE hint for it
    receipts = spark.read.parquet(src)

    # tiny regime: explicit hash repartition, no rebalance hint
    plan = (
        _cluster_by_month(_with_month(receipts))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "RepartitionByExpression" in plan
    assert "rebalance" not in plan.lower()

    # large regime (forced by shrinking the advisory): rebalance hint
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "1b")
    try:
        plan_big = (
            _cluster_by_month(_with_month(receipts))
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        assert "RebalancePartitions" in plan_big
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

    # layout: one parquet file per month directory, 12 months
    lake = str(tmp_path / "lake")
    write_receipts_parquet(receipts, lake, transactional=True, batch_key="b0")
    month_dirs = glob.glob(
        _os.path.join(lake, "segments", "*", "transaction_month=*")
    )
    assert len(month_dirs) == 12
    for d in month_dirs:
        assert len(glob.glob(_os.path.join(d, "*.parquet"))) == 1
