"""The z-order layout as the manifest layer's second client
(operators/layout.py + sinks/manifest.py) — the r10 audit's last
half-state windows, closed and pinned:

- transactional build/append/compact hold the same data as plain mode
  (the layout is a physical detail);
- a reader racing an append sees the OLD snapshot until the commit,
  then old+batch — never a partial file listing;
- the frozen bounds ride the manifest pointer (never observable out
  of sync with the segments) and the plain-mode sidecar write is
  atomic (a crash mid-write leaves the previous bounds intact);
- zorder_compact commits remove+add: a concurrent append is carried
  forward, a superseded rewrite aborts with StaleSegmentError;
- pruning still works through the manifest-resolved read (the segment
  files carry the same footer stats as a plain layout).
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from fintech_etl_spark.operators.layout import (
    _LAYOUT_DS,
    _write_sidecar,
    read_zorder,
    zorder_append,
    zorder_bounds,
    zorder_compact,
    zorder_write,
)
from fintech_etl_spark.sinks import manifest as mf


def _frame(spark, n=4000, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("rowid"),
        (F.col("id") * 37 % 997).cast("long").alias("x"),
        (F.col("id") * 91 % 983).cast("long").alias("y"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_transactional_build_matches_plain(spark, tmp_path):
    df = _frame(spark)
    plain, tx = str(tmp_path / "plain"), str(tmp_path / "tx")
    n_plain = zorder_write(df, ["x", "y"], plain, num_files=8)
    n_tx = zorder_write(df, ["x", "y"], tx, num_files=8, transactional=True)
    assert n_plain == n_tx == 4000
    assert _rows(read_zorder(spark, plain)) == _rows(read_zorder(spark, tx))
    # bounds identical, manifest-resolved vs sidecar
    assert zorder_bounds(tx)["bounds"] == {
        c: list(v) if isinstance(v, list) else v
        for c, v in zorder_bounds(plain)["bounds"].items()
    }
    assert mf.is_transactional(tx) and not mf.is_transactional(plain)


def test_append_is_atomic_to_readers(spark, tmp_path):
    """The r10 half-state window: stage the batch WITHOUT committing —
    a reader must see exactly the old snapshot; after the commit,
    exactly old+batch."""
    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 2000), ["x", "y"], root, num_files=4,
                 transactional=True)
    meta = zorder_bounds(root)

    # stage a batch the way zorder_append does, but crash before commit
    from fintech_etl_spark.operators.layout import _cluster_write

    seg = mf.new_segment_path(root)
    _cluster_write(_frame(spark, 500, offset=2000), meta, seg, 2, "overwrite")
    assert read_zorder(spark, root).count() == 2000  # staged = invisible

    # the retry (full append) commits segment + pointer atomically
    assert zorder_append(_frame(spark, 500, offset=2000), root, num_files=2) == 500
    assert read_zorder(spark, root).count() == 2500
    # both segments are named by the live manifest
    assert len(mf.dataset_segments(root, _LAYOUT_DS)) == 2
    # the crashed staging is an unreferenced orphan vacuum collects
    got = mf.vacuum(root, keep_last=1, orphan_grace_sec=0.0)
    assert os.path.join("segments", os.path.basename(seg)) in got[
        "removed_segments"
    ]
    assert read_zorder(spark, root).count() == 2500


def test_plain_sidecar_write_is_atomic(tmp_path, monkeypatch):
    """A crash mid-sidecar-write (simulated: fsync raises after the
    temp file is partially on disk) leaves the ORIGINAL bounds
    readable — the non-atomic open(...,'w') the r10 audit charged
    would have truncated them."""
    path = str(tmp_path)
    good = {"cols": ["x"], "bits": 4, "bounds": {"x": [0, 10]}}
    _write_sidecar(path, good)

    real_fsync = os.fsync

    def boom(fd):
        real_fsync(fd)
        raise OSError("simulated crash before replace")

    monkeypatch.setattr(os, "fsync", boom)
    with pytest.raises(OSError, match="simulated crash"):
        _write_sidecar(path, {"cols": ["x"], "bits": 4, "bounds": {"x": [0, 99]}})
    monkeypatch.undo()
    with open(os.path.join(path, "_zbounds.json")) as fh:
        assert json.load(fh) == good


def test_bounds_ride_the_pointer(spark, tmp_path):
    """After a bounds-refreshing compaction, segments and bounds come
    from the SAME manifest version — there is no file pair to observe
    out of sync (plain mode: data commit and sidecar replace are two
    steps)."""
    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 1000), ["x", "y"], root, num_files=4,
                 transactional=True)
    v0 = mf.current(root)["version"]
    before = zorder_bounds(root)
    # append data whose keys extend past the frozen range
    wide = spark.range(5000, 5400).select(
        F.col("id").alias("rowid"),
        (F.col("id") % 2000).cast("long").alias("x"),
        (F.col("id") % 1500).cast("long").alias("y"),
    )
    zorder_append(wide, root, num_files=2)
    assert zorder_bounds(root) == before  # append never moves bounds
    n = zorder_compact(spark, root, num_files=4)
    assert n == 1400
    m = mf.current(root)
    assert m["version"] == v0 + 2
    after = m["dataset_meta"][_LAYOUT_DS]
    assert after["bounds"]["x"][1] > before["bounds"]["x"][1]
    assert [os.path.join(root, s) for s in m["datasets"][_LAYOUT_DS]] == \
        mf.dataset_segments(root, _LAYOUT_DS)
    assert read_zorder(spark, root).count() == 1400


def test_compact_carries_concurrent_append_forward(spark, tmp_path):
    """The Iceberg rewrite-commit shape, layout edition: an append
    landing between the compactor's read and its commit survives."""
    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 1000), ["x", "y"], root, num_files=4,
                 transactional=True)
    old_segs = mf.dataset_segments(root, _LAYOUT_DS)
    meta = zorder_bounds(root)
    # compactor stages its rewrite of the CURRENT snapshot...
    from fintech_etl_spark.operators.layout import _cluster_write

    seg = mf.new_segment_path(root)
    _cluster_write(mf.read_segments(spark, old_segs), meta, seg, 4, "overwrite")
    # ...an append lands first...
    zorder_append(_frame(spark, 300, offset=1000), root, num_files=1)
    # ...then the compactor commits remove(read)+add(rewrite)
    mf.commit(
        root,
        remove={_LAYOUT_DS: old_segs},
        add={_LAYOUT_DS: [seg]},
        dataset_meta={_LAYOUT_DS: meta},
    )
    assert read_zorder(spark, root).count() == 1300  # append survived
    assert len(mf.dataset_segments(root, _LAYOUT_DS)) == 2


def test_superseded_compaction_aborts(spark, tmp_path):
    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 800), ["x", "y"], root, num_files=2,
                 transactional=True)
    old_segs = mf.dataset_segments(root, _LAYOUT_DS)
    # a faster compactor wins
    zorder_compact(spark, root, num_files=2)
    with pytest.raises(mf.StaleSegmentError):
        mf.commit(root, remove={_LAYOUT_DS: old_segs})
    assert read_zorder(spark, root).count() == 800


def test_pruning_through_manifest_read(spark, tmp_path):
    """Footer-stats pruning is unchanged by the manifest layer: a box
    predicate through read_zorder admits a minority of the segment's
    files, same as the plain-layout pruning test."""
    root = str(tmp_path / "lay")
    # hash-scattered keys: the arithmetic-lattice frame used elsewhere
    # puts points on a line pattern whose per-file boxes are wide and
    # whose admitted count wobbles with repartitionByRange sampling;
    # pruning quality is about SCATTERED data, so test that
    def scattered(n):
        return spark.range(n).select(
            F.col("id").alias("rowid"),
            (F.abs(F.xxhash64("id")) % 997).cast("long").alias("x"),
            (F.abs(F.xxhash64("id", F.lit(1))) % 983).cast("long").alias("y"),
        )

    zorder_write(scattered(20000), ["x", "y"], root, num_files=16,
                 transactional=True)
    box = read_zorder(spark, root).filter(
        F.col("x").between(450, 550) & F.col("y").between(400, 500)
    )
    want = scattered(20000).filter(
        F.col("x").between(450, 550) & F.col("y").between(400, 500)
    )
    assert _rows(box) == _rows(want)
    # physical check: the scan over manifest segments reads parquet
    # files whose min/max admit the box — count files actually read
    seg = mf.dataset_segments(root, _LAYOUT_DS)[0]
    import glob

    import pyarrow.parquet as pq

    admitted = 0
    files = glob.glob(os.path.join(seg, "*.parquet"))
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo_x = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        hi_x = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        lo_y = min(md.row_group(i).column(2).statistics.min for i in range(md.num_row_groups))
        hi_y = max(md.row_group(i).column(2).statistics.max for i in range(md.num_row_groups))
        if not (hi_x < 450 or lo_x > 550 or hi_y < 400 or lo_y > 500):
            admitted += 1
    # ≤ half, not < half: repartitionByRange samples its boundaries,
    # so the admitted count wobbles ±1 around the same clustering
    # quality run-to-run (observed 7 in isolation, 8 under the full
    # suite's execution order) — the claim is "box-compact files, at
    # most a minority-to-half admitted", vs ~all for unclustered data
    assert admitted <= len(files) / 2, (admitted, len(files))


def test_auto_detect_stays_transactional(spark, tmp_path):
    """transactional=None on an existing manifest-backed layout keeps
    the mode (the ANN lifecycle rule) — and the rebuild resets the
    segment list via a replace commit."""
    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 500), ["x", "y"], root, num_files=2,
                 transactional=True)
    zorder_append(_frame(spark, 100, offset=500), root, num_files=1)
    assert len(mf.dataset_segments(root, _LAYOUT_DS)) == 2
    # rebuild (auto-detected transactional): one fresh segment
    zorder_write(_frame(spark, 700), ["x", "y"], root, num_files=2)
    assert len(mf.dataset_segments(root, _LAYOUT_DS)) == 1
    assert read_zorder(spark, root).count() == 700


def test_compact_plain_layout_is_loud(spark, tmp_path):
    path = str(tmp_path / "plain")
    zorder_write(_frame(spark, 100), ["x", "y"], path, num_files=1)
    with pytest.raises(ValueError, match="not manifest-backed"):
        zorder_compact(spark, path)


def test_generic_compaction_rejects_layouts(spark, tmp_path):
    """sinks.maintenance.compact_transactional on a z-order dataset
    would preserve rows but silently flatten the curve clustering —
    it must refuse and point at zorder_compact."""
    from fintech_etl_spark.sinks.maintenance import compact_transactional

    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 300), ["x", "y"], root, num_files=2,
                 transactional=True)
    with pytest.raises(ValueError, match="zorder_compact"):
        compact_transactional(spark, root, {_LAYOUT_DS: []})


def test_three_key_curve_round_trip(spark, tmp_path):
    """with_zvalue/zorder_write support k>2 keys: a 3-key transactional
    layout round-trips bit-intact and a 3-dim box answered through the
    manifest equals the raw-frame answer."""
    df = spark.range(5000).select(
        F.col("id").alias("rowid"),
        (F.col("id") * 37 % 997).cast("long").alias("x"),
        (F.col("id") * 91 % 983).cast("long").alias("y"),
        (F.col("id") * 53 % 769).cast("long").alias("w"),
    )
    root = str(tmp_path / "lay3")
    assert zorder_write(df, ["x", "y", "w"], root, num_files=8,
                        transactional=True) == 5000
    box = (
        F.col("x").between(200, 400)
        & F.col("y").between(200, 400)
        & F.col("w").between(100, 300)
    )
    got = read_zorder(spark, root).filter(box)
    want = df.filter(box)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in want.collect()
    )


def test_manifest_segment_stats_prune(spark, tmp_path):
    """Iceberg-style manifest pruning: appends with disjoint key
    ranges are excluded driver-side from the manifest's stats alone,
    and the pruned read returns exactly the unpruned filter's rows."""
    from fintech_etl_spark.operators.layout import (
        prune_segments,
        read_zorder_box,
    )

    root = str(tmp_path / "lay")
    base = spark.range(1000).select(
        F.col("id").alias("rowid"),
        (F.col("id") % 500).cast("long").alias("x"),
        (F.col("id") % 400).cast("long").alias("y"),
    )
    zorder_write(base, ["x", "y"], root, num_files=2, transactional=True)
    # three appends in disjoint x-bands (keys clamp on the curve but
    # stats record ACTUAL values, so pruning sees the real ranges)
    for i, (lo_x, n) in enumerate([(1000, 200), (2000, 200), (3000, 200)]):
        b = spark.range(n).select(
            (F.col("id") + 10_000 * (i + 1)).alias("rowid"),
            (F.col("id") + lo_x).cast("long").alias("x"),
            (F.col("id") % 400).cast("long").alias("y"),
        )
        zorder_append(b, root, num_files=1)

    # a box inside the second append's band keeps base? no — base is
    # x<500; kept must be exactly the 2000-band segment
    kept, total = prune_segments(root, {"x": (2050, 2100)})
    assert total == 4 and len(kept) == 1
    got = read_zorder_box(spark, root, {"x": (2050, 2100)})
    want = read_zorder(spark, root).filter(F.col("x").between(2050, 2100))
    assert _rows(got) == _rows(want) and got.count() == 51

    # a box spanning base+first band keeps exactly those two
    kept, _ = prune_segments(root, {"x": (400, 1100)})
    assert len(kept) == 2
    # a box beyond every range keeps nothing and returns empty w/ schema
    kept, _ = prune_segments(root, {"x": (90_000, 99_000)})
    assert kept == []
    empty = read_zorder_box(spark, root, {"x": (90_000, 99_000)})
    assert empty.count() == 0 and set(empty.columns) == {"rowid", "x", "y"}


def test_segment_stats_follow_lifecycle(spark, tmp_path):
    """Stats are carried forward, dropped with removed segments, and
    reset by a rebuild; segments without stats are always kept."""
    from fintech_etl_spark.operators.layout import prune_segments

    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 500), ["x", "y"], root, num_files=1,
                 transactional=True)
    zorder_append(_frame(spark, 100, offset=500), root, num_files=1)
    m = mf.current(root)
    assert len(m["segment_stats"][_LAYOUT_DS]) == 2
    # compaction: removed segments' stats drop, the rewrite's appear
    zorder_compact(spark, root, num_files=1)
    m = mf.current(root)
    assert list(m["segment_stats"][_LAYOUT_DS]) == m["datasets"][_LAYOUT_DS]
    # a stats-less add (foreign committer) is always kept by pruning
    seg = mf.new_segment_path(root)
    _frame(spark, 10, offset=600).write.parquet(seg)
    mf.commit(root, add={_LAYOUT_DS: [seg]})
    kept, total = prune_segments(root, {"x": (10**9, 10**9 + 1)})
    assert total == 2 and [s for s in kept] == [seg]
    # rebuild resets the stats map to the new segment only
    zorder_write(_frame(spark, 300), ["x", "y"], root, num_files=1)
    m = mf.current(root)
    assert len(m["segment_stats"][_LAYOUT_DS]) == 1


def test_incremental_compaction(spark, tmp_path):
    """max_segments folds only the N smallest segments (Iceberg
    partial-rewrite shape): the big base survives untouched, data is
    intact, the curve bounds NEVER move on a partial compaction, and
    stats follow the fold."""
    from fintech_etl_spark.operators.layout import prune_segments

    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 3000), ["x", "y"], root, num_files=4,
                 transactional=True)
    base_seg = mf.dataset_segments(root, _LAYOUT_DS)[0]
    bounds0 = zorder_bounds(root)
    for i in range(4):  # four tiny appends
        zorder_append(_frame(spark, 50, offset=3000 + 50 * i), root,
                      num_files=1)
    assert len(mf.dataset_segments(root, _LAYOUT_DS)) == 5

    n = zorder_compact(spark, root, num_files=1, max_segments=3)
    assert n == 150  # exactly the three smallest appends folded
    segs = mf.dataset_segments(root, _LAYOUT_DS)
    assert len(segs) == 3 and base_seg in segs
    assert zorder_bounds(root) == bounds0  # partial never re-freezes
    assert read_zorder(spark, root).count() == 3200
    # stats cover every live segment (base + survivor + merged)
    m = mf.current(root)
    assert set(m["segment_stats"][_LAYOUT_DS]) == set(
        m["datasets"][_LAYOUT_DS]
    )
    # folding down to <= 1 candidate is a no-op
    assert zorder_compact(spark, root, num_files=1, max_segments=1) == 0
    assert len(mf.dataset_segments(root, _LAYOUT_DS)) == 3
    # a later FULL compaction may re-freeze
    zorder_compact(spark, root, num_files=2)
    assert len(mf.dataset_segments(root, _LAYOUT_DS)) == 1
    assert zorder_bounds(root)["bounds"]["x"] != bounds0["bounds"]["x"] or \
        zorder_bounds(root)["bounds"]["y"] != bounds0["bounds"]["y"] or \
        read_zorder(spark, root).count() == 3200


def test_time_travel_reads(spark, tmp_path):
    """Version-named immutable manifests + retained superseded
    segments = free time travel: every kept version reads as the
    exact snapshot that was live at its commit; vacuumed versions and
    plain layouts fail loudly."""
    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 400), ["x", "y"], root, num_files=1,
                 transactional=True)  # v0: 400 rows
    zorder_append(_frame(spark, 100, offset=400), root, num_files=1)  # v1
    zorder_compact(spark, root, num_files=1)  # v2: rewritten

    assert read_zorder(spark, root, version=0).count() == 400
    assert read_zorder(spark, root, version=1).count() == 500
    assert read_zorder(spark, root, version=2).count() == 500
    assert read_zorder(spark, root).count() == 500
    # v0's snapshot is the PRE-append state even though later versions
    # rewrote everything
    assert _rows(read_zorder(spark, root, version=0)) == _rows(
        _frame(spark, 400)
    )
    # retention: keep the last 2 versions -> v0 is gone, loudly
    mf.vacuum(root, keep_last=2, orphan_grace_sec=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        read_zorder(spark, root, version=0)
    assert read_zorder(spark, root, version=1).count() == 500
    # plain layouts have no history
    plain = str(tmp_path / "plain")
    zorder_write(_frame(spark, 10), ["x", "y"], plain, num_files=1)
    with pytest.raises(ValueError, match="plain directory"):
        read_zorder(spark, plain, version=0)


def test_fsck(spark, tmp_path, capsys, monkeypatch):
    """The read-only consistency checker: healthy log passes with the
    vacuum-debt counters; a missing live segment, a stats entry for an
    unnamed segment, and a missing ingest bucket are each reported."""
    import shutil

    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 300), ["x", "y"], root, num_files=1,
                 transactional=True)
    zorder_append(_frame(spark, 50, offset=300), root, num_files=1)
    zorder_compact(spark, root, num_files=1)  # leaves superseded segs
    # a crashed staging: the path handed out, the dir created, no commit
    os.makedirs(mf.new_segment_path(root), exist_ok=True)

    rep = mf.fsck(root)
    assert rep["ok"] and rep["errors"] == []
    assert rep["superseded_segments"] == 2  # pre-compaction base+append
    assert rep["orphan_segments"] == 1
    assert rep["versions_on_disk"] == [0, 1, 2]

    # CLI: healthy -> exit 0 + JSON report
    from fintech_etl_spark import cli

    monkeypatch.setattr(cli, "build_session", lambda *a, **k: spark)
    assert cli.main(["manifest-fsck", "--path", root]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is True

    # break it three ways
    live = mf.dataset_segments(root, _LAYOUT_DS)[0]
    shutil.rmtree(live)  # 1: live segment gone
    m = mf.current(root)
    mpath = os.path.join(mf.manifests_dir(root), m["_file"])
    m.pop("_file")
    m["segment_stats"][_LAYOUT_DS]["segments/deadbeef"] = {"x": [0, 1]}  # 2
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    rep = mf.fsck(root)
    assert not rep["ok"]
    assert any("missing segment" in e for e in rep["errors"])
    assert any("unnamed segment" in e for e in rep["errors"])
    assert cli.main(["manifest-fsck", "--path", root]) == 1
    capsys.readouterr()

    # 3: a plain dir is loud
    with pytest.raises(ValueError, match="not a manifest-backed"):
        mf.fsck(str(tmp_path))


def test_zorder_drift_metric_and_compact_restore(spark, tmp_path):
    """Drift is 0 on a fresh layout, stays 0 for in-range appends,
    quantifies out-of-bounds appends exactly from manifest stats
    (zero data scanned), and a FULL compact (bounds re-frozen) takes
    it back to 0."""
    from fintech_etl_spark.operators.layout import zorder_drift

    root = str(tmp_path / "lay")
    # x spans [0, 996], y [0, 982] (mod arithmetic over 4000 ids)
    zorder_write(_frame(spark, 4000), ["x", "y"], root, num_files=8,
                 transactional=True)
    d0 = zorder_drift(root)
    assert d0["drift"] == 0.0 and d0["segments"] == 1
    assert d0["segments_without_stats"] == 0

    # in-range append: same key space, drift stays 0
    zorder_append(_frame(spark, 1000, offset=4000), root, num_files=2)
    assert zorder_drift(root)["drift"] == 0.0

    # drifted append: shift x/y up by 2000 — entirely past the frozen box
    drifted = _frame(spark, 1000, offset=5000).select(
        "rowid", (F.col("x") + 2000).alias("x"), (F.col("y") + 2000).alias("y")
    )
    zorder_append(drifted, root, num_files=2)
    d1 = zorder_drift(root)
    assert d1["drift"] > 0.5, d1  # >half the live x-range is outside
    fx = d1["cols"]["x"]
    # exact arithmetic: out = actual_hi - frozen_hi over the live span
    assert fx["out_of_bounds_fraction"] == pytest.approx(
        (fx["actual"][1] - fx["frozen"][1])
        / (fx["actual"][1] - fx["actual"][0])
    )

    # FULL compact re-freezes the bounds from the live data → drift 0
    zorder_compact(spark, root, num_files=8)
    d2 = zorder_drift(root)
    assert d2["drift"] == 0.0 and d2["segments"] == 1
    # and the data survived intact
    assert read_zorder(spark, root).count() == 6000


def test_zorder_drift_requires_manifest(spark, tmp_path):
    from fintech_etl_spark.operators.layout import zorder_drift

    plain = str(tmp_path / "plain")
    zorder_write(_frame(spark, 1000), ["x", "y"], plain, num_files=2)
    with pytest.raises(ValueError, match="not manifest-backed"):
        zorder_drift(plain)


def test_zorder_drift_fraction_clamped_when_live_range_left_the_box(
    spark, tmp_path
):
    """A live range DISJOINT from the frozen box is 100% outside it —
    the r12 ADVICE caught out/span exceeding 1.0 there (e.g. 2.0),
    violating the documented 0..1 scale. The overlap form pins it."""
    from fintech_etl_spark.operators.layout import zorder_drift

    root = str(tmp_path / "lay")
    zorder_write(
        _frame(spark, 1000), ["x", "y"], root, num_files=2, transactional=True
    )
    orig = mf.dataset_segments(root, _LAYOUT_DS)
    seg = mf.new_segment_path(root)
    _frame(spark, 500).select(
        "rowid",
        (F.col("x") + 10_000).alias("x"),
        (F.col("y") + 10_000).alias("y"),
    ).write.parquet(seg)
    # stats came only from shifted batches: live range fully past frozen
    mf.commit(
        root,
        remove={_LAYOUT_DS: orig},
        add={_LAYOUT_DS: [seg]},
        segment_stats={
            _LAYOUT_DS: {seg: {"x": [10_000, 10_996], "y": [10_000, 10_982]}}
        },
    )
    d = zorder_drift(root)
    assert d["drift"] == 1.0
    for c in ("x", "y"):
        assert 0.0 <= d["cols"][c]["out_of_bounds_fraction"] <= 1.0
    assert d["unassessed_conservative"] is False


def test_zorder_drift_no_stats_segment_is_conservative_not_silent(
    spark, tmp_path
):
    """THE r12 ADVICE silent-0.0 scenario: the only drifted segments
    carry no stats (appends predating segment-stats support / foreign
    commits). Counting them while reporting drift 0.0 means the cron
    never compacts a fully-drifted layout — any unassessable segment
    must force the must-compact verdict instead. Compaction then
    commits stats for its rewrite, so the state converges to a real
    measurement."""
    from fintech_etl_spark.operators.layout import zorder_drift

    root = str(tmp_path / "lay")
    zorder_write(
        _frame(spark, 1000), ["x", "y"], root, num_files=2, transactional=True
    )
    assert zorder_drift(root)["drift"] == 0.0
    # a (massively drifted) segment committed WITHOUT stats
    seg = mf.new_segment_path(root)
    _frame(spark, 500).select(
        "rowid",
        (F.col("x") + 10_000).alias("x"),
        (F.col("y") + 10_000).alias("y"),
    ).write.parquet(seg)
    mf.commit(root, add={_LAYOUT_DS: [seg]})
    d = zorder_drift(root)
    assert d["segments_without_stats"] == 1
    assert d["unassessed_conservative"] is True
    assert d["drift"] == 1.0  # never the silent 0.0
    # full compact re-freezes bounds AND commits stats → assessable again
    zorder_compact(spark, root, num_files=4)
    d2 = zorder_drift(root)
    assert d2["segments_without_stats"] == 0
    assert d2["unassessed_conservative"] is False
    assert d2["drift"] == 0.0
    assert read_zorder(spark, root).count() == 1500


def test_zorder_drift_partial_stats_is_conservative_per_column(
    spark, tmp_path
):
    """The r13 audit's latent edge: a foreign commit whose stats dict
    EXISTS but carries only one of the two z-columns. The covered
    column measures normally; the uncovered one could hide arbitrary
    drift — it must get the same conservative 1.0 treatment as a
    whole-segment stats gap, never a silent under-report (the segment
    is NOT in segments_without_stats, which is exactly why the
    per-column rule exists)."""
    from fintech_etl_spark.operators.layout import zorder_drift

    root = str(tmp_path / "lay")
    zorder_write(
        _frame(spark, 1000), ["x", "y"], root, num_files=2, transactional=True
    )
    assert zorder_drift(root)["drift"] == 0.0
    # a drifted-on-y segment whose committed stats cover x ONLY (an
    # older stats schema / a foreign writer): x looks in-bounds
    seg = mf.new_segment_path(root)
    _frame(spark, 500).select(
        "rowid", "x", (F.col("y") + 10_000).alias("y")
    ).write.parquet(seg)
    mf.commit(
        root,
        add={_LAYOUT_DS: [seg]},
        segment_stats={_LAYOUT_DS: {seg: {"x": [0, 100]}}},
    )
    d = zorder_drift(root)
    assert d["segments_without_stats"] == 0  # the stats dict exists...
    assert d["unassessed_columns"] == ["y"]  # ...but y is a blind spot
    assert d["unassessed_conservative"] is True
    assert d["drift"] == 1.0  # never an under-report from x alone
    # compaction commits full stats for its rewrite → converges
    zorder_compact(spark, root, num_files=4)
    d2 = zorder_drift(root)
    assert d2["unassessed_columns"] == []
    assert d2["unassessed_conservative"] is False
    assert d2["drift"] == 0.0
    assert read_zorder(spark, root).count() == 1500


def test_cli_layout_drift_report_and_threshold(
    spark, tmp_path, capsys, monkeypatch
):
    """`layout-drift` prints the manifest-only drift report and its
    --max-drift threshold turns a drifted layout into exit 1 — the
    cron-alert contract."""
    from fintech_etl_spark import cli

    monkeypatch.setattr(cli, "build_session", lambda *a, **k: spark)
    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 2000), ["x", "y"], root, num_files=4,
                 transactional=True)
    rc = cli.main(["layout-drift", "--path", root, "--max-drift", "0.25"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["drift"] == 0.0

    drifted = _frame(spark, 500, offset=2000).select(
        "rowid", (F.col("x") + 5000).alias("x"), (F.col("y") + 5000).alias("y")
    )
    zorder_append(drifted, root, num_files=1)
    rc = cli.main(["layout-drift", "--path", root, "--max-drift", "0.25"])
    assert rc == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["drift"] > 0.25
    # report-only mode never alerts
    assert cli.main(["layout-drift", "--path", root]) == 0

def test_cli_layout_maintain_handoff(spark, tmp_path, capsys, monkeypatch):
    """`layout-maintain` is the cron half of the drift handoff: a
    marked layout is compacted (marker cleared in the same commit), an
    unmarked one is a no-op, and --when-drift-above lets the cron poll
    drift itself for layouts written by non-marking clients."""
    from fintech_etl_spark import cli
    from fintech_etl_spark.operators.layout import (
        compaction_due,
        mark_compaction_due,
        zorder_drift,
    )

    monkeypatch.setattr(cli, "build_session", lambda *a, **k: spark)
    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 2000), ["x", "y"], root, num_files=4,
                 transactional=True)
    # nothing due: no-op, safe at any cron frequency
    assert cli.main(["layout-maintain", "--path", root]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is False

    drifted = _frame(spark, 500, offset=2000).select(
        "rowid", (F.col("x") + 5000).alias("x"), (F.col("y") + 5000).alias("y")
    )
    zorder_append(drifted, root, num_files=1)
    d = zorder_drift(root)["drift"]
    mark_compaction_due(root, drift=d, threshold=0.25)
    assert cli.main(
        ["layout-maintain", "--path", root, "--num-files", "4",
         "--vacuum-keep", "2"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is True and out["rows"] == 2500
    assert out["marker"]["threshold"] == 0.25
    assert "vacuum" in out
    assert compaction_due(root) is None
    assert zorder_drift(root)["drift"] == 0.0
    assert read_zorder(spark, root).count() == 2500

    # unmarked but drifted + --when-drift-above: the cron polls itself
    zorder_append(drifted.select(
        "rowid", (F.col("x") + 9000).alias("x"), (F.col("y") + 9000).alias("y")
    ), root, num_files=1)
    assert compaction_due(root) is None
    assert cli.main(
        ["layout-maintain", "--path", root, "--when-drift-above", "0.25"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is True and out["rows"] == 3000
    assert zorder_drift(root)["drift"] == 0.0

def test_run_due_compaction_remarks_when_drift_survives_the_rewrite(
    spark, tmp_path, monkeypatch
):
    """The race the three-client receipt caught: a drifted append
    landing mid-rewrite is carried forward past the re-frozen bounds
    while the rewrite's commit clears the marker — the signal would be
    swallowed with the condition live. run_due_compaction must
    re-measure drift after each rewrite (one pointer read), re-mark,
    and rewrite again until the bounds actually cover the data."""
    from fintech_etl_spark.operators import layout as lay

    root = str(tmp_path / "lay")
    zorder_write(_frame(spark, 1000), ["x", "y"], root, num_files=2,
                 transactional=True)
    zorder_append(
        _frame(spark, 300, offset=1000).select(
            "rowid", (F.col("x") + 5000).alias("x"),
            (F.col("y") + 5000).alias("y"),
        ),
        root, num_files=1,
    )
    d = lay.zorder_drift(root)["drift"]
    lay.mark_compaction_due(root, drift=d, threshold=0.3)

    real = lay.zorder_compact
    state = {"raced": False}

    def racing_compact(spark_, path, num_files=32, **kw):
        rows = real(spark_, path, num_files=num_files, **kw)
        if not state["raced"]:
            state["raced"] = True
            # a concurrent drifted append lands just after the commit
            # (equivalent to landing mid-rewrite: carried forward,
            # clustered on the freshly frozen curve's OLD bounds)
            zorder_append(
                _frame(spark_, 200, offset=1300).select(
                    "rowid", (F.col("x") + 20_000).alias("x"),
                    (F.col("y") + 20_000).alias("y"),
                ),
                path, num_files=1,
            )
        return rows

    monkeypatch.setattr(lay, "zorder_compact", racing_compact)
    res = lay.run_due_compaction(spark, root, num_files=2)
    assert res is not None
    assert state["raced"]
    # the second rewrite covered the racing append: marker resolved,
    # drift truly 0, nothing lost
    assert lay.compaction_due(root) is None
    assert lay.zorder_drift(root)["drift"] == 0.0
    assert read_zorder(spark, root).count() == 1500


def test_unified_maintain_verb_covers_all_three_clients(
    spark, tmp_path, capsys, monkeypatch
):
    """ONE cron verb (r14): `maintain <root>` detects the client kind
    from the manifest's dataset names and runs that client's due
    condition — layout marker/drift handoff, lake fragmentation,
    index fragmentation — with a no-op (not an error) when nothing is
    due, and a loud refusal on non-manifest roots. One fleet cron
    entry per root replaces three verbs with three thresholds."""
    from fintech_etl_spark.operators.layout import (
        compaction_due,
        mark_compaction_due,
    )
    from fintech_etl_spark.sinks.maintenance import maintain
    from fintech_etl_spark.sinks.receipts import write_receipts_parquet
    from fintech_etl_spark.streaming.ann import (
        append_lsh_index,
        build_lsh_index,
    )
    from tests.conftest import SF_SMOKE

    # --- layout: marker-due ---
    lay = str(tmp_path / "lay")
    zorder_write(_frame(spark, 1500), ["x", "y"], lay, num_files=2,
                 transactional=True)
    mark_compaction_due(lay, drift=0.7, threshold=0.5)
    out = maintain(spark, lay)
    assert out["kind"] == "layout" and out["ran"]
    assert compaction_due(lay) is None  # marker cleared by the rewrite
    assert maintain(spark, lay) == {"kind": "layout", "ran": False}
    # drift-poll trigger for non-marking writers: out-of-bounds append
    seg = mf.new_segment_path(lay)
    _frame(spark, 300).select(
        "rowid", (F.col("x") + 10_000).alias("x"), (F.col("y") + 10_000).alias("y")
    ).write.parquet(seg)
    mf.commit(lay, add={_LAYOUT_DS: [seg]},
              segment_stats={_LAYOUT_DS: {seg: {"x": [10000, 11000],
                                                "y": [10000, 11000]}}})
    out = maintain(spark, lay, when_drift_above=0.5)
    assert out["ran"] and out["kind"] == "layout"

    # --- lake: fragmentation-due ---
    lake = str(tmp_path / "lake")
    rows = spark.createDataFrame(
        [("2024-01-05", 1.0), ("2024-02-07", 2.0), ("2024-03-09", 3.0)],
        "transaction_date string, total double",
    ).select(F.col("transaction_date").cast("date").alias("transaction_date"),
             "total")
    for i in range(3):
        write_receipts_parquet(rows, lake, transactional=True,
                               batch_key=f"b{i}")
    out = maintain(spark, lake, when_segments_above=5)
    assert out == {"kind": "lake", "ran": False, "segments": 3,
                   "threshold": 5}
    out = maintain(spark, lake, when_segments_above=2, vacuum_keep=2)
    assert out["kind"] == "lake" and out["ran"]
    assert len(mf.current(lake)["datasets"]["receipts"]) == 1
    assert "vacuum" in out

    # --- LSH index: fragmentation-due ---
    idx = str(tmp_path / "idx")
    from fintech_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    build_lsh_index(spark, SF_SMOKE, idx, transactional=True)
    append_lsh_index(
        emb.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
        ),
        idx,
    )
    n_segs = len(mf.current(idx)["datasets"]["index"])
    assert n_segs >= 2
    out = maintain(spark, idx, when_segments_above=1)
    assert out["kind"] == "lsh" and out["ran"]
    assert len(mf.current(idx)["datasets"]["index"]) == 1
    assert maintain(spark, idx, when_segments_above=1)["ran"] is False

    # --- CLI + loud edges ---
    from fintech_etl_spark import cli

    monkeypatch.setattr(cli, "build_session", lambda *a, **k: spark)
    assert cli.main(["maintain", lake, "--when-segments-above", "0"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["kind"] == "lake" and rep["ran"]  # 1 segment > 0 → recompact
    with pytest.raises(ValueError, match="not a manifest-backed"):
        maintain(spark, str(tmp_path / "nowhere"))
    weird = str(tmp_path / "weird")
    mf.commit(weird, replace={"mystery": []})
    with pytest.raises(ValueError, match="no known manifest client"):
        maintain(spark, weird)


def test_layout_lifecycle_threads_cas_lock_provider(spark, tmp_path):
    """r15: the lock-injection contract extended to the LAYOUT client
    (write/append/compact/marker/maintain) — a CAS-locked layout's
    cron serializes through the same store as its writers, proven by
    the version CLAIMS landing in the CAS store and no file-provider
    claims being minted."""
    from fintech_etl_spark.operators.layout import (
        mark_compaction_due,
        run_due_compaction,
    )
    from fintech_etl_spark.sinks.locks import CASLockProvider, CASStore
    from fintech_etl_spark.sinks.maintenance import maintain

    store = CASStore(str(tmp_path / "cas"))
    provider = CASLockProvider(store)
    path = str(tmp_path / "layout_cas")
    zorder_write(
        _frame(spark), ["x", "y"], path, num_files=4,
        transactional=True, lock=provider,
    )
    mdir = mf.manifests_dir(path)
    assert provider.read_claim(mdir, 0) is not None  # build claim
    zorder_append(
        _frame(spark, n=1000, offset=4000), path, num_files=2,
        lock=provider,
    )
    assert provider.read_claim(mdir, 1) is not None  # append claim
    mark_compaction_due(path, drift=0.9, threshold=0.5, lock=provider)
    assert provider.read_claim(mdir, 2) is not None  # marker claim
    out = maintain(spark, path, lock=provider)
    assert out["kind"] == "layout" and out["ran"]
    assert out["rows"] == 5000
    assert provider.read_claim(mdir, 3) is not None  # rewrite claim
    assert run_due_compaction(spark, path, lock=provider) is None  # resolved
    assert read_zorder(spark, path).count() == 5000
    # no file-provider claims anywhere — every commit went through
    # the injected store
    assert not [x for x in os.listdir(mdir) if x.startswith("claim-")]


def test_compact_bounds_from_stats_match_scan_and_fall_back(spark, tmp_path):
    """zorder_compact re-freezes its curve from the manifest's
    committed per-segment stats (zero data scanned); the metadata fold
    equals the full-scan agg exactly, and a segment missing stats (a
    foreign commit) falls back to the scan instead of mis-freezing."""
    from fintech_etl_spark.operators.layout import (
        _freeze_bounds,
        _stats_bounds,
    )

    path = str(tmp_path / "lake")
    zorder_write(
        _frame(spark), ["x", "y"], path, num_files=4, transactional=True
    )
    zorder_append(_frame(spark, n=1000, offset=5000), path, num_files=2)
    segs = mf.dataset_segments(path, _LAYOUT_DS)
    meta_bounds = _stats_bounds(path, segs, ["x", "y"])
    scan_bounds = _freeze_bounds(
        mf.read_segments(spark, segs), ["x", "y"], "test"
    )
    assert meta_bounds == scan_bounds
    # compact itself stays lossless and re-freezes to the same box
    before = _rows(read_zorder(spark, path))
    assert zorder_compact(spark, path, num_files=4) == 5000
    assert _rows(read_zorder(spark, path)) == before
    assert {
        c: tuple(v) for c, v in zorder_bounds(path)["bounds"].items()
    } == scan_bounds

    # strip one live segment's stats (a foreign writer's commit shape)
    m = mf.current(path)
    seg_rel = m["datasets"][_LAYOUT_DS][0]
    del m["segment_stats"][_LAYOUT_DS][seg_rel]
    mdir = os.path.join(path, "_manifests")
    name = f"manifest-{m['version'] + 1:010d}-feedfeed.json"
    with open(os.path.join(mdir, name), "w") as fh:
        json.dump({**m, "version": m["version"] + 1}, fh)
    with open(os.path.join(mdir, "_current"), "w") as fh:
        fh.write(name)
    segs2 = mf.dataset_segments(path, _LAYOUT_DS)
    assert _stats_bounds(path, segs2, ["x", "y"]) is None
    # the fallback scan keeps compaction exact
    assert zorder_compact(spark, path, num_files=4) == 5000
    assert {
        c: tuple(v) for c, v in zorder_bounds(path)["bounds"].items()
    } == scan_bounds


def test_append_stats_from_footers_match_agg(spark, tmp_path):
    """zorder_append commits the batch's min/max from the staged
    files' parquet footers; the footer fold equals the aggregation
    exactly (int stats are never truncated), drift arithmetic on top
    of them is unchanged, and unusable footers fall back to the agg."""
    from fintech_etl_spark.operators.layout import (
        _footer_bounds,
        _freeze_bounds,
        zorder_drift,
    )

    path = str(tmp_path / "lake")
    zorder_write(
        _frame(spark), ["x", "y"], path, num_files=4, transactional=True
    )
    batch = _frame(spark, n=777, offset=9000).select(
        "rowid", (F.col("x") + 1500).alias("x"), (F.col("y") - 700).alias("y")
    )
    zorder_append(batch, path, num_files=2)
    seg = mf.dataset_segments(path, _LAYOUT_DS)[-1]
    st = dict(mf.dataset_segments_with_stats(path, _LAYOUT_DS))[seg]
    agg = _freeze_bounds(batch, ["x", "y"], "test")
    assert {c: tuple(v) for c, v in st.items()} == agg
    assert _footer_bounds(seg, ["x", "y"]) == agg
    # a column absent from the files is unusable → None (fallback)
    assert _footer_bounds(seg, ["x", "nope"]) is None
    # drift over the footer-derived stats reads the true actual box
    d = zorder_drift(path)
    assert d["cols"]["x"]["actual"][1] == agg["x"][1]
    assert not d["unassessed_conservative"]
