"""Manifest-pointer transactional commits for plain-parquet datasets —
the one lake mechanism the ANN index lifecycle was missing.

The problem (r9 audit, "What's missing #1"): directory-swap compaction
is two non-atomic renames, so a reader listing the directory mid-swap
sees no dataset (or loses files mid-scan), and a crash between the
renames strands data; the streaming ingest likewise had an
at-least-once window between its parquet append and its ledger marker.
Table formats (Delta/Iceberg) close both with a transaction log. This
module is the minimal dependency-free version of that idea:

- data lives in immutable SEGMENT directories (each a self-contained
  ``partitionBy`` parquet dataset) under ``<root>/segments/<uuid>/``;
  a write STAGES a new segment — invisible until committed;
- a versioned MANIFEST file (``<root>/_manifests/manifest-<v>-<id>.
  json``) names, per logical dataset, exactly the segments a reader
  may see, plus the set of ingested source files (the dedup history);
- a single ``_current`` pointer file names the live manifest and is
  swapped with ``os.replace`` — POSIX-atomic, so every reader resolves
  EITHER the old state or the new one, never a half-state. Commit =
  stage segments, write manifest, swap pointer: one atomic step.

Consequences:

- compaction writes a brand-new segment and commits a manifest that
  REPLACES the old segment list — no live directory is ever renamed,
  so a serving micro-batch racing a compaction reads a consistent
  snapshot (old segments stay on disk until ``vacuum``);
- ingest is exactly-once per source file: the appended segment and the
  file-key record land in the SAME commit, so a crash before the
  pointer swap leaves an orphan segment (invisible; vacuum collects
  it) and the retry appends cleanly — there is no append-to-marker
  window left;
- crash recovery is "do nothing": the pointer always names a complete
  manifest.

Contracts and limits (documented, not hidden):

- CONCURRENT COMMITTERS are safe on filesystems with atomic
  O_CREAT|O_EXCL (POSIX, NFSv4, HDFS): every commit runs its
  read-modify-write of the manifest under a short-lived lock file
  (held only for the metadata step — microseconds — never across a
  data rewrite), and compaction commits REMOVE+ADD deltas rather than
  wholesale replacements, so an ingest commit landing between a
  compactor's read and its commit is carried forward, not lost (the
  Iceberg rewrite-commit shape). A crashed committer's lock is stolen
  after a staleness timeout. Object stores WITHOUT atomic
  create-exclusive still need an external lock/CAS service — the same
  reason Delta on S3 does.
- ``vacuum`` retention: a reader holds the manifest it resolved for
  the duration of one scan, so only run ``vacuum(keep_last>=2)`` (or
  pause long scans for keep_last=1) — the same retention contract as
  Delta's VACUUM.
- Works on any filesystem with atomic single-file rename (POSIX,
  HDFS). Object stores without atomic rename need the CAS variant.

The reference engine's landing path has the same lost-update blindness
this closes (no processed-marker around its writes —
/root/reference/main.py:181-183); manifests are public-literature
territory (Iceberg's spec, Delta's _delta_log) re-expressed minimally.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_CURRENT = "_current"
_SEGMENTS = "segments"
_LOCK = "_commit.lock"
#: commits hold the lock for the metadata step only (microseconds);
#: a lock older than this belongs to a crashed committer and is stolen
_LOCK_STALE_SEC = 60.0
_LOCK_TIMEOUT_SEC = 120.0


class StaleSegmentError(RuntimeError):
    """A remove-commit named a segment no longer in the manifest:
    another committer already compacted it away, so the caller's
    rewrite is based on a superseded layout. Abort (the staged segment
    is an invisible orphan — vacuum collects it) and retry from a
    fresh read."""


def manifests_dir(root: str) -> str:
    return os.path.join(root, _MANIFESTS)


def is_transactional(root: str) -> bool:
    """A dataset root is manifest-backed iff a committed pointer
    exists. Every lifecycle entry point auto-detects via this, so one
    ``transactional=True`` at build time upgrades append / ingest /
    compact / serve with no call-site changes."""
    return os.path.exists(os.path.join(manifests_dir(root), _CURRENT))


def current(root: str) -> dict:
    """Resolve the pointer and load the live manifest."""
    mdir = manifests_dir(root)
    with open(os.path.join(mdir, _CURRENT)) as fh:
        name = fh.read().strip()
    with open(os.path.join(mdir, name)) as fh:
        m = json.load(fh)
    m["_file"] = name
    return m


def new_segment_path(root: str) -> str:
    """A fresh segment directory path for the caller to write into.
    Staged data is invisible until a commit names it."""
    os.makedirs(os.path.join(root, _SEGMENTS), exist_ok=True)
    return os.path.join(root, _SEGMENTS, uuid.uuid4().hex[:12])


def _fsync_write(path: str, body: str) -> None:
    with open(path, "w") as fh:
        fh.write(body)
        fh.flush()
        os.fsync(fh.fileno())


def _acquire_lock(mdir: str) -> str:
    """Create the commit lock with O_CREAT|O_EXCL — atomic on POSIX /
    NFSv4 / HDFS. A lock older than ``_LOCK_STALE_SEC`` belongs to a
    crashed committer (the locked section is metadata-only,
    microseconds) and is stolen."""
    import time

    path = os.path.join(mdir, _LOCK)
    deadline = time.monotonic() + _LOCK_TIMEOUT_SEC
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return path
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(path)
            except OSError:
                age = 0.0  # holder just released — retry immediately
            if age > _LOCK_STALE_SEC:
                try:
                    os.unlink(path)  # steal a crashed committer's lock
                except OSError:
                    pass
                continue
            if time.monotonic() > deadline:
                raise RuntimeError(
                    f"manifest commit: lock {path!r} held for "
                    f">{_LOCK_TIMEOUT_SEC}s — a committer is stuck "
                    "inside what should be a microsecond metadata step"
                ) from None
            time.sleep(0.02)


def commit(
    root: str,
    *,
    add: dict[str, list[str]] | None = None,
    replace: dict[str, list[str]] | None = None,
    remove: dict[str, list[str]] | None = None,
    file_keys: list[str] | None = None,
) -> dict:
    """Write the next manifest version and atomically swap the pointer.

    ``add`` appends segment dirs to named datasets; ``replace`` swaps a
    dataset's whole segment list (initial build); ``remove`` deletes
    specific segments from a dataset's list — compaction commits
    ``remove`` (what it read) + ``add`` (its rewrite) so a CONCURRENT
    add landing after its read is carried forward, never lost (the
    Iceberg rewrite-commit shape; a removed segment that has already
    vanished raises :class:`StaleSegmentError` — the caller's rewrite
    is based on a superseded layout and must be retried from a fresh
    read). ``file_keys`` records ingested source files into the
    manifest's dedup history (kept forever, across compactions —
    erasing it is exactly the bug the directory-mode ledger had).
    Segment paths are stored relative to ``root`` so the index
    directory can be moved. Returns the committed manifest. First
    commit creates the log.

    The whole read-modify-write runs under the commit lock, so
    concurrent committers (an ingest stream and a cron compactor, the
    normal pair) serialize on the metadata step only — data stays
    staged outside the lock."""
    mdir = manifests_dir(root)
    os.makedirs(mdir, exist_ok=True)

    def _rel(p: str) -> str:
        return os.path.relpath(os.path.abspath(p), os.path.abspath(root))

    lock = _acquire_lock(mdir)
    try:
        if is_transactional(root):
            cur = current(root)
            version = cur["version"] + 1
            datasets = {k: list(v) for k, v in cur["datasets"].items()}
            ingested = list(cur["ingested_files"])
        else:
            version, datasets, ingested = 0, {}, []

        for ds, segs in (replace or {}).items():
            datasets[ds] = [_rel(s) for s in segs]
        for ds, segs in (remove or {}).items():
            have = datasets.get(ds, [])
            for s in segs:
                r = _rel(s)
                if r not in have:
                    raise StaleSegmentError(
                        f"manifest commit: segment {r!r} is not in "
                        f"dataset {ds!r} — another committer already "
                        "compacted it away; retry the rewrite from a "
                        "fresh read (the staged output is an orphan "
                        "vacuum will collect)"
                    )
                have = [x for x in have if x != r]
            datasets[ds] = have
        for ds, segs in (add or {}).items():
            datasets.setdefault(ds, [])
            datasets[ds] = datasets[ds] + [_rel(s) for s in segs]
        for k in file_keys or []:
            if k in ingested:
                raise ValueError(
                    f"manifest commit: source file {k!r} is already in "
                    "the ingested set — the caller must skip processed "
                    "files before staging (double-append would corrupt "
                    "the index)"
                )
            ingested.append(k)

        name = f"manifest-{version:010d}-{uuid.uuid4().hex[:8]}.json"
        m = {
            "version": version,
            "datasets": datasets,
            "ingested_files": ingested,
        }
        _fsync_write(os.path.join(mdir, name), json.dumps(m, indent=1))
        tmp = os.path.join(mdir, f"{_CURRENT}.tmp-{uuid.uuid4().hex[:8]}")
        _fsync_write(tmp, name)
        os.replace(tmp, os.path.join(mdir, _CURRENT))  # THE commit point
        # fsync the DIRECTORY too: rename atomicity is immediate, but
        # its durability is not — an OS crash could otherwise revert
        # the pointer to the previous manifest, resurrecting the
        # exactly-once window the commit exists to close
        dfd = os.open(mdir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass
    m["_file"] = name
    return m


def dataset_segments(root: str, dataset: str) -> list[str]:
    """Absolute segment paths the live manifest names for ``dataset``."""
    m = current(root)
    return [os.path.join(root, s) for s in m["datasets"].get(dataset, [])]


def read_dataset(
    spark: SparkSession, root: str, dataset: str, empty_schema: str
) -> DataFrame:
    """The manifest-resolved scan: union of the named segments (each a
    self-contained partitioned parquet dir, so partition pruning and
    filter pushdown apply per segment — Catalyst pushes filters through
    Union). Resolving the pointer per call is the transactional analogue
    of the serve streams' per-batch re-listing: appends and compactions
    land at the next micro-batch with no restart."""
    segs = dataset_segments(root, dataset)
    if not segs:
        return spark.createDataFrame([], empty_schema)
    out = spark.read.parquet(segs[0])
    for s in segs[1:]:
        out = out.unionByName(spark.read.parquet(s))
    return out


def vacuum(
    root: str, keep_last: int = 2, orphan_grace_sec: float = 300.0
) -> dict:
    """Garbage-collect segments referenced by NO kept manifest and
    manifests older than the newest ``keep_last`` versions. Retention
    contract: an in-flight reader resolved the pointer at scan start,
    so keep at least 2 versions while anything might be scanning (the
    Delta VACUUM rule). Orphan segments from crashed commits are
    collected too — they are referenced by no manifest at all.

    Runs under the commit lock. Segments referenced by a SUPERSEDED
    manifest are collected under the ``keep_last`` retention rule;
    segments referenced by NO manifest at all are either crashed-
    commit orphans (garbage) or a concurrent committer's in-flight
    staging (staged OUTSIDE the lock!) — ``orphan_grace_sec``
    disambiguates by age, sparing fresh ones (the same reason Delta's
    VACUUM has a retention period). Pass 0 only when no committer can
    be running."""
    if keep_last < 1:
        raise ValueError("vacuum keep_last must be >= 1")
    if not is_transactional(root):
        raise ValueError(
            f"vacuum: {root!r} is not a manifest-backed dataset "
            "(no _manifests/_current pointer) — nothing to vacuum; "
            "plain-directory indexes clean up via compact_partitioned"
        )
    import time

    mdir = manifests_dir(root)
    lock = _acquire_lock(mdir)
    try:
        cur = current(root)
        names = sorted(
            n for n in os.listdir(mdir) if n.startswith("manifest-")
        )  # version-prefixed → lexical == numeric order
        keep = names[-keep_last:]
        if cur["_file"] not in keep:  # never collect the live manifest
            keep.append(cur["_file"])
        live: set[str] = set()
        known: set[str] = set()  # referenced by ANY manifest, live or old
        for n in names:
            with open(os.path.join(mdir, n)) as fh:
                m = json.load(fh)
            for segs in m["datasets"].values():
                known.update(segs)
                if n in keep:
                    live.update(segs)
        removed_segments = []
        seg_root = os.path.join(root, _SEGMENTS)
        if os.path.isdir(seg_root):
            now = time.time()
            for entry in sorted(os.listdir(seg_root)):
                rel = os.path.join(_SEGMENTS, entry)
                full = os.path.join(seg_root, entry)
                if rel in live:
                    continue
                if rel not in known:
                    # never referenced: a crashed commit's orphan — or a
                    # CONCURRENT committer's in-flight staging; age tells
                    try:
                        age = now - os.path.getmtime(full)
                    except OSError:
                        continue
                    if age < orphan_grace_sec:
                        continue
                shutil.rmtree(full)
                removed_segments.append(rel)
        removed_manifests = []
        for n in names:
            if n not in keep:
                os.remove(os.path.join(mdir, n))
                removed_manifests.append(n)
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass
    return {
        "removed_segments": removed_segments,
        "removed_manifests": removed_manifests,
        "kept_manifests": sorted(keep),
    }
