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

- SINGLE WRITER. Two concurrent committers both succeed and the last
  pointer swap wins — the loser's segments become orphans. A real
  multi-writer lake needs a compare-and-swap on the pointer (the same
  reason Delta on S3 needs a lock service); the index lifecycle here
  has one maintenance actor by construction (one ingest stream, cron
  compaction).
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


def commit(
    root: str,
    *,
    add: dict[str, list[str]] | None = None,
    replace: dict[str, list[str]] | None = None,
    file_keys: list[str] | None = None,
) -> dict:
    """Write the next manifest version and atomically swap the pointer.

    ``add`` appends segment dirs to named datasets; ``replace`` swaps a
    dataset's whole segment list (compaction / initial build);
    ``file_keys`` records ingested source files into the manifest's
    dedup history (kept forever, across compactions — erasing it is
    exactly the bug the directory-mode ledger had). Segment paths are
    stored relative to ``root`` so the index directory can be moved.
    Returns the committed manifest. First commit creates the log.
    """
    mdir = manifests_dir(root)
    os.makedirs(mdir, exist_ok=True)
    if is_transactional(root):
        cur = current(root)
        version = cur["version"] + 1
        datasets = {k: list(v) for k, v in cur["datasets"].items()}
        ingested = list(cur["ingested_files"])
    else:
        version, datasets, ingested = 0, {}, []

    def _rel(p: str) -> str:
        return os.path.relpath(os.path.abspath(p), os.path.abspath(root))

    for ds, segs in (replace or {}).items():
        datasets[ds] = [_rel(s) for s in segs]
    for ds, segs in (add or {}).items():
        datasets.setdefault(ds, [])
        datasets[ds] = datasets[ds] + [_rel(s) for s in segs]
    for k in file_keys or []:
        if k in ingested:
            raise ValueError(
                f"manifest commit: source file {k!r} is already in the "
                "ingested set — the caller must skip processed files "
                "before staging (double-append would corrupt the index)"
            )
        ingested.append(k)

    name = f"manifest-{version:010d}-{uuid.uuid4().hex[:8]}.json"
    m = {"version": version, "datasets": datasets, "ingested_files": ingested}
    _fsync_write(os.path.join(mdir, name), json.dumps(m, indent=1))
    tmp = os.path.join(mdir, f"{_CURRENT}.tmp-{uuid.uuid4().hex[:8]}")
    _fsync_write(tmp, name)
    os.replace(tmp, os.path.join(mdir, _CURRENT))  # THE commit point
    # fsync the DIRECTORY too: rename atomicity is immediate, but its
    # durability is not — an OS crash could otherwise revert the
    # pointer to the previous manifest, resurrecting the exactly-once
    # window the commit exists to close
    dfd = os.open(mdir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
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


def vacuum(root: str, keep_last: int = 2) -> dict:
    """Garbage-collect segments referenced by NO kept manifest and
    manifests older than the newest ``keep_last`` versions. Retention
    contract: an in-flight reader resolved the pointer at scan start,
    so keep at least 2 versions while anything might be scanning (the
    Delta VACUUM rule). Orphan segments from crashed commits are
    collected too — they are referenced by no manifest at all."""
    if keep_last < 1:
        raise ValueError("vacuum keep_last must be >= 1")
    if not is_transactional(root):
        raise ValueError(
            f"vacuum: {root!r} is not a manifest-backed dataset "
            "(no _manifests/_current pointer) — nothing to vacuum; "
            "plain-directory indexes clean up via compact_partitioned"
        )
    mdir = manifests_dir(root)
    cur = current(root)
    names = sorted(
        n for n in os.listdir(mdir) if n.startswith("manifest-")
    )  # version-prefixed → lexical == numeric order
    keep = names[-keep_last:]
    if cur["_file"] not in keep:  # never collect the live manifest
        keep.append(cur["_file"])
    live: set[str] = set()
    for n in keep:
        with open(os.path.join(mdir, n)) as fh:
            m = json.load(fh)
        for segs in m["datasets"].values():
            live.update(segs)
    removed_segments = []
    seg_root = os.path.join(root, _SEGMENTS)
    if os.path.isdir(seg_root):
        for entry in sorted(os.listdir(seg_root)):
            rel = os.path.join(_SEGMENTS, entry)
            if rel not in live:
                shutil.rmtree(os.path.join(seg_root, entry))
                removed_segments.append(rel)
    removed_manifests = []
    for n in names:
        if n not in keep:
            os.remove(os.path.join(mdir, n))
            removed_manifests.append(n)
    return {
        "removed_segments": removed_segments,
        "removed_manifests": removed_manifests,
        "kept_manifests": sorted(keep),
    }
