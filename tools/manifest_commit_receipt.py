"""Receipt: manifest commit latency stays FLAT as the ingested-file
history grows 10² → 10⁵ (r10 verdict "What's missing #2").

The r10 layout inlined the whole ingested list in every manifest:
per-commit cost was O(history) twice over (linear dup scan + full list
rewrite) and the manifest file grew unboundedly. The r11 layout keeps
only a bounded tail inline and folds it into hash-bucketed immutable
checkpoint files (Delta-checkpoint-style), so a commit probes ONE
bucket per key and writes O(tail) bytes.

This receipt seeds a pure-metadata manifest log to each decade of
history size, then times the production shape — single-file-key
commits (the ingest stream's per-micro-batch commit) — and asserts:

- median single-key commit latency at 10⁵ keys ≤ 3× the 10² median
  (fsync noise bound; the old layout is >10× by 10⁵ and keeps growing);
- the manifest FILE stays bounded (tail ≤ _INGEST_TAIL_MAX keys)
  instead of growing with history.

Pure local metadata — no Spark session. Prints one JSON line; exit 1
if either bound fails. Run:  python tools/manifest_commit_receipt.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from fintech_etl_spark.sinks import manifest as mf  # noqa: E402

DECADES = (100, 1_000, 10_000, 100_000)
PROBE_COMMITS = 25
FLAT_BOUND = 3.0


def main() -> int:
    root = tempfile.mkdtemp(prefix="mf_commit_receipt_")
    out: dict = {"metric": "manifest_commit_latency", "decades": {}}
    try:
        mf.commit(root, replace={"d": []})
        seeded = 0
        key_no = 0
        for target in DECADES:
            # bulk-seed history up to the decade (chunked commits —
            # each chunk crosses the rollup threshold, so the
            # checkpoint path is exercised, not just the tail)
            while seeded < target - PROBE_COMMITS:
                n = min(1000, target - PROBE_COMMITS - seeded)
                mf.commit(
                    root,
                    file_keys=[f"seed-{key_no + i:07d}" for i in range(n)],
                )
                key_no += n
                seeded += n
            # probe: the ingest stream's per-batch shape
            lats = []
            for _ in range(PROBE_COMMITS):
                t0 = time.perf_counter()
                mf.commit(root, file_keys=[f"seed-{key_no:07d}"])
                lats.append(time.perf_counter() - t0)
                key_no += 1
                seeded += 1
            cur = mf.current(root)
            mdir = mf.manifests_dir(root)
            out["decades"][str(target)] = {
                "history": mf.ingested_count(root),
                "commit_ms_median": round(
                    statistics.median(lats) * 1000, 3
                ),
                "commit_ms_p90": round(
                    sorted(lats)[int(0.9 * len(lats))] * 1000, 3
                ),
                "manifest_bytes": os.path.getsize(
                    os.path.join(mdir, cur["_file"])
                ),
                "tail_len": len(cur["ingested_tail"]),
            }
            # periodic maintenance, as a deployment would run it
            mf.vacuum(root, keep_last=2, orphan_grace_sec=0)
        lo = out["decades"][str(DECADES[0])]["commit_ms_median"]
        hi = out["decades"][str(DECADES[-1])]["commit_ms_median"]
        out["ratio_hi_over_lo"] = round(hi / lo, 3) if lo else None
        out["flat_bound"] = FLAT_BOUND
        out["pass"] = (
            hi <= FLAT_BOUND * lo
            and all(
                d["tail_len"] <= mf._INGEST_TAIL_MAX
                for d in out["decades"].values()
            )
        )
        # integrity: every seeded key is still findable after rollups
        # and vacuums (spot-probe one key per decade + a miss)
        probes = [f"seed-{0:07d}", f"seed-{key_no - 1:07d}", "never-seen"]
        hit = mf.ingested_contains(root, probes)
        out["integrity_ok"] = hit == set(probes[:2])
        out["pass"] = bool(out["pass"] and out["integrity_ok"])
        print(json.dumps(out))
        return 0 if out["pass"] else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
