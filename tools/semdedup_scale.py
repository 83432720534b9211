"""SemDeDup k-scaling receipt (round-5 verdict #3).

The registered ``dedup_semantic_semdedup`` pins k=8 cells so the
DuckDB oracle can unroll Lloyd's; the lake-scale contract lives in
``semdedup_prune``'s auto-k (k = ceil(N / 512)). This tool MEASURES
that contract across a 10× corpus step: with auto-k, the max in-cell
GEMM (max cell size²) must stay bounded instead of growing ~100× the
way a pinned k would make it, and wall time must stay ≲ linear.

Usage (after tools/gen_scale_data.py has built the dirs):
    python tools/semdedup_scale.py [lo_dir hi_dir]

Prints one JSON line: per-sf N, k, wall seconds, cell-size histogram
(p50/p90/max), max GEMM entries, pruned count; plus the cross-sf
ratios. Exit 1 if max cell size grew superlinearly (> 3× at 10× data —
with a fixed target cell size it should stay ~flat) or wall went
superlinear beyond the bench_scale slack.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LO = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf0.1"
HI = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"


def main() -> int:
    from pyspark.sql import functions as F

    from fintech_etl_spark.operators.similarity import (
        _SEMDEDUP_TARGET_CELL,
        semdedup_prune,
    )
    from fintech_etl_spark.session import build_session
    from fintech_etl_spark.sources.tables import load_table

    spark = build_session("semdedup_scale")
    out: dict[str, dict] = {}
    for tag, sf_dir in (("lo", LO), ("hi", HI)):
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        k = max(1, -(-n // _SEMDEDUP_TARGET_CELL))
        t0 = time.perf_counter()
        res = semdedup_prune(emb, k=k).localCheckpoint()  # materialize once
        pruned = res.filter(~F.col("kept")).count()
        wall = round(time.perf_counter() - t0, 3)
        sizes = sorted(
            r.n for r in res.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        out[tag] = {
            "sf_dir": sf_dir,
            "n_vectors": n,
            "k": k,
            "wall_sec": wall,
            "pruned": pruned,
            "cell_p50": sizes[len(sizes) // 2],
            "cell_p90": sizes[int(len(sizes) * 0.9)],
            "cell_max": sizes[-1],
            "max_gemm_entries": sizes[-1] ** 2,
        }
    lo, hi = out["lo"], out["hi"]
    data_ratio = hi["n_vectors"] / max(lo["n_vectors"], 1)
    summary = {
        "metric": "semdedup_k_scaling",
        "target_cell": _SEMDEDUP_TARGET_CELL,
        "data_ratio": round(data_ratio, 2),
        "wall_ratio": round(hi["wall_sec"] / max(lo["wall_sec"], 1e-9), 2),
        "cell_max_ratio": round(hi["cell_max"] / max(lo["cell_max"], 1), 2),
        "lo": lo,
        "hi": hi,
    }
    failures = []
    if summary["cell_max_ratio"] > 3.0:
        failures.append(f"max cell grew {summary['cell_max_ratio']}x at "
                        f"{summary['data_ratio']}x data — auto-k not bounding cells")
    if hi["wall_sec"] > 1.0 and summary["wall_ratio"] > data_ratio * 1.5:
        failures.append(f"superlinear wall ratio {summary['wall_ratio']}")
    summary["failures"] = failures
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
