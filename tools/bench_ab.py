"""A/B micro-bench for the four r12 watch-list regressions (r12
verdict's "What's wrong" #2): time a named query set under the
CURRENT tree vs a pinned baseline commit on the same idle box, same
JVM-warm protocol as bench.py (1 warm + min/median of N timed noop
writes per query).

Usage:
  python tools/bench_ab.py q1,q2,... [runs]       # times the CURRENT tree
Run it twice — once from a `git worktree` checkout of the baseline
commit, once from HEAD — and compare the JSON lines.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "dedup_embedding_neardup",
        "ann_topk_cosine_brute",
        "ann_lsh_bucketed",
        "q8_market_share",
    ]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from fintech_etl_spark.registry import queries
    from fintech_etl_spark.session import build_session

    spark = build_session("bench_ab")
    qs = queries()
    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        out[name] = {
            "min": round(runs[0], 3),
            "median": round(runs[len(runs) // 2], 3),
        }
    print(json.dumps({
        "tree": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "load_per_cpu": round(os.getloadavg()[0] / (os.cpu_count() or 1), 3),
        "queries": out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
