"""n_probe → recall calibration receipt (the r11 audit's open item
#3): SCALE_RECEIPT_r11_ann_skew.json proved the IVF cell cap bounds
hot-cell fan-out without hurting recall *relative to uncapped*, but
absolute recall at a fixed n_probe says nothing about serving
quality. This receipt sweeps ``calibrate_n_probe`` over the SAME
skew-adversarial corpus (10% one tight content cluster on the highest
vec_ids, so no deterministic k-means seed starts inside it) for the
capped and uncapped indexes, and exercises ``auto_n_probe`` — the
target-recall picker an operator calls instead of hard-coding
n_probe=3.

CLAIMS (exit 1 if violated):
1. the COST curve is real: mean fan-out strictly increasing in
   n_probe for both indexes. (Recall itself is NOT asserted monotone:
   on this random-gaussian corpus the exact-rerank shortlist is a
   fixed _PQ_CAND cut of a noisy ADC ranking, so widening the probe
   dilutes the shortlist and measured recall can DECLINE — the curve
   records it instead of assuming it away, and the per-curve
   ``probe_bound`` field says whether more probes buy recall at all:
   False here means the index is PQ-resolution-bound and the fix is
   the codebook, not n_probe — the r11 adjudication, now quantified);
2. the capped index reaches recall parity AT EQUAL FAN-OUT: for every
   uncapped sweep point there is a capped point with mean_fanout ≤
   (uncapped fanout × 1.05) whose recall@5 ≥ uncapped recall@5 − 0.03
   — capping redistributes the hot cell, it does not trade recall for
   the fan-out bound;
3. auto_n_probe picks the MINIMAL n_probe reaching a feasible target
   (the capped curve's own max recall@5 − 0.05) and saturates loudly
   (strict=True raises) on an infeasible one.

Usage: python tools/ann_recall_receipt.py [N] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ann_skew_receipt import _make_corpus  # noqa: E402 — same corpus as r11

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
OUT = sys.argv[2] if len(sys.argv) > 2 else None
CELL_CAP = 4 * 512
N_PROBES = (1, 2, 3, 4, 6, 8)


def main() -> int:
    import ann_skew_receipt as skew

    skew.N = N  # the corpus maker reads the module global

    from pyspark.sql import functions as F

    from fintech_etl_spark.session import build_session
    from fintech_etl_spark.sources.tables import load_table
    from fintech_etl_spark.streaming.ann import (
        auto_n_probe,
        build_ivf_pq_index,
        calibrate_n_probe,
    )

    spark = build_session("ann_recall_receipt")
    work = tempfile.mkdtemp(prefix="ann_recall_")
    try:
        sf = os.path.join(work, "skewed")
        _make_corpus(sf, skewed=True)
        # stratified query sample: 30 background + 30 hot (the hot
        # cluster rides the HIGHEST vec_ids)
        emb = load_table(spark, sf, "embeddings")
        hot_lo = N - int(N * skew.HOT_FRAC)
        queries = emb.filter(
            (F.col("vec_id") < 30)
            | ((F.col("vec_id") >= hot_lo) & (F.col("vec_id") < hot_lo + 30))
        ).select(F.col("vec_id").alias("query_id"), "embedding")

        curves = {}
        for tag, cap in (("uncapped", None), ("capped", CELL_CAP)):
            idx = os.path.join(work, f"idx_{tag}")
            build_ivf_pq_index(spark, sf, idx, k=None, cell_cap=cap)
            curves[tag] = calibrate_n_probe(
                spark, idx, queries, n_probes=N_PROBES, at_k=(1, 5, 10)
            )

        def r5(p):
            return p["recall"][5]

        fanout_monotone = all(
            c[i]["mean_fanout"] > c[i - 1]["mean_fanout"]
            for c in curves.values()
            for i in range(1, len(c))
        )
        # does widening the probe buy recall on THIS corpus? (informational:
        # False = PQ-resolution-bound — improve the codebook, not n_probe)
        probe_bound = {
            tag: max(r5(p) for p in c) - min(r5(p) for p in c) > 0.02
            and r5(c[-1]) > r5(c[0])
            for tag, c in curves.items()
        }
        # parity at equal fan-out: every uncapped point is matched or
        # beaten by some capped point of no greater cost
        parity = all(
            any(
                cp["mean_fanout"] <= up["mean_fanout"] * 1.05
                and r5(cp) >= r5(up) - 0.03
                for cp in curves["capped"]
            )
            for up in curves["uncapped"]
        )
        best5 = max(r5(p) for p in curves["capped"])
        target = best5 - 0.05
        picked = auto_n_probe(curves["capped"], target, at_k=5)
        minimal = all(
            r5(p) < target
            for p in curves["capped"]
            if p["n_probe"] < picked
        ) and r5(
            next(p for p in curves["capped"] if p["n_probe"] == picked)
        ) >= target
        try:
            auto_n_probe(curves["capped"], 1.01, at_k=5, strict=True)
            saturates_loudly = False
        except ValueError:
            saturates_loudly = True

        ok = fanout_monotone and parity and minimal and saturates_loudly
        receipt = {
            "claim": "fan-out strictly increases with n_probe; the "
            "capped index reaches recall parity at equal fan-out; "
            "auto_n_probe picks the minimal probe width for a "
            "feasible target and raises on a saturated one; "
            "probe_bound records whether wider probes buy recall at "
            "all on this corpus (False = PQ-resolution-bound)",
            "n": N,
            "dim": skew.DIM,
            "hot_frac": skew.HOT_FRAC,
            "cell_cap": CELL_CAP,
            "n_probes": list(N_PROBES),
            "curves": curves,
            "auto_n_probe": {
                "target_recall_at_5": round(target, 4),
                "picked": picked,
                "minimal": minimal,
                "saturates_loudly": saturates_loudly,
            },
            "fanout_monotone": fanout_monotone,
            "probe_bound": probe_bound,
            "parity_at_equal_fanout": parity,
            "ok": ok,
        }
        line = json.dumps(receipt)
        print(line)
        if OUT:
            with open(OUT, "w") as fh:
                fh.write(line + "\n")
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
