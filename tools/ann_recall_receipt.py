"""ANN recall ATTRIBUTION receipt (closes the r12 judge's #2): the
r12 sweep measured recall@5 ≤ 0.19 DECREASING in n_probe and could
not say why. This receipt attributes it and demonstrates the fix, on
the same skew-adversarial corpus (10% one tight content cluster on
the highest vec_ids) for capped and uncapped indexes.

Attribution mechanics: ``calibrate_n_probe`` now reports ``ceiling``
per point — the recall an exact refine of EVERY probed-cell member
would achieve (= the ground-truth-in-probed-cells rate). High ceiling
+ low recall ⇒ the loss is the fixed 50-deep ADC shortlist
(_PQ_CAND), not cell routing; ``calibrate_pq_cand`` then sweeps that
cut at fixed n_probe and ``auto_pq_cand`` picks the minimal depth for
a target.

CLAIMS (exit 1 if violated):
1. mean fan-out strictly increasing in n_probe for both indexes (the
   cost curve is real);
2. ATTRIBUTION: on the UNCAPPED index ceiling@5 ≥ 0.85 at EVERY
   swept n_probe (even n_probe=1) — the coarse quantizer routes
   queries to their neighbors' cells, so the r12 recall floor was
   never assignment-bound and never corpus-intrinsic. On the CAPPED
   index the ceiling curve EXPOSES the cap's real cost: the split
   hot cell spreads a hot query's neighbors over sub-cells, so the
   ceiling starts lower and must be bought back with probes —
   asserted monotone in n_probe and ≥ 0.85 by the widest sweep
   point. Neither index is PQ-codebook-bound;
3. THE FIX: sweeping pq_cand on the capped index at n_probe=6
   (where its ceiling has recovered) lifts recall@5 from the
   r12-floor ~0.16 to ≥ 0.8 (the r12 verdict's done-criterion) and
   to within 0.05 of that probe's ceiling — the fixed 50-deep
   shortlist cut was the whole remaining gap; recall is
   non-decreasing in pq_cand; mean_refined records the cost honestly;
4. capped-index recall parity at equal fan-out (r12 claim, kept);
5. auto_n_probe picks minimally and saturates loudly (r12 claim,
   kept); auto_pq_cand picks the minimal cut reaching 0.8;
6. the JOINT picker closes the serving question: over an
   (n_probe × pq_cand) grid, pick_serving_config returns the
   cheapest config reaching recall@5 ≥ 0.8 under the documented
   cost model (fanout + 8×refined) — the receipt records the
   config an operator should actually serve this corpus with.

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
        _default_serving_cost,
        auto_n_probe,
        auto_pq_cand,
        build_ivf_pq_index,
        calibrate_n_probe,
        calibrate_pq_cand,
        calibrate_serving_grid,
        pick_serving_config,
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
        idx_paths = {}
        for tag, cap in (("uncapped", None), ("capped", CELL_CAP)):
            idx = os.path.join(work, f"idx_{tag}")
            idx_paths[tag] = idx
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
        # ATTRIBUTION: the exact-refine-all ceiling. Uncapped must be
        # high EVERYWHERE (routing was never the problem). Capped
        # starts lower BY CONSTRUCTION — the split hot cell spreads a
        # hot query's neighbors over sub-cells — and must climb back
        # with probes: that is the cap's real price, now quantified.
        ceilings = {
            tag: [p["ceiling"][5] for p in c] for tag, c in curves.items()
        }
        assignment_ok = all(v >= 0.85 for v in ceilings["uncapped"])
        capped_recovers = (
            ceilings["capped"] == sorted(ceilings["capped"])
            and ceilings["capped"][-1] >= 0.85
        )
        # THE FIX: sweep the shortlist depth on the capped index at a
        # probe width where its ceiling has recovered (n_probe=6)
        fix_probe = 6
        # widest cut covers the full probe yield even for hot queries
        # (fix_probe cells x cell_cap members) — recall then equals
        # the probe ceiling by construction, measured not assumed
        cut_curve = calibrate_pq_cand(
            spark,
            idx_paths["capped"],
            queries,
            pq_cands=(50, 200, 800, 3200, fix_probe * CELL_CAP),
            n_probe=fix_probe,
            at_k=(1, 5, 10),
        )
        cut_r5 = [p["recall"][5] for p in cut_curve]
        fix_ceiling = next(
            p["ceiling"][5]
            for p in curves["capped"]
            if p["n_probe"] == fix_probe
        )
        fix_reaches_target = cut_r5[-1] >= 0.8
        fix_closes_gap = cut_r5[-1] >= fix_ceiling - 0.05
        cut_monotone = cut_r5 == sorted(cut_r5)
        picked_cut = auto_pq_cand(cut_curve, 0.8, at_k=5)
        # THE ANSWER: the joint grid + cheapest-feasible pick — what
        # an operator should actually serve this corpus with
        grid = calibrate_serving_grid(
            spark,
            idx_paths["capped"],
            queries,
            n_probes=(2, 4, 6, 8),
            pq_cands=(50, 800, 3200, 8 * CELL_CAP),
            at_k=(5,),
        )
        served = pick_serving_config(grid, 0.8, at_k=5)
        served_ok = served["recall"][5] >= 0.8 and all(
            _default_serving_cost(served) <= _default_serving_cost(p)
            for p in grid
            if p["recall"][5] >= 0.8
        )
        # does widening the probe buy recall on THIS corpus? (informational:
        # False = shortlist-bound at the default cut — the attribution above
        # names the lever)
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

        ok = (
            fanout_monotone
            and parity
            and minimal
            and saturates_loudly
            and assignment_ok
            and capped_recovers
            and fix_reaches_target
            and fix_closes_gap
            and cut_monotone
            and served_ok
        )
        receipt = {
            "claim": "ATTRIBUTION of the r12 recall floor: on the "
            "uncapped index ceiling@5 (= ground-truth-in-probed-cells "
            "rate) >= 0.85 at EVERY n_probe, so the loss was never "
            "cell assignment or corpus geometry; the capped index's "
            "ceiling exposes the hot-cell split's probe cost "
            "(monotone, recovered by the widest sweep); sweeping the "
            "ADC shortlist depth (pq_cand) at n_probe=6 lifts capped "
            "recall@5 from the r12 ~0.16 floor to >= 0.8 and to "
            "within 0.05 of that probe's exact-refine ceiling — the "
            "fixed 50-deep cut was the whole remaining gap; plus the "
            "r12 claims: fan-out monotone, capped parity at equal "
            "fan-out, auto pickers minimal and loudly saturating",
            "n": N,
            "dim": skew.DIM,
            "hot_frac": skew.HOT_FRAC,
            "cell_cap": CELL_CAP,
            "n_probes": list(N_PROBES),
            "curves": curves,
            "attribution": {
                "ceiling_at_5_by_index": ceilings,
                "uncapped_never_assignment_bound": assignment_ok,
                "capped_ceiling_recovers_with_probes": capped_recovers,
                "fix_n_probe": fix_probe,
                "pq_cand_curve": cut_curve,
                "fix_probe_ceiling_at_5": round(fix_ceiling, 4),
                "fix_reaches_target_0.8": fix_reaches_target,
                "fix_closes_gap_to_ceiling": fix_closes_gap,
                "cut_monotone": cut_monotone,
                "auto_pq_cand_picked_for_0.8": picked_cut,
            },
            "serving_config": {
                "grid": grid,
                "picked": served,
                "picked_cost": round(_default_serving_cost(served), 1),
                "target_recall_at_5": 0.8,
                "cheapest_feasible": served_ok,
            },
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
