"""Serving-side scale receipt for the auto-k IVF-PQ index.

The composed-tier receipts (SCALE_RECEIPT_r07_ivfpq*.json) measure the
REGISTRY query, whose wall is dominated by the per-invocation PQ
training pass (linear in N by construction). The lake-scale claim that
matters for serving is different: with auto-k = ceil(N/512) cells, the
PER-QUERY-BATCH cost against a PREBUILT index should stay ~flat as the
corpus grows a decade, because a probe reads n_probe cells of ~512
vectors regardless of N (directory-pruned), while the pinned k=8 tier's
cells grow 10× per decade. This tool demonstrates that directly:

for each sf dir: build the index ONCE (timed separately — the
amortized, offline cost), then drain the SAME 10-query JSONL file
through ``start_ivf_pq_queries`` twice and record the second (warm)
drain — checkpoint dirs are fresh per drain so both runs do full work.

Usage: python tools/ivfpq_serving_scale.py [lo_dir hi_dir]
Prints one JSON line; exits 1 if the warm drain ratio exceeds
SLACK × sqrt(data ratio) (generous: listing/overhead grows mildly with
cell count even though scanned rows do not).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# exactly 0 or 2 positional args — a lone directory used to be
# silently ignored (defaults ran instead), which is worse than an error
if len(sys.argv) not in (1, 3):
    sys.exit(f"usage: {sys.argv[0]} [lo_dir hi_dir]")
LO = sys.argv[1] if len(sys.argv) == 3 else "/root/repo/.scale/sf1"
HI = sys.argv[2] if len(sys.argv) == 3 else "/root/repo/.scale/sf10"
DATA_RATIO = 10.0
SLACK = 2.0


def main() -> int:
    from pyspark.sql import functions as F

    from fintech_etl_spark.operators.similarity import _N_QUERIES
    from fintech_etl_spark.session import build_session
    from fintech_etl_spark.sources.tables import load_table
    from fintech_etl_spark.streaming.ann import (
        build_ivf_pq_index,
        start_ivf_pq_queries,
    )

    spark = build_session("ivfpq_serving_scale")
    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="ivfpq_scale_")
    try:
        for tag, sf in (("lo", LO), ("hi", HI)):
            idx = os.path.join(work, f"index_{tag}")
            t0 = time.time()
            counts = build_ivf_pq_index(spark, sf, idx, k=None)
            build_s = round(time.time() - t0, 3)

            qdir = os.path.join(work, f"queries_{tag}")
            os.makedirs(qdir)
            qrows = (
                load_table(spark, sf, "embeddings")
                .filter(F.col("vec_id") < _N_QUERIES)
                .select(F.col("vec_id").alias("query_id"), "embedding")
                .collect()
            )
            with open(os.path.join(qdir, "q.jsonl"), "w") as f:
                for r in qrows:
                    f.write(
                        json.dumps(
                            {
                                "query_id": r.query_id,
                                "embedding": list(r.embedding),
                            }
                        )
                        + "\n"
                    )

            drains = []
            n_rows = 0
            for rep in range(2):
                got: list = []

                def on_results(df, batch_id, _got=got):
                    _got.extend(df.collect())

                t0 = time.time()
                q = start_ivf_pq_queries(
                    spark,
                    os.path.join(qdir, "*.jsonl"),
                    os.path.join(work, f"ckpt_{tag}_{rep}"),
                    idx,
                    on_results,
                )
                q.awaitTermination(600)
                drains.append(round(time.time() - t0, 3))
                n_rows = len(got)
            out[tag] = {
                "sf_dir": sf,
                "k_cells": counts["coarse_cells"],
                "indexed_vectors": counts["vectors"],
                "build_s": build_s,
                "drain_cold_s": drains[0],
                "drain_warm_s": drains[1],
                "result_rows": n_rows,
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    ratio = round(out["hi"]["drain_warm_s"] / out["lo"]["drain_warm_s"], 2)
    bound = round(SLACK * DATA_RATIO**0.5, 2)
    receipt = {
        "metric": "ivfpq_serving_scale",
        "data_ratio": DATA_RATIO,
        "drain_warm_ratio": ratio,
        "bound": bound,
        "passed": ratio <= bound and all(
            v["result_rows"] > 0 for v in out.values()
        ),
        **out,
    }
    print(json.dumps(receipt))
    return 0 if receipt["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
