"""Batch-proportional-cost receipt for incremental ANN index append.

The lake-scale claim behind ``append_lsh_index`` / ``append_ivf_pq_index``
(streaming/ann.py): appending a FIXED batch of new vectors costs the
same whether the existing index holds 20k or 200k vectors, because the
append path touches only the batch plus the frozen parameter frames —
never the corpus-side index rows — while a full rebuild re-reads (and
for IVF-PQ retrains on) the whole corpus. This tool measures exactly
that: for each corpus scale, build the index once (timed — the rebuild
cost the append path avoids), then append the SAME 1024-vector batch
and time the append.

Bounds: LSH append is data-independent (hash + partitioned write) —
bounded at SLACK× flat. IVF-PQ frozen assignment scores O(√k) per
vector with auto-k = ceil(N/512) cells (two-level scorer past
_KM_HIER_MIN), so its bound is SLACK × sqrt(data ratio). Rebuild
ratios are reported alongside for contrast (expected ~linear).

Usage: python tools/append_scale.py [lo_dir hi_dir]
Prints one JSON line; exits 1 if either family's append ratio exceeds
its bound.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) not in (1, 3):
    sys.exit(f"usage: {sys.argv[0]} [lo_dir hi_dir]")
LO = sys.argv[1] if len(sys.argv) == 3 else "/root/repo/.scale/sf1"
HI = sys.argv[2] if len(sys.argv) == 3 else "/root/repo/.scale/sf10"
# the batch is drawn from LO (ids shifted out of every corpus), so the
# tool is self-contained wherever the lo/hi dirs live
BATCH_SRC = LO
BATCH_N = 1024
DATA_RATIO = 10.0
SLACK = 2.5


def main() -> int:
    from pyspark.sql import functions as F

    from fintech_etl_spark.session import build_session
    from fintech_etl_spark.sources.tables import load_table
    from fintech_etl_spark.operators.similarity import _N_BANDS
    from fintech_etl_spark.streaming.ann import (
        append_ivf_pq_index,
        append_lsh_index,
        build_ivf_pq_index,
        build_lsh_index,
    )

    spark = build_session("append_scale")
    # the SAME batch at every scale, ids shifted out of every corpus
    batch = (
        load_table(spark, BATCH_SRC, "embeddings")
        .orderBy("vec_id")
        .limit(BATCH_N)
        .withColumn("vec_id", F.col("vec_id") + F.lit(10**9))
        .localCheckpoint()
    )
    n_batch = batch.count()

    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="append_scale_")
    try:
        for tag, sf in (("lo", LO), ("hi", HI)):
            n_corpus = load_table(spark, sf, "embeddings").count()
            rec: dict = {"sf_dir": sf, "corpus_vectors": n_corpus}

            lsh = os.path.join(work, f"lsh_{tag}")
            t0 = time.time()
            build_lsh_index(spark, sf, lsh)
            rec["lsh_build_s"] = round(time.time() - t0, 3)
            t0 = time.time()
            n = append_lsh_index(batch, lsh)
            rec["lsh_append_s"] = round(time.time() - t0, 3)
            assert n == n_batch * _N_BANDS

            ivf = os.path.join(work, f"ivf_{tag}")
            t0 = time.time()
            counts = build_ivf_pq_index(spark, sf, ivf, k=None)
            rec["ivfpq_build_s"] = round(time.time() - t0, 3)
            rec["k_cells"] = counts["coarse_cells"]
            t0 = time.time()
            ap = append_ivf_pq_index(spark, batch, ivf)
            rec["ivfpq_append_s"] = round(time.time() - t0, 3)
            assert ap["appended_vectors"] == n_batch
            out[tag] = rec
    finally:
        shutil.rmtree(work, ignore_errors=True)

    lsh_ratio = round(out["hi"]["lsh_append_s"] / out["lo"]["lsh_append_s"], 2)
    ivf_ratio = round(
        out["hi"]["ivfpq_append_s"] / out["lo"]["ivfpq_append_s"], 2
    )
    lsh_bound = SLACK
    ivf_bound = round(SLACK * DATA_RATIO**0.5, 2)
    receipt = {
        "metric": "ann_index_append_scale",
        "batch_vectors": n_batch,
        "data_ratio": DATA_RATIO,
        "lsh_append_ratio": lsh_ratio,
        "lsh_bound": lsh_bound,
        "ivfpq_append_ratio": ivf_ratio,
        "ivfpq_bound": ivf_bound,
        "lsh_rebuild_ratio": round(
            out["hi"]["lsh_build_s"] / out["lo"]["lsh_build_s"], 2
        ),
        "ivfpq_rebuild_ratio": round(
            out["hi"]["ivfpq_build_s"] / out["lo"]["ivfpq_build_s"], 2
        ),
        "passed": lsh_ratio <= lsh_bound and ivf_ratio <= ivf_bound,
        **out,
    }
    print(json.dumps(receipt))
    return 0 if receipt["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
