"""Serving-side scale receipt for the (band, bucket)-partitioned LSH index.

Counterpart of tools/ivfpq_serving_scale.py for the LSH tier. The two
tiers make DIFFERENT scale promises and this tool receipts the LSH one
honestly: a probe reads only the query batch's exact (band, bucket)
partitions (directory prune — r8 moved the filter to the exact encoded
pair set), but each bucket's population grows LINEARLY with the corpus
(~N / (bands × 2^planes) rows), so the per-batch warm drain is expected
to grow ~linearly per data decade — with a small constant because only
probed buckets are read and only (id, cos) rows leave the scorer. The
decade-FLAT serving tier is IVF-PQ (bounded ~512-vector cells); LSH is
the cheap-build/exact-cosine-on-candidates tier. The receipt therefore
bounds the warm-drain ratio by SLACK × data_ratio (linear) and records
both drains so a reader can see the actual constant.

For each sf dir: build the index ONCE (timed separately — amortized,
offline), then drain the SAME 10-query JSONL file twice and record the
second (warm) drain; checkpoints are fresh per drain so both do full
work.

Usage: python tools/lsh_serving_scale.py [lo_dir hi_dir]
Prints one JSON line; exits 1 if the warm-drain ratio exceeds
SLACK × data_ratio or any drain returns zero rows.
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
DATA_RATIO = 10.0
SLACK = 1.5
_N_QUERIES = 10


def main() -> int:
    from pyspark.sql import functions as F

    from fintech_etl_spark.session import build_session
    from fintech_etl_spark.sources.tables import load_table
    from fintech_etl_spark.streaming.ann import build_lsh_index, start_ann_queries

    spark = build_session("lsh_serving_scale")
    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="lsh_scale_")
    try:
        for tag, sf in (("lo", LO), ("hi", HI)):
            idx = os.path.join(work, f"index_{tag}")
            t0 = time.time()
            n_index_rows = build_lsh_index(spark, sf, idx)
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
                q = start_ann_queries(
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
                "index_rows": n_index_rows,
                "build_s": build_s,
                "drain_cold_s": drains[0],
                "drain_warm_s": drains[1],
                "result_rows": n_rows,
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    ratio = round(out["hi"]["drain_warm_s"] / out["lo"]["drain_warm_s"], 2)
    bound = round(SLACK * DATA_RATIO, 2)
    receipt = {
        "metric": "lsh_serving_scale",
        "data_ratio": DATA_RATIO,
        "drain_warm_ratio": ratio,
        "bound": bound,
        "contract": (
            "probe reads only the exact probed (band,bucket) partitions; "
            "bucket population grows ~linearly with corpus, so warm drain "
            "is expected ~linear per decade (the decade-flat tier is "
            "IVF-PQ)"
        ),
        "passed": ratio <= bound
        and all(v["result_rows"] > 0 for v in out.values()),
        **out,
    }
    print(json.dumps(receipt))
    return 0 if receipt["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
