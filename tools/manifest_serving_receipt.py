"""Serving-cost receipt for the manifest-backed (transactional) index.

Question a reviewer should ask of sinks/manifest.py: what does
pointer-resolution-per-batch cost at serve time, relative to the plain
directory listing it replaces? This builds the SAME LSH index both
ways at the given scale, drains the SAME query files through
start_ann_queries against each, and reports per-batch walls plus
result equality (the manifest changes where bytes live, never what a
reader sees). Also drains the transactional index a second time after
appends have fragmented it into several segments, then after a
compaction — the manifest lifecycle a real lake would run.

Usage: python tools/manifest_serving_receipt.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else None
N_QUERY_FILES = 4
QUERIES_PER_FILE = 16


def _drain(spark, qglob, ckpt, idx):
    from fintech_etl_spark.streaming.ann import start_ann_queries

    got = {}
    walls = []

    def on_results(df, batch_id):
        got.update(
            {(r.query_id, r.rank): (r.neighbor_id, r.cos) for r in df.collect()}
        )
        walls.append(round(time.perf_counter() - t[0], 3))
        t[0] = time.perf_counter()

    t = [time.perf_counter()]
    q = start_ann_queries(
        spark, qglob, ckpt, idx, on_results, max_files_per_trigger=1
    )
    q.awaitTermination()
    return got, walls


def main() -> int:
    from pyspark.sql import functions as F

    from fintech_etl_spark.sinks import manifest as mf
    from fintech_etl_spark.sinks.maintenance import compact_lsh_index
    from fintech_etl_spark.sources.tables import load_table
    from fintech_etl_spark.session import build_session
    from fintech_etl_spark.streaming.ann import (
        append_lsh_index,
        build_lsh_index,
    )

    spark = build_session("manifest_serving_receipt")
    work = tempfile.mkdtemp(prefix="mf_serve_")
    receipt: dict = {"metric": "manifest_serving_overhead", "sf_dir": SF}
    try:
        emb = load_table(spark, SF, "embeddings")
        n = emb.count()
        cut = int(n * 0.8)
        a_dir = os.path.join(work, "sfA")
        os.makedirs(a_dir)
        emb.filter(F.col("vec_id") < cut).write.parquet(
            os.path.join(a_dir, "embeddings.parquet")
        )
        b = emb.filter(F.col("vec_id") >= cut)

        qdir = os.path.join(work, "queries")
        os.makedirs(qdir)
        qrows = emb.limit(N_QUERY_FILES * QUERIES_PER_FILE).collect()
        for fno in range(N_QUERY_FILES):
            with open(os.path.join(qdir, f"q{fno}.jsonl"), "w") as f:
                for r in qrows[
                    fno * QUERIES_PER_FILE : (fno + 1) * QUERIES_PER_FILE
                ]:
                    f.write(
                        json.dumps(
                            {
                                "query_id": int(r.vec_id) + 10_000_000,
                                "embedding": list(r.embedding),
                            }
                        )
                        + "\n"
                    )
        qglob = os.path.join(qdir, "*.jsonl")

        plain = os.path.join(work, "idx_plain")
        tx = os.path.join(work, "idx_tx")
        build_lsh_index(spark, SF, plain)
        build_lsh_index(spark, SF, tx, transactional=True)

        got_p, walls_p = _drain(spark, qglob, os.path.join(work, "cp"), plain)
        got_t, walls_t = _drain(spark, qglob, os.path.join(work, "ct"), tx)
        receipt["results_equal"] = got_p == got_t
        receipt["plain_batch_walls_sec"] = walls_p
        receipt["tx_single_segment_batch_walls_sec"] = walls_t
        receipt["tx_over_plain_ratio"] = round(
            sum(walls_t) / max(sum(walls_p), 1e-9), 2
        )

        # fragment the tx index: rebuild on the 80% slice + 4 appends,
        # so the manifest names 5 segments, then drain again
        shutil.rmtree(tx)
        build_lsh_index(spark, a_dir, tx, transactional=True)
        step = max(1, (n - cut) // 4)
        for lo in range(cut, n, step):
            batch = b.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + step)
            )
            append_lsh_index(batch, tx)
        receipt["tx_segments_after_appends"] = len(
            mf.dataset_segments(tx, "index")
        )
        got_f, walls_f = _drain(spark, qglob, os.path.join(work, "cf"), tx)
        receipt["tx_fragmented_batch_walls_sec"] = walls_f
        receipt["fragmented_results_equal"] = got_f == got_p

        compact_lsh_index(spark, tx)
        got_c, walls_c = _drain(spark, qglob, os.path.join(work, "cc"), tx)
        receipt["tx_compacted_batch_walls_sec"] = walls_c
        receipt["compacted_results_equal"] = got_c == got_p
        receipt["passed"] = (
            receipt["results_equal"]
            and receipt["fragmented_results_equal"]
            and receipt["compacted_results_equal"]
            and receipt["tx_over_plain_ratio"] <= 1.5
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(receipt)
    print(line)
    if OUT:
        with open(OUT, "w") as fh:
            fh.write(line + "\n")
    return 0 if receipt["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
