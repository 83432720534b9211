"""Transactional-layout receipt: the manifest layer's second client
must cost (almost) nothing at serving time and nothing meaningful at
write time — the same nil-overhead claim receipted for the ANN
datasets in SCALE_RECEIPT_r10_manifest_serving.json, now for z-order.

At the given scale dir, builds the SAME z-clustered lineitem layout
twice — plain directory vs manifest-backed (zorder_write
transactional=True) — appends a ~1% batch to each (plain parquet
append vs staged-segment add-commit), and answers the center box
query from both via read_zorder (plain: directory listing;
tx: pointer-resolved segment scan).

CLAIMS (exit 1 if violated):
1. results equal: box aggregates from plain and tx layouts match
   exactly, before and after the append;
2. write overhead bounded: tx build ≤ 1.5× plain build, tx append ≤
   2× plain append (the commit is a metadata step — microseconds —
   but small-wall ratios are noisy, hence the slack);
3. read overhead nil-ish: tx box-query wall ≤ 1.5× plain + 0.3 s
   (same parquet files; the extra pointer read + second listing root
   is a fixed few-hundred-ms of driver-side setup, so a sub-second
   box query needs the absolute term — at scale the ratio term
   governs).

Usage: python tools/zorder_tx_receipt.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else None
N_FILES = 32


def main() -> int:
    from pyspark.sql import functions as F

    from fintech_etl_spark.operators.layout import (
        read_zorder,
        zorder_append,
        zorder_write,
    )
    from fintech_etl_spark.session import build_session
    from fintech_etl_spark.sources.tables import load_table

    spark = build_session("zorder_tx_receipt")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    base = li.filter(F.col("l_orderkey") % 100 != 0)
    batch = li.filter(F.col("l_orderkey") % 100 == 0)
    b = li.agg(
        F.min("l_partkey").alias("plo"),
        F.max("l_partkey").alias("phi"),
        F.min("l_suppkey").alias("slo"),
        F.max("l_suppkey").alias("shi"),
    ).first()
    p_lo = b.plo + (b.phi - b.plo) * 3 // 8
    p_hi = b.plo + (b.phi - b.plo) * 5 // 8
    s_lo = b.slo + (b.shi - b.slo) * 3 // 8
    s_hi = b.slo + (b.shi - b.slo) * 5 // 8

    def box(path: str) -> tuple[tuple, float]:
        t0 = time.perf_counter()
        r = (
            read_zorder(spark, path)
            .filter(
                F.col("l_partkey").between(p_lo, p_hi)
                & F.col("l_suppkey").between(s_lo, s_hi)
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_quantity"), 4).alias("sq"),
                F.min("l_orderkey").alias("lo"),
                F.max("l_orderkey").alias("hi"),
            )
            .first()
        )
        return tuple(r), round(time.perf_counter() - t0, 3)

    work = tempfile.mkdtemp(prefix="ztx_")
    res: dict = {"metric": "zorder_transactional_overhead", "sf_dir": SF}
    try:
        walls: dict[str, float] = {}
        paths = {"plain": os.path.join(work, "p"), "tx": os.path.join(work, "t")}
        for mode, tx in (("plain", False), ("tx", True)):
            t0 = time.perf_counter()
            zorder_write(
                base,
                ["l_partkey", "l_suppkey"],
                paths[mode],
                num_files=N_FILES,
                transactional=tx,
            )
            walls[f"build_{mode}"] = round(time.perf_counter() - t0, 2)
        box0 = {m: box(p) for m, p in paths.items()}
        for mode in ("plain", "tx"):
            t0 = time.perf_counter()
            zorder_append(batch, paths[mode], num_files=2)
            walls[f"append_{mode}"] = round(time.perf_counter() - t0, 2)
        box1 = {m: box(p) for m, p in paths.items()}

        res.update(walls)
        res["box_pre_append"] = {m: list(v[0]) for m, v in box0.items()}
        res["box_post_append"] = {m: list(v[0]) for m, v in box1.items()}
        res["read_wall_plain"] = box1["plain"][1]
        res["read_wall_tx"] = box1["tx"][1]
        res["claims"] = {
            "results_equal_pre": box0["plain"][0] == box0["tx"][0],
            "results_equal_post": box1["plain"][0] == box1["tx"][0],
            "build_overhead_ok": walls["build_tx"]
            <= 1.5 * walls["build_plain"],
            "append_overhead_ok": walls["append_tx"]
            <= 2.0 * walls["append_plain"],
            "read_overhead_ok": box1["tx"][1]
            <= 1.5 * box1["plain"][1] + 0.3,
        }
        res["pass"] = all(res["claims"].values())
        line = json.dumps(res)
        print(line)
        if OUT:
            with open(OUT, "w") as f:
                f.write(line + "\n")
        return 0 if res["pass"] else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
