"""Regenerate the raw plan dumps behind PLANS.md.

Usage: python tools/dump_plans.py [query_name ...]
Prints the formatted physical plan tree + scan details (PushedFilters /
ReadSchema) for each named query (default: the PLANS.md set) at
$SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = (
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q5_region_revenue",
    "q18_large_volume_customers",
    "topk_orders_global",
    "dedup_minhash_lsh",
    "dedup_embedding_neardup",
    "ann_topk_cosine_brute",
    "events_salted_heavy_hitters",
    "graph_copurchase_pagerank",
    "audit_order_reconciliation",
)


def main() -> int:
    from fintech_etl_spark.registry import all_specs
    from fintech_etl_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(DEFAULT)
    spark = build_session("dump_plans")
    specs = all_specs()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        full = buf.getvalue()
        print(f"@@@ {name}")
        print(full.split("\n\n(")[0].strip())
        print("--- scan details")
        for line in full.splitlines():
            s = line.strip()
            if "PushedFilters" in s or "ReadSchema" in s:
                print(s[:220])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
