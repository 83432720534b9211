"""Dump per-query ``explain("formatted")`` files for a round's plan
evidence: one ``plans/r{N}/<query>_<tag>.txt`` per query, same raw
format as the committed ``_before`` captures.

Usage: python tools/dump_round_plans.py <round> <tag> [query ...]
       (default queries: every ``plans/r{N}/*_before.txt`` stem)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rnd, tag = sys.argv[1], sys.argv[2]
    plan_dir = os.path.join(REPO, "plans", f"r{rnd}")
    names = sys.argv[3:] or sorted(
        f[: -len("_before.txt")]
        for f in os.listdir(plan_dir)
        if f.endswith("_before.txt")
    )
    from fintech_etl_spark.registry import all_specs
    from fintech_etl_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("dump_round_plans")
    specs = all_specs()
    for name in names:
        if name not in specs:
            print(f"skip {name}: not in registry")
            continue
        try:
            df = specs[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(plan_dir, f"{name}_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {out}")
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            print(f"ERR {name}: {str(exc)[:200]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
