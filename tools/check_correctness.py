"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark at sf0.01 and
the matching ``oracle_sql()`` in DuckDB on the same parquet files, then
compares row count, sorted column names, and an order-insensitive
value multiset (floats to 4 decimals, dates/timestamps ISO-rendered).

Usage:  python tools/check_correctness.py [name_substring ...]
        python tools/check_correctness.py --receipt[=PATH]

``--receipt`` writes the committed full-registry artifact
``CORRECTNESS_FULL_r{N}.json`` (N = newest driver
``CORRECTNESS_r*.json`` round + 1, i.e. the round in progress; or an
explicit PATH) — the per-round proof that EVERY registry row passes
its oracle, closing the blind spot of the driver's fixed 50-row
sample (the r11 judge's top item: 160 rows were never
driver-checked). Refused when include/exclude filters are active:
the receipt must cover the whole registry.
``tests/test_operators.py::test_full_registry_receipt_is_current_and_clean``
asserts the committed receipt covers the exact current registry with
zero failures and is no older than the newest driver artifact.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 4)
        return 0.0 if r == 0 else r  # -0.0 → 0.0
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: json.dumps(t, default=str))
    return sorted(cols), out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from fintech_etl_spark.session import build_session

    # positional args: include-substrings; "-name" args: exclude EXACT
    # query names ("-name*" excludes by prefix).  Exact-by-default so
    # "-q1" doesn't silently drop q10..q19; used to skip known-quadratic
    # ORACLES — brute-force pair joins — when sweeping large generated
    # sf_dirs (the Spark side scales, the DuckDB replay doesn't)
    args = sys.argv[1:]
    receipt_path = None
    want_receipt = False
    subset_receipt_path = None
    for a in list(args):
        if a == "--receipt" or a.startswith("--receipt="):
            want_receipt = True
            if "=" in a:
                receipt_path = a.split("=", 1)[1]
            args.remove(a)
        elif a.startswith("--subset-receipt="):
            # the sf0.1 lifecycle receipt (r12 verdict #5): a committed
            # artifact for a NAMED slice of the registry at a second
            # scale factor, so scale-dependent regressions in the
            # transactional/lifecycle rows are caught at round close
            # instead of only in a judge's ad-hoc spot-sweep. Unlike
            # --receipt it REQUIRES filters (the point is the slice)
            # and records the sf_dir it ran against.
            subset_receipt_path = a.split("=", 1)[1]
            args.remove(a)
    filters = [a for a in args if not a.startswith("-")]
    excludes = [a[1:] for a in args if a.startswith("-")]
    if want_receipt and (filters or excludes):
        print("--receipt requires a FULL run (no filters/excludes)")
        return 2
    if subset_receipt_path and not filters:
        print("--subset-receipt requires include filters (it records a slice)")
        return 2
    if want_receipt and receipt_path is None:
        import glob
        import re

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rounds = [
            int(m.group(1))
            for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
            if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(f)))
        ]
        # the newest driver artifact is last round's close → the round
        # in progress is +1
        receipt_path = os.path.join(
            repo, f"CORRECTNESS_FULL_r{max(rounds, default=0) + 1:02d}.json"
        )

    def _excluded(name: str) -> bool:
        return any(
            name.startswith(e[:-1]) if e.endswith("*") else name == e
            for e in excludes
        )

    spark = build_session("check_correctness")
    con = duckdb.connect()
    # Large generated sf_dirs can push iterative-unroll oracles
    # (pagerank) into spill; a bigger in-memory budget keeps the spill
    # off the (shared) disk. Default 64GiB fits this 128GiB box.
    con.execute(
        "SET memory_limit = '"
        + os.environ.get("SPARK_GRAFT_DUCKDB_MEM", "64GB")
        + "'"
    )
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    if excludes:
        skipped = sorted(n for n in qs if _excluded(n))
        print(f"excluded {len(skipped)}: {' '.join(skipped)}")
    for name, fn in sorted(qs.items()):
        if filters and not any(f in name for f in filters):
            continue
        if _excluded(name):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(exc)[:500]}
            n_fail += 1
            print(f"FAIL {name}: SPARK_ERROR {str(exc)[:200]}")
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
            print(f"  ok {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(exc)[:500]}
            n_fail += 1
            print(f"FAIL {name}: ORACLE_ERROR {str(exc)[:200]}")
            continue
        sc, sr = _norm_rows(scols, srows)
        dc, dr = _norm_rows(dcols, drows)
        status = "PASS"
        detail = ""
        if sc != dc:
            status, detail = "SCHEMA_MISMATCH", f"spark={sc} duck={dc}"
        elif len(sr) != len(dr):
            status, detail = "ROWCOUNT_MISMATCH", f"spark={len(sr)} duck={len(dr)}"
        elif sr != dr:
            status = "VALUE_MISMATCH"
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    detail = f"first diff row {i}: spark={a} duck={b}"
                    break
        results[name] = {
            "status": status,
            "rows": len(sr),
            "sec": round(time.time() - t0, 2),
            **({"detail": detail[:400]} if detail else {}),
        }
        if status == "PASS":
            n_pass += 1
            print(f"  ok {name}: {len(sr)} rows [{results[name]['sec']}s]")
        else:
            n_fail += 1
            print(f"FAIL {name}: {status} {detail[:250]}")

    print(f"\n{n_pass} pass, {n_fail} fail")
    with open("/tmp/check_correctness.json", "w") as f:
        json.dump(results, f, indent=1)
    if want_receipt:
        receipt = {
            "sf_dir": SF_DIR,
            "queries_total": len(results),
            "oracle_pass": n_pass,
            "rows_only": sum(
                1 for r in results.values() if r["status"] == "ROWS_ONLY"
            ),
            "fail": n_fail,
            "results": results,
        }
        with open(receipt_path, "w") as f:
            json.dump(receipt, f, indent=1)
        print(f"receipt -> {receipt_path}")
    if subset_receipt_path:
        receipt = {
            "sf_dir": SF_DIR,
            "filters": filters,
            "queries_total": len(results),
            "oracle_pass": n_pass,
            "rows_only": sum(
                1 for r in results.values() if r["status"] == "ROWS_ONLY"
            ),
            "fail": n_fail,
            "results": results,
        }
        with open(subset_receipt_path, "w") as f:
            json.dump(receipt, f, indent=1)
        print(f"subset receipt -> {subset_receipt_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
