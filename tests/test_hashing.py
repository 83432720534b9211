"""Cross-engine hash64 contract: the md5-derived 60-bit hash MUST be
bit-identical between Spark and DuckDB — every value-checked hash-
bucketed operator (SimHash, winnowing, mixture sampling, train
shuffle) rests on this. Checked over adversarial and random inputs in
one batch per engine (not per-example, to keep the test fast)."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from fintech_etl_spark.functions.hashing import HASH64_BITS, hash64, hash64_sql


def _cases() -> list[str]:
    rng = random.Random(42)
    fixed = [
        "",
        " ",
        "a",
        "hello world",
        "ünïcødé ƒtèxt",  # multi-byte utf-8
        "line\nbreak\ttab",
        "0" * 500,
        "'; DROP TABLE x; --",
        '"quoted"',
        "back\\slash",
    ]
    rand = [
        "".join(rng.choices(string.printable, k=rng.randint(1, 80)))
        for _ in range(60)
    ]
    return fixed + rand


@pytest.mark.parametrize("seed", [None, 0, 7, 63])
def test_hash64_bit_identical_across_engines(spark, seed):
    vals = _cases()
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got_spark = [
        r.h for r in df.select(hash64("x", seed=seed).alias("h")).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, x VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {hash64_sql('x', seed=seed)} FROM t ORDER BY i"
        ).fetchall()
    ]

    assert got_spark == got_duck
    # 60-bit means strictly non-negative and below 2^60 — no ANSI
    # overflow is possible on either side
    assert all(0 <= h < (1 << HASH64_BITS) for h in got_spark)


def test_hash64_null_propagates(spark):
    df = spark.createDataFrame([(None,), ("x",)], "x string")
    rows = df.select(hash64("x", seed=1).alias("h")).collect()
    assert [r.h is None for r in rows] == [True, False]
