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


def _py_hash64(t: str) -> int:
    import hashlib

    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)


def test_simhash_hof_matches_python_reference(spark):
    """The round-4 single-fold SimHash (no explode, no groupBy) must
    reproduce the straightforward per-token Python computation exactly
    — the fast path earns no correctness discount. Random token lists
    plus adversarial shapes (single token, repeated token, empty-string
    token, unicode)."""
    import random

    from pyspark.sql import functions as F

    from fintech_etl_spark.operators.dedup import (
        _SIMHASH_BITS,
        simhash_fingerprints,
    )

    rng = random.Random(7)
    vocab = ["tok%d" % i for i in range(50)] + ["ü√é", "", "x"]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 40))))
        for i in range(40)
    ]
    docs += [(100, "solo"), (101, "dup dup dup dup"), (102, "ü√é ü√é x")]

    def py_sim(text: str) -> int:
        toks = text.lower().strip().split()
        votes = [0] * _SIMHASH_BITS
        for t in toks:
            h = _py_hash64(t)
            for i in range(_SIMHASH_BITS):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(_SIMHASH_BITS) if votes[i] > 0)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.sim
        for r in simhash_fingerprints(
            df, F.split(F.lower(F.trim("text")), r"\s+")
        ).collect()
    }
    # NB: python split() drops empty strings; spark split keeps them —
    # build the expected values from the SAME token lists spark sees
    import re

    want = {}
    for i, text in docs:
        toks = re.split(r"\s+", text.lower().strip())
        votes = [0] * _SIMHASH_BITS
        for t in toks:
            h = _py_hash64(t)
            for b in range(_SIMHASH_BITS):
                votes[b] += 1 if (h >> b) & 1 else -1
        want[i] = sum(1 << b for b in range(_SIMHASH_BITS) if votes[b] > 0)
    assert got == want


def test_minhash_hof_matches_python_reference(spark):
    """The single-pass 64-slot minhash fold must equal the naive
    per-permutation Python minimum over xxhash64(shingle, seed)."""
    from pyspark.sql import functions as F

    from fintech_etl_spark.operators.dedup import minhash_signature

    rows = [
        (1, ["a b c", "b c d", "c d e"]),
        (2, ["x y z"]),
        (3, ["a b c", "a b c"]),  # duplicate element
        (4, ["ü ü ü", ""]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s array<string>")
    got = {r.doc_id: list(r.sig) for r in df.select(
        "doc_id", minhash_signature("s").alias("sig")).collect()}
    # reference: spark's own xxhash64 per (shingle, seed), min per seed
    def perm_min(seed: int):
        # one-arg lambda on purpose: a two-arg transform lambda would
        # receive the ELEMENT INDEX as its second argument and silently
        # shadow the seed
        return F.array_min(F.transform("s", lambda g: F.xxhash64(g, F.lit(seed))))

    ref_rows = df.select(
        "doc_id",
        F.array(*[perm_min(i) for i in range(64)]).alias("sig"),
    ).collect()
    want = {r.doc_id: list(r.sig) for r in ref_rows}
    assert got == want


def test_aa_quantization_ln_parity_across_engines(spark):
    """Canary for graph_link_prediction_aa's scaled-integer AA terms:
    floor(1e12 / ln(deg)) must be the SAME BIGINT in Spark (JVM
    Math.log) and DuckDB (libm log) for every degree the operator can
    see (2..cap). The quantized sum is order-independent by
    construction; this pins the one residual cross-engine hazard — a
    last-ulp ln() difference straddling an integer boundary."""
    import duckdb

    from fintech_etl_spark.operators.graph_ops import _AA_DEG_CAP

    degs = list(range(2, _AA_DEG_CAP + 1))
    spark_vals = {
        r.d: r.q
        for r in spark.createDataFrame([(d,) for d in degs], "d int")
        .selectExpr("d", "CAST(floor(1e12 / ln(d)) AS BIGINT) AS q")
        .collect()
    }
    duck_vals = dict(
        duckdb.connect()
        .execute(
            "SELECT d, CAST(floor(1e12 / ln(d)) AS BIGINT) FROM "
            f"unnest(range(2, {_AA_DEG_CAP + 1})) AS t(d)"
        )
        .fetchall()
    )
    assert spark_vals == duck_vals


def test_dense_band_verify_bucket_cap_bounds_hot_template(spark):
    """The dense-tier bucket cap (production posture for single-
    template-hot corpora): a template stamped onto many docs forms one
    mega-bucket per band; with the cap those buckets sit out pair
    generation, while pairs OUTSIDE them are returned unchanged."""
    from pyspark.sql import functions as F

    from fintech_etl_spark.operators.dedup import (
        _dense_band_verify,
        minhash_signature_xxhash64,
    )

    hot = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)]
    cold = [
        (100, "one two three four five six seven eight nine ten"),
        (101, "one two three four five six seven eight nine ten"),
        (102, "totally different words appear in this document here"),
    ]
    docs = spark.createDataFrame(hot + cold, "doc_id long, text string")

    sig = minhash_signature_xxhash64("s")
    uncapped = _dense_band_verify(docs, sig)
    capped = _dense_band_verify(docs, sig, bucket_cap=8)

    got_un = {(r.doc_a, r.doc_b) for r in uncapped.collect()}
    got_cap = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # uncapped: the 40-clone template contributes C(40,2) = 780 pairs
    assert (100, 101) in got_un and len(got_un) == 780 + 1
    # capped: the mega-bucket sits out; the cold near-dup pair survives
    assert got_cap == {(100, 101)}
