"""Cross-engine deterministic hashing.

Spark's native ``xxhash64``/``hash`` (Murmur3) have no bit-identical
twin in other engines, which makes any query built on them impossible
to value-check against an ANSI-SQL oracle. ``hash64`` derives a 60-bit
integer hash from ``md5`` — which IS bit-identical across Spark,
DuckDB, Postgres, etc. — so hash-bucketed operators (SimHash,
winnowing, MinHash banding) can be verified end-to-end:

    Spark : conv(substring(md5(x), 1, 15), 16, 10)  → long
    DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

15 hex chars = 60 bits keeps the value strictly below 2^63, so the
ANSI cast to signed long can never overflow (16 chars could). The cost
is ~one md5 per input instead of one xxhash64 — fine for verification
paths and moderate-cardinality columns; keep xxhash64 for pure
in-engine bucketing where cross-engine parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH64_BITS = 60


def hash64(col: Column | str, seed: int | None = None) -> Column:
    """60-bit non-negative integer hash of a string column, bit-identical
    to :func:`hash64_sql`'s DuckDB expression. ``seed`` derives
    independent hash families (MinHash permutations) by prefixing the
    input; ``concat`` null-propagates in both engines, so null input →
    null hash either way."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB twin of :func:`hash64` (same bits, same nulls)."""
    e = f"('{seed}:' || {expr})" if seed is not None else expr
    return f"CAST(('0x' || substr(md5({e}), 1, 15)) AS BIGINT)"
