"""Physical-layout operators: Z-order (Morton-curve) clustering.

The lake-scale problem: parquet scans skip files/row-groups via
column min/max statistics, but data sorted by ONE key gives tight
stats only for that key — a predicate on a second column prunes
nothing. Interleaving the bits of k columns into one Morton z-value
and range-partitioning + sorting on it gives every file a compact
HYPER-RECTANGLE of the key space, so a box predicate on ANY of the
interleaved columns skips most files (the technique behind Delta/
Iceberg `OPTIMIZE ZORDER BY`; Morton 1966 — public literature).

Everything is exact BIGINT arithmetic shared verbatim between Spark
and the DuckDB oracle: each key is min-max scaled to ``bits`` with
integer math — ``(k − min) · (2^bits − 1) div (max − min)`` — then the
scaled keys' bits interleave with shifts/masks. No UDFs, no doubles,
no engine-specific rounding.

The reference engine has no layout surface at all (CSV-in, JSON-out —
/root/reference/stream/processor.py); this is lake-scale gap-fill,
same as the rest of the analytics registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table

#: curve resolution: 12 bits/key → a 4096×4096 grid, 24-bit z-values.
_Z_BITS = 12


def scaled_expr(
    col: str, lo: str, hi: str, bits: int = _Z_BITS, idiv: str = "div"
) -> str:
    """SQL text mapping ``col`` from [lo, hi] onto [0, 2^bits) with
    exact integer math. The ONLY engine-divergent token is the integer
    division spelling (Spark ``div``, DuckDB ``//``) — passed in as
    ``idiv`` so the arithmetic itself is shared verbatim; the
    ``greatest`` guards the degenerate single-value column."""
    return (
        f"(cast({col} as bigint) - cast({lo} as bigint)) * {(1 << bits) - 1} "
        f"{idiv} greatest(cast({hi} as bigint) - cast({lo} as bigint), 1)"
    )


def interleave_expr(xs: list[str], bits: int = _Z_BITS) -> str:
    """SQL text interleaving the low ``bits`` of each expression in
    ``xs`` into one Morton z-value: bit i of column c lands at
    position ``i·len(xs) + c`` (column 0 owns the least-significant
    lane). Pure shifts/masks/ors — identical semantics both engines."""
    n = len(xs)
    # every term FULLY parenthesized: shift/and/or precedence differs
    # between engines (DuckDB binds | tighter than <<)
    terms = [
        f"(((({x}) >> {i}) & 1) << {i * n + c})"
        for i in range(bits)
        for c, x in enumerate(xs)
    ]
    return "(" + " | ".join(terms) + ")"


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    out: str = "z",
    bits: int = _Z_BITS,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Add the Morton z-value of ``cols`` (min-max scaled per column —
    one tiny agg pass collects the bounds, then the curve is a pure
    projection). Pass ``bounds`` ({col: (lo, hi)}) to scale against
    FROZEN bounds instead (the incremental-append path): values
    outside the frozen range clamp to the curve's edge cells, so a
    batch that drifts past the layout-time min/max still lands on the
    curve (re-clustering refreshes the bounds)."""
    if bounds is None:
        agg = df.agg(
            *[F.min(c).cast("long").alias(f"lo_{c}") for c in cols],
            *[F.max(c).cast("long").alias(f"hi_{c}") for c in cols],
        ).first()
        # fail here with the real cause: interpolating a None bound
        # would emit the bare token `None` into the SQL and surface as
        # an unresolved-identifier AnalysisException far from this call
        missing = [c for c in cols if agg[f"lo_{c}"] is None]
        if missing:
            raise ValueError(
                "with_zvalue: no min/max bounds for column(s) "
                f"{missing} — input is empty or the column is all-NULL; "
                "z-ordering needs at least one non-NULL value per key"
            )
        bounds = {c: (agg[f"lo_{c}"], agg[f"hi_{c}"]) for c in cols}
        clamp = False
    else:
        clamp = True  # frozen bounds: out-of-range keys hit edge cells
    # scale into named intermediates FIRST so the interleave's 2·bits
    # terms reference a plain column, not 2·bits copies of the division
    d = df
    names = []
    for c in cols:
        names.append(f"_zs_{c}")
        lo, hi = bounds[c]
        expr = scaled_expr(c, str(lo), str(hi), bits)
        if clamp:
            expr = f"least(greatest({expr}, 0), {(1 << bits) - 1})"
        d = d.withColumn(names[-1], F.expr(expr))
    return d.withColumn(out, F.expr(interleave_expr(names, bits))).drop(*names)


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = _Z_BITS,
    num_files: int = 32,
) -> int:
    """Write ``df`` as ``num_files`` parquet files clustered along the
    Morton curve of ``cols``: range-partition + sort on the z-value,
    drop it, write. Each output file then covers a compact box of the
    key space, so min/max stats prune it for predicates on ANY of the
    interleaved columns — pinned by the footer-stats pruning test in
    tests/test_layout.py and receipted at sf0.1
    (SCALE_RECEIPT_r09_zorder.json). Returns the row count.

    The layout's scaling bounds are persisted in a ``_zbounds.json``
    sidecar (underscore-prefixed — invisible to parquet reads) so
    :func:`zorder_append` can cluster LATER batches against the same
    frozen curve."""
    import json
    import os

    agg = df.agg(
        *[F.min(c).cast("long").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"hi_{c}") for c in cols],
    ).first()
    missing = [c for c in cols if agg[f"lo_{c}"] is None]
    if missing:
        raise ValueError(
            f"zorder_write: no bounds for {missing} — empty input or "
            "all-NULL key column"
        )
    bounds = {c: (agg[f"lo_{c}"], agg[f"hi_{c}"]) for c in cols}
    z = with_zvalue(df, cols, out="_z", bits=bits, bounds=bounds)
    (
        z.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    with open(os.path.join(path, "_zbounds.json"), "w") as fh:
        json.dump({"cols": cols, "bits": bits, "bounds": bounds}, fh)
    return df.sparkSession.read.parquet(path).count()


def zorder_append(df: DataFrame, path: str, num_files: int = 4) -> int:
    """Incremental Z-order maintenance — the layout twin of the ANN
    index append contract (frozen parameters, batch-proportional
    cost): cluster a NEW batch along the EXISTING layout's curve
    (bounds frozen in the ``_zbounds.json`` sidecar
    :func:`zorder_write` leaves) and append it as ``num_files``
    box-compact files. Nothing from the existing layout is read or
    rewritten — cost is linear in the BATCH — and footer-stats pruning
    is per-file, so the appended files prune exactly like the
    originals (pinned by tests/test_layout.py). Keys that drift past
    the frozen bounds clamp to the curve's edge cells (their files
    stay prunable for in-range predicates; a periodic
    :func:`zorder_write` re-cluster refreshes the bounds — the same
    rhythm as index compaction). Returns appended row count."""
    import json
    import os

    sidecar = os.path.join(path, "_zbounds.json")
    if not os.path.exists(sidecar):
        raise ValueError(
            f"zorder_append: {path!r} has no _zbounds.json sidecar — "
            "the layout predates frozen-bounds support (or is not a "
            "zorder_write layout); re-cluster it with zorder_write "
            "once to record the curve bounds"
        )
    with open(sidecar) as fh:
        meta = json.load(fh)
    bounds = {c: tuple(v) for c, v in meta["bounds"].items()}
    z = with_zvalue(
        df, meta["cols"], out="_z", bits=meta["bits"], bounds=bounds
    )
    (
        z.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("append")
        .parquet(path)
    )
    return df.count()


_Z_ORACLE = f"""
    WITH b AS (SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
                      min(l_suppkey) AS slo, max(l_suppkey) AS shi
               FROM lineitem),
    sc AS (SELECT {scaled_expr('l_partkey', 'plo', 'phi', idiv='//')} AS sp,
                  {scaled_expr('l_suppkey', 'slo', 'shi', idiv='//')} AS ss,
                  l_partkey, l_suppkey
           FROM lineitem CROSS JOIN b),
    zv AS (SELECT {interleave_expr(['sp', 'ss'])} AS z, l_partkey, l_suppkey
           FROM sc)
    SELECT CAST(z >> {2 * _Z_BITS - 8} AS BIGINT) AS z_bucket,
           CAST(count(*) AS BIGINT)   AS n,
           CAST(min(l_partkey) AS BIGINT) AS part_lo,
           CAST(max(l_partkey) AS BIGINT) AS part_hi,
           CAST(min(l_suppkey) AS BIGINT) AS supp_lo,
           CAST(max(l_suppkey) AS BIGINT) AS supp_hi
    FROM zv GROUP BY z_bucket
"""


@register(
    "layout_zorder_buckets",
    _Z_ORACLE,
    doc=(
        "Morton (Z-order) clustering profile of lineitem on "
        "(l_partkey, l_suppkey): min-max scale each key to 12 bits "
        "with exact integer division, interleave into a 24-bit "
        "z-value, and report per-top-8-bit-bucket row counts and the "
        "min/max box of BOTH keys — the statistics a z-clustered "
        "writer's file footers would carry, demonstrating that every "
        "curve bucket is a compact hyper-rectangle (tight stats on "
        "ALL interleaved columns at once, which is exactly why a box "
        "predicate on either key prunes most files at 100 TB; "
        "single-key sorting gives this for one column only). The "
        "interleave/scale SQL text is generated once and shared "
        "verbatim with the DuckDB oracle — no UDF, no doubles. "
        "zorder_write materializes the layout itself; footer-stats "
        "pruning pinned in tests/test_layout.py."
    ),
    tags=("layout", "scale"),
)
def layout_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    z = with_zvalue(li, ["l_partkey", "l_suppkey"])
    return z.groupBy(
        F.shiftright(F.col("z"), 2 * _Z_BITS - 8).cast("long").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_partkey").cast("long").alias("part_lo"),
        F.max("l_partkey").cast("long").alias("part_hi"),
        F.min("l_suppkey").cast("long").alias("supp_lo"),
        F.max("l_suppkey").cast("long").alias("supp_hi"),
    )


# the end-to-end box query: the center box [3/8, 5/8] of each key's
# range, derived with the SAME integer arithmetic on both engines
# (Python // on positive spans ≡ Spark div ≡ DuckDB //)
_ZQ_ORACLE = """
    WITH b AS (SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
                      min(l_suppkey) AS slo, max(l_suppkey) AS shi
               FROM lineitem),
    box AS (SELECT (plo + (((phi - plo) * 3) // 8)) AS p_lo,
                   (plo + (((phi - plo) * 5) // 8)) AS p_hi,
                   (slo + (((shi - slo) * 3) // 8)) AS s_lo,
                   (slo + (((shi - slo) * 5) // 8)) AS s_hi
            FROM b)
    SELECT CAST(count(*) AS BIGINT)        AS n,
           round(sum(l_quantity), 4)       AS sum_qty,
           round(sum(l_extendedprice), 4)  AS sum_price,
           CAST(min(l_orderkey) AS BIGINT) AS first_order,
           CAST(max(l_orderkey) AS BIGINT) AS last_order
    FROM lineitem CROSS JOIN box
    WHERE l_partkey BETWEEN p_lo AND p_hi
      AND l_suppkey BETWEEN s_lo AND s_hi
"""


@register(
    "layout_zorder_box_query",
    _ZQ_ORACLE,
    doc=(
        "End-to-end Z-order scan: zorder_write materializes lineitem "
        "as 32 parquet files clustered on the Morton curve of "
        "(l_partkey, l_suppkey), then a box predicate spanning the "
        "center quarter of BOTH key ranges is answered FROM THE "
        "Z-CLUSTERED LAYOUT — the read path a stats-aware scan prunes "
        "(each file covers a compact hyper-rectangle, so most files' "
        "footer min/max exclude the box; admitted-file counts receipted "
        "in SCALE_RECEIPT_r10_zorder_query.json and pinned by "
        "tests/test_layout.py). The oracle runs the same box query on "
        "the raw table: the layout is a physical detail, so the "
        "answers must match exactly — proving the clustered write is "
        "lossless AND the pruned scan is correct. Box bounds derive "
        "from min/max with shared integer arithmetic (Python // ≡ "
        "Spark div ≡ DuckDB //)."
    ),
    tags=("layout", "scale"),
)
def layout_zorder_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
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

    # materialize the clustered layout (idempotent overwrite, one path
    # per sf_dir) and answer the box from IT, not from the source table
    path = os.path.join(
        tempfile.gettempdir(),
        "fintech_etl_zbox_"
        + hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    zorder_write(li, ["l_partkey", "l_suppkey"], path, num_files=32)
    z = spark.read.parquet(path)
    return z.filter(
        F.col("l_partkey").between(p_lo, p_hi)
        & F.col("l_suppkey").between(s_lo, s_hi)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.min("l_orderkey").cast("long").alias("first_order"),
        F.max("l_orderkey").cast("long").alias("last_order"),
    )
