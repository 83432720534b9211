"""Distributed exact global ranking — no single-partition WindowExec.

``row_number() OVER (ORDER BY …)`` / ``ntile(k) OVER (ORDER BY …)``
with an empty PARTITION BY compile to a WindowExec behind an
``Exchange SinglePartition`` — every row funnels through ONE task.
Correct at any scale, catastrophic at lake scale (10⁸⁺ entity rows
through one reducer; the round-7 audit flagged exactly four such
plans). These helpers compute the SAME exact values with the standard
distributed recipe:

1. ``repartitionByRange`` on the order keys — partition *i* holds
   rows that sort strictly before partition *i+1* (ties can't split
   across partitions when the key set is unique, which every caller
   guarantees via an explicit tie-break column).
2. ``sortWithinPartitions`` + ``monotonically_increasing_id()`` —
   the id is ``pid·2³³ + position``, so within a partition the sorted
   position is ``id − min(id)``; no second full-data shuffle for a
   pid-partitioned window.
3. A per-partition side table (count, min-id) — at most
   ``shuffle.partitions`` rows — turned into exclusive prefix offsets
   with a broadcast self-join (O(P²) on P≈32 rows; deliberately NOT a
   window so the plan stays WindowExec-free), then broadcast back.

``global rank = offset(pid) + (id − min_id(pid)) + 1`` — exact,
bit-identical to the single-partition window, and every stage is
parallel: the only full-data movement is the one range exchange.

The sorted frame is consumed three times, so it sits behind an
injectable materialization barrier (``barrier=`` — reliable
``checkpoint`` when a checkpoint dir is set, executor-local otherwise;
see :func:`_barrier` for the executor-loss semantics of each option).

ntile derives from exact rank + total count with the SQL-standard
fill (first ``n mod k`` tiles get ``⌈n/k⌉`` rows) so Spark and DuckDB
tile identically.

Reference parity note: the reference engine has no analytics surface
at all (it is a 1.1k-line pandas microservice — see
/root/reference/stream/processor.py); this module exists for the
lake-scale gap-fill registry, not for reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _order_cols(order_by) -> list:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def _barrier(d: DataFrame, strategy: str) -> DataFrame:
    """Materialization barrier for the ranked frame (consumed three
    times: main branch + both sides of the offset self-join). Without
    one, every consumer duplicates the entire upstream lineage — nested
    calls grow the plan 3^depth (the un-checkpointed RFM plan was 658
    nodes) — and re-runs the range exchange.

    The strategy semantics (auto|reliable|local|persist|none) live in
    :mod:`fintech_etl_spark.barrier` — the policy is shared with every
    other multiply-consumed frame in the engine (e.g. the IVF-PQ append
    assignment), so a configured checkpoint dir upgrades them all at
    once. ``persist`` here is recompute-safe: the range sort is
    deterministic on a total order, so ``monotonically_increasing_id``
    recomputes identically on executor loss.
    """
    from fintech_etl_spark.barrier import materialization_barrier

    return materialization_barrier(d, strategy)


def global_row_number(
    df: DataFrame,
    order_by,
    out: str = "rk",
    total: str | None = None,
    num_parts: int | None = None,
    partition_by: list[str] | None = None,
    barrier: str = "auto",
    max_side_rows: int = 4_000_000,
) -> DataFrame:
    """Exact global ``row_number() OVER ([PARTITION BY partition_by]
    ORDER BY order_by)`` as a parallel plan (one range exchange; no
    WindowExec at all). ``barrier`` picks the materialization strategy
    for the thrice-consumed ranked frame — see :func:`_barrier` for the
    fault-tolerance semantics of each option.

    ``order_by`` must be a total order within a partition group
    (include a unique tie-break column) — otherwise range-partition
    boundaries could split a tie group and the recomposed rank would
    disagree with a single-sort rank. ``total`` optionally adds a
    column carrying COUNT(*) over the frame (per group when
    ``partition_by`` is set) — broadcast, no extra pass.

    ``partition_by`` is for the SKEWED-FEW-GROUPS case (an ordinary
    ``Window.partitionBy`` puts each group through one task — fine for
    millions of small groups, fatal when one group is 10⁹ rows): rows
    range-partition on (groups, order keys) so every group's rows
    spread over many partitions, and the offset side table is
    per-(partition, group) — bounded by partitions × |groups|, so keep
    |groups| small enough to broadcast (≤ ~10⁵). The bound is ENFORCED:
    if the side table exceeds ``max_side_rows`` the call raises loudly
    instead of silently broadcasting an exploding offset table. For
    high-cardinality grouping use a plain partitioned window instead.
    """
    spark = df.sparkSession
    n = int(
        num_parts
        or spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    groups = list(partition_by or [])
    cols = _order_cols(list(groups) + list(order_by))
    d = _barrier(
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id()),
        barrier,
    )
    side = d.groupBy("_pid", *groups).agg(
        F.count(F.lit(1)).alias("_cnt"), F.min("_mid").alias("_min")
    )
    if groups:
        # Loud guard on the broadcast bound: the grouped offset table is
        # partitions × |groups| rows and rides a broadcast self-join; a
        # caller with 10⁷ groups would otherwise silently build an
        # exploding side table. The count() also materializes the lazy
        # barrier, so the two side consumers below read the checkpoint
        # instead of re-running the range exchange. (Deliberately NOT a
        # persist: caching `side` would re-print its agg subtree under
        # both self-join references and obscure the real plan.)
        n_side = side.count()
        if n_side > max_side_rows:
            raise ValueError(
                f"global_row_number(partition_by={groups}): offset side "
                f"table has {n_side} rows, over max_side_rows="
                f"{max_side_rows}. The grouped recipe broadcasts "
                "partitions × |groups| offset rows and is built for "
                "SKEWED-FEW-GROUPS; with this many groups every group is "
                "small enough for a plain Window.partitionBy window — "
                "use that instead (see agg_percentiles_grouped_window)."
            )
    # Exclusive prefix sum over ≤ num_parts × |groups| rows: a
    # broadcast triangular self-join (per group when partitioned)
    # instead of an ORDER BY window, so the whole plan is
    # WindowExec-free. The cross side is the same tiny frame.
    a, b = side.alias("a"), F.broadcast(side.alias("b"))
    same_group = [F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}")) for g in groups]
    cond = same_group[0] if same_group else F.lit(True)
    for c in same_group[1:]:
        cond = cond & c
    offs = (
        a.join(b, cond, how="inner")
        .groupBy(
            F.col("a._pid").alias("_pid"),
            F.col("a._min").alias("_min"),
            *[F.col(f"a.{g}").alias(g) for g in groups],
        )
        .agg(
            F.sum(
                F.when(F.col("b._pid") < F.col("a._pid"), F.col("b._cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("_off"),
            F.sum("b._cnt").alias("_tot"),
        )
    )
    # null-safe on the group columns: groupBy kept NULL groups as real
    # groups, and a plain equi-join here would silently drop their rows
    left, right = d.alias("l"), F.broadcast(offs.alias("r"))
    jc = F.col("l._pid") == F.col("r._pid")
    for g in groups:
        jc = jc & F.col(f"l.{g}").eqNullSafe(F.col(f"r.{g}"))
    sel = [F.col(f"l.{c}") for c in df.columns]
    sel.append(
        (F.col("r._off") + (F.col("l._mid") - F.col("r._min")) + F.lit(1))
        .cast("long")
        .alias(out)
    )
    if total is not None:
        sel.append(F.col("r._tot").alias(total))
    return left.join(right, jc).select(*sel)


def ntile_from_rank(rk: Column, n: Column, k: int) -> Column:
    """SQL-standard NTILE(k) from an exact 1-based global rank ``rk``
    and total row count ``n``: the first ``n mod k`` tiles take
    ``n div k + 1`` rows, the rest take ``n div k`` (matches both
    Spark's and DuckDB's ntile bit-for-bit)."""
    # exact integer division for non-negative longs: (a - a%b) is an
    # exact multiple of b, so the double division is exact up to 2⁵³
    # (a bare a/b can round the wrong way near huge exact integers)
    idiv = lambda a, b: ((a - a % b) / b).cast("long")  # noqa: E731
    q = idiv(n, F.lit(k))
    r = n - q * F.lit(k)
    boundary = r * (q + F.lit(1))
    head = idiv(rk - F.lit(1), q + F.lit(1)) + F.lit(1)
    tail = r + idiv(rk - F.lit(1) - boundary, q) + F.lit(1)
    return F.when(rk <= boundary, head).otherwise(tail).cast("int")


def global_ntile(
    df: DataFrame,
    order_by,
    k: int,
    out: str,
    num_parts: int | None = None,
    partition_by: list[str] | None = None,
    barrier: str = "auto",
    max_side_rows: int = 4_000_000,
) -> DataFrame:
    """Exact global ``ntile(k) OVER ([PARTITION BY …] ORDER BY
    order_by)`` via :func:`global_row_number` — same values as the
    window, fully parallel plan."""
    ranked = global_row_number(
        df,
        order_by,
        out="_gnt_rk",
        total="_gnt_n",
        num_parts=num_parts,
        partition_by=partition_by,
        barrier=barrier,
        max_side_rows=max_side_rows,
    )
    return ranked.withColumn(
        out, ntile_from_rank(F.col("_gnt_rk"), F.col("_gnt_n"), k)
    ).drop("_gnt_rk", "_gnt_n")
