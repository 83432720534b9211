"""Analytic function batteries: statistics, ordered aggregation,
percentiles, richer windows — the rest of the query surface a user of
a full engine expects (SURVEY §2.2 gap-fill, M3).

Every query is a thin named plan over the star schema with a DuckDB
oracle; cross-engine hash stability rules from registry.py apply
(round(…,4), pinned integer widths, shared aliases, keyed tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fintech_etl_spark.barrier import materialization_barrier
from fintech_etl_spark.operators.ranking import global_ntile, global_row_number
from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table


def _r4(c: F.Column) -> F.Column:
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# Statistical aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_stats_battery",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_extendedprice), 4)    AS var_price,
           round(corr(l_extendedprice, l_quantity), 4)        AS corr_price_qty,
           round(covar_samp(l_extendedprice, l_quantity), 4)  AS covar_price_qty,
           round(min(l_extendedprice), 4)         AS min_price,
           round(max(l_extendedprice), 4)         AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Sample stddev/variance/correlation/covariance per group — one partial+final agg pass.",
    tags=("agg", "stats"),
)
def agg_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _r4(F.stddev_samp("l_extendedprice")).alias("sd_price"),
        _r4(F.var_samp("l_extendedprice")).alias("var_price"),
        _r4(F.corr("l_extendedprice", "l_quantity")).alias("corr_price_qty"),
        _r4(F.covar_samp("l_extendedprice", "l_quantity")).alias("covar_price_qty"),
        _r4(F.min("l_extendedprice")).alias("min_price"),
        _r4(F.max("l_extendedprice")).alias("max_price"),
    )


@register(
    "agg_percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "Exact interpolated percentiles per group (Spark percentile ≡ "
        "DuckDB quantile_cont). At 100 TB the approx_percentile sketch "
        "variant below trades exactness for a mergeable fixed-size state."
    ),
    tags=("agg", "stats"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.array(*[F.lit(x) for x in _QUANTS]))
    return orders.groupBy("o_orderpriority").agg(
        _r4(F.element_at(pct, 1)).alias("p25"),
        _r4(F.element_at(pct, 2)).alias("p50"),
        _r4(F.element_at(pct, 3)).alias("p75"),
        _r4(F.element_at(pct, 4)).alias("p95"),
    )


_QUANTS = (0.25, 0.5, 0.75, 0.95)


@register(
    "agg_percentiles_grouped_window",
    """
    SELECT o_custkey,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           CAST(count(*) AS BIGINT)                    AS n
    FROM orders GROUP BY o_custkey
    """,
    doc=(
        "Exact per-group quantiles for the MANY-SMALL-GROUPS case — "
        "the third leg of the exact-quantile decision table. Grouping "
        "by customer means millions of groups, each holding a handful "
        "of orders, so the per-group aggregation buffer (Spark's exact "
        "percentile() holds one group's values) is bounded by the "
        "largest GROUP, not the lake, and the single hash exchange "
        "spreads groups across every reducer — the plain partitioned "
        "form a Window.partitionBy percentile would compute, minus the "
        "window's per-row emission and extra distinct. Decision table: "
        "FEW-HUGE groups → agg_percentiles_distributed_exact (grouped "
        "distributed ranking; a group outgrows any one buffer); "
        "MANY-SMALL groups → this (buffer ≤ max group size); unknown "
        "mix or one-pass-many-quantiles → approx_percentile sketch "
        "(agg_approx_sketches). Picking a tier is a data-shape "
        "question, not a semantics question — all three agree exactly "
        "or within sketch bounds."
    ),
    tags=("agg", "stats", "window"),
)
def agg_percentiles_grouped_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile(
        "o_totalprice", F.array(*[F.lit(x) for x in _QUANTS])
    )
    return orders.groupBy("o_custkey").agg(
        _r4(F.element_at(pct, 1)).alias("p25"),
        _r4(F.element_at(pct, 2)).alias("p50"),
        _r4(F.element_at(pct, 3)).alias("p75"),
        _r4(F.element_at(pct, 4)).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_percentiles_distributed_exact",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           CAST(count(*) AS BIGINT)                    AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "Exact per-group quantile_cont for the SKEWED-FEW-GROUPS case "
        "via grouped distributed ranking (operators/ranking.py "
        "partition_by): orders has 5 priorities, so at 100 TB both the "
        "built-in percentile() aggregate (one buffer holding a fifth "
        "of the lake per group) and a Window.partitionBy (one TASK per "
        "group) funnel ~10⁹ rows through five reducers. Here rows "
        "range-partition on (priority, price) — every group spreads "
        "over many partitions — per-(partition, group) offsets rebuild "
        "exact in-group ranks, only the ≤8 boundary ranks per group "
        "survive, and lower + (upper−lower)·frac replays "
        "quantile_cont. agg_percentiles keeps the built-in-aggregate "
        "form as the oracle-parity twin; approx_percentile remains the "
        "many-groups sketch tier."
    ),
    tags=("agg", "stats", "window"),
)
def agg_percentiles_distributed_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        "o_orderpriority", F.col("o_totalprice").alias("v"), "o_orderkey"
    )
    ranked = global_row_number(
        vals,
        [F.col("v").asc(), F.col("o_orderkey").asc()],
        out="rk",
        total="n",
        partition_by=["o_orderpriority"],
    )
    idx = F.col("rk") - 1
    n1 = (F.col("n") - 1).cast("double")
    keep = None
    for q in _QUANTS:
        hit = (idx == F.floor(n1 * q)) | (idx == F.ceil(n1 * q))
        keep = hit if keep is None else (keep | hit)
    b = ranked.filter(keep)

    def interp(q: float):
        h = n1 * q
        lo = F.max(F.when(idx == F.floor(h), F.col("v")))
        hi = F.max(F.when(idx == F.ceil(h), F.col("v")))
        frac = F.max(h - F.floor(h))
        return F.round(lo + (hi - lo) * frac, 4)

    return b.groupBy("o_orderpriority").agg(
        interp(0.25).alias("p25"),
        interp(0.5).alias("p50"),
        interp(0.75).alias("p75"),
        interp(0.95).alias("p95"),
        F.max("n").alias("n"),
    )


@register(
    "agg_quantiles_distributed_exact",
    """
    SELECT round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
           CAST(count(*) AS BIGINT)                    AS n
    FROM orders
    """,
    doc=(
        "EXACT ungrouped quantile_cont over the whole order book via "
        "distributed ranking (operators/ranking.py) — the lake-scale "
        "exact path. Spark's percentile() on an ungrouped frame is a "
        "single aggregation buffer holding EVERY value (the same "
        "one-task failure mode as an unpartitioned window, just hidden "
        "inside an agg); here the values are globally ranked by one "
        "range exchange, only the ≤8 boundary ranks are kept, and the "
        "interpolation lower + (upper−lower)·frac with h = (n−1)·q "
        "replays the exact quantile_cont/percentile formula both "
        "engines share. The approx_percentile sketch stays the "
        "mergeable-state twin for when one pass must serve many "
        "quantiles per group."
    ),
    tags=("agg", "stats", "window"),
)
def agg_quantiles_distributed_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(F.col("o_totalprice").alias("v"), "o_orderkey")
    ranked = global_row_number(
        vals, [F.col("v").asc(), F.col("o_orderkey").asc()], out="rk", total="n"
    )
    # h = (n−1)·q; keep only rows whose 0-based rank is floor(h) or
    # ceil(h) for SOME q — ≤ 2·|Q| rows survive into the final agg
    idx = F.col("rk") - 1
    n1 = (F.col("n") - 1).cast("double")
    keep = None
    for q in _QUANTS:
        hit = (idx == F.floor(n1 * q)) | (idx == F.ceil(n1 * q))
        keep = hit if keep is None else (keep | hit)
    b = ranked.filter(keep)

    def interp(q: float):
        h = n1 * q
        lo = F.max(F.when(idx == F.floor(h), F.col("v")))
        hi = F.max(F.when(idx == F.ceil(h), F.col("v")))
        frac = F.max(h - F.floor(h))
        return F.round(lo + (hi - lo) * frac, 4)

    return b.agg(
        interp(0.25).alias("p25"),
        interp(0.5).alias("p50"),
        interp(0.75).alias("p75"),
        interp(0.95).alias("p95"),
        F.max("n").alias("n"),
    )


# ---------------------------------------------------------------------------
# exact_quantiles: the auto-tier picker over the quantile decision table
# ---------------------------------------------------------------------------


def _q_alias(q: float) -> str:
    """0.25 → p25, 0.975 → p97_5 — stable column names both tiers share."""
    return ("p%g" % (q * 100)).replace(".", "_")


def _pick_quantile_tier(
    n_groups: int,
    max_group: int,
    *,
    max_groups_for_ranking: int,
    max_group_rows_for_agg: int,
) -> str:
    """The decision table as a pure function (unit-tested directly):

    - max group fits one aggregation buffer → ``"agg"`` (plain hash
      agg; Spark's exact percentile() buffers ONE group's values, so
      the bound is the largest group, not the lake);
    - else, few enough groups for the grouped-ranking offset table →
      ``"ranking"`` (each huge group spreads over the range exchange);
    - else (many groups AND a huge group) → ``"sketch"`` — no exact
      plan is shuffle-safe, so fall back to approx_percentile and say
      so loudly.
    """
    if max_group <= max_group_rows_for_agg:
        return "agg"
    if n_groups <= max_groups_for_ranking:
        return "ranking"
    return "sketch"


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = _QUANTS,
    by: list[str] | None = None,
    *,
    max_groups_for_ranking: int = 100_000,
    max_group_rows_for_agg: int = 20_000_000,
    barrier: str = "auto",
    tier: str | None = None,
) -> DataFrame:
    """Exact interpolated quantiles with the scale-safe plan picked
    from the data's shape, so callers get the right tier without
    reading the decision table spelled out across
    ``agg_percentiles_grouped_window`` / ``agg_percentiles_
    distributed_exact`` / ``agg_quantiles_distributed_exact``.

    Ungrouped (``by=None``): always the distributed-ranking recipe
    (one range exchange; the built-in percentile() would buffer every
    value in one task). Grouped: two cheap probe aggregates (|groups|
    and max group size — one groupBy count, rows out ≤ |groups|)
    choose per :func:`_pick_quantile_tier`; pass ``tier=`` to skip the
    probe and force one. The sketch tier emits a ``UserWarning``
    because it is no longer exact (±accuracy rank error) — it exists
    for the shape where NO exact plan bounds memory: more groups than
    the ranking offset table holds AND a group too big for one buffer.

    All tiers return the same schema — ``by`` columns, one ``p{q}``
    column per quantile (``round(…, 4)``, quantile_cont semantics),
    and ``n`` rows per group — and the two exact tiers return
    identical values (pinned by tests/test_exact_quantiles.py).

    NULL semantics are identical across tiers BY CONSTRUCTION: NULL
    values are filtered out before the probe and every tier, so
    quantiles are over non-NULL values (the percentile()/
    percentile_approx() convention), ``n`` counts non-NULL values, and
    a group with no non-NULL values is absent from the result in every
    tier. Without the shared filter the ranking tier would RANK the
    NULLs (asc sorts them first), so crossing a tier threshold would
    silently shift every quantile — the r10 ADVICE finding.
    """
    df = df.filter(F.col(value_col).isNotNull())
    if tier is None:
        if by is None:
            tier = "ranking"
        else:
            probe = (
                df.groupBy(*by)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.count(F.lit(1)).alias("n_groups"),
                    F.max("_n").alias("max_group"),
                )
                .first()
            )
            if probe["max_group"] is None:
                tier = "agg"  # empty input: any tier returns 0 rows
            else:
                tier = _pick_quantile_tier(
                    probe["n_groups"],
                    probe["max_group"],
                    max_groups_for_ranking=max_groups_for_ranking,
                    max_group_rows_for_agg=max_group_rows_for_agg,
                )
    if tier not in ("agg", "ranking", "sketch"):
        raise ValueError(
            f"unknown quantile tier {tier!r} (expected agg|ranking|sketch)"
        )

    if tier == "agg" and by is None:
        # honor an explicit force, but an ungrouped exact percentile()
        # is the one-buffer plan the helper exists to avoid
        import warnings

        warnings.warn(
            "exact_quantiles(tier='agg', by=None) buffers every value "
            "in one aggregation buffer — the auto tier uses the "
            "distributed-ranking plan instead",
            stacklevel=2,
        )

    group_cols = list(by) if by else []
    if tier == "agg":
        pct = F.percentile(value_col, F.array(*[F.lit(q) for q in qs]))
        aggs = [
            _r4(F.element_at(pct, i + 1)).alias(_q_alias(q))
            for i, q in enumerate(qs)
        ] + [F.count(F.lit(1)).alias("n")]
        return (
            df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
        )

    if tier == "sketch":
        import warnings

        warnings.warn(
            "exact_quantiles: falling back to the approx_percentile "
            "sketch — too many groups for the grouped-ranking offset "
            f"table (> {max_groups_for_ranking}) AND a group too large "
            f"for one aggregation buffer (> {max_group_rows_for_agg} "
            "rows); results are approximate (mergeable fixed-size "
            "sketch, rank error bounded by its accuracy parameter)",
            stacklevel=2,
        )
        sk = F.percentile_approx(
            value_col, F.array(*[F.lit(q) for q in qs]), F.lit(10_000)
        )
        aggs = [
            _r4(F.element_at(sk, i + 1)).alias(_q_alias(q))
            for i, q in enumerate(qs)
        ] + [F.count(F.lit(1)).alias("n")]
        return (
            df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
        )

    # ranking tier: the distributed-exact recipe shared with the
    # registry rows. Tie-break by a synthesized unique id — rank order
    # among EQUAL values is arbitrary, but quantile interpolation only
    # reads the values at positions floor(h)/ceil(h), which ties can't
    # change.
    vals = df.select(
        *group_cols, F.col(value_col).alias("_v")
    ).withColumn("_tb", F.monotonically_increasing_id())
    ranked = global_row_number(
        vals,
        [F.col("_v").asc(), F.col("_tb").asc()],
        out="_rk",
        total="_n",
        partition_by=group_cols or None,
        barrier=barrier,
        max_side_rows=max(max_groups_for_ranking, 4_000_000),
    )
    idx = F.col("_rk") - 1
    n1 = (F.col("_n") - 1).cast("double")
    keep = None
    for q in qs:
        hit = (idx == F.floor(n1 * q)) | (idx == F.ceil(n1 * q))
        keep = hit if keep is None else (keep | hit)
    b = ranked.filter(keep)

    def interp(q: float):
        h = n1 * q
        lo = F.max(F.when(idx == F.floor(h), F.col("_v")))
        hi = F.max(F.when(idx == F.ceil(h), F.col("_v")))
        frac = F.max(h - F.floor(h))
        return F.round(lo + (hi - lo) * frac, 4)

    aggs = [interp(q).alias(_q_alias(q)) for q in qs] + [
        F.max("_n").alias("n")
    ]
    return b.groupBy(*group_cols).agg(*aggs) if group_cols else b.agg(*aggs)


def approx_sketches_raw(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    """Sketch aggregates + exact ground truth + rank counts, per
    l_returnflag. HLL++ distinct counts and the KLL-style approximate
    median next to their exact values, plus how many rows fall
    strictly below / at-or-below the approximate median — everything
    the deterministic bound verdicts in :func:`agg_approx_sketches`
    need, and what the pytest accuracy pin inspects directly."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_p50"
        ),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    agg = materialization_barrier(agg, barrier)
    # ^ the 3-row sketch result is referenced twice below (probe side
    # and final join). Without the checkpoint each branch re-runs the
    # aggregation, and a re-merged percentile sketch can return a value
    # one data-point off — the rank counts would then be measured
    # against a DIFFERENT median than the one reported.
    # rank-position of the approximate median: one more scan joined to
    # the 3-row sketch result (broadcast), counting rows below / at it
    ranks = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(agg.select("l_returnflag", "approx_p50")), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("approx_p50"), 1).otherwise(0)
            ).alias("n_lt"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("approx_p50"), 1).otherwise(0)
            ).alias("n_le"),
        )
    )
    return agg.join(ranks, "l_returnflag")


@register(
    "agg_approx_sketches",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           CAST(count(*) AS BIGINT)                  AS n_rows,
           TRUE AS parts_ok,
           TRUE AS supps_ok,
           TRUE AS p50_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Sketch aggregates for 100 TB interactive profiling: HLL++ "
        "distinct counts and KLL-style approximate percentiles, fixed-"
        "size mergeable state per partition. Raw sketch outputs are "
        "engine-specific, so the registered row projects DETERMINISTIC "
        "verdicts instead: exact ground truth (both engines compute "
        "it) plus boolean accuracy bounds — HLL within 4× the default "
        "5 % rsd (|approx−exact|·5 ≤ exact, pure BIGINT), and the "
        "approximate median's rank within 1/accuracy + one row of the "
        "0.5 target (cross-multiplied to BIGINT). The oracle computes "
        "the same exact columns and asserts the bounds hold (TRUE "
        "literals) — a wrong sketch value-fails the row. The pytest "
        "accuracy pin (tests/test_operators.py) checks the raw sketch "
        "numbers directly via approx_sketches_raw."
    ),
    tags=("agg", "stats", "sketch"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = approx_sketches_raw(spark, sf_dir)
    # all bounds in integer arithmetic so the booleans are engine-exact:
    #   |approx − exact| ≤ 4·0.05·exact        ⇔ |approx−exact|·5 ≤ exact
    #   n_lt/n ≤ 0.5 + 1/10000 + 1/n           ⇔ n_lt·20000 ≤ 10000·n + 2·n + 20000
    #   n_le/n ≥ 0.5 − (1/10000 + 1/n)         ⇔ n_le·20000 ≥ 10000·n − 2·n − 20000
    hll_ok = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) * 5 <= F.col(e)
    )
    n = F.col("n_rows")
    return raw.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        "n_rows",
        hll_ok("approx_parts", "exact_parts").alias("parts_ok"),
        hll_ok("approx_supps", "exact_supps").alias("supps_ok"),
        (
            (F.col("n_lt") * 20000 <= 10000 * n + 2 * n + 20000)
            & (F.col("n_le") * 20000 >= 10000 * n - 2 * n - 20000)
        ).alias("p50_ok"),
    )


@register(
    "agg_minmax_by",
    """
    SELECT l_returnflag,
           CAST(arg_max(l_orderkey, l_extendedprice ORDER BY l_extendedprice DESC, l_orderkey) AS BIGINT) AS priciest_order,
           round(max(l_extendedprice), 4) AS max_price,
           CAST(arg_min(l_orderkey, l_extendedprice ORDER BY l_extendedprice, l_orderkey) AS BIGINT) AS cheapest_order,
           round(min(l_extendedprice), 4) AS min_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "max_by/min_by (argmax/argmin) per group; the composite "
        "(value, key) ordering struct makes ties deterministic across "
        "engines."
    ),
    tags=("agg",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.max_by(
            "l_orderkey", F.struct(F.col("l_extendedprice"), -F.col("l_orderkey"))
        ).alias("priciest_order"),
        _r4(F.max("l_extendedprice")).alias("max_price"),
        F.min_by(
            "l_orderkey", F.struct(F.col("l_extendedprice"), F.col("l_orderkey"))
        ).alias("cheapest_order"),
        _r4(F.min("l_extendedprice")).alias("min_price"),
    )


@register(
    "agg_string_listagg",
    """
    SELECT n_name,
           string_agg(c_name, ',' ORDER BY c_name) AS top_names,
           CAST(count(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 9900
    GROUP BY n_name
    """,
    doc="Ordered string aggregation (listagg): array_sort(collect_list) + join keeps it deterministic.",
    tags=("agg", "string"),
)
def agg_string_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "top_names"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_conditional_counts",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)                                    AS n,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
           round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4) AS urgent_total,
           round(avg(CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                          THEN o_totalprice END), 4) AS hi_prio_avg
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Conditional aggregation battery: FILTER clauses and CASE-gated aggregates in one pass.",
    tags=("agg",),
)
def agg_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    prio = F.col("o_orderpriority")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        _r4(
            F.sum(F.when(prio == "1-URGENT", F.col("o_totalprice")))
        ).alias("urgent_total"),
        _r4(
            F.avg(
                F.when(
                    prio.startswith("1") | prio.startswith("2"),
                    F.col("o_totalprice"),
                )
            )
        ).alias("hi_prio_avg"),
    )


# ---------------------------------------------------------------------------
# Window batteries
# ---------------------------------------------------------------------------


@register(
    "window_rank_battery",
    """
    SELECT c_custkey,
           CAST(rank()         OVER w AS BIGINT) AS rnk,
           CAST(dense_rank()   OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)       OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 4)       AS pct_rank,
           round(cume_dist()    OVER w, 4)       AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Ranking battery over one window definition: rank/dense_rank/ntile/percent_rank/cume_dist.",
    tags=("window",),
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        _r4(F.percent_rank().over(w)).alias("pct_rank"),
        _r4(F.cume_dist().over(w)).alias("cdist"),
    )


@register(
    "window_lead_lag_gaps",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS INTEGER) AS days_since_prev,
           CAST(date_diff('day', o_orderdate,
                lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                ) AS INTEGER) AS days_to_next
    FROM orders
    """,
    doc="lead/lag inter-order gap analysis per customer.",
    tags=("window", "time"),
)
def window_lead_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    od = F.to_date("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(od, F.to_date(F.lag("o_orderdate").over(w))).alias(
            "days_since_prev"
        ),
        F.datediff(F.to_date(F.lead("o_orderdate").over(w)), od).alias(
            "days_to_next"
        ),
    )


@register(
    "window_moving_avg",
    """
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3,
           round(first_value(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey), 4) AS first_price,
           round(last_value(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4) AS last_price
    FROM orders
    """,
    doc="Moving average (3-row frame) + first/last_value with explicit frames.",
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    order_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r4(
            F.avg("o_totalprice").over(order_w.rowsBetween(-2, W.currentRow))
        ).alias("ma3"),
        _r4(F.first("o_totalprice").over(order_w)).alias("first_price"),
        _r4(
            F.last("o_totalprice").over(
                order_w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            )
        ).alias("last_price"),
    )


# ---------------------------------------------------------------------------
# Scalar batteries: regex / array / JSON / datetime
# ---------------------------------------------------------------------------


@register(
    "scalar_regex_funcs",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1)           AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')      AS devoweled,
           regexp_matches(p_type, '^(ECONOMY|PREMIUM)')     AS is_tiered,
           regexp_extract(p_brand, '([0-9]+)$', 1)          AS brand_num
    FROM part
    """,
    doc="Regex battery: extract/replace/match as codegen'd projections (no UDF).",
    tags=("scalar", "string"),
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike(r"^(ECONOMY|PREMIUM)").alias("is_tiered"),
        F.regexp_extract("p_brand", r"([0-9]+)$", 1).alias("brand_num"),
    )


@register(
    "scalar_array_funcs",
    """
    SELECT p_partkey,
           CAST(len(string_split(p_name, ' ')) AS INTEGER)      AS n_words,
           array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_words,
           list_contains(string_split(p_name, ' '), 'red')      AS has_red,
           string_split(p_name, ' ')[1]                         AS head_word,
           array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|') AS distinct_words
    FROM part
    """,
    doc="Array function battery over split() results: size/sort/contains/head/distinct.",
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return part.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_join(F.array_sort(words), "|").alias("sorted_words"),
        F.array_contains(words, "red").alias("has_red"),
        F.element_at(words, 1).alias("head_word"),
        F.array_join(F.array_sort(F.array_distinct(words)), "|").alias("distinct_words"),
    )


@register(
    "scalar_json_struct",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER)  AS k_typed,
           json_extract_string(props, '$.missing')      AS missing_path,
           json_valid(props)                            AS is_valid
    FROM events
    """,
    doc=(
        "JSON battery on the events props column: typed extraction via "
        "from_json with a declared schema (not string get_json_object), "
        "missing-path null semantics, validity probe."
    ),
    tags=("scalar", "json", "events"),
)
def scalar_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k int, missing string")
    return ev.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        parsed["missing"].alias("missing_path"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@register(
    "scalar_datetime_funcs",
    """
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INTEGER)                   AS qtr,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)       AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_95,
           CAST(date_trunc('month', o_orderdate) AS DATE)          AS month_start
    FROM orders
    """,
    doc="Datetime battery: quarter/last_day/interval add/datediff/trunc.",
    tags=("scalar", "time"),
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.last_day(od).alias("month_end"),
        F.date_add(od, 30).alias("due_date"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
    )


@register(
    "scalar_null_handling",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER')  AS seg_or_other,
           CASE WHEN c_acctbal IS NULL THEN 0.0 ELSE round(c_acctbal, 4) END AS bal_nvl,
           (c_acctbal IS NOT NULL AND c_acctbal > 0)            AS is_positive,
           greatest(c_acctbal, 0.0)                             AS bal_floor0,
           least(round(c_acctbal, 4), 1000.0)                   AS bal_cap1k
    FROM customer
    """,
    doc="Null-handling battery: nullif/coalesce/greatest/least/boolean three-valued logic.",
    tags=("scalar",),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(bal.isNull(), 0.0).otherwise(F.round(bal, 4)).alias("bal_nvl"),
        (bal.isNotNull() & (bal > 0)).alias("is_positive"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(F.round(bal, 4), F.lit(1000.0)).alias("bal_cap1k"),
    )


# ---------------------------------------------------------------------------
# Set / union / sampling shapes
# ---------------------------------------------------------------------------


@register(
    "union_all_tagged",
    """
    SELECT 'customer' AS side, CAST(c_custkey AS BIGINT) AS key FROM customer WHERE c_acctbal > 9500
    UNION ALL
    SELECT 'supplier' AS side, CAST(s_suppkey AS BIGINT) AS key FROM supplier WHERE s_acctbal > 9500
    """,
    doc="UNION ALL with provenance tags (no dedup shuffle — cheaper than UNION when duplicates are fine).",
    tags=("setop",),
)
def union_all_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.lit("customer").alias("side"), F.col("c_custkey").alias("key"))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.lit("supplier").alias("side"), F.col("s_suppkey").alias("key"))
    )
    return cust.unionAll(sup)


@register(
    "in_subquery_priority_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderpriority = '1-URGENT'
    """,
    doc="IN-subquery as left-semi join with the filter pushed to both scans.",
    tags=("join",),
)
def in_subquery_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    mach = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    return orders.join(
        mach, orders.o_custkey == mach.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "dq_expectations_report",
    """
    WITH ref AS (SELECT CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                             AS BIGINT) AS v
                 FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
    pk AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v
           FROM orders),
    pos AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v
            FROM orders),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS v
           FROM orders),
    dom AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                            THEN 1 ELSE 0 END) AS BIGINT) AS v
            FROM orders)
    SELECT check_name, n_checked, n_violations, n_violations = 0 AS passed
    FROM (
        SELECT 'orders_custkey_references_customer' AS check_name, n AS n_checked, v AS n_violations FROM ref
        UNION ALL SELECT 'orders_orderkey_unique', n, v FROM pk
        UNION ALL SELECT 'orders_totalprice_positive', n, v FROM pos
        UNION ALL SELECT 'orders_orderdate_not_null', n, v FROM nn
        UNION ALL SELECT 'orders_status_in_domain', n, v FROM dom
    ) u
    """,
    doc=(
        "Data-quality expectations battery (the Deequ/Great-"
        "Expectations shape): referential integrity, key uniqueness, "
        "positivity, non-null, and domain checks over orders, each "
        "reduced to (n_checked, n_violations, passed). Every check is "
        "a full-scan aggregate with map-side combine — violations "
        "count in one pass, no row-level materialization; the "
        "referential check is the one join (dimension side broadcast "
        "here; at 100 TB a shuffled left join with the same verdict "
        "columns). This is the gate a pipeline runs before publishing "
        "a snapshot."
    ),
    tags=("quality", "relational"),
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def verdict(name: str, frame: DataFrame) -> DataFrame:
        return frame.select(
            F.lit(name).alias("check_name"),
            F.col("n").alias("n_checked"),
            F.col("v").alias("n_violations"),
            (F.col("v") == 0).alias("passed"),
        )

    ref = verdict(
        "orders_custkey_references_customer",
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias("v"),
        ),
    )
    pk = verdict(
        "orders_orderkey_unique",
        orders.agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias("v"),
        ),
    )
    pos = verdict(
        "orders_totalprice_positive",
        orders.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v"),
        ),
    )
    nn = verdict(
        "orders_orderdate_not_null",
        orders.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("v"),
        ),
    )
    dom = verdict(
        "orders_status_in_domain",
        orders.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
            ).alias("v"),
        ),
    )
    return ref.unionAll(pk).unionAll(pos).unionAll(nn).unionAll(dom)


@register(
    "scalar_map_funcs",
    """
    WITH m AS (SELECT o_orderkey,
                      MAP(['status', 'priority'],
                          [o_orderstatus, o_orderpriority]) AS m
               FROM orders)
    SELECT o_orderkey,
           to_json(m)                                   AS m_json,
           CAST(cardinality(m) AS INTEGER)              AS m_size,
           array_to_string(map_keys(m), ',')            AS keys_csv,
           array_to_string(map_values(m), ',')          AS vals_csv,
           m['status'][1]                               AS status_val,
           m['missing'][1]                              AS missing_val
    FROM m
    """,
    doc=(
        "Map-type scalar battery: construction, to_json round-trip, "
        "cardinality, key/value extraction, present and absent lookups "
        "— the semi-structured column surface (feature maps, tags, "
        "configs) exercised as pure projections. Insertion order is "
        "deterministic on both engines, so the JSON rendering is "
        "hash-stable."
    ),
    tags=("scalar", "map"),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    base = orders.select("o_orderkey", m.alias("m"))
    return base.select(
        "o_orderkey",
        F.to_json("m").alias("m_json"),
        F.size("m").alias("m_size"),
        F.array_join(F.map_keys("m"), ",").alias("keys_csv"),
        F.array_join(F.map_values("m"), ",").alias("vals_csv"),
        F.element_at("m", F.lit("status")).alias("status_val"),
        F.element_at("m", F.lit("missing")).alias("missing_val"),
    )


@register(
    "scalar_try_funcs",
    """
    SELECT o_orderkey,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)      AS prio_num,
           TRY_CAST(o_orderpriority AS INTEGER)                    AS bad_int,
           TRY_CAST(o_orderpriority AS DATE)                       AS bad_date,
           TRY_CAST(CAST(o_orderdate AS VARCHAR) AS DATE)          AS roundtrip_date,
           round(o_totalprice / nullif(o_orderkey % 5, 0), 4)      AS safe_div
    FROM orders
    """,
    doc=(
        "Error-safe coercion battery (the ANSI-mode survival kit): "
        "try_cast on good/garbage numerics and dates, string→date "
        "round-trip, and divide-by-zero guarded with nullif — every "
        "expression returns NULL instead of failing the 100 TB job on "
        "one malformed row. Same family as functions/rules.py's "
        "safe_num, exercised over the relational tables."
    ),
    tags=("scalar", "quality"),
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_int"),
        F.expr("try_cast(o_orderpriority AS DATE)").alias("bad_date"),
        F.expr("try_cast(CAST(o_orderdate AS STRING) AS DATE)").alias(
            "roundtrip_date"
        ),
        F.round(
            F.col("o_totalprice") / F.nullif(F.col("o_orderkey") % 5, F.lit(0)), 4
        ).alias("safe_div"),
    )


@register(
    "window_distribution_funcs",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS INTEGER)        AS bal_quartile,
           round(percent_rank() OVER w, 4)         AS pct_rank,
           round(cume_dist() OVER w, 4)            AS cume,
           round(nth_value(c_acctbal, 1) OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4)
               AS seg_min_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc=(
        "Distribution window battery: ntile quartiles, percent_rank, "
        "cume_dist, nth_value — the ranking-distribution surface "
        "(completes rank/dense_rank/row_number from the rank battery). "
        "The ordering key is made unique with the tie-break column, so "
        "every value is an exact rational of integer ranks — no "
        "interpolation, hash-stable across engines. One segment-keyed "
        "shuffle serves all four."
    ),
    tags=("window",),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.round(F.nth_value("c_acctbal", 1).over(wf), 4).alias("seg_min_bal"),
    )


@register(
    "agg_bitwise_battery",
    """
    SELECT o_orderstatus,
           CAST(bit_or(o_orderkey % 256)  AS BIGINT) AS flags_or,
           CAST(bit_and(o_orderkey % 256) AS BIGINT) AS flags_and,
           CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS flags_xor,
           bool_and(o_totalprice > 0)                AS all_positive,
           bool_or(o_totalprice > 400000)            AS any_jumbo,
           CAST(count(*) AS BIGINT)                  AS n
    FROM orders GROUP BY o_orderstatus
    """,
    doc=(
        "Bitwise/boolean aggregate battery: bit_or/bit_and/bit_xor over "
        "a derived flag byte plus bool_and/bool_or — the flag-rollup "
        "surface (permission masks, feature flags, error bitsets). All "
        "map-side combinable; integers are exact so the check is "
        "bit-for-bit."
    ),
    tags=("agg",),
)
def agg_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    flags = F.col("o_orderkey") % 256
    return orders.groupBy("o_orderstatus").agg(
        F.bit_or(flags).alias("flags_or"),
        F.bit_and(flags).alias("flags_and"),
        F.bit_xor(flags).alias("flags_xor"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.count(F.lit(1)).alias("n"),
    )


_AFFINITY_MIN_PAIRS = 3  # support floor for reported part pairs


@register(
    "part_affinity_lift",
    f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM lineitem),
    s AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS supp FROM b
          GROUP BY l_partkey),
    p AS (SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
                 CAST(count(*) AS BIGINT) AS pair_supp
          FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                           AND a.l_partkey < c.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= {_AFFINITY_MIN_PAIRS})
    SELECT part_a, part_b, pair_supp,
           round(pair_supp * 1.0 * n_orders / (sa.supp * sb.supp), 4) AS lift
    FROM p
    JOIN s sa ON sa.l_partkey = part_a
    JOIN s sb ON sb.l_partkey = part_b
    CROSS JOIN n
    """,
    doc=(
        "Market-basket affinity: part pairs co-ordered in the same "
        "order, with lift = P(a,b)/(P(a)·P(b)) — the association-rule "
        "primitive behind recommendations. Baskets collapse to sorted "
        "part arrays ONCE (one l_orderkey aggregation) and pairs are "
        "generated LOCALLY per basket with a nested array transform — "
        "Σ basket²/2 rows (baskets are 4-13 items) with no self-join "
        "and no second shuffle of the basket table; per-part supports "
        f"broadcast back onto the surviving ≥{_AFFINITY_MIN_PAIRS}-"
        "support pairs. Integer supports make lift an exact rational — "
        "bit-stable cross-engine at round-4."
    ),
    tags=("agg", "join", "recommendation"),
)
def part_affinity_lift(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # barrier: baskets feed four consumers (pairs, supports ×2, the
    # order count); without the cut each replans the basket aggregation
    # (injectable policy — fintech_etl_spark.barrier)
    baskets = materialization_barrier(
        li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("parts")
        ),
        barrier,
    )
    # all a<b pairs within the sorted array, generated locally per row
    pair_arr = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size("parts")),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    p = (
        baskets.select(F.explode(pair_arr).alias("pr"))
        .groupBy(F.col("pr.part_a").alias("part_a"), F.col("pr.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("pair_supp"))
        .filter(F.col("pair_supp") >= _AFFINITY_MIN_PAIRS)
    )
    singles = baskets.select(F.explode("parts").alias("l_partkey"))
    # same: the support dimension broadcasts onto BOTH pair sides
    s = materialization_barrier(
        singles.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("supp")),
        barrier,
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    sa = s.select(F.col("l_partkey").alias("part_a"), F.col("supp").alias("supp_a"))
    sb = s.select(F.col("l_partkey").alias("part_b"), F.col("supp").alias("supp_b"))
    return (
        p.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "pair_supp",
            F.round(
                F.col("pair_supp") * 1.0 * F.col("n_orders")
                / (F.col("supp_a") * F.col("supp_b")),
                4,
            ).alias("lift"),
        )
    )


@register(
    "agg_linreg_battery",
    """
    SELECT event_type,
           CAST(regr_count(value, hour(ts)) AS BIGINT)       AS n,
           round(regr_slope(value, hour(ts)), 4)             AS slope,
           round(regr_intercept(value, hour(ts)), 4)         AS intercept,
           round(regr_r2(value, hour(ts)), 4)                AS r2,
           round(regr_avgx(value, hour(ts)), 4)              AS avg_hour,
           round(regr_avgy(value, hour(ts)), 4)              AS avg_value
    FROM events GROUP BY event_type
    """,
    doc=(
        "Linear-regression aggregate battery (SQL:2003 regr_*): per "
        "event type, OLS of event value against hour-of-day — slope, "
        "intercept, R², and the regression means, all as single-pass "
        "mergeable aggregates (sum/sum-of-products sketches per "
        "partition, one reduce) — the time-of-day trend screen that "
        "needs no ML library and shuffles one row per (group, stat)."
    ),
    tags=("agg", "stats"),
)
def agg_linreg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.hour("ts")
    return ev.groupBy("event_type").agg(
        F.regr_count("value", x).cast("long").alias("n"),
        _r4(F.regr_slope("value", x)).alias("slope"),
        _r4(F.regr_intercept("value", x)).alias("intercept"),
        _r4(F.regr_r2("value", x)).alias("r2"),
        _r4(F.regr_avgx("value", x)).alias("avg_hour"),
        _r4(F.regr_avgy("value", x)).alias("avg_value"),
    )


@register(
    "revenue_concentration_gini",
    """
    WITH c AS (SELECT o_custkey,
                      -- integer cents (floor of the bit-identical
                      -- double) so per-customer revenue, ranks, and
                      -- every sum below are engine- and order-exact
                      sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
               FROM orders GROUP BY o_custkey),
    r AS (SELECT o_custkey, rev,
                 row_number() OVER (ORDER BY rev ASC, o_custkey)  AS rk,
                 row_number() OVER (ORDER BY rev DESC, o_custkey) AS drk
          FROM c),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 sum(rev)                  AS tot,
                 -- DECIMAL(38,0): rank-weighted sum grows as n²·rev;
                 -- BIGINT would wrap in Spark / raise in DuckDB at
                 -- tens of millions of customers
                 sum(CAST(rk AS DECIMAL(18,0)) * CAST(rev AS DECIMAL(18,0))) AS wsum
          FROM r),
    -- top-N cutoffs as BIGINT integer division (n//100 etc.): double
    -- n*frac can floor one ulp low in one engine only
    s AS (SELECT max(t.n) AS n, max(t.tot) AS tot, max(t.wsum) AS wsum,
                 sum(CASE WHEN r.drk <= greatest(1, t.n // 100)
                          THEN r.rev ELSE 0 END) AS top1,
                 sum(CASE WHEN r.drk <= t.n // 10
                          THEN r.rev ELSE 0 END) AS top10,
                 sum(CASE WHEN r.drk <= t.n // 5
                          THEN r.rev ELSE 0 END) AS top20
          FROM r CROSS JOIN t)
    SELECT n AS n_customers,
           round(tot / 100.0, 2)                          AS total_revenue,
           round(2.0 * CAST(wsum AS DOUBLE) / (1.0 * n * tot) - (n + 1.0) / n, 4) AS gini,
           round(top1 * 1.0 / tot, 4)                     AS top1pct_share,
           round(top10 * 1.0 / tot, 4)                    AS top10pct_share,
           round(top20 * 1.0 / tot, 4)                    AS top20pct_share
    FROM s
    """,
    doc=(
        "Revenue concentration: the Gini coefficient of per-customer "
        "revenue (rank formula G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n over the "
        "ascending-sorted revenues) plus the Lorenz points — share of "
        "revenue held by the top 1/10/20% of customers — the standard "
        "whale-dependence screen. All revenue arithmetic runs in "
        "integer cents, so ranks and weighted sums are exact and both "
        "engines compute bit-identical concentration numbers; the "
        "rank windows run over one row per CUSTOMER (the order book "
        "itself never sorts globally), and at lake scale the exact "
        "rank weighting would hand off to a quantile-sketch Lorenz "
        "approximation, the documented trade."
    ),
    tags=("agg", "window", "audit"),
)
def revenue_concentration_gini(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("rev")
    )
    # both exact global ranks via distributed ranking (range exchange +
    # per-partition offsets, operators/ranking.py) — no single-task
    # WindowExec over the customer dimension. drk is NOT n+1−rk: both
    # ranks tie-break custkey ASCENDING, so tied revenues need their
    # own range sort (two slim (key, rev, rank) exchanges total).
    r = global_row_number(
        c, [F.col("rev").asc(), F.col("o_custkey").asc()], out="rk"
    )
    r = materialization_barrier(
        global_row_number(
            r, [F.col("rev").desc(), F.col("o_custkey").asc()], out="drk"
        ),
        barrier,
    )
    # wsum = Σ rank·rev grows as n²·avg_rev: as BIGINT it would wrap
    # silently in Spark but raise in DuckDB once n reaches tens of
    # millions — DECIMAL(38,0) gives both engines the same exact value
    # (and the same loud overflow mode) up to 10^38.
    dec = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    t = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("tot"),
        F.sum(dec("rk") * dec("rev")).alias("wsum"),
    )
    # top-N cutoffs in pure BIGINT division (n div 100/10/5): a double
    # n*frac can land one ulp below an exact integer and floor to k-1
    # in one engine but k in the other — integer div is engine-exact.
    top = lambda divisor, at_least_one: F.sum(  # noqa: E731
        F.when(
            F.col("drk")
            <= F.greatest(
                F.lit(1 if at_least_one else 0).cast("long"),
                F.expr(f"n div {divisor}"),
            ),
            F.col("rev"),
        ).otherwise(0)
    )
    s = r.crossJoin(F.broadcast(t)).agg(
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
        F.max("wsum").alias("wsum"),
        top(100, True).alias("top1"),
        top(10, False).alias("top10"),
        top(5, False).alias("top20"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("tot") / 100.0, 2).alias("total_revenue"),
        F.round(
            2.0 * F.col("wsum").cast("double") / (1.0 * F.col("n") * F.col("tot"))
            - (F.col("n") + 1.0) / F.col("n"),
            4,
        ).alias("gini"),
        F.round(F.col("top1") * 1.0 / F.col("tot"), 4).alias("top1pct_share"),
        F.round(F.col("top10") * 1.0 / F.col("tot"), 4).alias("top10pct_share"),
        F.round(F.col("top20") * 1.0 / F.col("tot"), 4).alias("top20pct_share"),
    )


@register(
    "orders_seasonal_backtest",
    """
    WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                      sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_e2
               FROM orders GROUP BY 1),
    f AS (SELECT month, rev_e2,
                 lag(rev_e2, 12) OVER (ORDER BY month) AS fc_e2
          FROM m)
    SELECT month,
           round(rev_e2 / 100.0, 2)                    AS actual,
           round(fc_e2 / 100.0, 2)                     AS forecast,
           round(abs(rev_e2 - fc_e2) / 100.0, 2)       AS abs_err,
           round(abs(rev_e2 - fc_e2) * 1.0 / rev_e2, 4) AS ape
    FROM f WHERE fc_e2 IS NOT NULL
    """,
    doc=(
        "Seasonal-naive forecast backtest: monthly revenue predicted "
        "by the same month last year (lag 12 over the month series), "
        "with per-month absolute and percentage error — the baseline "
        "every forecasting model must beat, and the standard sanity "
        "screen for seasonality strength. Revenue aggregates in "
        "integer cents (exact, order-independent); the lag window "
        "runs over ONE row per month, so the global ordering is "
        "driver-trivial at any ledger size — the heavy shuffle is the "
        "single month groupBy of the scan."
    ),
    tags=("agg", "window", "timeseries"),
)
def orders_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("rev_e2"))
    f = m.withColumn("fc_e2", F.lag("rev_e2", 12).over(Window.orderBy("month")))
    return f.filter(F.col("fc_e2").isNotNull()).select(
        "month",
        F.round(F.col("rev_e2") / 100.0, 2).alias("actual"),
        F.round(F.col("fc_e2") / 100.0, 2).alias("forecast"),
        F.round(F.abs(F.col("rev_e2") - F.col("fc_e2")) / 100.0, 2).alias(
            "abs_err"
        ),
        F.round(
            F.abs(F.col("rev_e2") - F.col("fc_e2")) * 1.0 / F.col("rev_e2"), 4
        ).alias("ape"),
    )


@register(
    "histogram_doc_lengths",
    """
    SELECT CAST(floor(n_chars / 50) * 50 AS INTEGER) AS bucket_start,
           CAST(count(*) AS BIGINT)                  AS n_docs,
           CAST(min(n_chars) AS INTEGER)             AS min_chars,
           CAST(max(n_chars) AS INTEGER)             AS max_chars
    FROM documents GROUP BY 1
    """,
    doc=(
        "Equi-width histogram of document lengths (50-char buckets) — "
        "the distribution primitive behind every corpus length-filter "
        "decision, as ONE grouped aggregation with integer bucket "
        "keys: a map-side combine reduces each partition to its "
        "occupied buckets, so the shuffle carries O(buckets) rows "
        "regardless of corpus size (contrast with exact percentiles, "
        "which need rank machinery — the histogram is the cheap first "
        "look)."
    ),
    tags=("agg", "corpus", "stats"),
)
def histogram_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        (F.floor(F.col("n_chars") / 50) * 50).cast("int").alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("int").alias("min_chars"),
        F.max("n_chars").cast("int").alias("max_chars"),
    )


@register(
    "concurrent_open_orders",
    """
    WITH iv AS (SELECT o.o_orderkey,
                       CAST(o.o_orderdate AS DATE)   AS sd,
                       CAST(max(l.l_shipdate) AS DATE) AS ed
                FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                GROUP BY 1, 2),
    b AS (SELECT sd AS day, 1 AS delta FROM iv
          UNION ALL
          SELECT ed + 1 AS day, -1 AS delta FROM iv),
    e AS (SELECT day, CAST(sum(delta) AS BIGINT) AS net_delta
          FROM b GROUP BY day)
    SELECT day, net_delta,
           CAST(sum(net_delta) OVER (ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS open_orders
    FROM e
    """,
    doc=(
        "Concurrent-interval counting — how many orders are OPEN "
        "(placed, not yet fully shipped) on each day the count "
        "changes: the interval-stabbing primitive behind backlog, "
        "occupancy, and concurrency dashboards. Each order interval "
        "[orderdate, last shipdate] becomes a +1/-1 boundary event, "
        "one day-grain aggregation collapses the events, and a "
        "running sum over the ~thousands of DISTINCT boundary days "
        "yields the open count — no calendar join, no per-day "
        "explosion of the fact table; the only full-size shuffle is "
        "the per-order max-shipdate aggregation on the fact table's "
        "natural key."
    ),
    tags=("agg", "window", "timeseries"),
)
def concurrent_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("sd"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("ed"))
    )
    b = iv.select(F.col("sd").alias("day"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.date_add("ed", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    e = b.groupBy("day").agg(F.sum("delta").cast("long").alias("net_delta"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return e.select(
        "day",
        "net_delta",
        F.sum("net_delta").over(w).cast("long").alias("open_orders"),
    )


@register(
    "supplier_scorecard",
    """
    WITH f AS (SELECT l.l_suppkey,
                      CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                           AS BIGINT)                        AS net_e2,
                      l.l_partkey,
                      CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
                      CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                           THEN 1 ELSE 0 END                 AS late
               FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    s AS (SELECT l_suppkey,
                 CAST(count(*) AS BIGINT)                    AS n_lines,
                 sum(net_e2)                                 AS rev_e2,
                 CAST(count(DISTINCT l_partkey) AS BIGINT)   AS n_parts,
                 CAST(sum(ret) AS BIGINT)                    AS n_returned,
                 CAST(sum(late) AS BIGINT)                   AS n_late
          FROM f GROUP BY l_suppkey)
    SELECT s.l_suppkey AS suppkey, su.s_name AS supplier,
           n_lines, round(rev_e2 / 100.0, 2) AS net_revenue, n_parts,
           round(n_returned * 1.0 / n_lines, 4) AS return_rate,
           round(n_late * 1.0 / n_lines, 4)     AS late_ship_rate
    FROM s JOIN supplier su ON s.l_suppkey = su.s_suppkey
    """,
    doc=(
        "Per-supplier operational scorecard: shipped lines, net "
        "revenue (integer cents — exact), part diversity, return "
        "rate, and >90-day late-ship rate, joined to the supplier "
        "dimension — the vendor-management composite every "
        "procurement dashboard starts from (and the analytical face "
        "of the reference's vendor-centric domain). One fact-key join "
        "(orders broadcast-eligible per AQE at dim scale, "
        "co-partitioned at lake scale) + one suppkey aggregation; "
        "the supplier dimension broadcasts onto the result."
    ),
    tags=("agg", "join", "audit"),
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    f = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
        .cast("long")
        .alias("net_e2"),
        "l_partkey",
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .cast("int")
        .alias("late"),
    )
    s = f.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("net_e2").alias("rev_e2"),
        F.count_distinct("l_partkey").alias("n_parts"),
        F.sum("ret").cast("long").alias("n_returned"),
        F.sum("late").cast("long").alias("n_late"),
    )
    return s.join(
        F.broadcast(sup.select("s_suppkey", "s_name")),
        s.l_suppkey == F.col("s_suppkey"),
    ).select(
        F.col("l_suppkey").alias("suppkey"),
        F.col("s_name").alias("supplier"),
        "n_lines",
        F.round(F.col("rev_e2") / 100.0, 2).alias("net_revenue"),
        "n_parts",
        F.round(F.col("n_returned") * 1.0 / F.col("n_lines"), 4).alias(
            "return_rate"
        ),
        F.round(F.col("n_late") * 1.0 / F.col("n_lines"), 4).alias(
            "late_ship_rate"
        ),
    )


@register(
    "revenue_waterfall",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0, 2)
               AS gross,
           round(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT))
                 / 100.0, 2) AS discount_given,
           round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                          AS BIGINT)) / 100.0, 2) AS net,
           round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * l_tax * 100 + 0.5)
                          AS BIGINT)) / 100.0, 2) AS tax_collected,
           round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS charged
    FROM lineitem
    """,
    doc=(
        "Revenue bridge (waterfall): gross extended price → discount "
        "given → net → tax collected → total charged, as ONE full-"
        "ledger aggregation in exact integer cents (each component "
        "floored from its bit-identical per-row double, summed as "
        "BIGINT — associative, engine-exact at any ledger size). The "
        "single-row finance summary whose components must reconcile "
        "by construction: gross − discount ≈ net and net + tax ≈ "
        "charged, up to the per-row floor."
    ),
    tags=("agg", "audit"),
)
def revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def cents(expr: F.Column) -> F.Column:
        return F.sum(F.floor(expr * 100 + 0.5).cast("long"))

    ep = F.col("l_extendedprice")
    disc = F.col("l_discount")
    tax = F.col("l_tax")
    return li.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(cents(ep) / 100.0, 2).alias("gross"),
        F.round(cents(ep * disc) / 100.0, 2).alias("discount_given"),
        F.round(cents(ep * (1 - disc)) / 100.0, 2).alias("net"),
        F.round(cents(ep * (1 - disc) * tax) / 100.0, 2).alias("tax_collected"),
        F.round(cents(ep * (1 - disc) * (1 + tax)) / 100.0, 2).alias("charged"),
    )


@register(
    "brand_share_yoy",
    """
    WITH f AS (SELECT p.p_brand,
                      CAST(year(l.l_shipdate) AS INTEGER) AS yr,
                      CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                           AS BIGINT) AS net_e2
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    b AS (SELECT p_brand, yr, sum(net_e2) AS rev_e2
          FROM f GROUP BY p_brand, yr),
    s AS (SELECT p_brand, yr, rev_e2,
                 round(rev_e2 * 1.0 / sum(rev_e2) OVER (PARTITION BY yr), 4)
                     AS share
          FROM b)
    SELECT p_brand, yr,
           round(rev_e2 / 100.0, 2) AS net_revenue,
           share,
           round(share - lag(share) OVER (PARTITION BY p_brand ORDER BY yr), 4)
               AS share_delta_yoy
    FROM s
    """,
    doc=(
        "Brand mix-shift analysis: each brand's share of yearly net "
        "revenue and its year-over-year share delta — the screen that "
        "separates 'the category grew' from 'this brand took share'. "
        "Revenue in exact integer cents; shares are single divisions "
        "of exact sums (per-year totals via a window over the "
        "brand-year aggregate, tens of rows), and the YoY delta is a "
        "lag over each brand's short year series. The only full-size "
        "shuffle is the (brand, year) aggregation; the part dimension "
        "broadcasts onto the fact scan."
    ),
    tags=("agg", "window", "join"),
)
def brand_share_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    f = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.year("l_shipdate").cast("int").alias("yr"),
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
        .cast("long")
        .alias("net_e2"),
    )
    b = f.groupBy("p_brand", "yr").agg(F.sum("net_e2").alias("rev_e2"))
    share = F.round(
        F.col("rev_e2") * 1.0 / F.sum("rev_e2").over(Window.partitionBy("yr")), 4
    )
    s = b.withColumn("share", share)
    return s.select(
        "p_brand",
        "yr",
        F.round(F.col("rev_e2") / 100.0, 2).alias("net_revenue"),
        "share",
        F.round(
            F.col("share")
            - F.lag("share").over(Window.partitionBy("p_brand").orderBy("yr")),
            4,
        ).alias("share_delta_yoy"),
    )


@register(
    "brand_realized_vs_list",
    """
    WITH f AS (SELECT p.p_brand,
                      CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                           AS BIGINT)              AS net_e2,
                      CAST(floor(l.l_quantity) AS BIGINT) AS qty,
                      CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
                          * CAST(floor(l.l_quantity) AS BIGINT) AS list_e2
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT p_brand,
           CAST(sum(qty) AS BIGINT)                    AS units,
           round(sum(net_e2) / 100.0, 2)               AS realized,
           round(sum(list_e2) / 100.0, 2)              AS at_list,
           round(1.0 - sum(net_e2) * 1.0 / sum(list_e2), 4)
               AS effective_discount
    FROM f GROUP BY p_brand
    """,
    doc=(
        "Realized-vs-list pricing screen per brand: units, revenue "
        "actually charged (net of line discounts), what the same "
        "units would have fetched at list (retail price × quantity), "
        "and the effective discount rate — the price-realization "
        "metric behind every pricing review, and a channel-leakage "
        "screen in the reference's vendor-invoice domain. Quantities "
        "pass through floor() before the BIGINT cast so Spark "
        "(truncating cast) and DuckDB (half-even cast) agree even on "
        "fractional quantities; all sums are exact integer cents; one "
        "broadcast dim join + one brand aggregation."
    ),
    tags=("agg", "join", "audit"),
)
def brand_realized_vs_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # floor() before the BIGINT cast: a bare double→BIGINT cast rounds
    # half-even in DuckDB but truncates in Spark — floor first makes
    # both engines truncate identically (repo-wide pinned convention,
    # same as audit_benford_screen).
    qty = F.floor(F.col("l_quantity")).cast("long")
    f = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_retailprice")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
        .cast("long")
        .alias("net_e2"),
        qty.alias("qty"),
        (F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long") * qty).alias(
            "list_e2"
        ),
    )
    return f.groupBy("p_brand").agg(
        F.sum("qty").cast("long").alias("units"),
        F.round(F.sum("net_e2") / 100.0, 2).alias("realized"),
        F.round(F.sum("list_e2") / 100.0, 2).alias("at_list"),
        F.round(
            1.0 - F.sum("net_e2") * 1.0 / F.sum("list_e2"), 4
        ).alias("effective_discount"),
    )


@register(
    "nation_trade_balance",
    """
    WITH net AS (SELECT l_orderkey, l_suppkey,
                        CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                             AS BIGINT) AS net_e2
                 FROM lineitem),
    exp AS (SELECT n.n_name AS nation, sum(net.net_e2) AS exp_e2
            FROM net
            JOIN supplier s ON net.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name),
    imp AS (SELECT n.n_name AS nation, sum(net.net_e2) AS imp_e2
            FROM net
            JOIN orders o ON net.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name)
    SELECT coalesce(exp.nation, imp.nation) AS nation,
           round(coalesce(exp_e2, 0) / 100.0, 2) AS supplied,
           round(coalesce(imp_e2, 0) / 100.0, 2) AS purchased,
           round((coalesce(exp_e2, 0) - coalesce(imp_e2, 0)) / 100.0, 2)
               AS net_balance
    FROM exp FULL OUTER JOIN imp ON exp.nation = imp.nation
    """,
    doc=(
        "Trade-balance matrix collapsed per nation: revenue each "
        "nation's suppliers SHIPPED vs revenue its customers BOUGHT, "
        "and the net — the q7-family rollup that answers 'is this "
        "geography a net producer or consumer on our platform'. Both "
        "legs aggregate the same integer-cent fact expression; "
        "supplier/nation broadcast onto the fact scan, the customer "
        "leg routes through the orderkey join, and the final "
        "full-outer stitch runs on 25 nation rows. Exact cents, so "
        "both engines net to the penny."
    ),
    tags=("agg", "join"),
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    net = li.select(
        "l_orderkey",
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
        .cast("long")
        .alias("net_e2"),
    )
    exp = (
        net.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            net.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("net_e2").alias("exp_e2"))
    )
    imp = (
        net.join(orders, net.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("net_e2").alias("imp_e2"))
    )
    j = exp.withColumnRenamed("nation", "exp_nation").join(
        imp.withColumnRenamed("nation", "imp_nation"),
        F.col("exp_nation") == F.col("imp_nation"),
        "full_outer",
    )
    return j.select(
        F.coalesce("exp_nation", "imp_nation").alias("nation"),
        F.round(F.coalesce("exp_e2", F.lit(0)) / 100.0, 2).alias("supplied"),
        F.round(F.coalesce("imp_e2", F.lit(0)) / 100.0, 2).alias("purchased"),
        F.round(
            (F.coalesce("exp_e2", F.lit(0)) - F.coalesce("imp_e2", F.lit(0)))
            / 100.0,
            2,
        ).alias("net_balance"),
    )


@register(
    "order_size_distribution",
    """
    WITH o AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
               FROM lineitem GROUP BY l_orderkey)
    SELECT n_items,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(count(*) * 1.0 / sum(count(*)) OVER (), 4) AS share
    FROM o GROUP BY n_items
    """,
    doc=(
        "Basket-size distribution: orders bucketed by line-item "
        "count, with each size's share of all orders — the shape "
        "parameter behind picking/packing capacity and the pair-"
        "generation cost model of the graph/affinity operators "
        "(which are quadratic per basket). Two grouped counts, the "
        "second over at most a few dozen distinct sizes; the share "
        "normalizer is a single-row window over those sizes. Exact "
        "integer counts throughout."
    ),
    tags=("agg", "stats"),
)
def order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    o = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    d = o.groupBy("n_items").agg(F.count(F.lit(1)).alias("n_orders"))
    return d.select(
        "n_items",
        "n_orders",
        F.round(
            F.col("n_orders") * 1.0
            / F.sum("n_orders").over(Window.partitionBy()),
            4,
        ).alias("share"),
    )


@register(
    "customer_balance_deciles",
    """
    WITH c AS (SELECT c_custkey,
                      CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_e2
               FROM customer),
    r AS (SELECT bal_e2,
                 ntile(10) OVER (ORDER BY bal_e2, c_custkey) AS decile
          FROM c)
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(min(bal_e2) / 100.0, 2) AS min_balance,
           round(max(bal_e2) / 100.0, 2) AS max_balance,
           floor(sum(bal_e2) / (100.0 * count(*)) * 10000 + 0.5) / 10000.0
               AS avg_balance
    FROM r GROUP BY decile
    """,
    doc=(
        "Account-balance decile table: customers tiled into 10 "
        "equal-count bands by balance (integer cents, custkey tie-"
        "break so both engines tile identically), with per-decile "
        "count/min/max/mean — the distribution summary credit teams "
        "read before setting exposure thresholds. The ntile runs "
        "over one slim (balance, key) row per customer; at lake "
        "scale the exact tiling hands off to percentile_approx "
        "boundaries like the RFM scores. Mean uses the explicit "
        "floor-based half-up (integer-ratio round() ties)."
    ),
    tags=("agg", "window", "stats"),
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    c = cust.select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_e2"),
    )
    # exact global decile via distributed ranking (operators/
    # ranking.py) — value-identical to ntile(10) OVER (ORDER BY …) but
    # parallel: the only full-data movement is one range exchange of
    # the slim (balance, key) frame
    r = global_ntile(
        c, [F.col("bal_e2").asc(), F.col("c_custkey").asc()], 10, "decile"
    ).select("bal_e2", "decile")
    return r.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("bal_e2") / 100.0, 2).alias("min_balance"),
        F.round(F.max("bal_e2") / 100.0, 2).alias("max_balance"),
        (
            F.floor(
                F.sum("bal_e2") / (100.0 * F.count(F.lit(1))) * 10000 + 0.5
            )
            / 10000.0
        ).alias("avg_balance"),
    )
