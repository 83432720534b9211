"""exact_quantiles (operators/analytics.py): the auto-tier picker over
the exact-quantile decision table. The three tiers already exist as
registry rows; pinned here is the DISPATCH — the probe picks the
scale-safe plan for each data shape, every branch is forceable, and
the two exact tiers agree bit-for-bit with the built-in percentile
ground truth.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fintech_etl_spark.operators.analytics import (
    _pick_quantile_tier,
    _q_alias,
    exact_quantiles,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _frame(spark, groups=4, per_group=50):
    rows = [
        (f"g{g}", float(g * 1000 + i * 7 % per_group))
        for g in range(groups)
        for i in range(per_group)
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_q_alias():
    assert _q_alias(0.25) == "p25"
    assert _q_alias(0.5) == "p50"
    assert _q_alias(0.975) == "p97_5"


def test_pick_tier_pure_function():
    kw = dict(max_groups_for_ranking=100, max_group_rows_for_agg=1000)
    # buffer-sized groups → agg, no matter how many groups
    assert _pick_quantile_tier(10, 1000, **kw) == "agg"
    assert _pick_quantile_tier(10**9, 5, **kw) == "agg"
    # huge group, few groups → ranking
    assert _pick_quantile_tier(100, 1001, **kw) == "ranking"
    # huge group AND too many groups → sketch
    assert _pick_quantile_tier(101, 1001, **kw) == "sketch"


def test_exact_tiers_agree_with_builtin(spark):
    df = _frame(spark)
    want = {
        r.g: (r.p25, r.p50, r.p75, r.p95, r.n)
        for r in exact_quantiles(df, "v", by=["g"], tier="agg").collect()
    }
    got = {
        r.g: (r.p25, r.p50, r.p75, r.p95, r.n)
        for r in exact_quantiles(df, "v", by=["g"], tier="ranking").collect()
    }
    assert got == want and len(want) == 4
    # the agg tier IS the built-in percentile (quantile_cont semantics)
    pct = F.percentile("v", F.array(F.lit(0.5)))
    builtin = {
        r.g: r.p50
        for r in df.groupBy("g")
        .agg(F.round(F.element_at(pct, 1), 4).alias("p50"))
        .collect()
    }
    assert {g: t[1] for g, t in want.items()} == builtin


def test_ungrouped_matches_builtin(spark):
    df = _frame(spark)
    got = exact_quantiles(df, "v", qs=(0.5, 0.9)).first()
    pct = F.percentile("v", F.array(F.lit(0.5), F.lit(0.9)))
    want = df.agg(
        F.round(F.element_at(pct, 1), 4).alias("p50"),
        F.round(F.element_at(pct, 2), 4).alias("p90"),
    ).first()
    assert (got.p50, got.p90) == (want.p50, want.p90)
    assert got.n == df.count()


def test_auto_dispatch_many_small_groups_is_agg(spark):
    df = _frame(spark)  # max group = 50 rows — fits any buffer
    out = exact_quantiles(df, "v", by=["g"])
    assert "percentile(" in _plan(out)
    assert "approx" not in _plan(out)


def test_auto_dispatch_few_huge_groups_is_ranking(spark):
    df = _frame(spark)
    out = exact_quantiles(
        df, "v", by=["g"], max_group_rows_for_agg=10
    )  # every group outgrows the 'buffer'
    p = _plan(out)
    assert "percentile" not in p  # no one-buffer aggregate anywhere
    # values still exact
    want = {
        r.g: r.p50
        for r in exact_quantiles(df, "v", by=["g"], tier="agg").collect()
    }
    got = {r.g: r.p50 for r in out.collect()}
    assert got == want


def test_auto_dispatch_hostile_shape_is_sketch_with_warning(spark):
    df = _frame(spark)
    with pytest.warns(UserWarning, match="approx_percentile"):
        out = exact_quantiles(
            df,
            "v",
            by=["g"],
            max_group_rows_for_agg=10,
            max_groups_for_ranking=2,
        )
    assert "percentile_approx" in _plan(out)
    # sketch values are still rank-close on this tiny frame
    got = {r.g: r.p50 for r in out.collect()}
    assert len(got) == 4


def test_forced_ungrouped_agg_warns_one_buffer(spark):
    df = _frame(spark, groups=1)
    with pytest.warns(UserWarning, match="one aggregation buffer"):
        exact_quantiles(df, "v", tier="agg")


def test_empty_input(spark):
    empty = spark.createDataFrame([], "g string, v double")
    assert exact_quantiles(empty, "v", by=["g"]).count() == 0


def test_null_values_agree_across_tiers(spark):
    """The r10 ADVICE finding: NULLs must not shift quantiles when the
    auto-dispatch crosses a tier threshold. All tiers ignore NULL
    values, count only non-NULL rows in ``n``, and drop groups whose
    values are all NULL."""
    rows = (
        [("a", float(i)) for i in range(1, 101)]  # 1..100
        + [("a", None)] * 25  # would shift every rank if counted
        + [("b", 7.0), ("b", None)]
        + [("c", None), ("c", None)]  # all-NULL group: absent everywhere
    )
    df = spark.createDataFrame(rows, "g string, v double")
    outs = {
        t: {
            r.g: (r.p25, r.p50, r.p75, r.p95, r.n)
            for r in exact_quantiles(df, "v", by=["g"], tier=t).collect()
        }
        for t in ("agg", "ranking")
    }
    assert outs["agg"] == outs["ranking"]
    assert set(outs["agg"]) == {"a", "b"}  # no all-NULL group row
    # ground truth: percentile() over non-NULL values, n = non-NULL count
    assert outs["agg"]["a"] == (25.75, 50.5, 75.25, 95.05, 100)
    assert outs["agg"]["b"] == (7.0, 7.0, 7.0, 7.0, 1)
    # the sketch tier shares the filter too (same n, same group set)
    with pytest.warns(UserWarning):
        sk = {
            r.g: r.n
            for r in exact_quantiles(
                df, "v", by=["g"], tier="sketch"
            ).collect()
        }
    assert sk == {"a": 100, "b": 1}


def test_unknown_tier_is_loud(spark):
    with pytest.raises(ValueError, match="quantile tier"):
        exact_quantiles(_frame(spark), "v", by=["g"], tier="bogus")
