"""Distributed exact ranking (operators/ranking.py): bit-parity with
the single-partition window it replaces, under ties, skew, descending
order, tiny/empty frames, and every n-mod-k ntile fill shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_etl_spark.operators.ranking import global_ntile, global_row_number


def _frame(spark, n=5000, seed=7):
    # heavy ties in `v` (only 97 distinct values) so range-partition
    # boundaries land INSIDE tie groups; `k` is the unique tie-break
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64(F.col("id") + seed), F.lit(97)).alias("v"),
    )


def test_global_row_number_matches_window(spark):
    df = _frame(spark)
    order = [F.col("v").asc(), F.col("k").asc()]
    got = global_row_number(df, order, out="rk")
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_row_number_desc_with_asc_tiebreak(spark):
    # mixed directions (the gini drk shape: value DESC, key ASC)
    df = _frame(spark, n=3000)
    order = [F.col("v").desc(), F.col("k").asc()]
    got = global_row_number(df, order, out="rk")
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    assert got.exceptAll(want).count() == 0


def test_global_row_number_total_column(spark):
    df = _frame(spark, n=1234)
    got = global_row_number(df, ["v", "k"], out="rk", total="n")
    rows = got.agg(
        F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
        F.count_distinct("rk").alias("d"),
        F.max("n").alias("n"),
        F.min("n").alias("n2"),
    ).first()
    assert (rows.lo, rows.hi, rows.d) == (1, 1234, 1234)
    assert rows.n == rows.n2 == 1234


@pytest.mark.parametrize("n,k", [(40, 4), (41, 4), (43, 4), (7, 10), (1, 3), (1000, 10)])
def test_global_ntile_matches_window_every_fill_shape(spark, n, k):
    # n % k == 0, 1, 3; n < k (every tile size 1); big exact case
    df = _frame(spark, n=n)
    order = [F.col("v").asc(), F.col("k").asc()]
    got = global_ntile(df, order, k, "t")
    want = df.withColumn("t", F.ntile(k).over(Window.orderBy(*order)))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_row_number_empty_frame(spark):
    df = _frame(spark, n=1).filter(F.col("k") < 0)
    assert global_row_number(df, ["v", "k"]).count() == 0


def test_global_rank_plan_has_no_window(spark, monkeypatch):
    """The whole point: the recipe's physical plan contains no
    WindowExec at all (not merely a partitioned one). The helper's
    localCheckpoint would hide its upstream lineage from a plan walk,
    so neutralize it here and walk the TRUE full plan."""
    # patch the CONCRETE class — pyspark 4's classic DataFrame shadows
    # the abstract pyspark.sql.DataFrame's methods
    from pyspark.sql.classic.dataframe import DataFrame

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    df = _frame(spark, n=2000)
    ranked = global_ntile(df, ["v", "k"], 10, "t")
    plan = ranked._jdf.queryExecution().sparkPlan()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    names = [n.nodeName() for n in walk(plan)]
    assert all(n != "Window" for n in names)
    # and the one full-data movement really is a RANGE exchange
    assert any("Sort" in n or "Exchange" in n for n in names)
