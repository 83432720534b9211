"""Fintech audit screens over the order book.

The reference is a vendor-invoice ETL (/root/reference/README.md) —
these are the audit queries its downstream AP/finance consumers run on
the resulting ledger: duplicate-payment detection and Benford's-law
digit screening, both standard fraud/error controls. Expressed as
declarative plans with exact DuckDB oracles like every other family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table

#: Duplicate-payment screen: same payer, order dates within this many
#: days, amounts within this relative tolerance.
_DUP_WINDOW_DAYS = 30
_DUP_REL_TOL = 0.01


@register(
    "audit_duplicate_payments",
    f"""
    WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
               FROM orders)
    SELECT a.o_custkey                              AS custkey,
           a.o_orderkey                             AS order_a,
           b.o_orderkey                             AS order_b,
           round(a.o_totalprice, 4)                 AS amount_a,
           round(b.o_totalprice, 4)                 AS amount_b,
           CAST(abs(date_diff('day', a.o_orderdate, b.o_orderdate))
                AS INTEGER)                         AS days_apart,
           round(abs(a.o_totalprice - b.o_totalprice)
                 / greatest(a.o_totalprice, b.o_totalprice), 4) AS rel_diff
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= {_DUP_WINDOW_DAYS}
     AND abs(a.o_totalprice - b.o_totalprice)
         <= {_DUP_REL_TOL} * greatest(a.o_totalprice, b.o_totalprice)
    """,
    doc=(
        "Duplicate-payment screen, the classic AP control: pairs of "
        "orders from the SAME payer whose dates fall within "
        f"{_DUP_WINDOW_DAYS} days and whose amounts agree within "
        f"{_DUP_REL_TOL:.0%} — near-identical invoices paid twice. "
        "ONE self-join keyed on the payer: per-key fan-in is bounded "
        "by orders-per-customer (tens, not millions), so the shuffle "
        "is skew-free; at lake scale the date predicate additionally "
        "blocks by month bucket so a year of history never joins "
        "against itself. Exact rational comparisons; both engines "
        "evaluate the identical band predicate."
    ),
    tags=("audit", "join", "dq"),
)
def audit_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_a"),
        F.col("o_totalprice").alias("price_a"),
        F.col("o_orderdate").alias("date_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_b"),
        F.col("o_totalprice").alias("price_b"),
        F.col("o_orderdate").alias("date_b"),
    )
    days_apart = F.abs(
        F.datediff(F.col("date_a").cast("date"), F.col("date_b").cast("date"))
    )
    hi = F.greatest("price_a", "price_b")
    return (
        a.join(b, "custkey")
        .filter(
            (F.col("order_a") < F.col("order_b"))
            & (days_apart <= _DUP_WINDOW_DAYS)
            & (F.abs(F.col("price_a") - F.col("price_b")) <= _DUP_REL_TOL * hi)
        )
        .select(
            "custkey",
            "order_a",
            "order_b",
            F.round("price_a", 4).alias("amount_a"),
            F.round("price_b", 4).alias("amount_b"),
            days_apart.cast("int").alias("days_apart"),
            F.round(
                F.abs(F.col("price_a") - F.col("price_b")) / hi, 4
            ).alias("rel_diff"),
        )
    )


@register(
    "audit_benford_screen",
    """
    WITH d AS (SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                      AS digit
               FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM d GROUP BY digit),
    t AS (SELECT CAST(sum(observed) AS DOUBLE) AS total FROM c)
    SELECT digit,
           observed,
           round(observed / t.total, 4)                       AS observed_share,
           round(log10(1 + 1.0 / CAST(digit AS INTEGER)), 4)  AS benford_share,
           round(pow(observed / t.total
                     - log10(1 + 1.0 / CAST(digit AS INTEGER)), 2)
                 / log10(1 + 1.0 / CAST(digit AS INTEGER)) * t.total, 4)
               AS chi2_contrib
    FROM c CROSS JOIN t
    """,
    doc=(
        "Benford's-law first-digit screen on order amounts — the "
        "standard forensic-accounting test (fabricated or process-"
        "generated amounts deviate from the log10(1+1/d) digit law). "
        "Per digit: observed share vs Benford expectation and the "
        "chi-square contribution, so the 9-row output is both the "
        "verdict and the evidence. ONE grouped count over the scan "
        "plus a broadcast total — the cheapest possible full-ledger "
        "pass; on the synthetic book it correctly reports a large "
        "deviation (uniform-ish amounts are exactly what the screen "
        "exists to flag)."
    ),
    tags=("audit", "agg", "dq"),
)
def audit_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("string"), 1, 1
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    t = c.agg(F.sum("observed").cast("double").alias("total"))
    benford = F.log10(1 + 1.0 / F.col("digit").cast("int"))
    share = F.col("observed") / F.col("total")
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "observed",
        F.round(share, 4).alias("observed_share"),
        F.round(benford, 4).alias("benford_share"),
        F.round(
            F.pow(share - benford, 2) / benford * F.col("total"), 4
        ).alias("chi2_contrib"),
    )


@register(
    "audit_order_reconciliation",
    """
    WITH r AS (SELECT l_orderkey,
                      -- all arithmetic in 10^-4 currency units as
                      -- BIGINT: the per-line double is bit-identical
                      -- in both engines, floor() of it is too, and
                      -- integer sums are associative — no accumulation
                      -- -order noise and no double->DECIMAL rounding
                      -- divergence (engines disagree at .xxxx5 ties)
                      sum(CAST(floor(l_extendedprice * (1 + l_tax)
                                     * (1 - l_discount) * 10000 + 0.5)
                               AS BIGINT)) AS recomputed_e4
               FROM lineitem GROUP BY l_orderkey),
    j AS (SELECT o.o_orderkey,
                 CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT) AS booked_e4,
                 r.recomputed_e4,
                 abs(CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT)
                     - coalesce(r.recomputed_e4, 0)) AS diff_e4
          FROM orders o LEFT JOIN r ON o.o_orderkey = r.l_orderkey),
    k AS (SELECT *,
                 CASE WHEN recomputed_e4 IS NULL THEN 'no_lineitems'
                      WHEN diff_e4 <= 100 THEN 'match'
                      WHEN 100 * diff_e4 <= booked_e4 THEN 'minor_variance'
                      ELSE 'major_variance' END AS status
          FROM j)
    SELECT status,
           CAST(count(*) AS BIGINT)                  AS n_orders,
           round(sum(booked_e4) / 10000.0, 4)        AS booked_total,
           round(sum(diff_e4) / 10000.0, 4)          AS abs_variance
    FROM k GROUP BY status
    """,
    doc=(
        "Invoice recomputation control — THE three-way-match step of "
        "an AP audit: every order's booked total is re-derived from "
        "its line items (extended price grossed for tax, net of "
        "discount) and bucketed into match / minor (≤1%) / major "
        "variance / no-line-items orphans, with order counts and "
        "absolute variance per bucket. One orderkey-keyed aggregation "
        "plus one orderkey join — both sides shuffle on the fact "
        "table's natural key, so the control costs one co-partitioned "
        "pass at any ledger size. On the synthetic book it correctly "
        "reports wholesale variance (the generator does not maintain "
        "the TPC-H total invariant) and 257 orphaned orders — the "
        "screen's job is to say so."
    ),
    tags=("audit", "join", "dq"),
)
def audit_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # integer 10^-4 currency units throughout — see the oracle comment
    line_e4 = F.floor(
        F.col("l_extendedprice")
        * (1 + F.col("l_tax"))
        * (1 - F.col("l_discount"))
        * 10000 + 0.5
    ).cast("long")
    r = li.groupBy("l_orderkey").agg(F.sum(line_e4).alias("recomputed_e4"))
    booked_e4 = F.floor(F.col("o_totalprice") * 10000 + 0.5).cast("long")
    j = (
        orders.join(r, orders.o_orderkey == r.l_orderkey, "left")
        .withColumn("booked_e4", booked_e4)
        .withColumn(
            "diff_e4",
            F.abs(
                F.col("booked_e4") - F.coalesce("recomputed_e4", F.lit(0))
            ),
        )
    )
    status = (
        F.when(F.col("recomputed_e4").isNull(), "no_lineitems")
        .when(F.col("diff_e4") <= 100, "match")
        .when(100 * F.col("diff_e4") <= F.col("booked_e4"), "minor_variance")
        .otherwise("major_variance")
    )
    return (
        j.withColumn("status", status)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("booked_e4") / 10000.0, 4).alias("booked_total"),
            F.round(F.sum("diff_e4") / 10000.0, 4).alias("abs_variance"),
        )
    )

