"""Remaining TPC-H query shapes (Q2/Q4/Q6/Q8/Q9/Q10/Q11/Q12/Q13/Q16/Q17/Q20/Q21).

Together with operators/relational.py (Q1/Q3/Q5/Q7/Q14/Q15/Q18/Q19/Q22)
this completes all 22 classic optimizer shapes over the driver's star
schema. The reference has no query surface at all
(/root/reference/stream/processor.py is its only "plan"), so these are
engine deliverables per SURVEY §2.2's gap-fill note.

The testdata is a TPC-H *subset* (no partsupp, no l_commitdate /
l_receiptdate / l_shipmode), so shapes that need those columns are
adapted while preserving the plan structure the query is famous for:

- Q2's correlated-min over partsupp  → min unit-price per (part,supp)
  derived from lineitem, rank-1 within part;
- Q4/Q12/Q21's commit/receipt lateness → shipping delay
  (l_shipdate vs o_orderdate + INTERVAL);
- Q11/Q20's availqty value → shipped-quantity value from lineitem;
- Q16's supplier complaint exclusion → brand exclusion only.

Scale posture: every dimension join broadcasts (part 200k, supplier
10k per SF unit — both << facts), every correlated subquery is
rewritten as aggregate + join (never a per-row subquery), thresholds
become 1-row broadcast cross joins, and rank-1 picks use window
row_number with explicit key tie-breaks so results are deterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table


def _r4(c: F.Column) -> F.Column:
    return F.round(c, 4)


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part (correlated MIN subquery → rank-1)
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey)
    -- unit_cost is emitted UNROUNDED: the quotient + min is IEEE-
    -- deterministic (bit-identical across engines), while an engine-
    -- side round(x,4) lands .xxxx5-boundary values differently per
    -- engine (observed at sf0.001); the compare harness normalizes.
    SELECT p_partkey, s_name, unit_cost
    FROM (SELECT l_partkey, l_suppkey, unit_cost,
                 row_number() OVER (PARTITION BY l_partkey
                       ORDER BY unit_cost, l_suppkey) AS rn
          FROM cost) c
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE rn = 1 AND p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
    """,
    doc=(
        "TPC-H Q2 shape: cheapest supplier per part. The spec's "
        "correlated MIN over partsupp becomes a grouped min of unit "
        "price from lineitem + rank-1 window (suppkey tie-break), "
        "then broadcast joins to both dimensions."
    ),
    tags=("join", "subquery", "window"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = W.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
        )
    )
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        best.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "s_name", "unit_cost")
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left-semi)
# ---------------------------------------------------------------------------


@register(
    "q4_priority_late_ship",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: EXISTS with a correlated inequality "
        "(commitdate<receiptdate adapted to ship-30-days-late) planned "
        "as a left-semi join; the quarter filter prunes the orders scan "
        "before the shuffle."
    ),
    tags=("join", "subquery", "agg"),
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (pure scan-filter-agg, full pushdown)
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc=(
        "TPC-H Q6: the canonical pushdown probe — every predicate "
        "reaches the parquet scan (date range + discount band + "
        "quantity), single partial+final agg, zero shuffle of raw rows."
    ),
    tags=("agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (two-level agg over a 7-way star join)
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    """
    SELECT yr, round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE 0 END) / sum(volume), 4) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                 l_extendedprice * (1 - l_discount) AS volume,
                 sn.n_name AS supp_nation
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN part     ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN region   ON cn.n_regionkey = r_regionkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') t
    GROUP BY yr
    """,
    doc=(
        "TPC-H Q8 shape: market share of one supplier nation within a "
        "customer region — nation joined twice under different roles, "
        "conditional-sum ratio instead of a self-join. part/supplier/"
        "nation/region broadcast; lineitem⋈orders is the one big "
        "shuffle, pre-pruned by the part filter."
    ),
    tags=("join", "agg", "broadcast"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    reg = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    cn = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
        )
    )
    sn = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(reg, F.col("cn_reg") == F.col("r_regionkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("yr"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return joined.groupBy("yr").agg(
        _r4(F.sum(nation_vol) / F.sum("volume")).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS yr,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity), 4) AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'PROMO'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc=(
        "TPC-H Q9 shape: profit rollup per supplier nation × order "
        "year. ps_supplycost (no partsupp table) is modelled as 10% of "
        "p_retailprice per unit; the filtered part dim broadcasts and "
        "prunes the fact before the orders shuffle."
    ),
    tags=("join", "agg", "broadcast"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(_r4(F.sum(profit)).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue top-20
# ---------------------------------------------------------------------------


@register(
    "q10_returned_revenue",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc=(
        "TPC-H Q10: lost-revenue ranking of customers who returned "
        "items in a quarter — returnflag filter pushed to the fact "
        "scan, 4-way join, top-20 via TakeOrdered (custkey tie-break)."
    ),
    tags=("join", "agg", "topk"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.alias("_rev"))
        .orderBy(F.col("_rev").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", _r4(F.col("_rev")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q11 — value concentration (scalar-subquery threshold)
# ---------------------------------------------------------------------------


@register(
    "q11_part_value_concentration",
    """
    WITH value AS (
        -- integer cents: the view is re-evaluated for the scalar
        -- subquery, and a double threshold from a second accumulation
        -- order can disagree with the first by an ulp (the exact
        -- failure the sf1 sweep caught on q15's self-equality);
        -- 0.002·total becomes the EXACT BIGINT test 500·part > total
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * l_quantity * 100 + 0.5) AS BIGINT))
                   AS value_e2
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey)
    SELECT l_partkey, round(value_e2 / 100.0, 2) AS part_value
    FROM value
    WHERE value_e2 * 500 > (SELECT sum(value_e2) FROM value)
    """,
    doc=(
        "TPC-H Q11 shape: parts holding an outsized share of one "
        "nation's traded value — the grouped value view is computed "
        "once and compared against its own grand total (scalar "
        "subquery → 1-row broadcast cross join). Values accumulate in "
        "integer cents and the 0.2% threshold is the exact BIGINT "
        "test 500·part > total, so the comparison against the "
        "re-evaluated grand total cannot be broken by accumulation-"
        "order ulps."
    ),
    tags=("join", "agg", "subquery"),
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    )
    value = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * F.col("l_quantity") * 100 + 0.5
                ).cast("long")
            ).alias("value_e2")
        )
    )
    total = value.agg(F.sum("value_e2").alias("total_e2"))
    return (
        value.join(F.broadcast(total))
        .filter(F.col("value_e2") * 500 > F.col("total_e2"))
        .select(
            "l_partkey", F.round(F.col("value_e2") / 100.0, 2).alias("part_value")
        )
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay priority classes (CASE-sum over a join)
# ---------------------------------------------------------------------------


@register(
    "q12_shipdelay_priority",
    """
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 'slow' ELSE 'fast' END AS ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    doc=(
        "TPC-H Q12 shape: priority-class counts per shipping bucket "
        "(l_shipmode adapted to a ship-delay CASE), conditional sums "
        "in one pass over the join."
    ),
    tags=("join", "agg"),
)
def q12_shipdelay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        "slow",
    ).otherwise("fast")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + double agg)
# ---------------------------------------------------------------------------


@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey) t
    GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13: order-count histogram — left outer join keeps "
        "zero-order customers (count(col) skips their nulls), then a "
        "second aggregation over the first's output."
    ),
    tags=("join", "agg"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part group (distinct agg after exclusion)
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_part_diversity",
    """
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO' AND p_size IN (1, 9, 14, 23, 36, 45)
    GROUP BY p_brand, p_size
    """,
    doc=(
        "TPC-H Q16 shape: distinct-supplier counts per part group with "
        "negated predicates (partsupp adapted to the lineitem bridge); "
        "two-phase distinct aggregation after a broadcast join."
    ),
    tags=("join", "agg"),
)
def q16_supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#9")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 23, 36, 45)
        )
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG threshold)
# ---------------------------------------------------------------------------


@register(
    "q17_small_qty_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS t_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
          FROM lineitem GROUP BY l_partkey) t ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < half_avg_qty
    """,
    doc=(
        "TPC-H Q17 shape: revenue from orders below half the part's "
        "average quantity — the correlated scalar AVG is decorrelated "
        "into a grouped aggregate joined back on partkey."
    ),
    tags=("join", "agg", "subquery"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(_r4(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q20 — dominant suppliers (nested IN over a grouped threshold)
# ---------------------------------------------------------------------------


@register(
    "q20_dominant_suppliers",
    """
    WITH shipped AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey),
    part_total AS (
        SELECT l_partkey AS pt_partkey, sum(supp_qty) AS total_qty
        FROM shipped GROUP BY l_partkey)
    SELECT DISTINCT s_suppkey, s_name
    FROM shipped
    JOIN part_total ON pt_partkey = l_partkey
    JOIN supplier   ON s_suppkey = l_suppkey
    JOIN nation     ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7' AND supp_qty > 0.5 * total_qty
    """,
    doc=(
        "TPC-H Q20 shape: suppliers shipping >50% of a part's yearly "
        "volume (availqty>half-shipped adapted to share-of-shipped). "
        "The nested IN chain is decorrelated into two grouped "
        "aggregates joined on partkey, then DISTINCT projects the "
        "supplier set."
    ),
    tags=("join", "agg", "subquery"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("supp_qty").alias("total_qty")
    )
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    )
    return (
        shipped.join(part_total, F.col("pt_partkey") == F.col("l_partkey"))
        .filter(F.col("supp_qty") > 0.5 * F.col("total_qty"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting
# (EXISTS + NOT EXISTS against the same fact)
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
    all_supp AS (SELECT DISTINCT l_orderkey AS a_orderkey,
                                 l_suppkey  AS a_suppkey FROM lineitem)
    SELECT s_name, count(*) AS numwait
    FROM late
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE EXISTS (SELECT 1 FROM all_supp
                  WHERE a_orderkey = l_orderkey AND a_suppkey <> l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = late.l_orderkey
                        AND l2.l_suppkey <> late.l_suppkey)
    GROUP BY s_name
    """,
    doc=(
        "TPC-H Q21 shape: the sole late supplier on multi-supplier "
        "finished orders (receiptdate>commitdate adapted to "
        "ship-60-days-late). EXISTS → left-semi and NOT EXISTS → "
        "left-anti against the same derived fact, both shuffling on "
        "orderkey so the joins co-locate."
    ),
    tags=("join", "subquery", "agg"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # `late` is DISTINCT (orderkey, suppkey), so the two correlated
    # subqueries collapse to per-order counts — same result set, one
    # computation of `late` instead of two and no sort-merge anti join
    # (the old plan duplicated the whole join+distinct subtree per
    # subquery — r15 plan capture):
    #   NOT EXISTS other late supplier  ⇔  count(late rows per order) = 1
    #   EXISTS any other supplier       ⇔  order's distinct suppliers ≥ 2
    #     (this row's suppkey is always among them)
    # Kept as a WINDOW count on purpose: the equivalent hash-agg form
    # (groupBy(l_orderkey).agg(count, min(l_suppkey)).filter(n=1) —
    # min IS the sole supplier) measured 1.14× SLOWER at sf0.1
    # (interleaved min-of-3 fresh-JVM, idle box: 3.08 s vs 2.70 s) —
    # `late` is already distinct so partial aggregation buys nothing,
    # and the agg's own exchange costs more than WindowExec's sort.
    n_late = F.count(F.lit(1)).over(W.partitionBy("l_orderkey"))
    sole_late = late.withColumn("n_late", n_late).filter(
        F.col("n_late") == 1
    )
    multi = (
        li.groupBy(F.col("l_orderkey").alias("a_orderkey"))
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") >= 2)
        .select("a_orderkey")
    )
    sole_late = sole_late.join(
        multi, F.col("a_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        sole_late.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Full outer join (the one join type the rest of the surface lacks)
# ---------------------------------------------------------------------------


@register(
    "full_outer_spend_by_status",
    """
    SELECT coalesce(f.custkey, o.custkey) AS custkey,
           round(coalesce(f.total, 0.0), 4) AS f_total,
           round(coalesce(o.total, 0.0), 4) AS o_total
    FROM (SELECT o_custkey AS custkey, sum(o_totalprice) AS total
          FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 350000
          GROUP BY o_custkey) f
    FULL OUTER JOIN
         (SELECT o_custkey AS custkey, sum(o_totalprice) AS total
          FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 350000
          GROUP BY o_custkey) o
      ON f.custkey = o.custkey
    """,
    doc=(
        "Full outer join of two filtered per-customer aggregates — "
        "customers present on either side survive with the missing side "
        "zero-filled. Both inputs shuffle once on the same key, so the "
        "join itself is co-partitioned."
    ),
    tags=("join", "setop"),
)
def full_outer_spend_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def side(status: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderstatus") == status) & (F.col("o_totalprice") > 350000)
            )
            .groupBy(F.col("o_custkey").alias(f"{status}_custkey"))
            .agg(F.sum("o_totalprice").alias(f"{status}_total"))
        )

    f, o = side("F"), side("O")
    return f.join(o, f.F_custkey == o.O_custkey, "full_outer").select(
        F.coalesce("F_custkey", "O_custkey").alias("custkey"),
        F.round(F.coalesce("F_total", F.lit(0.0)), 4).alias("f_total"),
        F.round(F.coalesce("O_total", F.lit(0.0)), 4).alias("o_total"),
    )
