"""Relational query surface (SURVEY §2.2 gap-fill / §7.1 M3).

The reference's only relational plan is scan → groupBy → agg → project
(/root/reference/stream/processor.py:32-103). A usable engine needs the
full algebra, so each operator family here is exercised by a named
query over the driver's star schema, registered with a DuckDB oracle.

Scale notes baked into each plan:
- dimension joins broadcast (region/nation/supplier/part are tiny
  relative to facts at every SF — classic star-schema shape);
- aggregations are expressed so Catalyst plans partial+final hash agg;
- every top-k is window-per-group or global sort+limit (TakeOrdered),
  never a driver-side collect;
- AQE handles post-shuffle coalescing and skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table


def _r4(c: F.Column) -> F.Column:
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# Aggregation core (R1–R4 analogues at star-schema scale)
# ---------------------------------------------------------------------------


#: q1 as ONE SQL statement (parameterized with the lineitem frame):
#: building this plan through ~100 Column-object Py4J round-trips cost
#: ~0.32 s PER INVOCATION — more than the query's execution — while a
#: single SQL parse is ~0.05 s. Semantics are identical to the DSL
#: two-level form (bench-verified value-equal); `D` suffixes force
#: DOUBLE literals (bare 100.0 parses as DECIMAL in Spark SQL, which
#: would change division/rounding semantics vs the oracle).
#: Level 1 sums longs per input partition (bounded by
#: maxPartitionBytes → no overflow at any table size); level 2 merges
#: groups×partitions rows in DECIMAL(38,0). Half-up cent display: see
#: the oracle comments.
_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(s_qty AS DECIMAL(38,0))) / 100.0D, 4) AS sum_qty,
       round(sum(CAST(s_price AS DECIMAL(38,0))) / 100.0D, 4) AS sum_base_price,
       round(floor((sum(CAST(s_disc AS DECIMAL(38,0))) + 50) / 100.0D)
             / 100.0D, 4) AS sum_disc_price,
       round(floor((sum(CAST(s_charge AS DECIMAL(38,0))) + 5000) / 10000.0D)
             / 100.0D, 4) AS sum_charge,
       round(sum(CAST(s_qty AS DECIMAL(38,0))) / (100.0D * sum(s_n)), 4)
           AS avg_qty,
       round(sum(CAST(s_price AS DECIMAL(38,0))) / (100.0D * sum(s_n)), 4)
           AS avg_price,
       round(sum(CAST(s_drate AS DECIMAL(38,0))) / (10000.0D * sum(s_n)), 4)
           AS avg_disc,
       sum(s_n) AS count_order
FROM (
  SELECT l_returnflag, l_linestatus, _pid,
         sum(qty_e2) AS s_qty, sum(price_e2) AS s_price,
         sum(disc_e4) AS s_disc, sum(charge_e6) AS s_charge,
         sum(drate_e4) AS s_drate, count(1) AS s_n
  FROM (
    SELECT l_returnflag, l_linestatus,
           CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_e2,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_e2,
           CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                AS BIGINT) AS disc_e4,
           CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      * 1000000 + 0.5) AS BIGINT) AS charge_e6,
           CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS drate_e4,
           spark_partition_id() AS _pid
    FROM {li}
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00')
  GROUP BY l_returnflag, l_linestatus, _pid)
GROUP BY l_returnflag, l_linestatus
"""



@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(CAST(floor(l_quantity * 100 + 0.5) AS DECIMAL(18,0))) / 100.0, 4)
               AS sum_qty,
           round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(18,0))) / 100.0, 4)
               AS sum_base_price,
           round(floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                          AS DECIMAL(18,0))) + 50) / 100.0) / 100.0, 4)
               AS sum_disc_price,
           round(floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5)
                          AS DECIMAL(18,0))) + 5000) / 10000.0) / 100.0, 4)
               AS sum_charge,
           round(sum(CAST(floor(l_quantity * 100 + 0.5) AS DECIMAL(18,0)))
                 / (100.0 * count(*)), 4)                   AS avg_qty,
           round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(18,0)))
                 / (100.0 * count(*)), 4)                   AS avg_price,
           round(sum(CAST(floor(l_discount * 10000 + 0.5) AS DECIMAL(18,0)))
                 / (10000.0 * count(*)), 4)                 AS avg_disc,
           count(*)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "TPC-H Q1-style pricing summary: filter + 2-key hash agg with 8 "
        "aggregates. Every sum accumulates in SCALED-INTEGER units "
        "(cents / 1e-4 / 1e-6) — at sf10 the raw double sums reach "
        "2.4e11 where the 4th display decimal is accumulation-order "
        "noise and the two engines visibly diverge (caught by the "
        "1000×-gate value sweep); the per-row half-up floor of a "
        "bit-identical double is engine-exact and integer addition is "
        "associative. Accumulation is TWO-LEVEL: per-partition partial "
        "sums in 64-bit longs (a partition is capped at "
        "maxPartitionBytes, so a partial sum of e6-scaled prices tops "
        "out near 1e17 ≪ 2^63 regardless of table size), then a final "
        "merge in DECIMAL(38,0) whose headroom outlives any lake. "
        "This buys back the round-5 exactness tax: long arithmetic in "
        "the per-row hot path (~1.7× faster than DECIMAL per-row "
        "accumulation), DECIMAL only over the 4×num_partitions partial "
        "rows. The DuckDB oracle keeps a flat DECIMAL sum — identical "
        "by associativity of exact integer addition. Averages divide "
        "the exact sums by the count in one deterministic fp op."
    ),
    tags=("agg",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(_Q1_SQL, li=li)


@register(
    "q3_segment_topk_revenue",
    """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: 3-way join, filters on both sides, group, global top-k.",
    tags=("join", "topk"),
)
def q3_segment_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer is fact-scale: no forced broadcast — AQE converts to a
        # broadcast join at runtime only if the filtered side is small.
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("_rev"))
        .orderBy(F.col("_rev").desc(), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            _r4(F.col("_rev")).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "q5_region_revenue",
    """
    SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Star join fact→3 broadcast dims, revenue rollup per region.",
    tags=("join", "agg", "broadcast"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    reg = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@register(
    "nation_order_totals",
    """
    SELECT n_name,
           count(*)                     AS n_orders,
           round(sum(o_totalprice), 4)  AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="Customer-path star join with date-range filter pushed to the fact scan.",
    tags=("join", "agg", "broadcast"),
)
def nation_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    # customer is fact-scale (150k × SF): never force-broadcast it; the
    # orders⋈customer join shuffles on custkey (or AQE broadcasts at
    # small SF). Only nation is a true dimension here.
    cust = load_table(spark, sf_dir, "customer")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r4(F.sum("o_totalprice")).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------

_BIG_ORDER = 300000.0


@register(
    "semi_join_big_spenders",
    f"""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > {_BIG_ORDER})
    """,
    doc="EXISTS as left-semi join; filter pushed below the join.",
    tags=("join",),
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > _BIG_ORDER
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_BIG_ANTI = 450000.0


@register(
    "anti_join_no_big_order",
    f"""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > {_BIG_ANTI})
    """,
    doc=(
        "NOT EXISTS as left-anti join (filter below the join). Every "
        "testdata customer has orders, so the predicate keeps the result "
        "non-trivial: customers with no order above the threshold."
    ),
    tags=("join",),
)
def anti_join_no_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > _BIG_ANTI
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
          FROM orders) t
    WHERE rn <= 3
    """,
    doc="Top-3 orders per customer: ranking window, tie-broken by key.",
    tags=("window", "topk"),
)
def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
    FROM orders
    """,
    doc="Running sum per customer in order-date order (analytic frame).",
    tags=("window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r4(F.sum("o_totalprice").over(w)).alias("running_total"),
    )


@register(
    "window_lag_sessionize",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > 3600
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM (SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events) t
    GROUP BY user_id
    """,
    doc="Sessionization: lag window + gap threshold + per-user rollup.",
    tags=("window", "events"),
)
def window_lag_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.withColumn("_new_session", (gap.isNull() | (gap > 3600)).cast("long"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_new_session").alias("n_sessions"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube / pivot
# ---------------------------------------------------------------------------


@register(
    "rollup_flag_status",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (grand total + per-flag subtotals).",
    tags=("agg",),
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _r4(F.sum("l_quantity")).alias("sum_qty")
    )


@register(
    "cube_flag_status",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(avg(l_extendedprice), 4) AS avg_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dimensions.",
    tags=("agg",),
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), _r4(F.avg("l_extendedprice")).alias("avg_price")
    )


@register(
    "pivot_status_by_flag",
    """
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS qty_F,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 4) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot linestatus into columns (explicit value list keeps the plan one pass).",
    tags=("agg",),
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(_r4(F.sum("l_quantity")))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_F"),
            F.col("O").alias("qty_O"),
        )
    )


@register(
    "grouping_sets_flag_status",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="GROUPING SETS with disjoint key sets.",
    tags=("agg",),
)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# ---------------------------------------------------------------------------
# Set operations / distinct / sort-limit
# ---------------------------------------------------------------------------


@register(
    "setop_intersect_statuses",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="INTERSECT of two filtered projections.",
    tags=("setop",),
)
def setop_intersect_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(o)


@register(
    "setop_except_statuses",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="EXCEPT (anti set difference).",
    tags=("setop",),
)
def setop_except_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    p = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.subtract(p)


@register(
    "setop_union_distinct",
    """
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
    doc="UNION (distinct) across two sources.",
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.union(orders).distinct()


@register(
    "topk_orders_global",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject, no full sort.",
    tags=("topk",),
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "distinct_parts_per_supplier",
    """
    SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_suppkey
    """,
    doc="COUNT(DISTINCT) per group (two-phase distinct aggregation).",
    tags=("agg",),
)
def distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(F.countDistinct("l_partkey").alias("n_parts"))


# ---------------------------------------------------------------------------
# events: JSON + time semantics
# ---------------------------------------------------------------------------


@register(
    "events_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(value), 4) AS avg_value,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    doc="JSON prop extraction in the hot path (native get_json_object, no UDF).",
    tags=("events", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _r4(F.avg("value")).alias("avg_value"),
        F.sum(k).alias("sum_k"),
    )


@register(
    "events_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Tumbling 1h time buckets (batch analogue of the streaming window agg).",
    tags=("events", "time"),
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), _r4(F.sum("value")).alias("total_value"))
    )


@register(
    "asof_join_signup_before_purchase",
    """
    SELECT event_id, user_id, ts AS purchase_ts, signup_ts
    FROM (SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts,
                 row_number() OVER (PARTITION BY p.event_id ORDER BY s.ts DESC) AS rn
          FROM events p
          JOIN events s ON s.user_id = p.user_id
                       AND s.event_type = 'signup'
                       AND s.ts <= p.ts
          WHERE p.event_type = 'purchase') t
    WHERE rn = 1
    """,
    doc=(
        "As-of join (Spark lacks a native one): equi-join on user + range "
        "predicate, latest-prior picked by max aggregation. Shuffles once "
        "on user_id; per-user fan-in is bounded, so it scales."
    ),
    tags=("join", "asof", "events"),
)
def asof_join_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    return (
        p.join(s, (p.user_id == F.col("s_user")) & (F.col("s_ts") <= p.ts))
        .groupBy("event_id", "user_id", "ts")
        .agg(F.max("s_ts").alias("signup_ts"))
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "signup_ts")
    )


@register(
    "range_join_quantity_bands",
    """
    WITH bands(band, lo, hi) AS (
        VALUES ('small', 0.0, 10.0), ('medium', 10.0, 25.0), ('large', 25.0, 1e9)
    )
    SELECT band, count(*) AS n, round(sum(l_extendedprice), 4) AS total_price
    FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
    GROUP BY band
    """,
    doc=(
        "Range (band) join: tiny band table broadcast → nested-loop join "
        "stays executor-local; the fact side never shuffles."
    ),
    tags=("join", "range"),
)
def range_join_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bands = F.broadcast(
        spark.createDataFrame(
            [("small", 0.0, 10.0), ("medium", 10.0, 25.0), ("large", 25.0, 1e9)],
            "band string, lo double, hi double",
        )
    )
    return (
        li.join(bands, (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r4(F.sum("l_extendedprice")).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar function library (string / date / math / conditional)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           upper(p_name)                                    AS name_upper,
           CAST(length(p_name) AS INTEGER)                  AS name_len,
           substr(p_type, 1, 5)                             AS type_prefix,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0')        AS padded_key,
           replace(p_brand, '#', '-')                       AS brand_dashed,
           concat(p_brand, ':', p_type)                     AS brand_type
    FROM part
    """,
    doc="String function battery as a pure projection (no shuffle).",
    tags=("scalar",),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dashed"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )


@register(
    "scalar_date_funcs",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER)  AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           count(*) AS n,
           round(sum(o_totalprice), 4) AS total
    FROM orders GROUP BY 1, 2
    """,
    doc="Date part extraction + calendar rollup.",
    tags=("scalar", "time"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(F.count(F.lit(1)).alias("n"), _r4(F.sum("o_totalprice")).alias("total"))
    )


@register(
    "scalar_math_funcs",
    """
    SELECT c_custkey,
           round(abs(c_acctbal), 4)                    AS abs_bal,
           CAST(floor(c_acctbal) AS BIGINT)            AS floor_bal,
           CAST(ceil(c_acctbal) AS BIGINT)             AS ceil_bal,
           round(sqrt(abs(c_acctbal)), 4)              AS sqrt_bal,
           round(ln(abs(c_acctbal) + 1), 4)            AS ln_bal,
           round(pow(c_acctbal, 2), 4)                 AS sq_bal
    FROM customer
    """,
    doc="Math function battery as a pure projection.",
    tags=("scalar",),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        _r4(F.abs(bal)).alias("abs_bal"),
        F.floor(bal).alias("floor_bal"),
        F.ceil(bal).alias("ceil_bal"),
        _r4(F.sqrt(F.abs(bal))).alias("sqrt_bal"),
        _r4(F.log(F.abs(bal) + 1)).alias("ln_bal"),
        _r4(F.pow(bal, 2)).alias("sq_bal"),
    )


@register(
    "case_when_balance_buckets",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
    doc="CASE WHEN bucketing + rollup (reference F3/F5 are this shape).",
    tags=("scalar", "agg"),
)
def case_when_balance_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    bucket = (
        F.when(bal < 0, "negative")
        .when(bal < 5000, "low")
        .when(bal < 9000, "mid")
        .otherwise("high")
    )
    return cust.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "above_nation_avg_balance",
    """
    SELECT c_custkey
    FROM customer
    JOIN (SELECT c_nationkey AS nk, avg(c_acctbal) AS nation_avg
          FROM customer GROUP BY c_nationkey) t
      ON c_nationkey = nk
    WHERE c_acctbal > nation_avg
    """,
    doc="Correlated-subquery pattern as agg + self-join.",
    tags=("join", "agg"),
)
def above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), F.col("c_nationkey") == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey")
    )


@register(
    "having_busy_suppliers",
    """
    SELECT l_suppkey, count(*) AS n_items
    FROM lineitem GROUP BY l_suppkey HAVING count(*) > 100
    """,
    doc="HAVING post-aggregation filter.",
    tags=("agg",),
)
def having_busy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") > 100)
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped classics (distinct optimizer shapes)
# ---------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS yr,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS volume
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2') AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
    doc=(
        "TPC-H Q7 shape: 5-way join with the same dimension (nation) "
        "joined twice under different roles, cross-nation filter, "
        "3-key rollup. The nation filters reach both scans; the "
        "lineitem⋈orders join is the only large shuffle."
    ),
    tags=("join", "agg"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nations = ("NATION_1", "NATION_2")
    sn = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    cn = F.broadcast(
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("yr")
        )
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "volume"
            )
        )
    )


@register(
    "q14_promo_revenue_share",
    """
    SELECT round(100.0 * sum(CASE WHEN p_name LIKE 'red%'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
    doc=(
        "TPC-H Q14 shape: conditional-revenue ratio in a single "
        "aggregation (no self-join); part dimension broadcast, date "
        "range pushed to the fact scan."
    ),
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_name").startswith("red"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(_r4(100.0 * F.sum(promo) / F.sum(rev)).alias("promo_pct"))
    )


@register(
    "q19_disjunctive_predicates",
    """
    SELECT count(*) AS n, round(sum(l_extendedprice), 4) AS total
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_size <= 10 AND l_quantity >= 25 AND p_type = 'ECONOMY')
       OR (p_size >= 40 AND l_quantity <= 5  AND p_brand LIKE 'Brand#1%')
    """,
    doc=(
        "TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst "
        "derives the common residual (p_size/l_quantity bounds) and "
        "pushes partial predicates below the join instead of filtering "
        "after it."
    ),
    tags=("join",),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    pred = (
        (F.col("p_size") <= 10) & (F.col("l_quantity") >= 25) & (F.col("p_type") == "ECONOMY")
    ) | (
        (F.col("p_size") >= 40) & (F.col("l_quantity") <= 5) & F.col("p_brand").startswith("Brand#1")
    )
    return joined.filter(pred).agg(
        F.count(F.lit(1)).alias("n"), _r4(F.sum("l_extendedprice")).alias("total")
    )


@register(
    "q15_top_supplier_by_revenue",
    """
    WITH revenue AS (
        -- integer cents, NOT a double sum: the view is evaluated twice
        -- (rows + max scalar), and at a few million rows a parallel
        -- double accumulation can make the re-evaluated max equal NO
        -- value of the first evaluation — measured at sf1 as DuckDB
        -- returning 0 rows. BIGINT sums are order-exact, so the
        -- self-equality is safe in both engines at any scale.
        SELECT l_suppkey AS supplier_no,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                        AS BIGINT)) AS rev_e2
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(rev_e2 / 100.0, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE rev_e2 = (SELECT max(rev_e2) FROM revenue)
    """,
    doc=(
        "TPC-H Q15 shape: derived revenue view joined back against its "
        "own max — the aggregate is computed once and reused on both "
        "sides (scalar subquery becomes a broadcast 1-row join). "
        "Revenue accumulates in integer cents so the self-equality "
        "against a re-evaluated aggregate cannot be broken by "
        "accumulation-order ulps (the sf1 sweep caught the double-sum "
        "form returning zero rows in DuckDB)."
    ),
    tags=("join", "agg", "subquery"),
)
def q15_top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast(
                "long"
            )
        ).alias("rev_e2")
    )
    max_rev = revenue.agg(F.max("rev_e2").alias("mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("rev_e2") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_e2") / 100.0, 2).alias("total_revenue"),
        )
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice, sum_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN (SELECT l_orderkey, round(sum(l_quantity), 4) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250) big ON o_orderkey = big.l_orderkey
    """,
    doc=(
        "TPC-H Q18 shape: HAVING-filtered aggregate subquery drives a "
        "semi-join-like reduction of the fact table before the customer "
        "join — the aggregate's output is small, so it broadcasts."
    ),
    tags=("join", "agg", "subquery"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey", _r4(F.col("_sq")).alias("sum_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            _r4(F.col("o_totalprice")).alias("o_totalprice"),
            "sum_qty",
        )
    )


@register(
    "q22_idle_rich_customers",
    """
    WITH b AS (SELECT c_custkey, c_name,
                      CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_e2
               FROM customer),
    -- the avg comparison as exact integers: c_acctbal > avg(pos)
    -- becomes bal_e2 · n_pos > total_pos_e2 — immune to the
    -- re-evaluated-double-aggregate ulp class the sf1 sweep caught
    t AS (SELECT CAST(sum(bal_e2) AS BIGINT) AS tot_e2,
                 CAST(count(*) AS BIGINT) AS n_pos
          FROM b WHERE bal_e2 > 0),
    eligible AS (
        SELECT substr(c_name, 10, 1) AS name_digit, c_custkey, bal_e2
        FROM b, t
        WHERE bal_e2 * n_pos > tot_e2
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_totalprice > 400000))
    SELECT name_digit, CAST(count(*) AS BIGINT) AS n_cust,
           round(sum(bal_e2) / 100.0, 2) AS total_bal
    FROM eligible GROUP BY name_digit
    """,
    doc=(
        "TPC-H Q22 shape: scalar average subquery (1-row broadcast), "
        "anti-join against filtered orders, substring bucketing "
        "rollup. Balances quantize to integer cents and the average "
        "test is the exact cross-multiplied BIGINT comparison "
        "bal·n > total, so neither the threshold nor the rollup "
        "depends on double accumulation order at any scale."
    ),
    tags=("join", "agg", "subquery"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_e2"),
    )
    t = cust.filter(F.col("bal_e2") > 0).agg(
        F.sum("bal_e2").alias("tot_e2"), F.count(F.lit(1)).alias("n_pos")
    )
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    eligible = (
        cust.join(F.broadcast(t))
        .filter(F.col("bal_e2") * F.col("n_pos") > F.col("tot_e2"))
        .join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
    )
    return eligible.groupBy(
        F.substring("c_name", 10, 1).alias("name_digit")
    ).agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("bal_e2") / 100.0, 2).alias("total_bal"),
    )
