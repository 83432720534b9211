"""Graph analytics over the part co-purchase graph.

The reference has no graph layer; these operators extend the engine the
way a production lakehouse grows one — derive an edge list from a fact
table (parts co-ordered in the same order, the same basket primitive as
``part_affinity_lift``), then run the two canonical whole-graph
screens on it: PageRank (importance) and triangle counting / global
clustering (community density). Both are expressed as pure DataFrame
plans with exact unrolled DuckDB oracles, the same verification pattern
as ``kmeans_fit`` (iterations become CTE rounds, no RNG, no engine-
defined ordering).

Scale posture (100 TB fact table):
- The edge list is built with the LOCAL pair generator — baskets
  collapse to one sorted array per order and all a<b pairs explode
  per-row, so there is no fact-table self-join and Σ basket²/2 bounds
  the intermediate (baskets are 4-13 items).
- A minimum co-occurrence support (≥2) prunes the hairball: edge count
  grows with *repeated* co-purchases, not with raw order count, which
  is what keeps the iterated graph joins small relative to the lake.
- PageRank shuffles (node, double) pairs only — two keyed joins per
  iteration, both on the node id the edge list is already hashed by.
- Triangle counting uses the degree-orientation trick: every
  undirected edge is directed from its lower-(degree, id) endpoint, so
  per-node out-degree is O(sqrt(m)) and the wedge join can never go
  quadratic on a hub node — the standard bound that makes exact
  triangle counting feasible at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.barrier import materialization_barrier
from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table

#: Minimum number of distinct orders a part pair must co-occur in to
#: become an edge. Support-1 pairs are noise (any two parts that ever
#: shared a basket) and make the graph quadratic-ish in basket size;
#: support ≥ 2 keeps edges that recur, which is both the analytical
#: intent and the scale bound.
_MIN_SUPPORT = 2

#: PageRank damping and iteration count. 3 unrolled iterations, like
#: the kmeans oracle — enough to differentiate hubs from leaves while
#: keeping the oracle an exact finite CTE expansion.
_DAMPING = 0.85
_PR_ITERS = 3

# Shared SQL prelude: undirected support-capped co-purchase edges and
# per-node degrees. `u` holds each edge once (src < dst), `e` both
# directions, `deg` the undirected degree.
_EDGE_CTES = f"""
    b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    u AS (SELECT a.l_partkey AS src, c.l_partkey AS dst
          FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                           AND a.l_partkey < c.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= {_MIN_SUPPORT}),
    e AS (SELECT src, dst FROM u UNION ALL SELECT dst AS src, src AS dst FROM u),
    deg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)
"""


#: Fixed-point scale for PageRank mass: ranks live in 1e-12 units as
#: BIGINTs. Total mass is ~1e12 units, so per-node values, the ×85
#: damping product, and any per-destination sum all sit far below
#: 2^63 at every graph size (mass is conserved-or-shrinking under
#: truncating division).
_PR_E12 = 1_000_000_000_000
_PR_TELEPORT_E12 = int(round((1 - _DAMPING) * _PR_E12))
_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100


def _pagerank_oracle() -> str:
    rounds = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        rounds.append(
            f"a{i} AS (SELECT e.dst AS v, sum({prev}.r // {prev}.deg) AS acc"
            f"         FROM e JOIN {prev} ON e.src = {prev}.v GROUP BY e.dst),"
            f" r{i} AS (SELECT deg.v, deg.deg,"
            f"                {_PR_TELEPORT_E12} // n.n_nodes"
            f"                + ({_PR_DAMP_NUM} * a{i}.acc) // {_PR_DAMP_DEN} AS r"
            f"          FROM deg JOIN a{i} ON deg.v = a{i}.v CROSS JOIN n)"
        )
        prev = f"r{i}"
    return f"""
    WITH {_EDGE_CTES},
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
    r0 AS (SELECT v, deg, {_PR_E12} // n.n_nodes AS r FROM deg CROSS JOIN n),
    {", ".join(rounds)}
    SELECT {prev}.v AS part_id, {prev}.deg AS degree,
           round(CAST({prev}.r AS DOUBLE) / {_PR_E12}.0 * n.n_nodes, 4) AS pr_norm
    FROM {prev} CROSS JOIN n
    """


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected support-≥2 co-purchase edges (src < dst), one row per
    edge. Pairs are generated locally per basket array — no lineitem
    self-join, no second shuffle of the basket table (same plan shape
    as ``part_affinity_lift``, /root/reference has no graph analogue)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size("parts")),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_arr).alias("pr"))
        .groupBy(F.col("pr.src").alias("src"), F.col("pr.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("supp"))
        .filter(F.col("supp") >= _MIN_SUPPORT)
        .select("src", "dst")
    )


def _sym_edges_and_degrees(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> tuple[DataFrame, DataFrame]:
    """Both-direction edge list and per-node undirected degree, each
    behind a materialization barrier — the iterated consumers below
    would otherwise replan the basket aggregation once per use.
    Fault-tolerance posture rides :mod:`fintech_etl_spark.barrier`:
    ``"auto"`` is a RELIABLE checkpoint when the session has a
    checkpoint dir (preemptible fleets), executor-local otherwise."""
    # checkpoint the DIRECTED list (half the rows of the symmetric
    # one); the both-direction view is a union of two reads of that
    # checkpoint — re-derived per consumer at map speed, no shuffle,
    # instead of materializing the doubled list as a second copy
    u = materialization_barrier(copurchase_edges(spark, sf_dir), barrier)
    e = u.union(u.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = materialization_barrier(
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("v"), "deg"),
        barrier,
    )
    return e, deg


@register(
    "graph_copurchase_pagerank",
    _pagerank_oracle(),
    doc=(
        "PageRank over the part co-purchase graph (parts co-ordered in "
        "≥2 distinct orders), 3 unrolled power iterations at d=0.85 — "
        "the 'importance' screen behind related-product ranking. Each "
        "iteration is two node-keyed joins (rank/degree share onto the "
        "edge list, then a sum per destination); only (node, double) "
        "rows ever shuffle, and the undirected graph has no dangling "
        "nodes so mass is conserved without a correction term. The "
        "oracle unrolls the identical 3 rounds as CTEs — exact cross-"
        "engine value check, like kmeans_fit. pr_norm is rank scaled "
        "by node count (uniform = 1.0), keeping 4-decimal rounding "
        "meaningful at any graph size. Determinism posture: all rank "
        "mass lives in 1e-12 FIXED-POINT BIGINT units — the share "
        "split is truncating integer division (r div deg), damping is "
        "the exact integer (85·acc) div 100, and the per-destination "
        "sum is BIGINT — so every iteration is order-independent and "
        "bit-identical across engines (the q15/sf1 incident class), "
        "at the cost of ≤deg·1e-12 truncated mass per node per round. "
        "Only the final display expression touches doubles, in the "
        "same operation order on both engines."
    ),
    tags=("graph", "iterative", "join"),
)
def graph_copurchase_pagerank(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: per-iteration rank frames are truncated via the
    # injectable policy — reliable when a checkpoint dir is set, so an
    # executor loss mid-pagerank replays from the store, not from zero
    e, deg = _sym_edges_and_degrees(spark, sf_dir, barrier)
    # one count on the (about-to-be-materialized-anyway) degree frame:
    # it replaces the n_nodes aggregate + BroadcastNestedLoopJoin that
    # rode EVERY iteration with an integer literal, and sizes the
    # rank-vector joins below. The integer arithmetic is identical.
    n_nodes = deg.count()
    # A rank/accumulator frame is one (node, bigint) row per node. In
    # the mid band (~1M-100M nodes) that is a clean broadcast (guide
    # §3.1) and the checkpointed edge list is then NEVER re-shuffled
    # per iteration (the checkpoint defeats size estimation, so the
    # planner would sort-merge all three joins otherwise). Below the
    # floor the whole graph fits in a few shuffle partitions and the
    # per-iteration exchange is cheaper than 2 broadcast builds per
    # round (measured: 3 rounds of broadcasts cost ~0.9 s on a 20k-node
    # graph at sf0.1 vs ~nothing shuffled); past the cap a >8 GB
    # broadcast would be the real scale killer. Join strategy cannot
    # move any value: the per-destination sum is exact fixed-point
    # BIGINT, order-independent.
    bcast_min = int(os.environ.get("SPARK_GRAFT_PR_BCAST_MIN_NODES", 1_000_000))
    _maybe_b = (
        F.broadcast if bcast_min <= n_nodes <= 100_000_000 else (lambda d: d)
    )
    r = deg.select(
        "v", "deg", F.expr(f"{_PR_E12} div {n_nodes}").alias("r_e12")
    )
    for _ in range(_PR_ITERS):
        share = r.select(
            F.col("v").alias("src"), F.expr("r_e12 div deg").alias("share_e12")
        )
        acc = (
            e.join(_maybe_b(share), "src")
            .groupBy("dst")
            .agg(F.sum("share_e12").alias("acc"))
        )
        r = materialization_barrier(
            deg.join(_maybe_b(acc), deg.v == acc.dst).select(
                "v",
                "deg",
                F.expr(
                    f"{_PR_TELEPORT_E12} div {n_nodes}"
                    f" + ({_PR_DAMP_NUM} * acc) div {_PR_DAMP_DEN}"
                ).alias("r_e12"),
            ),
            barrier,
        )
    return r.select(
        F.col("v").alias("part_id"),
        F.col("deg").alias("degree"),
        F.round(
            F.col("r_e12").cast("double") / _PR_E12 * F.lit(n_nodes), 4
        ).alias("pr_norm"),
    )


@register(
    "graph_triangle_clustering",
    f"""
    WITH {_EDGE_CTES},
    oe AS (SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.src < u.dst)
                       THEN u.src ELSE u.dst END AS s,
                  CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.src < u.dst)
                       THEN u.dst ELSE u.src END AS t
           FROM u JOIN deg da ON u.src = da.v JOIN deg db ON u.dst = db.v),
    oed AS (SELECT oe.s, oe.t, d.deg AS tdeg FROM oe JOIN deg d ON oe.t = d.v),
    tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM oed a
            JOIN oed b ON a.s = b.s
                      AND (a.tdeg < b.tdeg OR (a.tdeg = b.tdeg AND a.t < b.t))
            JOIN oe  c ON c.s = a.t AND c.t = b.t),
    wed AS (SELECT CAST(sum(deg * (deg - 1)) AS DOUBLE) / 2 AS n_wedges FROM deg)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM u)   AS n_edges,
           tri.n_triangles,
           round(3.0 * tri.n_triangles / wed.n_wedges, 4) AS global_clustering
    FROM tri CROSS JOIN wed
    """,
    doc=(
        "Exact triangle count + global clustering coefficient of the "
        "co-purchase graph via degree orientation: every undirected "
        "edge is directed from its lower-(degree, id) endpoint, so "
        "out-degree is O(sqrt(m)) and the wedge self-join is bounded "
        "by arboricity instead of the max hub degree — the standard "
        "trick that keeps exact triangle counting feasible on "
        "power-law graphs. Clustering = 3·triangles / wedges with "
        "wedges = Σ deg·(deg-1)/2. One row out; every join is on node "
        "ids the edge list is already hashed by."
    ),
    tags=("graph", "join", "agg"),
)
def graph_triangle_clustering(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: oe/oed feed two wedge sides plus the closing
    # join — truncated via the injectable policy (reliable on clusters
    # with a checkpoint dir, executor-local in dev)
    e, deg = _sym_edges_and_degrees(spark, sf_dir, barrier)
    u = e.filter(F.col("src") < F.col("dst"))
    da = deg.select(F.col("v").alias("src"), F.col("deg").alias("sdeg"))
    db = deg.select(F.col("v").alias("dst"), F.col("deg").alias("ddeg"))
    src_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    oe = materialization_barrier(
        u.join(da, "src")
        .join(db, "dst")
        .select(
            F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("s"),
            F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("t"),
        ),
        barrier,
    )
    oed = materialization_barrier(
        oe.join(
            deg.select(F.col("v").alias("t"), F.col("deg").alias("tdeg")), "t"
        ),
        barrier,
    )
    a = oed.select(F.col("s"), F.col("t").alias("t_a"), F.col("tdeg").alias("deg_a"))
    b = oed.select(F.col("s"), F.col("t").alias("t_b"), F.col("tdeg").alias("deg_b"))
    wedge_lt = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("t_a") < F.col("t_b"))
    )
    closing = oe.select(F.col("s").alias("t_a"), F.col("t").alias("t_b"))
    tri = (
        a.join(b, "s")
        .filter(wedge_lt)
        .join(closing, ["t_a", "t_b"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    edges = u.agg(F.count(F.lit(1)).alias("n_edges"))
    wedges = deg.agg(
        (F.sum(F.col("deg") * (F.col("deg") - 1)).cast("double") / 2).alias("n_wedges")
    )
    return (
        tri.crossJoin(F.broadcast(nodes))
        .crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(wedges))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 4
            ).alias("global_clustering"),
        )
    )


#: Centers with undirected degree above this cap are excluded from
#: wedge enumeration. Wedges per center grow as deg², while the
#: Adamic-Arar contribution shrinks as 1/ln(deg) — so hub centers cost
#: the most and signal the least. The cap makes the enumeration
#: Σ min(deg, cap)² ≤ cap·Σdeg = O(cap·m): linear in edges, immune to
#: hubs — the standard production bound for common-neighbor scoring.
_AA_DEG_CAP = 64
_AA_TOP_K = 100


@register(
    "graph_link_prediction_aa",
    f"""
    WITH {_EDGE_CTES},
    ctr AS (SELECT v, deg FROM deg WHERE deg BETWEEN 2 AND {_AA_DEG_CAP}),
    w AS (SELECT a.dst AS na, b.dst AS nb,
                 CAST(count(*) AS BIGINT) AS common_neighbors,
                 -- scaled-integer AA: each 1/ln(deg) term quantized to
                 -- 1e-12 and summed as BIGINT — order-independent and
                 -- engine-exact, unlike a double accumulation whose
                 -- partial-sum order can flip a rounded score at the
                 -- LIMIT boundary
                 sum(CAST(floor(1e12 / ln(ctr.deg)) AS BIGINT)) AS aa_e12
          FROM e a
          JOIN e b ON a.src = b.src AND a.dst < b.dst
          JOIN ctr ON a.src = ctr.v
          GROUP BY 1, 2),
    cand AS (SELECT w.na, w.nb, w.common_neighbors, w.aa_e12
             FROM w ANTI JOIN u ON w.na = u.src AND w.nb = u.dst)
    SELECT na AS part_a, nb AS part_b, common_neighbors,
           round(aa_e12 / 1e12, 4) AS aa_score
    FROM cand
    ORDER BY aa_e12 DESC, na, nb
    LIMIT {_AA_TOP_K}
    """,
    doc=(
        "Link prediction by Adamic-Adar: for every non-adjacent part "
        "pair sharing ≥1 co-purchase neighbor, score Σ 1/ln(deg(v)) "
        "over common neighbors v — the classic 'products likely to be "
        "co-bought next' ranking. Wedges enumerate per CENTER with a "
        f"degree cap of {_AA_DEG_CAP}: wedge work is Σ min(deg,cap)² "
        "= O(cap·m), linear in edges and hub-immune, and the dropped "
        "hub centers are exactly the ones whose 1/ln(deg) contribution "
        "is weakest (degree-1 centers contribute no wedge at all). "
        "Existing edges anti-join away; AA terms are quantized to "
        "1e-12 and summed as BIGINT (order-independent, engine-exact) "
        "and the deterministic top-"
        f"{_AA_TOP_K} cut orders by the exact integer score, so both "
        "engines cut the same prefix with no rounding-boundary "
        "flakiness."
    ),
    tags=("graph", "join", "topk"),
)
def graph_link_prediction_aa(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: shared edge/degree frames via the injectable
    # policy (see _sym_edges_and_degrees)
    e, deg = _sym_edges_and_degrees(spark, sf_dir, barrier)
    u = e.filter(F.col("src") < F.col("dst"))
    ctr = deg.filter(F.col("deg").between(2, _AA_DEG_CAP))
    a = e.select(F.col("src").alias("c"), F.col("dst").alias("na"))
    b = e.select(F.col("src").alias("c"), F.col("dst").alias("nb"))
    w = (
        a.join(b, "c")
        .filter(F.col("na") < F.col("nb"))
        .join(ctr.select(F.col("v").alias("c"), "deg"), "c")
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            # scaled-integer sum (see oracle SQL): BIGINT accumulation
            # is partial-aggregate-order independent; ordering by the
            # exact integer (not the rounded double) pins the top-k cut
            F.sum(F.floor(F.lit(1e12) / F.log(F.col("deg"))).cast("long")).alias(
                "aa_e12"
            ),
        )
    )
    cand = w.join(
        u.select(F.col("src").alias("na"), F.col("dst").alias("nb")),
        ["na", "nb"],
        "left_anti",
    )
    return (
        cand.select(
            F.col("na").alias("part_a"),
            F.col("nb").alias("part_b"),
            "common_neighbors",
            F.round(F.col("aa_e12") / 1e12, 4).alias("aa_score"),
            F.col("aa_e12"),
        )
        .orderBy(F.col("aa_e12").desc(), "part_a", "part_b")
        .limit(_AA_TOP_K)
        .drop("aa_e12")
    )
