"""Approximate-nearest-neighbor search over embedding columns (north star).

Three tiers over the ``embeddings`` table (array<float> vectors):

- brute-force cosine top-k — the exactness baseline (oracle-checked);
- random-hyperplane LSH buckets — prune candidates before scoring,
  the shuffle-friendly 100 TB path;
- IVF-style coarse quantization — partition vectors by nearest
  centroid, probe the closest cells only.

Everything is JVM-side higher-order-function arithmetic (zip_with /
aggregate) except the one sanctioned Arrow matmul in the LSH bucketer;
the hyperplanes are deterministic literals and the IVF cells come from
the in-repo distributed Lloyd's k-means, so every tier is reproducible
and (via literal-plane / unrolled-iteration SQL replays) value-checked.
int8 quantization and the code-scored re-rank round out the serving
path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from fintech_etl_spark.barrier import materialization_barrier
from fintech_etl_spark.operators.dedup import cosine
from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table

_DIM = 64
_TOP_K = 5
_N_QUERIES = 10  # vec_id < 10 are the probe set


def _deterministic_hyperplanes(n_planes: int, dim: int = _DIM) -> list[list[float]]:
    """Fixed pseudo-random unit hyperplanes (LCG; no RNG imports so the
    plan is reproducible byte-for-byte across sessions/machines)."""
    state = 88172645463325252
    planes: list[list[float]] = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            v.append(((state % 2_000_001) / 1_000_000.0) - 1.0)
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


# ---------------------------------------------------------------------------
# Brute-force top-k (the baseline; oracle-checked)
# ---------------------------------------------------------------------------


@register(
    "ann_topk_cosine_brute",
    f"""
    SELECT query_id, neighbor_id, cos, rank
    FROM (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                 round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                              CAST(v.embedding AS DOUBLE[])), 4) AS cos,
                 CAST(row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(v.embedding AS DOUBLE[])), 4) DESC,
                              v.vec_id) AS INTEGER) AS rank
          FROM embeddings q JOIN embeddings v ON q.vec_id < {_N_QUERIES}
                                             AND v.vec_id <> q.vec_id) t
    WHERE rank <= {_TOP_K}
    """,
    doc=(
        "Brute-force cosine top-k: broadcast the (tiny) query set against "
        "the full vector table, score with zip_with/aggregate in double, "
        "rank per query with a window. One pass over the corpus, no "
        "shuffle of the big side — this is also the final re-rank stage "
        "of both approximate tiers. Rank on the ROUNDED score + id so "
        "ordering is engine-independent."
    ),
    tags=("similarity", "topk"),
)
def ann_topk_cosine_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 4).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH buckets (approximate tier)
# ---------------------------------------------------------------------------

# 4 sign bits × 12 bands: tuned for the top-k regime (cos ≈ 0.4 →
# P(bit agree) ≈ 0.65 → band hit ≈ 0.65⁴ ≈ 0.18 → recall over 12 bands
# ≈ 1-(1-0.18)¹² ≈ 0.91). Near-dup-only workloads (cos ≥ 0.9) would
# flip to more bits per band for tighter buckets.
_N_PLANES = 4
_N_BANDS = 12


def _lsh_oracle() -> str:
    """DuckDB replay of the EXACT LSH algorithm (not brute force): the
    hyperplanes are deterministic literals, so bucketing + candidate
    join + re-rank are all SQL-expressible. Cross-engine parity holds
    because a sign bit flips only if a plane dot lies within float
    noise of zero (|dot| ~ 0.125 typical → P(flip) ≈ 1e-13 per
    projection); the re-rank score is rounded to 4 like the brute tier.
    repr() round-trips each plane component exactly."""
    planes = _deterministic_hyperplanes(_N_PLANES * _N_BANDS, _DIM)
    values = ",\n        ".join(
        f"({pid}, [{', '.join(repr(x) for x in pv)}]::DOUBLE[])"
        for pid, pv in enumerate(planes)
    )
    return f"""
    WITH planes(pid, pv) AS (VALUES
        {values}),
    n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    u AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_aggregate(
                     list_transform(v, y -> y * y), 'sum'))) AS u
          FROM n),
    bits AS (SELECT vec_id, pid // {_N_PLANES} AS band,
                    CASE WHEN list_dot_product(u.u, p.pv) >= 0.0
                         THEN (CAST(1 AS BIGINT) << (pid % {_N_PLANES}))
                         ELSE 0 END AS w
             FROM u CROSS JOIN planes p),
    bk AS (SELECT vec_id, band, CAST(sum(w) AS BIGINT) AS bucket
           FROM bits GROUP BY vec_id, band),
    cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
             FROM bk q JOIN bk c ON q.band = c.band AND q.bucket = c.bucket
             WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id),
    s AS (SELECT query_id, neighbor_id,
                 round(list_dot_product(uq.u, un.u), 4) AS cos
          FROM cand
          JOIN u uq ON uq.vec_id = query_id
          JOIN u un ON un.vec_id = neighbor_id),
    r AS (SELECT query_id, neighbor_id, cos,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
          FROM s)
    SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= {_TOP_K}
    """


@register(
    "ann_lsh_bucketed",
    _lsh_oracle(),
    doc=(
        "ANN via random-hyperplane LSH: 12 bands × 4 sign bits. Candidates "
        "= vectors sharing a bucket with the query in any band; exact "
        "cosine re-rank within candidates. At 100 TB the bucket id is "
        "the shuffle/partition key, so each query touches ~corpus/16 "
        "per band instead of the full corpus."
    ),
    tags=("similarity", "lsh", "topk"),
)
def ann_lsh_bucketed(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    # Unit-normalize ONCE so the per-candidate score is a single dot
    # (no per-pair norm recomputation), and sign buckets can hash the
    # unit vector (signs are scale-invariant).
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    unit = emb.select("vec_id", F.transform(v, lambda x: x / norm).alias("u"))
    # Each band needs distinct planes — slice one deterministic stream.
    all_planes = _deterministic_hyperplanes(_N_PLANES * _N_BANDS, _DIM)

    # All 48 plane projections at once as one Arrow-batched matmul
    # ((batch × 64) @ (64 × 48) → sign bits → 12 packed bucket ids).
    # The Column-expression form (48 plane dots, each building a
    # 64-literal array per row) measured 6.8 s at sf0.1; this is ~1 s.
    # Deterministic: the plane constants ship inside the udf closure.
    import numpy as np
    import pandas as pd

    P = np.array(all_planes, dtype=np.float64).T  # 64 × 48
    weights = 1 << np.arange(_N_PLANES)

    def _buckets(u):  # (pd.Series) -> pd.Series; unhinted: PEP-563
        # stringified hints break pandas_udf type inference here
        U = np.stack(u.to_numpy())
        bits = (U @ P >= 0).astype(np.int64)  # batch × 48
        packed = bits.reshape(len(U), _N_BANDS, _N_PLANES) @ weights
        return pd.Series(list(packed))

    buckets_udf = pandas_udf(_buckets, "array<long>")

    # ONE Arrow/Python pass over the corpus behind the injectable
    # barrier (vec_id, u, 12 packed bucket ids — tiny); query side is a
    # filter of the same materialized table, so the UDF doesn't run a
    # second time and the band explode happens JVM-side on both
    # branches. fintech_etl_spark.barrier: reliable on clusters with a
    # checkpoint dir, executor-local in dev.
    packed = materialization_barrier(
        unit.select("vec_id", "u", buckets_udf(F.col("u")).alias("bks")),
        barrier,
    )

    def with_buckets(df: DataFrame, idcol: str) -> DataFrame:
        return df.select(
            F.col("vec_id").alias(idcol),
            F.col("u").alias(f"{idcol}_u"),
            F.posexplode("bks").alias("band", "bucket"),
        )

    corpus = with_buckets(packed, "neighbor_id")
    queries = with_buckets(packed.filter(F.col("vec_id") < _N_QUERIES), "query_id")

    # Score candidates straight off the bucket join — a pair colliding
    # in k bands is scored k times (k ≤ 3 in practice), then deduped on
    # the (ids, score) agg. This beats pre-scoring distinct: distinct
    # would shuffle the embedding arrays; here only (ids, double) rows
    # ever reach a shuffle.
    scored = (
        queries.join(corpus, ["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("query_id_u"), F.col("neighbor_id_u")), 4).alias("c"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("c").alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-style coarse quantization (approximate tier #2)
# ---------------------------------------------------------------------------

_N_PROBE = 3  # cells searched per query
_KM_K = 8  # IVF cells (k-means k)
_KM_ITERS = 3  # fixed Lloyd iterations (deterministic unroll)

# k-means is "iterative" only in the unbounded sense — with a FIXED
# deterministic iteration count (3) and deterministic init (k lowest
# vec_ids), the whole training run unrolls into SQL: three
# (distance → argmin → per-dim mean) CTE rounds. Cross-engine parity
# holds because every distance fold is spelled in the same index order
# on both engines; the only unordered float reduction is the centroid
# mean, whose ulp-level engine difference flips an assignment only for
# a vector within ~1e-13 of a Voronoi boundary.
_KM_ITER_SQL = """
    d{i} AS (SELECT v.vec_id, v.v, c.cell,
                list_aggregate(list_transform(generate_series(1, {dim}),
                    j -> (v.v[j] - c.centroid[j]) * (v.v[j] - c.centroid[j])),
                    'sum') AS dist
          FROM v CROSS JOIN c{prev} c),
    a{i} AS (SELECT vec_id, v, cell, dist FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY dist, cell) AS rn
              FROM d{i}) t WHERE rn = 1),
    e{i} AS (SELECT cell, j, avg(x) AS m
          FROM (SELECT cell, unnest(v) AS x, generate_subscripts(v, 1) AS j
                FROM a{i}) u
          GROUP BY cell, j),
    c{i} AS (SELECT cell, list(m ORDER BY j) AS centroid FROM e{i} GROUP BY cell)"""


def _kmeans_ctes(k: int = _KM_K, iters: int = _KM_ITERS, dim: int = _DIM) -> str:
    """Shared WITH-clause body: v, deterministic init c0, then
    ``iters`` unrolled Lloyd rounds ending at assignment a{iters} and
    centroids c{iters} — mirrors kmeans_fit exactly (min-struct
    tie-break = ORDER BY dist, cell)."""
    rounds = ",".join(
        _KM_ITER_SQL.format(i=i, prev=i - 1, dim=dim) for i in range(1, iters + 1)
    )
    return f"""
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cell,
                  v AS centroid
           FROM (SELECT * FROM v ORDER BY vec_id LIMIT {k}) q),
    {rounds}"""


def _sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine` — same dot/(|a|·|b|) shape, same
    sequential fold order."""
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_aggregate(list_transform({a}, x -> x * x), 'sum')) * "
        f"sqrt(list_aggregate(list_transform({b}, x -> x * x), 'sum'))))"
    )


def _ivf_probe_oracle() -> str:
    it = _KM_ITERS
    return f"""
    WITH {_kmeans_ctes()},
    qc AS (SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
                  {_sql_cosine("q.v", "c.centroid")} AS ccos
           FROM v q CROSS JOIN c{it} c WHERE q.vec_id < {_N_QUERIES}),
    pr AS (SELECT query_id, qv, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY ccos DESC, cell) AS prank
              FROM qc) t WHERE prank <= {_N_PROBE}),
    sc AS (SELECT pr.query_id, n.vec_id AS neighbor_id,
                  round({_sql_cosine("pr.qv", "n.v")}, 4) AS cos
           FROM pr JOIN a{it} n ON n.cell = pr.cell
           WHERE n.vec_id <> pr.query_id),
    r AS (SELECT query_id, neighbor_id, cos,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
          FROM sc)
    SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= {_TOP_K}
    """


@register(
    "ann_ivf_probe",
    _ivf_probe_oracle(),
    doc=(
        "IVF ANN with TRAINED cells: distributed Lloyd's k-means (see "
        "kmeans_fit) assigns every vector to a cell; each query probes "
        "its n_probe nearest centroids and exact-reranks only inside "
        "those cells. The corpus is partitioned by cell id — "
        "write_ivf_layout materializes exactly that as directory "
        "partitioning, so a probe reads only its cells' files. "
        "Centroids are a k-row broadcast."
    ),
    tags=("similarity", "topk", "iterative"),
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    cent, assign = kmeans_fit(emb)

    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    # nearest _N_PROBE cells per query (centroid table is tiny → broadcast)
    qc = q.join(F.broadcast(cent)).select(
        "query_id",
        "qe",
        "cell",
        cosine(F.col("qe"), F.col("centroid")).alias("ccos"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cell"))
    probes = (
        qc.withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= _N_PROBE)
        .select("query_id", "qe", "cell")
    )

    corpus = emb.join(assign.select("vec_id", "cell"), "vec_id")
    scored = (
        probes.join(
            corpus,
            ["cell"],
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 4).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Vector-algebra battery (the building blocks of every ANN tier)
# ---------------------------------------------------------------------------


@register(
    "embedding_vector_ops",
    """
    SELECT vec_id,
           round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                                    x -> x * x), 'sum')), 4) AS l2_norm,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4)      AS comp_sum,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 4)      AS comp_max,
           CAST(len(embedding) AS INTEGER)                                   AS dim
    FROM embeddings
    """,
    doc=(
        "Vector scalar battery via higher-order functions (aggregate/"
        "transform): L2 norm, component sum/max, dimensionality — all "
        "JVM-side, the primitives the ANN operators compose."
    ),
    tags=("similarity", "scalar"),
)
def embedding_vector_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    sq_sum = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 4
        ).alias("comp_sum"),
        F.round(F.array_max(v), 4).alias("comp_max"),
        F.size("embedding").alias("dim"),
    )


@register(
    "embedding_label_centroids",
    """
    WITH e AS (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
                      generate_subscripts(embedding, 1) AS i
               FROM embeddings)
    SELECT label, CAST(count(DISTINCT i) AS INTEGER) AS dim,
           round(sum(x) / (SELECT count(*) FROM embeddings b
                           WHERE b.label = e.label) / count(DISTINCT i) * count(DISTINCT i), 4)
               AS centroid_mass
    FROM e GROUP BY label
    """,
    doc=(
        "Mean-pooled centroid mass per label via posexplode + two-level "
        "aggregation — the IVF training step's shuffle shape (explode on "
        "(label, dim), never a collect to the driver)."
    ),
    tags=("similarity", "agg"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x")
    )
    per_dim = e.groupBy("label", "i").agg(F.avg("x").alias("m"))
    return per_dim.groupBy("label").agg(
        F.count(F.lit(1)).cast("int").alias("dim"),
        F.round(F.sum("m"), 4).alias("centroid_mass"),
    )


# ---------------------------------------------------------------------------
# Distributed k-means (Lloyd's) — the IVF training step, for real
# ---------------------------------------------------------------------------

def _sq_dist(a: F.Column, b: F.Column) -> F.Column:
    d = F.zip_with(a, b, lambda x, y: x - y)
    return F.aggregate(F.transform(d, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)


#: Past this many cells the per-iteration assignment switches from the
#: literal-expression scorer (bit-exact vs the SQL-fold oracles, but
#: plan size O(k·d) — measured 20 s of pure Catalyst plan-build at
#: k=40·d=64 over 3 iterations, SLOWER than scoring 10× the vectors
#: through Arrow) to the numpy batch scorer (O(1) plan, BLAS). All
#: oracle-checked queries pin k=_KM_K=8 ≪ this, so the cross-engine
#: replay path never changes; only the rows-only auto-k tier crosses
#: (the two scorers agree on assignments and to 1e-9 on distances —
#: pinned by test_kmeans_large_k_numpy_scorer_matches_literal).
_KM_LITERAL_MAX = 16

#: Past this many cells the BLAS scorer itself goes TWO-LEVEL: the k
#: centroids are clustered (driver-side NumPy Lloyd's, deterministic
#: first-√k init) into ~√k coarse groups and each vector scores only
#: the coarse centers plus the fine members of its top-2 groups —
#: ~3·√k distance evaluations instead of k. That bounds the auto-k
#: SemDeDup assignment (k = N/512, so flat scoring is N²·d/512 per
#: iteration) to N·√k·d. Exact below the threshold; the winner's
#: distance is recomputed exactly in both regimes. Assignment becomes
#: approximate (top-2 probe can miss the global argmin for a vector
#: near a coarse boundary) — acceptable for cell-blocking consumers
#: (SemDeDup, IVF) and pinned by an agreement test vs the flat path.
_KM_HIER_MIN = 256

#: Coarse groups probed per vector in the two-level scorer. 2 is the
#: standard IVF nprobe-style recall/cost point: the nearest fine
#: centroid is almost always in the nearest-or-second coarse cell.
_KM_HIER_PROBES = 2


def _literal_matrix(rows) -> F.Column:
    """A list of double vectors as ONE ``array<array<double>>`` literal
    column, built from a single parsed SQL string.

    Spelling the doubles as ``repr(x)D`` text is IEEE-exact (Python
    repr round-trips, Spark's parser is Double.parseDouble — verified
    ``F.lit(xs) = F.expr(sql)`` TRUE with max |Δ| 0.0) and constant
    folding collapses the parsed tree to the very Literal that
    ``F.lit`` would have built — same physical plan, same codegen. The
    difference is pure driver time: each ``F.lit(list)`` call pays a
    40–650 ms Py4J list conversion, so the per-centroid-column form
    cost O(k) such calls per Lloyd round (the dominant cost of a fit
    at sf0.1, measured this round). Non-finite values (never produced
    by a mean over finite embeddings) fall back to the F.lit form,
    whose behavior is the historical one."""
    vals = [[float(x) for x in r] for r in rows]
    if all(math.isfinite(x) for r in vals for x in r):
        return F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(f"{x!r}D" for x in r) + ")" for r in vals
            )
            + ")"
        )
    return F.lit(vals)


def _coarse_partition(C: "np.ndarray"):  # noqa: F821 (numpy imported by caller)
    """Driver-side NumPy Lloyd's over the k fine centroids: returns
    ``(G, members)`` — coarse centers (g×d, g ≈ √k, empty groups
    dropped) and, per group, the ascending array of fine-centroid
    indices it owns. Deterministic: init = first g fine centroids (cell
    order), 5 iterations, first-minimum tie-break."""
    import numpy as np

    k = C.shape[0]
    g = int(np.ceil(np.sqrt(k)))
    G = C[:g].copy()
    lab = None
    for _ in range(5):
        d2 = (
            (C * C).sum(axis=1)[:, None]
            - 2.0 * (C @ G.T)
            + (G * G).sum(axis=1)[None, :]
        )
        lab = np.argmin(d2, axis=1)
        for j in range(g):
            m = lab == j
            if m.any():
                G[j] = C[m].mean(axis=0)
    # final labels against the final centers, then drop empty groups
    d2 = (
        (C * C).sum(axis=1)[:, None]
        - 2.0 * (C @ G.T)
        + (G * G).sum(axis=1)[None, :]
    )
    lab = np.argmin(d2, axis=1)
    keep = [j for j in range(g) if (lab == j).any()]
    members = [np.nonzero(lab == j)[0] for j in keep]
    return G[keep], members


def _assign_step(vecs: DataFrame, cent, k: int) -> DataFrame:
    """One Lloyd's assignment pass with NO shuffle and NO per-vector
    fan-out: centroids are collected to the driver (k·d doubles — tiny
    by the k ≈ N/512 contract) and pushed into a single narrow
    projection. The previous shape (broadcast cross-join → groupBy
    argmin) shuffled N·k rows each carrying the full vector per
    iteration — ~0.5 GB/iteration at just 20k vectors × k=40.

    ``cent`` is a ``(cell, centroid)`` frame, or the already-collected
    (cell-sorted) rows of one — :func:`kmeans_fit` collects once per
    iteration and reuses the rows for the centroid-update width, so
    the collect isn't paid twice."""
    rows = (
        cent
        if isinstance(cent, list)
        else sorted(cent.collect(), key=lambda r: r.cell)
    )
    if k <= _KM_LITERAL_MAX:
        # literal centroids, spelled as ONE parsed SQL string: the
        # Column-API form of this scorer costs ~0.8 s of pure
        # plan-build PER ITERATION (each zip_with/aggregate lambda is a
        # Py4J round-trip; 8 centroids × 3 lambdas × 3 iterations made
        # kmeans_fit 2.4 s of driver time at sf0.1 — measured, and it
        # was the whole dedup_semantic_semdedup regression in r7's
        # de-shuffle rewrite), while F.expr parses in ~3 ms. ALL
        # centroids ride as ONE k×dim array-of-arrays literal column
        # (_kC): the earlier one-F.lit-per-centroid form paid 40–650 ms
        # of Py4J list conversion PER F.lit call (measured this round:
        # 8 lits = 0.3–5.3 s cold, vs 3–20 ms for the single parsed
        # literal), which was most of each round's driver time. The
        # parser's repr-roundtrip doubles are IEEE-exact (verified
        # `F.lit(xs) = F.expr(sql)` TRUE with max |Δ| = 0.0), and
        # constant folding collapses the parsed array to the same
        # Literal the F.lit form produced, so the physical plan —
        # and the codegen cache behavior across rounds — is unchanged.
        # The SQL text builds the IDENTICAL zip_with/transform/
        # aggregate fold as _sq_dist and the unrolled SQL oracles, so
        # scores are bit-identical — pinned by test_kmeans_matches_
        # numpy et al. array_min on named_struct(dist, cell) keeps the
        # deterministic smallest-cell tie-break.
        # NOTE: the k-branch array_min form is kept deliberately — an
        # A/B of the running-minimum single-fold variant (the shape
        # _pq_assign_step now uses) measured ~1.03–1.13× SLOWER on the
        # kmeans-only rows at k ≤ 16: with so few branches the
        # spelled-out tree is small and constant-folds each _kC[i] to
        # a direct literal, while the dynamic-index fold pays a per-
        # element array access and struct build. The PQ step keeps the
        # fold because its tree was subs·k ≈ 128 branches.
        kc = _literal_matrix([r.centroid for r in rows])
        parts = ",".join(
            "named_struct('dist', aggregate(transform(zip_with(v, "
            f"_kC[{i}], (x, y) -> x - y), x -> x * x), 0.0D, "
            f"(s, x) -> s + x), 'cell', {int(r.cell)})"
            for i, r in enumerate(rows)
        )
        best = F.expr(f"array_min(array({parts}))")
        return vecs.select("vec_id", "v", kc.alias("_kC")).select(
            "vec_id",
            best["cell"].alias("cell"),
            best["dist"].alias("dist"),
            "v",
        )

    # large-k path (rows-only consumers): one Arrow-batched GEMM per
    # partition against the closure'd centroid matrix. Candidate
    # argmin via |v|²−2v·C+|C|² (BLAS), winner's distance recomputed
    # exactly per row; ties break to the smallest cell (C sorted by
    # cell, np.argmin returns the first minimum). Past _KM_HIER_MIN
    # the scorer is two-level (coarse groups + top-2 probe) so the
    # per-vector cost is O(√k), not O(k).
    import numpy as np
    import pandas as pd

    C = np.stack([np.asarray(r.centroid, dtype=np.float64) for r in rows])
    cells = np.array([int(r.cell) for r in rows], dtype=np.int64)
    cnorm = (C * C).sum(axis=1)
    hier = k > _KM_HIER_MIN
    if hier:
        G, members = _coarse_partition(C)
        gnorm = (G * G).sum(axis=1)
        nprobe = min(_KM_HIER_PROBES, len(members))

    def _winner_rows(V, cand):
        """argmin over the fine candidates ``cand`` (ascending, so the
        first minimum is the smallest cell) + exact recompute."""
        d2 = (
            (V * V).sum(axis=1)[:, None]
            - 2.0 * (V @ C[cand].T)
            + cnorm[cand][None, :]
        )
        idx = cand[np.argmin(d2, axis=1)]
        exact = ((V - C[idx]) ** 2).sum(axis=1)
        return cells[idx], exact

    def score(pdfs):
        for pdf in pdfs:
            V = np.stack(pdf["v"].to_numpy())
            n = V.shape[0]
            cell_out = np.empty(n, dtype=np.int64)
            dist_out = np.empty(n, dtype=np.float64)
            if not hier:
                cell_out, dist_out = _winner_rows(V, np.arange(len(cells)))
            else:
                d2g = (
                    (V * V).sum(axis=1)[:, None]
                    - 2.0 * (V @ G.T)
                    + gnorm[None, :]
                )
                # stable sort: equal coarse distances break to the
                # smaller group index, deterministically
                top = np.argsort(d2g, axis=1, kind="stable")[:, :nprobe]
                # batch rows by their probed-group tuple: one fine GEMM
                # per distinct tuple, not per row
                key = top[:, 0]
                for j in range(1, nprobe):
                    key = key * len(members) + top[:, j]
                for tup in np.unique(key):
                    sel = np.nonzero(key == tup)[0]
                    probes = top[sel[0]]
                    cand = np.unique(np.concatenate([members[g_] for g_ in probes]))
                    cell_out[sel], dist_out[sel] = _winner_rows(V[sel], cand)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": cell_out,
                    "dist": dist_out,
                    "v": pdf["v"],
                }
            )

    return vecs.mapInPandas(
        score, "vec_id long, cell int, dist double, v array<double>"
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = _KM_K,
    max_iter: int = _KM_ITERS,
    barrier: str = "auto",
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd's k-means over an ``(vec_id, embedding)`` frame.

    Returns ``(centroids(cell, centroid), assignments(vec_id, cell,
    dist))``. Initialization is deterministic (the k lowest vec_ids), so
    runs are reproducible and unit-testable against a NumPy oracle.

    Each iteration is: collect the k centroids (k·d doubles — tiny by
    the k ≈ N/512 contract) → score k distances per vector in ONE
    narrow projection (no join, no shuffle, no N·k row fan-out) →
    argmin with a deterministic smallest-cell tie-break → recompute
    centroids with a posexplode + (cell, dim) mean (one shuffle keyed
    on at most k×dim rows out). The corpus never shuffles. For
    k ≤ 16 (every oracle-checked query: k=8) scoring is the literal
    zip_with/aggregate fold — bit-identical to the unrolled SQL
    oracles; past that (the rows-only auto-k tier) it is an
    Arrow-batched BLAS scorer with the exact winner distance
    recomputed per row — flat (all k candidates, exact argmin) up to
    ``_KM_HIER_MIN`` cells, two-level beyond it (coarse √k groups +
    top-2 probe: O(√k) per vector, assignment approximate only for
    vectors whose true cell hides outside both probed groups).
    The injectable materialization barrier cuts the plan between
    iterations (fintech_etl_spark.barrier — reliable when the session
    has a checkpoint dir, so an executor loss mid-Lloyd's replays from
    the store; executor-local in dev).
    """
    from pyspark.sql import Window as W

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cent = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(W.orderBy("vec_id")).alias("cell"),
            F.col("v").alias("centroid"),
        )
    )
    assign = None
    for it in range(max_iter):
        last = it == max_iter - 1
        # ONE collect per iteration (the action that materializes the
        # previous round); the rows feed both the assignment scorer and
        # the centroid-update width below
        rows = sorted(cent.collect(), key=lambda r: r.cell)
        dim = len(rows[0].centroid)
        assign = _assign_step(vecs, rows, k)
        if last:
            # only the RETURNED frames need the barrier: because each
            # round's centroids ride the plan as LITERALS, every
            # intermediate frame's lineage is constant-depth (scan →
            # score → agg) — an intermediate checkpoint bought no plan
            # truncation and cost a full materialization per round
            # (measured ~0.2–0.7 s per fit at sf0.1). Executor-loss
            # replay of an intermediate round is the same shallow
            # recompute the checkpoint would have avoided.
            assign = materialization_barrier(assign, barrier)
        # centroid update in ONE shuffle: a wide per-cell avg of each
        # dimension (dim known from the collected centroids) instead of
        # posexplode → (cell, i) mean → (cell) re-assembly, which paid
        # a second exchange and an N·dim row fan-out per iteration.
        # Same multiset of doubles into each per-(cell, dim) mean, same
        # partial-aggregation structure — values unchanged. The whole
        # dim-wide projection is ONE parsed expression: the Column-API
        # form (dim × avg/getItem/alias Py4J calls + a second select)
        # cost ~0.6 s of pure plan-build per round (measured; the
        # parsed form is ~0.04 s), and the optimizer collapses both to
        # the identical Aggregate node.
        cent = assign.groupBy("cell").agg(
            F.expr(
                "array("
                + ",".join(f"avg(v[{i}])" for i in range(dim))
                + ") AS centroid"
            )
        )
        if last:
            # consumers (IVF probe, the returned centroids) see a cut
            # lineage; their first action materializes it
            cent = materialization_barrier(cent, barrier)
    return cent, assign.select("vec_id", "cell", "dist")


@register(
    "kmeans_ivf_cells",
    f"""
    WITH {_kmeans_ctes()}
    SELECT CAST(cell AS INTEGER) AS cell,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(sum(dist), 4) AS inertia
    FROM a{_KM_ITERS} GROUP BY cell
    """,
    doc=(
        "Distributed Lloyd's k-means (k=8, 3 iterations, deterministic "
        "init) over the embeddings — the real IVF training step whose "
        "output cells ann_ivf_probe's layout assumes. Emits per-cell "
        "size and inertia; the unit test replays the identical "
        "algorithm in NumPy and requires exact cell-size agreement."
    ),
    tags=("similarity", "iterative"),
)
def kmeans_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    _, assign = kmeans_fit(emb)
    return (
        assign.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.sum("dist"), 4).alias("inertia"),
        )
        .select("cell", "n_vectors", "inertia")
    )


def write_ivf_layout(spark: SparkSession, sf_dir: str, out_path: str) -> DataFrame:
    """Materialize the IVF index layout: embeddings written partitioned
    by their trained k-means cell (``cell=N/`` directories).

    This is the storage half of the IVF design ann_ivf_probe assumes:
    a query that probes n cells reads only those cells' files —
    directory-level partition pruning, no index structure needed. At
    100 TB re-clustering is incremental (assign new vectors to frozen
    centroids; retrain periodically). Returns the assignment frame."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent, assign = kmeans_fit(emb)
    enriched = emb.join(assign.select("vec_id", "cell"), "vec_id")
    enriched.write.mode("overwrite").partitionBy("cell").parquet(out_path)
    return assign


# ---------------------------------------------------------------------------
# Embedding quantization (index compression)
# ---------------------------------------------------------------------------


@register(
    "embedding_quantize_int8",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    m AS (SELECT vec_id, e,
                 list_aggregate(list_transform(e, x -> abs(x)), 'max') / 127.0 AS scale
          FROM v)
    SELECT vec_id,
           scale,
           array_to_string(list_transform(e, x -> CAST(floor(x / scale + 0.5) AS INTEGER)),
                           ',') AS q_csv,
           round(sqrt(list_aggregate(list_transform(e,
                 x -> (x - floor(x / scale + 0.5) * scale)
                      * (x - floor(x / scale + 0.5) * scale)), 'sum')), 4) AS recon_err
    FROM m
    """,
    doc=(
        "Symmetric per-vector int8 quantization — the 4× index "
        "compression step every large ANN deployment runs before "
        "serving: scale = max|x|/127, q = round(x/scale), plus the L2 "
        "reconstruction error. Pure higher-order column expressions "
        "(transform/aggregate), zero shuffles, scan-speed at any scale. "
        "Rounding is spelled floor(x/scale + 0.5) on BOTH engines so "
        "the integer codes are bit-identical cross-engine (round() "
        "half-away vs half-even varies); scale is emitted unrounded "
        "because IEEE division is engine-exact. Codes serialize to CSV "
        "at the query boundary (driver hash needs flat columns); the "
        "production writer would keep array<tinyint>."
    ),
    tags=("similarity", "quantization"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    # scale is hoisted into its own projection: referencing the
    # array_max expression inside the lambdas would re-reduce the whole
    # vector once PER ELEMENT (O(dim²) per row, ~7× slower measured).
    base = emb.select(
        "vec_id",
        v.alias("v"),
        (F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)).alias(
            "scale"
        ),
    )
    scale = F.col("scale")

    def _q(x: F.Column) -> F.Column:
        return F.floor(x / scale + F.lit(0.5))

    def _err_term(x: F.Column) -> F.Column:
        d = x - _q(x) * scale
        return d * d

    return base.select(
        "vec_id",
        scale.alias("scale"),
        F.array_join(
            F.transform("v", lambda x: _q(x).cast("int").cast("string")), ","
        ).alias("q_csv"),
        F.round(
            F.sqrt(
                F.aggregate(F.transform("v", _err_term), F.lit(0.0), lambda a, x: a + x)
            ),
            4,
        ).alias("recon_err"),
    )


_INT8_CAND = 20  # approx-score candidates per query fed to exact re-rank


@register(
    "ann_topk_int8_rerank",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id, v,
                 list_transform(v, x -> floor(
                     x / (list_aggregate(list_transform(v, y -> abs(y)), 'max') / 127.0)
                     + 0.5)) AS code
          FROM e),
    p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 q.v AS qv, n.v AS nv,
                 list_dot_product(q.code, n.code) AS approx
          FROM c q JOIN c n ON q.vec_id < {_N_QUERIES} AND n.vec_id <> q.vec_id),
    cand AS (SELECT query_id, neighbor_id, qv, nv,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY approx DESC, neighbor_id) AS crk
             FROM p),
    r AS (SELECT query_id, neighbor_id,
                 round(list_cosine_similarity(qv, nv), 4) AS cos,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY round(list_cosine_similarity(qv, nv), 4) DESC,
                               neighbor_id) AS INTEGER) AS rank
          FROM cand WHERE crk <= {_INT8_CAND})
    SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= {_TOP_K}
    """,
    doc=(
        "Two-stage ANN over quantized codes: score every corpus vector "
        "against the broadcast query set with the INTEGER dot product "
        f"of its int8 codes (exact in double arithmetic, so the top-"
        f"{_INT8_CAND} candidate cut is deterministic cross-engine), "
        f"then exact-cosine re-rank only those {_INT8_CAND} candidates "
        "per query. This is the serving shape int8 compression buys: "
        "the first pass reads 4×-smaller codes at scan bandwidth and "
        "needs no float math; the float vectors are touched for "
        f"{_INT8_CAND} rows per query. Both windows share one "
        "query_id exchange."
    ),
    tags=("similarity", "topk", "quantization"),
)
def ann_topk_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    # two-step projection: scale first, then codes — keeps the
    # array_max reduction out of the per-element lambda (see
    # embedding_quantize_int8)
    scaled = emb.select(
        "vec_id",
        v.alias("v"),
        (F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)).alias(
            "scale"
        ),
    )
    code = F.transform("v", lambda x: F.floor(x / F.col("scale") + F.lit(0.5)))
    base = scaled.select("vec_id", "v", code.alias("code"))
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("code").alias("qcode"),
    )
    p = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "qv",
        F.col("v").alias("nv"),
        dot(F.col("qcode"), F.col("code")).alias("approx"),
    )
    w = W.partitionBy("query_id")
    cand = p.withColumn(
        "crk",
        F.row_number().over(w.orderBy(F.col("approx").desc(), "neighbor_id")),
    ).filter(F.col("crk") <= _INT8_CAND)
    cos = F.round(cosine(F.col("qv"), F.col("nv")), 4)
    return (
        cand.withColumn("cos", cos)
        .withColumn(
            "rank",
            F.row_number().over(w.orderBy(F.col("cos").desc(), "neighbor_id")),
        )
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization + asymmetric distance (the FAISS-style scale stack)
# ---------------------------------------------------------------------------

_PQ_SUBS = 8  # subspaces: 64-dim → 8 × 8-dim
_PQ_SUBDIM = _DIM // _PQ_SUBS
_PQ_K = 16  # centroids per subspace codebook → a 4-bit code per subspace
_PQ_ITERS = 2  # fixed Lloyd rounds per codebook (deterministic unroll)

_PQ_ITER_SQL = """
    pd{i} AS (SELECT s.vec_id, s.sub, s.sv, c.cell,
                 list_aggregate(list_transform(generate_series(1, {sd}),
                     j -> (s.sv[j] - c.centroid[j]) * (s.sv[j] - c.centroid[j])),
                     'sum') AS dist
           FROM subs s JOIN pc{prev} c ON c.sub = s.sub),
    pa{i} AS (SELECT vec_id, sub, sv, cell, dist FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                            ORDER BY dist, cell) AS rn
               FROM pd{i}) t WHERE rn = 1),
    pe{i} AS (SELECT sub, cell, j, avg(x) AS m
           FROM (SELECT sub, cell, unnest(sv) AS x,
                        generate_subscripts(sv, 1) AS j
                 FROM pa{i}) u
           GROUP BY sub, cell, j),
    pc{i} AS (SELECT sub, cell, list(m ORDER BY j) AS centroid
              FROM pe{i} GROUP BY sub, cell)"""


def _pq_ctes(include_v: bool = True) -> str:
    """v → per-(vec, subspace) slices → deterministic per-sub init →
    unrolled grouped Lloyd rounds. ALL {subs} codebooks train in the
    same relational rounds — subspace is just another grouping key.
    ``include_v=False`` omits the ``v`` CTE for composition with
    another CTE family that already defines it (the IVF k-means CTEs
    in ann_ivf_pq — both spell ``v`` identically)."""
    rounds = ",".join(
        _PQ_ITER_SQL.format(i=i, prev=i - 1, sd=_PQ_SUBDIM)
        for i in range(1, _PQ_ITERS + 1)
    )
    v_cte = (
        "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
        if include_v
        else ""
    )
    return f"""
    {v_cte}
    subs AS (SELECT vec_id, sub,
                    list_slice(v, sub * {_PQ_SUBDIM} + 1,
                               sub * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sv
             FROM v CROSS JOIN (SELECT unnest(generate_series(0, {_PQ_SUBS - 1}))
                                AS sub) sx),
    pc0 AS (SELECT sub,
                   CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id)
                        AS INTEGER) AS cell,
                   sv AS centroid
            FROM (SELECT * FROM subs
                  WHERE vec_id IN (SELECT vec_id FROM v
                                   ORDER BY vec_id LIMIT {_PQ_K})) q),
    {rounds}"""


_PQ_CAND = 50  # ADC shortlist size fed to the exact re-rank


def _pq_adc_oracle() -> str:
    it = _PQ_ITERS
    return f"""
    WITH {_pq_ctes()},
    qt AS (SELECT q.vec_id AS query_id, c.sub, c.cell,
                  list_aggregate(list_transform(generate_series(1, {_PQ_SUBDIM}),
                      j -> (q.sv[j] - c.centroid[j]) * (q.sv[j] - c.centroid[j])),
                      'sum') AS tdist
           FROM subs q JOIN pc{it} c ON c.sub = q.sub
           WHERE q.vec_id < {_N_QUERIES}),
    sc AS (SELECT qt.query_id, n.vec_id AS neighbor_id,
                  round(sum(qt.tdist), 4) AS approx_dist
           FROM pa{it} n JOIN qt ON qt.sub = n.sub AND qt.cell = n.cell
           WHERE n.vec_id <> qt.query_id
           GROUP BY qt.query_id, n.vec_id),
    shortlist AS (SELECT query_id, neighbor_id, approx_dist FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY approx_dist, neighbor_id) AS crank
                    FROM sc) t WHERE crank <= {_PQ_CAND}),
    ex AS (SELECT s.query_id, s.neighbor_id, s.approx_dist,
                  round(list_aggregate(list_transform(generate_series(1, {_DIM}),
                      j -> (vq.v[j] - vn.v[j]) * (vq.v[j] - vn.v[j])),
                      'sum'), 4) AS dist
           FROM shortlist s
           JOIN v vq ON vq.vec_id = s.query_id
           JOIN v vn ON vn.vec_id = s.neighbor_id),
    r AS (SELECT query_id, neighbor_id, approx_dist, dist,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY dist, neighbor_id) AS INTEGER) AS rank
          FROM ex)
    SELECT query_id, neighbor_id, approx_dist, dist, rank
    FROM r WHERE rank <= {_TOP_K}
    """


def _pq_subslices(vecs: DataFrame) -> DataFrame:
    """(vec_id, sub, sv): each vector split into the _PQ_SUBS
    subspace slices — the shared input shape of PQ training and the
    frozen-codebook assignment used by incremental index append."""
    return vecs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice("v", s * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("sv"),
                    )
                    for s in range(_PQ_SUBS)
                ]
            )
        ).alias("x"),
    ).select("vec_id", "x.sub", "x.sv")


def _pq_assign_step(subs: DataFrame, cent) -> DataFrame:
    """One PQ assignment pass (vec_id, sub, cell, sv) against a given
    ``(sub, cell, centroid)`` codebook frame — collect the subs·k tiny
    centroids and score each slice with a per-sub argmin spelled as ONE
    parsed SQL expression: the previous shape (broadcast join →
    groupBy(vec_id, sub) min-struct) shuffled subs·N rows carrying the
    slices every iteration; this is a pure projection — the corpus
    truly never shuffles for assignment. Fold text and smallest-cell
    tie-break are identical to the _PQ_ITER_SQL oracle rounds
    (aggregate of squared diffs ascending j; min struct(dist, cell) ≡
    row_number ORDER BY dist, cell), so codes are bit-identical —
    ann_pq_adc/ann_ivf_pq stay oracle-green. Shared by pq_fit's Lloyd
    rounds and by frozen-codebook encoding on the index append path."""

    rows = (
        cent
        if isinstance(cent, list)
        else sorted(cent.collect(), key=lambda r: (int(r.sub), int(r.cell)))
    )
    by_sub: dict[int, list] = {}
    for r in rows:
        by_sub.setdefault(int(r.sub), []).append(r)
    # ALL subs·k codewords ride as ONE flat array-of-arrays literal
    # column (_pC) plus per-sub offset/count and flat cell-id int
    # arrays, and the per-sub argmin is ONE running-minimum fold over
    # the sub's codeword indices — the previous form spelled the
    # distance fold out once per codeword inside a per-sub CASE
    # (subs·k ≈ 128 copies, ~5000 analyzed nodes per round, the
    # dominant remaining driver cost of pq_fit; this tree is
    # constant-size). least() on the (dist, cell) struct is exactly
    # array_min's comparison (dist a sum of squares — never NaN/-0.0),
    # the inner fold is the identical arithmetic, and cells are
    # scanned via their recorded ids, so codes are bit-identical —
    # ann_pq_adc/ann_ivf_pq stay oracle-green. The one-F.lit-per-
    # codeword form this replaces also paid 40–650 ms of Py4J list
    # conversion per codeword (see _literal_matrix).
    ordered = [r for _, cells in sorted(by_sub.items()) for r in cells]
    offs, counts, off = {}, {}, 0
    for s, cells in sorted(by_sub.items()):
        offs[s], counts[s] = off, len(cells)
        off += len(cells)
    pc = _literal_matrix([r.centroid for r in ordered])
    cells_lit = (
        "array(" + ",".join(str(int(r.cell)) for r in ordered) + ")"
    )
    offs_lit = (
        "array("
        + ",".join(str(offs[s]) for s in sorted(offs))
        + ")"
    )
    counts_lit = (
        "array("
        + ",".join(str(counts[s]) for s in sorted(counts))
        + ")"
    )
    subs_sorted = sorted(by_sub)
    sub_pos = (
        f"array_position(array({','.join(str(s) for s in subs_sorted)}), sub)"
        if subs_sorted != list(range(len(subs_sorted)))
        else "(sub + 1)"
    )
    best = F.expr(
        f"""
        aggregate(sequence(0, _pCnt[{sub_pos} - 1] - 1),
          named_struct('dist', cast('Infinity' as double),
                       'cell', 2147483647),
          (acc, i) -> least(acc, named_struct(
              'dist', aggregate(transform(zip_with(sv,
                          _pC[_pOff[{sub_pos} - 1] + i],
                          (x, y) -> x - y), x -> x * x),
                      0.0D, (p, x) -> p + x),
              'cell', _pCells[_pOff[{sub_pos} - 1] + i])))
        """
    )
    return subs.select(
        "vec_id",
        "sub",
        "sv",
        pc.alias("_pC"),
        F.expr(cells_lit).alias("_pCells"),
        F.expr(offs_lit).alias("_pOff"),
        F.expr(counts_lit).alias("_pCnt"),
    ).select("vec_id", "sub", best["cell"].alias("cell"), "sv")


def pq_fit(emb: DataFrame, barrier: str = "auto") -> tuple[DataFrame, DataFrame]:
    """Train all {_PQ_SUBS} product-quantization codebooks in one set of
    distributed Lloyd rounds (subspace is a grouping key, NOT a Python
    loop): returns ``(codebooks(sub, cell, centroid), codes(vec_id,
    sub, cell))``. Deterministic init (each subspace seeds from the
    {_PQ_K} lowest vec_ids' slices) mirrors :func:`kmeans_fit`. Per
    iteration: one broadcast of ≤ subs·k tiny centroids, one corpus
    pass for argmin, one (sub, cell, dim)-keyed mean — the corpus
    itself never shuffles."""
    from pyspark.sql import Window as W

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    subs = _pq_subslices(vecs)

    seed_ids = vecs.orderBy("vec_id").limit(_PQ_K).select("vec_id")
    cent = (
        subs.join(F.broadcast(seed_ids), "vec_id", "semi")
        .withColumn(
            "cell",
            F.row_number().over(W.partitionBy("sub").orderBy("vec_id")),
        )
        .select("sub", "cell", F.col("sv").alias("centroid"))
    )
    assign = None
    for it in range(_PQ_ITERS):
        last = it == _PQ_ITERS - 1
        # one collect per iteration (the materializing action); rows
        # feed the scorer AND give the subspace width for the update.
        # Intermediate frames carry the centroids as LITERALS, so their
        # lineage is constant-depth — only the RETURNED frames get the
        # barrier (see kmeans_fit; the per-round checkpoints were pure
        # materialization cost, ~0.6 s per fit at sf0.1).
        rows = sorted(
            cent.collect(), key=lambda r: (int(r.sub), int(r.cell))
        )
        subdim = len(rows[0].centroid)
        assign = _pq_assign_step(subs, rows)
        if last:
            assign = materialization_barrier(assign, barrier)
        # centroid update in ONE shuffle (wide per-(sub, cell) avg of
        # each slice dimension) — same values as the posexplode →
        # two-level mean it replaces, one fewer exchange per iteration.
        # One parsed expression instead of subdim × Column-API calls +
        # a second select (see kmeans_fit — same Aggregate node, ~15×
        # cheaper to build).
        cent = assign.groupBy("sub", "cell").agg(
            F.expr(
                "array("
                + ",".join(f"avg(sv[{i}])" for i in range(subdim))
                + ") AS centroid"
            )
        )
        if last:
            cent = materialization_barrier(cent, barrier)
    return cent, assign.select("vec_id", "sub", "cell")


@register(
    "ann_pq_adc",
    _pq_adc_oracle(),
    doc=(
        "Product quantization + asymmetric distance computation, the "
        "FAISS-style memory-scale stack: 8 trained 16-centroid "
        "codebooks compress each 64-dim vector to 8 four-bit codes "
        "(64 bytes → 4), and a query scores the WHOLE corpus from a "
        "broadcast query×sub×cell distance table joined to the code "
        "table — per-neighbor cost is 8 table lookups + a sum, never a "
        "64-dim dot. The ADC shortlist (top-50) then gets an exact "
        "L2 re-rank on raw vectors, the FAISS refine step — only "
        "50 full vectors per query are ever read back. All codebooks "
        "train in the same grouped Lloyd rounds (subspace is a "
        "grouping key, not a loop over trainings); the entire pipeline "
        "— training, encoding, ADC shortlist, exact re-rank — is "
        "value-checked against a DuckDB replay of the identical "
        "unrolled algorithm."
    ),
    tags=("similarity", "topk", "iterative", "quantization"),
)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    cent, codes = pq_fit(emb)

    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qsubs = vecs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice("v", s * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("qsv"),
                    )
                    for s in range(_PQ_SUBS)
                ]
            )
        ).alias("x"),
    ).select("query_id", "x.sub", "x.qsv")
    # the ADC table: queries × subs × cells, ≤ 10·8·16 rows → broadcast
    qtab = qsubs.join(F.broadcast(cent), "sub").select(
        "query_id",
        "sub",
        "cell",
        _sq_dist(F.col("qsv"), F.col("centroid")).alias("tdist"),
    )
    scored = (
        codes.join(F.broadcast(qtab), ["sub", "cell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("tdist"), 4).alias("approx_dist"))
    )
    w = W.partitionBy("query_id")
    shortlist = scored.withColumn(
        "crank",
        F.row_number().over(w.orderBy(F.col("approx_dist").asc(), "neighbor_id")),
    ).filter(F.col("crank") <= _PQ_CAND)
    # exact refine: only the shortlist's raw vectors come back
    qv = vecs.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    nv = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    exact = (
        shortlist.join(F.broadcast(qv.filter(F.col("query_id") < _N_QUERIES)), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_dist",
            F.round(_sq_dist(F.col("qv"), F.col("nv")), 4).alias("dist"),
        )
    )
    return (
        exact.withColumn(
            "rank",
            F.row_number().over(w.orderBy(F.col("dist").asc(), "neighbor_id")),
        )
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "approx_dist", "dist", "rank")
    )


def _ivf_pq_oracle() -> str:
    """IVF coarse quantizer + PQ fine quantizer, composed from the two
    oracle-proven CTE families (both trained on the full corpus, both
    replayed identically here): probe the top n_probe IVF cells per
    query, ADC-score ONLY those cells' members from the PQ code table,
    exact-refine the shortlist."""
    kit = _KM_ITERS
    pit = _PQ_ITERS
    return f"""
    WITH {_kmeans_ctes()},
    {_pq_ctes(include_v=False)},
    qc AS (SELECT q.vec_id AS query_id, c.cell,
                  {_sql_cosine("q.v", "c.centroid")} AS ccos
           FROM v q CROSS JOIN c{kit} c WHERE q.vec_id < {_N_QUERIES}),
    pr AS (SELECT query_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY ccos DESC, cell) AS prank
              FROM qc) t WHERE prank <= {_N_PROBE}),
    qt AS (SELECT q.vec_id AS query_id, c.sub, c.cell,
                  list_aggregate(list_transform(generate_series(1, {_PQ_SUBDIM}),
                      j -> (q.sv[j] - c.centroid[j]) * (q.sv[j] - c.centroid[j])),
                      'sum') AS tdist
           FROM subs q JOIN pc{pit} c ON c.sub = q.sub
           WHERE q.vec_id < {_N_QUERIES}),
    cand AS (SELECT pr.query_id, n.vec_id
             FROM pr JOIN a{kit} n ON n.cell = pr.cell
             WHERE n.vec_id <> pr.query_id),
    sc AS (SELECT cd.query_id, cd.vec_id AS neighbor_id,
                  round(sum(qt.tdist), 4) AS approx_dist
           FROM cand cd
           JOIN pa{pit} p ON p.vec_id = cd.vec_id
           JOIN qt ON qt.query_id = cd.query_id
                  AND qt.sub = p.sub AND qt.cell = p.cell
           GROUP BY cd.query_id, cd.vec_id),
    shortlist AS (SELECT query_id, neighbor_id, approx_dist FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY approx_dist, neighbor_id) AS crank
                    FROM sc) t WHERE crank <= {_PQ_CAND}),
    ex AS (SELECT s.query_id, s.neighbor_id, s.approx_dist,
                  round(list_aggregate(list_transform(generate_series(1, {_DIM}),
                      j -> (vq.v[j] - vn.v[j]) * (vq.v[j] - vn.v[j])),
                      'sum'), 4) AS dist
           FROM shortlist s
           JOIN v vq ON vq.vec_id = s.query_id
           JOIN v vn ON vn.vec_id = s.neighbor_id),
    r AS (SELECT query_id, neighbor_id, approx_dist, dist,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY dist, neighbor_id) AS INTEGER) AS rank
          FROM ex)
    SELECT query_id, neighbor_id, approx_dist, dist, rank
    FROM r WHERE rank <= {_TOP_K}
    """


@register(
    "ann_ivf_pq",
    _ivf_pq_oracle(),
    doc=(
        "IVF-PQ, the lake-scale ANN index shape (FAISS IVFPQ with "
        "by_residual=False): an IVF coarse quantizer (trained k-means, "
        "see kmeans_fit) routes each query to its n_probe nearest "
        "cells, and ONLY those cells' members are ADC-scored from the "
        "PQ code table (8 four-bit codes per vector, see pq_fit) "
        "before the exact top-k refine on raw vectors. Versus "
        "ann_pq_adc — which ADC-scores the whole corpus per query — "
        "the scored set shrinks to n_probe/k of the corpus, which is "
        "the difference that matters at 10^9 vectors: scoring cost "
        "follows the probe list, not the corpus. Both quantizers "
        "train in the same grouped Lloyd rounds as their standalone "
        "operators, and the full pipeline (both trainings, probe, "
        "ADC over probed cells, refine) is value-checked against a "
        "DuckDB replay composed from the same two oracle-proven CTE "
        "families."
    ),
    tags=("similarity", "topk", "iterative", "quantization"),
)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_search(emb, k=_KM_K)


@register(
    "ann_ivf_pq_auto",
    None,
    doc=(
        "Production twin of ann_ivf_pq: the identical "
        "kmeans_fit + pq_fit + probe + probed-cell-ADC + exact-refine "
        "pipeline (ivf_pq_search), with the IVF cell count "
        "auto-derived as ceil(N / 512) instead of the oracle's k=8 "
        "pin — expected cell size (and so the per-probe scan) stays "
        "constant as the corpus grows, which is the lake-scale "
        "contract the pinned tier cannot honor (its second-decade "
        "receipt shows cells growing 10× per decade). No DuckDB "
        "oracle by construction (auto-k Lloyd's has no fixed-k CTE "
        "unroll — same declared exception as "
        "dedup_semantic_semdedup_auto), so the driver records the "
        "weaker rows-only check; semantics are pinned instead by "
        "tests/test_operators.py::test_ivf_pq_auto_parity: at the "
        "smoke corpus auto-k is 1, a single cell whose probe covers "
        "the whole corpus, so the result must equal ann_pq_adc "
        "BIT-FOR-BIT (same PQ training, same shortlist, same refine), "
        "and at sweep scale its refined recall@5 must hold the same "
        "floor as the pinned tier. Past _KM_HIER_MIN=256 cells the "
        "assignment goes two-level exactly as the SemDeDup auto tier "
        "does. Use this tier in production; use the k=8 tier when an "
        "audit needs the replayable Lloyd's trail."
    ),
    tags=("similarity", "topk", "iterative", "quantization"),
)
def ann_ivf_pq_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_search(emb, k=None)


def ivf_pq_search(emb: DataFrame, k: int | None = None) -> DataFrame:
    """IVF-PQ search over any ``(vec_id, embedding)`` frame.

    ``k=None`` derives the IVF cell count as ceil(N / 512) (min 1) —
    the same bounded-cell contract as :func:`semdedup_prune` — and
    probes ``min(_N_PROBE, k)`` cells per query. The PQ codebook shape
    (8 subspaces × 16 centroids) is corpus-size-independent, so only
    the coarse quantizer scales with N.
    """
    from pyspark.sql import Window as W

    if k is None:
        n_vecs = emb.count()
        k = max(1, -(-n_vecs // 512))
    n_probe = min(_N_PROBE, k)
    # The coarse quantizer and the PQ codebooks are INDEPENDENT
    # trainings over the same frame, but each is a chain of small
    # blocking driver actions (one collect per Lloyd round). Run them
    # on two driver threads so their jobs interleave and the cluster's
    # idle tail during one training back-fills with the other — the
    # scheduler overlaps jobs fine, only the sequential driver code
    # serialized them (guide §2.6). Results are unchanged: neither
    # training reads anything the other writes.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_coarse = pool.submit(kmeans_fit, emb, k)
        f_pq = pool.submit(pq_fit, emb)
        coarse_cent, coarse_assign = f_coarse.result()
        pq_cent, codes = f_pq.result()

    # --- probe: top n_probe IVF cells per query (identical to
    # ann_ivf_probe's oracle-proven shape; centroids broadcast) ---
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc = q.join(F.broadcast(coarse_cent)).select(
        "query_id",
        "cell",
        cosine(F.col("qe"), F.col("centroid")).alias("ccos"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cell"))
    probes = (
        qc.withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= n_probe)
        .select("query_id", "cell")
    )

    # --- candidates: members of probed cells only — the IVF cut.
    # probes is ≤ queries × n_probe rows → broadcast; the corpus-sized
    # assignment frame never shuffles for this join ---
    cand = (
        F.broadcast(probes)
        .join(coarse_assign.select("vec_id", "cell"), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )

    # --- ADC table: queries × subs × pq-cells, ≤ 10·8·16 rows ---
    vecs = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qsubs = vecs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice("v", s * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("qsv"),
                    )
                    for s in range(_PQ_SUBS)
                ]
            )
        ).alias("x"),
    ).select("query_id", "x.sub", "x.qsv")
    qtab = qsubs.join(F.broadcast(pq_cent), "sub").select(
        "query_id",
        "sub",
        "cell",
        _sq_dist(F.col("qsv"), F.col("centroid")).alias("tdist"),
    )

    # --- ADC over candidates only: per-neighbor cost is 8 lookups +
    # a sum, and the scored set is the probed cells, not the corpus ---
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qtab), ["query_id", "sub", "cell"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.sum("tdist"), 4).alias("approx_dist"))
    )
    w = W.partitionBy("query_id")
    shortlist = scored.withColumn(
        "crank",
        F.row_number().over(w.orderBy(F.col("approx_dist").asc(), "neighbor_id")),
    ).filter(F.col("crank") <= _PQ_CAND)

    # --- exact refine: only the shortlist's raw vectors come back ---
    qv = vecs.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    nv = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    exact = (
        shortlist.join(F.broadcast(qv.filter(F.col("query_id") < _N_QUERIES)), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_dist",
            F.round(_sq_dist(F.col("qv"), F.col("nv")), 4).alias("dist"),
        )
    )
    return (
        exact.withColumn(
            "rank",
            F.row_number().over(w.orderBy(F.col("dist").asc(), "neighbor_id")),
        )
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "approx_dist", "dist", "rank")
    )


# ---------------------------------------------------------------------------
# Filtered ANN (vector search with a relational predicate)
# ---------------------------------------------------------------------------


@register(
    "ann_filtered_search",
    f"""
    SELECT query_id, neighbor_id, lang, cos, rank
    FROM (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, d.lang,
                 round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                              CAST(v.embedding AS DOUBLE[])), 4) AS cos,
                 CAST(row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(v.embedding AS DOUBLE[])), 4) DESC,
                              v.vec_id) AS INTEGER) AS rank
          FROM embeddings q
          JOIN embeddings v ON q.vec_id < {_N_QUERIES} AND v.vec_id <> q.vec_id
          JOIN documents d ON d.doc_id = v.vec_id
          WHERE d.lang = 'en' AND d.n_chars >= 100) t
    WHERE rank <= {_TOP_K}
    """,
    doc=(
        "Filtered vector search — the production retrieval shape "
        "(vector similarity AND a relational predicate on the joined "
        "document): neighbors must be English docs of ≥ 100 chars. "
        "Strategy is PRE-filter: the predicate joins/filters the "
        "corpus BEFORE any distance math, which is right when the "
        "filter is selective (here ~40%) — a post-filtered ANN would "
        "return < k results whenever the top-k neighborhood is "
        "predicate-poor. At 100 TB the document predicate pushes into "
        "the parquet scan and the (doc_id = vec_id) equi-join rides "
        "broadcast or bucketed layout; the scoring pass then touches "
        "only surviving vectors."
    ),
    tags=("similarity", "topk", "join"),
)
def ann_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 100)
    )
    cand = emb.join(
        docs.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = cand.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "lang",
        F.round(cosine(F.col("qe"), F.col("embedding")), 4).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "lang", "cos", "rank")
    )


@register(
    "embedding_label_separation",
    """
    WITH e AS (SELECT vec_id, label,
                      generate_subscripts(embedding, 1) AS i,
                      unnest(CAST(embedding AS DOUBLE[])) AS x
               FROM embeddings),
    -- coordinates quantized to 1e-9 BIGINT units: every accumulation
    -- below is exact integer addition (order-independent on both
    -- engines); doubles reappear only in single final expressions
    eq AS (SELECT vec_id, label, i, x,
                  CAST(floor(x * 1e9) AS BIGINT) AS x_e9 FROM e),
    c AS (SELECT label, i,
                 CAST(sum(x_e9) AS DOUBLE) / (1000000000.0 * count(*)) AS m
          FROM eq GROUP BY label, i),
    intra AS (SELECT eq.label, eq.vec_id,
                     sum(CAST(floor((eq.x - c.m) * (eq.x - c.m) * 1e12)
                              AS BIGINT)) AS d2_e12
              FROM eq JOIN c ON eq.label = c.label AND eq.i = c.i
              GROUP BY eq.label, eq.vec_id),
    il AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
                  sqrt(CAST(sum(d2_e12) AS DOUBLE)
                       / (1000000000000.0 * count(*))) AS intra_rms
           FROM intra GROUP BY label),
    cd AS (SELECT a.label AS la, b.label AS lb,
                  sqrt(CAST(sum(CAST(floor((a.m - b.m) * (a.m - b.m) * 1e12)
                                     AS BIGINT)) AS DOUBLE)
                       / 1000000000000.0) AS d
           FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
           GROUP BY a.label, b.label),
    mind AS (SELECT label, min(d) AS min_inter FROM
             (SELECT la AS label, d FROM cd
              UNION ALL SELECT lb AS label, d FROM cd)
             GROUP BY label)
    SELECT il.label, il.n_vectors,
           round(il.intra_rms, 4)                  AS intra_rms,
           round(mind.min_inter, 4)                AS min_inter_centroid,
           round(mind.min_inter / il.intra_rms, 4) AS separation_ratio
    FROM il JOIN mind ON il.label = mind.label
    """,
    doc=(
        "Label-separation screen for an embedding table: per label, "
        "the RMS distance of member vectors to their own centroid "
        "(cohesion) vs the distance to the NEAREST other centroid "
        "(separation), and their ratio — the silhouette-style sanity "
        "check run before trusting labels for classifier training or "
        "stratified sampling. Centroids come from one (label, dim) "
        "mean — the same shuffle shape as IVF training, corpus never "
        "collected; the centroid-pair matrix is |labels|² tiny rows. "
        "A ratio well above 1 means the labels are geometrically "
        "real; near 1 means label noise. Determinism: coordinates are "
        "quantized to 1e-9 BIGINT units and squared deviations to "
        "1e-12 units, so centroid means and distance sums reduce over "
        "EXACT INTEGERS (order-independent, engine-exact — the proven "
        "scaled-integer pattern); the label-level merge accumulates in "
        "DECIMAL(38,0) so headroom survives any vector count, and "
        "doubles appear only in single final expressions evaluated in "
        "the same order on both engines."
    ),
    tags=("similarity", "agg", "eval"),
)
def embedding_label_separation(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    d38 = "decimal(38,0)"
    e = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    ).withColumn("x_e9", F.floor(F.col("x") * 1e9).cast("long"))
    c = (
        e.groupBy("label", "i")
        .agg(
            (
                F.sum(F.col("x_e9").cast(d38)).cast("double")
                / (F.lit(1000000000.0) * F.count(F.lit(1)))
            ).alias("m")
        )
    )
    # feeds both the intra join and the centroid-pair matrix —
    # injectable barrier policy (fintech_etl_spark.barrier)
    c = materialization_barrier(c, barrier)
    dev2_e12 = F.floor(
        (F.col("x") - F.col("m")) * (F.col("x") - F.col("m")) * 1e12
    ).cast("long")
    intra = (
        e.join(F.broadcast(c), ["label", "i"])
        .groupBy("label", "vec_id")
        .agg(F.sum(dev2_e12).alias("d2_e12"))
    )
    il = intra.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sqrt(
            F.sum(F.col("d2_e12").cast(d38)).cast("double")
            / (F.lit(1000000000000.0) * F.count(F.lit(1)))
        ).alias("intra_rms"),
    )
    a = c.select(F.col("label").alias("la"), "i", F.col("m").alias("ma"))
    b = c.select(F.col("label").alias("lb"), "i", F.col("m").alias("mb"))
    cdev_e12 = F.floor(
        (F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")) * 1e12
    ).cast("long")
    cd = (
        a.join(b, "i")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sqrt(F.sum(cdev_e12).cast("double") / F.lit(1000000000000.0)).alias(
                "d"
            )
        )
    )
    mind = (
        cd.select(F.col("la").alias("label"), "d")
        .unionAll(cd.select(F.col("lb").alias("label"), "d"))
        .groupBy("label")
        .agg(F.min("d").alias("min_inter"))
    )
    return il.join(F.broadcast(mind), "label").select(
        "label",
        "n_vectors",
        F.round("intra_rms", 4).alias("intra_rms"),
        F.round("min_inter", 4).alias("min_inter_centroid"),
        F.round(F.col("min_inter") / F.col("intra_rms"), 4).alias(
            "separation_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-prune semantic deduplication
# ---------------------------------------------------------------------------

#: prune threshold: a vector is dropped when a SMALLER-id vector in the
#: same k-means cell has cosine ≥ τ. The published SemDeDup recipe uses
#: τ ≈ 0.95+ on web-scale CLIP/LM embeddings; this synthetic corpus is
#: near-orthogonal (max in-cell cos ≈ 0.51), so τ is set where the
#: technique has observable work at every sf (2 / 9 / 53 pruned at
#: sf0.001 / 0.01 / 0.1).
_SEMDEDUP_TAU = 0.45


def _sql_cosine_e12(a: str, b: str) -> str:
    """Quantized-exact cosine: per-dim products and squares floored to
    1e-12 integer units before summing. Every partial stays < 2^53, so
    the double-typed sums are EXACT integers regardless of fold order —
    the kernel's vectorized numpy sums and DuckDB's list_aggregate
    cannot disagree (unlike a float GEMM vs a sequential SQL fold,
    which differ in the last ulp and can flip a >= tau comparison)."""
    return (
        f"(list_aggregate(list_transform(generate_series(1, {_DIM}),"
        f" j -> floor({a}[j] * {b}[j] * 1e12)), 'sum') /"
        f" (sqrt(list_aggregate(list_transform({a}, x -> floor(x * x * 1e12)),"
        f" 'sum')) *"
        f" sqrt(list_aggregate(list_transform({b}, x -> floor(x * x * 1e12)),"
        f" 'sum'))))"
    )


def _semdedup_oracle() -> str:
    it = _KM_ITERS
    cos = _sql_cosine_e12("a.v", "b.v")
    return f"""
    WITH {_kmeans_ctes()},
    m AS (SELECT vec_id, CAST(cell AS INTEGER) AS cell, v FROM a{it}),
    cand AS (SELECT b.vec_id AS vec_id, a.vec_id AS other, {cos} AS cos
             FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
             WHERE {cos} >= {_SEMDEDUP_TAU}),
    pruned AS (SELECT vec_id, min(other) AS pruned_by FROM cand GROUP BY vec_id),
    pb AS (SELECT p.vec_id, p.pruned_by,
                  floor(c.cos * 10000 + 0.5) / 10000 AS prune_cos
           FROM pruned p JOIN cand c
             ON c.vec_id = p.vec_id AND c.other = p.pruned_by)
    SELECT m.vec_id, m.cell,
           (pb.vec_id IS NULL) AS kept,
           pb.pruned_by, pb.prune_cos
    FROM m LEFT JOIN pb ON m.vec_id = pb.vec_id
    """


@register(
    "dedup_semantic_semdedup",
    _semdedup_oracle(),
    doc=(
        "SemDeDup (Abbas et al. 2023): cluster embeddings with k-means, "
        "then inside each cluster drop every vector that has a near-"
        "semantic-duplicate — cosine ≥ τ against a smaller-id member — "
        "keeping one deterministic representative per duplicate set. "
        "One row per vector: kept verdict, the pruning representative, "
        "and the cosine that condemned it. The quadratic work is "
        "CONFINED to cells (Σ n_c² with k chosen ~ N/target_cell_size "
        "at lake scale, so cells stay bounded and each is one NumPy "
        "GEMM in an Arrow batch); the corpus never all-pairs joins. "
        "Oracle replays the identical unrolled Lloyd's (shared "
        "_kmeans_ctes) plus the in-cell prune rule in pure SQL. "
        "Cross-engine determinism: the float GEMM is only a PREFILTER "
        "(pairs above tau − 1e-6); every tau comparison and displayed "
        "cosine is recomputed from 1e-12-quantized per-dim integer "
        "sums (exact at < 2^53 in float64, so numpy and DuckDB agree "
        "bit-for-bit) with a half-up 4-decimal display — centroid "
        "means remain the only unordered reduction (documented "
        "ulp/Voronoi-boundary residual)."
    ),
    tags=("dedup", "similarity", "pandas_udf", "iterative"),
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # the registered query pins k=_KM_K so the unrolled-Lloyd's oracle
    # replays it; production callers use semdedup_prune's auto-k
    return semdedup_prune(emb, k=_KM_K)


#: Target members per SemDeDup cell when k is auto-derived: in-cell
#: work is one n_c×n_c GEMM, so pinning E[n_c] pins the per-task cost
#: and makes total work O(N·cell) — linear in corpus size.
_SEMDEDUP_TARGET_CELL = 512


@register(
    "dedup_semantic_semdedup_auto",
    None,
    doc=(
        "Production twin of dedup_semantic_semdedup: the identical "
        "kmeans_fit + per-cell quantized-exact prune pipeline "
        "(semdedup_prune), with k auto-derived as ceil(N / 512) "
        "instead of the oracle's k=8 pin — expected cell size (and so "
        "the per-cell GEMM) stays constant as the corpus grows, which "
        "is the lake-scale contract the k=8 tier cannot honor. No "
        "DuckDB oracle by construction (auto-k Lloyd's has no fixed-k "
        "CTE unroll), so the driver records the weaker rows-only "
        "check; semantics are pinned instead by tests/test_operators."
        "py::test_semdedup_auto_parity_with_k8_tier — at the gate "
        "corpus (500 vectors) auto-k is 1, a single cell that is a "
        "strict superset of every k=8 cell, so every vector the "
        "oracle-checked tier prunes must be pruned here too with the "
        "identical pruned_by/prune_cos whenever the representative "
        "matches — and by SCALE_RECEIPT_r07_semdedup.json (10x "
        "vectors: k 4->40, max cell x1.76, wall x3.0). Past "
        "_KM_HIER_MIN=256 cells the assignment goes two-level "
        "(coarse sqrt(k) groups + top-2 probe, O(sqrt(k))/vector — "
        "SCALE_RECEIPT_r07_hier.json: 200k vectors, k=391, 0.948 "
        "agreement with flat, zero sub-exact distances, cells "
        "bounded). Use this tier in production; use the k=8 tier "
        "when an audit needs the replayable Lloyd's trail."
    ),
    tags=("dedup", "similarity", "pandas_udf", "iterative"),
)
def dedup_semantic_semdedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_prune(emb, k=None)


def semdedup_prune(
    emb: DataFrame, k: int | None = None, tau: float = _SEMDEDUP_TAU
) -> DataFrame:
    """SemDeDup over any ``(vec_id, embedding)`` frame.

    ``k=None`` derives the cell count as ceil(N / 512): expected cell
    size — and therefore the per-cell GEMM — stays constant as the
    corpus grows, which is the lake-scale contract (the k=8 pin of the
    registered query exists only so the DuckDB oracle can unroll
    Lloyd's; tools/bench_scale.py measures THIS entry point at
    sf0.1→sf1 to receipt the bounded-cell claim). k-means cost per
    iteration is one broadcast of k centroids and one argmin pass —
    no extra shuffle relative to the pinned variant.

    Scale posture: with k ∝ N a FLAT assignment step would be
    N·k·d = N²·d/512 work per Lloyd's iteration (the SemDeDup paper
    pays the same). Past ``_KM_HIER_MIN`` cells (k > 256, i.e.
    N ≳ 131k vectors) ``kmeans_fit`` therefore switches to two-level
    assignment — the k centroids are themselves clustered into √k
    coarse groups and each vector scores coarse centers + the fine
    members of its top-2 groups, O(√k) evaluations — making the
    iteration N·√k·d. Assignment becomes approximate at the margin
    (a vector whose true cell is outside both probed coarse groups
    lands in a neighboring cell; SemDeDup's blocking tolerates that —
    the cell is only a candidate-confinement structure), pinned by an
    agreement test and the committed hier scale receipt."""
    import numpy as np
    import pandas as pd

    if k is None:
        n_vecs = emb.count()
        k = max(1, -(-n_vecs // _SEMDEDUP_TARGET_CELL))
    _, assign = kmeans_fit(emb, k=k)
    members = assign.select("vec_id", "cell").join(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v")),
        "vec_id",
    )

    def prune_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        V = np.stack(pdf["v"].to_numpy())
        # exact per-vector squared norms in 1e-12 integer units: each
        # partial < 2^53, so the float64 sum is exact in any order
        norm_e12 = np.floor(V * V * 1e12).sum(axis=1)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T  # float prefilter only — never compared to tau
        n = len(ids)
        kept = np.ones(n, dtype=bool)
        pby = np.full(n, 0, dtype=np.int64)
        pcos = np.zeros(n, dtype=np.float64)
        for j in range(n):
            # GEMM error vs the quantized-exact cosine is < 1e-9, so a
            # 1e-6 margin cannot drop a true candidate
            cand = np.nonzero(S[:j, j] >= tau - 1e-6)[0]
            if not cand.size:
                continue
            # exact quantized cosine, same expression order as the
            # oracle: sum(floor(a*b*1e12)) / (sqrt(na)*sqrt(nb))
            dots = np.floor(V[cand] * V[j] * 1e12).sum(axis=1)
            cosx = dots / (np.sqrt(norm_e12[cand]) * np.sqrt(norm_e12[j]))
            hit = cosx >= tau
            if hit.any():
                kept[j] = False
                i = int(cand[np.argmax(hit)])  # cand asc → smallest id
                pby[j] = ids[i]
                # half-up 4-decimal display, matching DuckDB round()
                pcos[j] = np.floor(cosx[np.argmax(hit)] * 10000 + 0.5) / 10000
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"],
                "kept": kept,
                # nullable columns: Arrow turns pd.NA into SQL NULL (a
                # float NaN would hash as the string 'NaN', not NULL)
                "pruned_by": pd.array(
                    [None if k else int(b) for k, b in zip(kept, pby)],
                    dtype="Int64",
                ),
                "prune_cos": pd.array(
                    [None if k else float(c) for k, c in zip(kept, pcos)],
                    dtype="Float64",
                ),
            }
        )

    return members.groupBy("cell").applyInPandas(
        prune_cell,
        "vec_id long, cell int, kept boolean, pruned_by long, prune_cos double",
    )
