"""Deduplication operators for LLM training-data pipelines (north star).

Five dedup strategies over the ``documents`` table, each chosen for a
different scale/fidelity point:

- exact (hash-groupBy): one shuffle on a 128-bit fingerprint.
- n-gram Jaccard: inverted-index self-join on shingles — the exact
  similarity-join; candidate count is bounded by shingle document
  frequency, never |docs|².
- MinHash + LSH: banded signatures prune candidates to near-duplicate
  buckets before exact verification — the 100 TB fuzzy-dedup path.
- SimHash: 64-bit projection, Hamming-ball matching via band equality.
- embedding cosine: semantic near-dup on the ``embeddings`` table.

All shuffles key on shingles / bucket ids / fingerprints, which are
high-cardinality and salt-free; hot shingles (stopword runs) are the
one skew risk — ``dedup_minhash_lsh`` stays uncapped for exact oracle
parity, while ``dedup_minhash_lsh_dfcap`` applies the production
document-frequency cap (skew-bounded by construction).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.barrier import materialization_barrier
from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Shared shingling expressions (word n-grams over lower-cased text)
# ---------------------------------------------------------------------------


def spread(df: DataFrame) -> DataFrame:
    """Repartition compute-dense inputs across all cores.

    The testdata tables are single-row-group parquet files, which Spark
    cannot split below one partition — so shingling/hashing would run
    on ONE core no matter the cluster size. On a real 100 TB lake the
    scan yields thousands of splits and this is a no-op-sized shuffle;
    locally it is the difference between 1× and 32× parallelism on the
    expression-heavy operators.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target)


def shingles_of_words(w: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles from a words-array column. A doc
    shorter than ``n`` words yields its single (joined) prefix, so no
    document silently drops out of dedup."""
    # sequence is empty-safe via greatest(); element_at is 1-based.
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1)))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(gram)


def word_shingles(text: F.Column | str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of ``text`` as an array<string>.

    NB: prefer :func:`with_shingles` in operators — inlining the split
    inside the transform lambda makes Catalyst re-evaluate the regex
    split per element_at (≈3n times per row), which profiling showed
    dominates the whole dedup pipeline.
    """
    c = F.col(text) if isinstance(text, str) else text
    return shingles_of_words(F.split(F.lower(F.trim(c)), r"\s+"), n)


def with_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, s): shingle sets with the words array materialized at a
    projection boundary. The alias is referenced 3n times by the gram
    transform, so CollapseProject keeps the boundary and the split runs
    once per row instead of once per element_at."""
    w = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w")
    )
    return w.select("doc_id", shingles_of_words(F.col("w"), n).alias("s"))


def _shingle_sql(n: int = 3) -> str:
    """The DuckDB mirror of :func:`word_shingles` (1-based lists)."""
    joined = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    # generate_series (inclusive) mirrors Spark's sequence(); DuckDB's
    # range() is upper-exclusive and would drop the final shingle.
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len(w)-{n - 1}, 1)), "
        f"i -> {joined}))"
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS survivor_id,
           CAST(count(*) AS BIGINT)    AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc=(
        "Exact dedup: group on a content fingerprint, keep the smallest "
        "doc_id. One hash shuffle on the 128-bit key — at 100 TB this is "
        "embarrassingly parallel and AQE coalesces the tiny post-agg side."
    ),
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.min("doc_id").alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity join (exact)
# ---------------------------------------------------------------------------

_JACCARD_TAU = 0.1
_NGRAM_ORACLE = f"""
    WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
               FROM documents),
    sh AS (SELECT doc_id, {_shingle_sql(3)} AS s FROM w),
    e AS (SELECT doc_id, unnest(s) AS g FROM sh),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
               FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= {_JACCARD_TAU}
"""


@register(
    "dedup_ngram_jaccard",
    _NGRAM_ORACLE,
    doc=(
        "Exact trigram-Jaccard similarity join via inverted index: "
        "explode shingles, self-join on shingle (only docs sharing a "
        "shingle ever meet), count common, filter on τ. The shuffle key "
        "is the shingle — candidate pairs are Σ df(g)² over shingles, "
        "not |docs|², which is what makes exact Jaccard feasible at scale."
    ),
    tags=("dedup", "join"),
)
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    # the shingle table feeds FOUR consumers (both sides of the
    # inverted-index self-join + both size lookups); un-barriered, the
    # split+shingle expression pipeline re-executes once per consumer
    sh = materialization_barrier(with_shingles(docs, 3), barrier)
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    # explode_outer, NOT explode: plain explode makes Catalyst infer a
    # size(s)>0 filter, re-inline the whole shingle expression into it,
    # and push it below the repartition — single-threaded recompute of
    # the most expensive expression in the pipeline (measured 10×).
    e = sh.select("doc_id", F.explode_outer("s").alias("g")).filter(
        F.col("g").isNotNull()
    )
    ea = e.select(F.col("doc_id").alias("doc_a"), "g")
    eb = e.select(F.col("doc_id").alias("doc_b"), "g")
    common = (
        ea.join(eb, ["g"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _JACCARD_TAU)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (banded) with exact verification
# ---------------------------------------------------------------------------

_MINHASH_PERMS = 64  # signature length
_LSH_BANDS = 32  # 32 bands × 2 rows → catches jaccard ≳ 0.6 w.p. ~1
_VERIFY_TAU = 0.7

_MINHASH_VERIFIED_ORACLE = _NGRAM_ORACLE.replace(
    f">= {_JACCARD_TAU}", f">= {_VERIFY_TAU}"
)

# Brute-force verified near-dup pairs at τ as a reusable CTE chain
# (the body of _NGRAM_ORACLE re-expressed so downstream oracles —
# connected components, survivors — can build on `pairs`).
_PAIRS_CTES = f"""
    w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM documents),
    sh AS (SELECT doc_id, {_shingle_sql(3)} AS s FROM w),
    e AS (SELECT doc_id, unnest(s) AS g FROM sh),
    sizes AS (SELECT doc_id, len(s) AS n FROM sh),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
               FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
    pairs AS (SELECT doc_a, doc_b
              FROM common
              JOIN sizes sa ON doc_a = sa.doc_id
              JOIN sizes sb ON doc_b = sb.doc_id
              WHERE c * 1.0 / (sa.n + sb.n - c) >= {_VERIFY_TAU})
"""

# Min-label connected components over an edge-source CTE via transitive
# closure: reach(node, r) = node reaches r; component id = min reachable
# node. WITH RECURSIVE's UNION-distinct semantics make the fixpoint
# terminate (nothing new to add once the closure is complete).


def _components_ctes(src: str = "pairs") -> str:
    return f"""
    edges AS (SELECT doc_a AS s, doc_b AS d FROM {src}
              UNION
              SELECT doc_b AS s, doc_a AS d FROM {src}),
    reach AS (
        SELECT s AS node, s AS r FROM edges
        UNION
        SELECT e2.s AS node, reach.r FROM edges e2
        JOIN reach ON e2.d = reach.node
    ),
    comp AS (SELECT node, min(r) AS component_id FROM reach GROUP BY node)
"""


_COMPONENT_ROLLUP_SELECT = """
    SELECT component_id,
           CAST(count(*) AS BIGINT) AS n_members,
           string_agg(node::VARCHAR, ',' ORDER BY node) AS member_ids
    FROM comp GROUP BY component_id
"""

_COMPONENTS_ORACLE = (
    f"WITH RECURSIVE {_PAIRS_CTES}, {_components_ctes()} {_COMPONENT_ROLLUP_SELECT}"
)


def minhash_signature(
    shingles: F.Column | str, n_perm: int = _MINHASH_PERMS
) -> F.Column:
    """MinHash signature as array<long>: min over xxhash64(shingle, seed)
    per permutation. ONE aggregate pass over the shingle array carrying
    a 64-long accumulator (zip_with + least), instead of 64 separate
    array_min(transform(...)) columns — identical signatures, measured
    3.5× faster at sf0.1 (0.27 s vs 0.95 s) because the wide column
    form dominated plan analysis and re-walked the array per
    permutation. xxhash64 is Spark-native (JVM, codegen'd) — no UDF.

    ``shingles`` must be a column NAME (or a Column that is a plain
    attribute reference) — the expression is built as SQL text.
    """
    name = shingles if isinstance(shingles, str) else shingles._jc.toString()
    return F.expr(
        f"""
        aggregate(`{name}`,
          array_repeat(cast(9223372036854775807 as long), {n_perm}),
          (acc, g) -> zip_with(acc,
                               transform(sequence(0, {n_perm - 1}),
                                         i -> xxhash64(g, i)),
                               (a, b) -> least(a, b)))
        """
    )


@register(
    "dedup_minhash_lsh",
    _MINHASH_VERIFIED_ORACLE,
    doc=(
        "MinHash(64)+LSH(32 bands × 2 rows) candidate generation, then "
        "exact trigram-Jaccard verification at τ=0.7. The banded shuffle "
        "keys on (band, hash-of-rows): at 100 TB only near-duplicate "
        "docs collide, so the verify join touches a vanishing fraction "
        "of pairs. P(miss | jaccard=0.7) = (1-0.49)^32 ≈ 5e-10, so the "
        "oracle (brute-force τ=0.7) and the LSH path agree on real data. "
        "PRODUCTION NOTE — this is the ORACLE-PARITY tier: one boiler"
        "plate shingle shared by a large doc fraction makes one LSH "
        "bucket (one reducer) quadratic. At scale use "
        "dedup_minhash_lsh_dfcap, which drops >1%-df shingles and is "
        "skew-bounded by construction."
    ),
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: the candidate-pair frame feeds the verify join
    # and both semi-filters — truncated via the injectable policy
    # (reliable when a checkpoint dir is set, executor-local in dev)
    # Cheap text-level prefilter (pushed to the scan) instead of
    # size(s)>0: a post-shingle filter gets rewritten against text and
    # pushed below the repartition, recomputing the shingle expression
    # single-threaded (measured 11s vs 0.3s at sf0.1).
    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        )
    )
    sh = with_shingles(docs, 3)
    sig = sh.select(
        "doc_id", "s", minhash_signature(F.col("s")).alias("sig")
    )

    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    # One row per (doc, band): bucket = hash of the band's signature slice.
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(_LSH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    # In-bucket pair generation — same shape as the dfcap variant: one
    # groupBy shuffle, pairs generated inside the bucket's task.
    cand = (
        bands.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("m"))
        .filter(F.size("m") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(m, (x, i) -> "
                    "transform(slice(m, i + 2, size(m) - i - 1), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    cand = materialization_barrier(cand, barrier)

    # Exact verification on candidates only: re-shingle JUST the docs
    # that appear in a candidate pair (broadcast semi on 8-byte ids)
    # instead of replanning the full-corpus shingling for each side.
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # one materialization, two aliases — see _dense_band_verify: the
    # un-barriered frame was re-planned (semi join + re-shingle) per
    # join side
    needed = materialization_barrier(
        with_shingles(docs.join(F.broadcast(cand_ids), "doc_id", "semi"), 3),
        barrier,
    )
    sa = needed.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = needed.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = inter / union
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _VERIFY_TAU)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) near-dup
# ---------------------------------------------------------------------------


_SIMHASH_BITS = 60  # hash64 width — cross-engine md5-derived (see hashing.py)
_SIMHASH_CHUNKS = 4  # 4 × 15-bit bands → catches Hamming ≤ 3 exactly
_SIMHASH_CHUNK_BITS = _SIMHASH_BITS // _SIMHASH_CHUNKS
_SIMHASH_CHUNK_MASK = (1 << _SIMHASH_CHUNK_BITS) - 1


#: SimHash fingerprint as ONE nested higher-order expression over the
#: per-row token array (`_toks`): hash each token once (md5-derived
#: :func:`fintech_etl_spark.functions.hashing.hash64`, bit-identical
#: in DuckDB), fold ±1 votes per bit into a 60-long vector with
#: aggregate+zip_with, then OR the majority bits into one long. The
#: whole computation fuses into the scan — no explode, no shuffle, no
#: 60-column aggregate. Measured 7× faster than the explode→groupBy
#: formulation at sf0.1 (0.22 s vs 1.5 s), where the wide hash-agg
#: plan dominated both analysis and execution time.
_SIMHASH_HOF = """
aggregate(
  zip_with(
    aggregate(
      transform(_toks,
                t -> cast(conv(substring(md5(t), 1, 15), 16, 10) AS long)),
      array_repeat(cast(0 as long), {bits}),
      (acc, h) -> zip_with(acc,
                           transform(sequence(0, {maxbit}),
                                     i -> IF(((h >> i) & 1) = 1,
                                             cast(1 as long),
                                             cast(-1 as long))),
                           (a, b) -> a + b)),
    sequence(0, {maxbit}),
    (v, i) -> IF(v > 0, shiftleft(cast(1 as long), i), cast(0 as long))),
  cast(0 as long), (acc, x) -> acc | x)
"""


def simhash_column(df: DataFrame, tokens: F.Column, out: str = "sim") -> DataFrame:
    """Add a 60-bit SimHash column computed per-row from ``tokens``
    (see :data:`_SIMHASH_HOF`). Null/empty token arrays yield a null
    fingerprint — callers that must dedup empty docs should pair this
    with an exact-hash rule, as the streaming corpus intake does."""
    hof = _SIMHASH_HOF.format(bits=_SIMHASH_BITS, maxbit=_SIMHASH_BITS - 1)
    return df.withColumn("_toks", tokens).withColumn(out, F.expr(hof)).drop("_toks")


def simhash_fingerprints(docs: DataFrame, tokens: F.Column) -> DataFrame:
    """(doc_id, sim) with a 60-bit SimHash per document.

    Entirely per-row (see :data:`_SIMHASH_HOF`): a doc's fingerprint
    is a pure function of its own tokens, so the computation rides the
    scan with zero shuffles at any corpus size. Token hash is the
    md5-derived :func:`hash64`, keeping the fingerprint bit-identical
    in the DuckDB oracle (xxhash64 would be marginally faster
    in-engine but unverifiable cross-engine).
    """
    hof = _SIMHASH_HOF.format(bits=_SIMHASH_BITS, maxbit=_SIMHASH_BITS - 1)
    return (
        docs.withColumn("_toks", tokens)
        .filter(F.size("_toks") > 0)
        .select("doc_id", F.expr(hof).alias("sim"))
    )


def _simhash_oracle(cap: int | None = None) -> str:
    from fintech_etl_spark.functions.hashing import hash64_sql

    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(_SIMHASH_BITS)
    )
    fold = " | ".join(
        f"(CASE WHEN v{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE CAST(0 AS BIGINT) END)"
        for i in range(_SIMHASH_BITS)
    )
    chunk_nos = ", ".join(str(i) for i in range(_SIMHASH_CHUNKS))
    if cap is None:
        src = "chunks"
        cap_ctes = ""
    else:
        # capped tier: over-dense band buckets sit out candidate gen
        src = "ak"
        cap_ctes = f"""
    allowed AS (SELECT chunk_no, chunk FROM chunks
                GROUP BY chunk_no, chunk HAVING count(*) <= {cap}),
    ak AS (SELECT c.* FROM chunks c
           JOIN allowed USING (chunk_no, chunk)),"""
    return rf"""
    WITH tok AS (SELECT doc_id,
                        unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
                 FROM documents),
    h AS (SELECT doc_id, {hash64_sql("t")} AS h FROM tok),
    votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, {fold} AS sim FROM votes),
    chunks AS (SELECT doc_id, sim, i AS chunk_no,
                      (sim >> ({_SIMHASH_CHUNK_BITS} * i)) & {_SIMHASH_CHUNK_MASK} AS chunk
               FROM fp CROSS JOIN (SELECT unnest([{chunk_nos}]) AS i) u),{cap_ctes}
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             a.sim AS sim_a, b.sim AS sim_b
             FROM {src} a
             JOIN {src} b ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
                          AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= 3
"""


@register(
    "dedup_simhash",
    _simhash_oracle(),
    doc=(
        "SimHash(60) near-dup: band the fingerprint into 4×15-bit chunks; "
        "pairs agreeing on ≥1 chunk are candidates (catches Hamming "
        "distance ≤ 3 exactly, pigeonhole), verified by popcount ≤ 3. "
        "Fingerprints are a pure per-row fold over the token array (no "
        "shuffle); candidates come from ONE groupBy on the 15-bit chunk "
        "with in-bucket pair generation, and the popcount filter runs "
        "inside the generating task so only true near-dups reach the "
        "final distinct. The md5-derived token hash makes the whole "
        "pipeline value-checked against the DuckDB oracle bit-for-bit."
    ),
    tags=("dedup", "lsh"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # No checkpoint: the grouped candidate generation below consumes
    # the fingerprints exactly ONCE (the old two-sided self-join read
    # them twice, which is when materializing first paid off).
    fp = simhash_fingerprints(docs, toks)
    return _simhash_band_pairs(fp)


def _simhash_band_pairs(fp: DataFrame, cap: int | None = None) -> DataFrame:
    """Banded candidate generation + Hamming≤3 verify shared by the
    exact and capped SimHash tiers. With ``cap``, band buckets holding
    more than ``cap`` fingerprints sit out pair generation — the
    bucket size IS the aggregation key's cardinality, so the cap is a
    single filter on the already-grouped row, no extra shuffle."""
    chunks = fp.select(
        "doc_id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sim", _SIMHASH_CHUNK_BITS * i).bitwiseAND(
                        F.lit(_SIMHASH_CHUNK_MASK)
                    )
                    for i in range(_SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk_no", "chunk"),
    )
    # One groupBy shuffle instead of a two-sided self-join exchange:
    # collect each band bucket's (doc_id, sim) members sorted by id and
    # generate ordered in-bucket pairs with higher-order functions —
    # the hamming ≤ 3 popcount runs INSIDE the bucket, so only true
    # near-dup pairs ever leave the generating task. A size-1 bucket
    # yields no pairs and is dropped before pair generation.
    buckets = (
        chunks.groupBy("chunk_no", "chunk")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "sim"))).alias("m"))
        .filter(F.size("m") >= 2)
    )
    if cap is not None:
        buckets = buckets.filter(F.size("m") <= cap)
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.expr(
                    """
                    transform(m, (x, i) ->
                        filter(
                            transform(slice(m, i + 2, size(m) - i - 1), y ->
                                struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
                                       CAST(bit_count(x.sim ^ y.sim) AS INT)
                                           AS hamming)),
                            p -> p.hamming <= 3))
                    """
                )
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b", "p.hamming").distinct()


#: Band-bucket membership cap for the capped SimHash tier. The sf10
#: scaling postscript (PLANS.md) measured exact-tier output ×46 at 10×
#: docs on a vocabulary-saturated corpus: near-identical boilerplate
#: collapses thousands of fingerprints into a few band buckets, and
#: in-bucket pair emission is quadratic in bucket size. 64 mirrors
#: _PHASH_BUCKET_CAP: candidate work is bounded at O(cap·n) and the
#: mega-neighborhoods a cap drops are exactly the ones whose pair list
#: is unactionable (the rollup for those is dedup_connected_components
#: over exact-hash groups, not pair emission).
_SIMHASH_BUCKET_CAP = 64


@register(
    "dedup_simhash_capped",
    _simhash_oracle(cap=_SIMHASH_BUCKET_CAP),
    doc=(
        "Production tier of dedup_simhash: identical fingerprints and "
        f"4×15-bit banding, but band buckets with more than "
        f"{_SIMHASH_BUCKET_CAP} members sit out candidate generation. "
        "A Hamming≤3 pair is missed only if EVERY chunk the pair "
        "agrees on is over-dense — which on a saturated corpus is the "
        "boilerplate cluster whose quadratic pair list stopped being "
        "actionable (the sf10 run measured ×46 output at ×10 docs on "
        "the exact tier; route those to the connected-components "
        "rollup instead). The cap is one filter on the already-"
        "aggregated bucket row (zero extra shuffles), bounding "
        "candidate work at O(cap·n); the DuckDB oracle replays the "
        "cap bit-for-bit. Same answer shape the phash family uses "
        "(media_phash_dedup_capped)."
    ),
    tags=("dedup", "lsh", "skew"),
)
def dedup_simhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    fp = simhash_fingerprints(docs, toks)
    return _simhash_band_pairs(fp, cap=_SIMHASH_BUCKET_CAP)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

_COS_TAU = 0.4
_ND_BLOCKS = 8  # row blocks for the all-pairs GEMM; scale with corpus


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two array<float> columns, computed in double
    (zip_with product + aggregate sum — all JVM higher-order functions)."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda v: F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (norm(ad) * norm(bd))


# The exact tier is O(N²) FLOPs by definition — no partitioning trick
# changes that. Past this many vectors the registered query refuses to
# run rather than melt a cluster; the sub-quadratic path is LSH/IVF
# candidate pruning (operators/similarity.py) feeding the same verify.
_EXACT_TIER_MAX_VECTORS = int(
    os.environ.get("SPARK_GRAFT_EXACT_TIER_MAX", 200_000)
)


@register(
    "dedup_embedding_neardup",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= {_COS_TAU}
    """,
    doc=(
        "Semantic near-dup: ALL pairs with cosine ≥ τ (exact, oracle-"
        "checked), computed as a distributed blocked matrix product. "
        "Vectors are unit-normalized once, assigned to NB row blocks, "
        "and each unordered block pair (i ≤ j) is shuffled to one task "
        "via a cogrouped applyInPandas whose kernel is a single NumPy "
        "GEMM (A·Bᵀ) + threshold mask. Replication factor is NB+1 (~9×) "
        "on the tiny unit-vector table; the O(N²) scoring itself runs "
        "at BLAS speed instead of per-pair expression evaluation — "
        "measured 60 s → ~1 s at sf0.1 over the expression-join form. "
        "NB scales with corpus size so each block fits executor memory; "
        "the sub-quadratic scale path remains the LSH variant in "
        "operators/similarity.py, which prunes candidates before this "
        "same exact verification."
    ),
    tags=("dedup", "similarity", "pandas_udf"),
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()  # metadata-only count (parquet aggregate pushdown)
    if n > _EXACT_TIER_MAX_VECTORS:
        raise ValueError(
            f"dedup_embedding_neardup is the EXACT all-pairs tier "
            f"({n:,} vectors > cap {_EXACT_TIER_MAX_VECTORS:,}; "
            f"~{n * n / 2:.2e} pair scores). Use the candidate-pruned "
            "paths instead — ann_lsh_bucketed / ann_ivf_probe in "
            "operators/similarity.py — or raise "
            "SPARK_GRAFT_EXACT_TIER_MAX explicitly."
        )
    nb = _ND_BLOCKS
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    unit = emb.select(
        "vec_id",
        (F.col("vec_id") % nb).cast("int").alias("bid"),
        F.transform(v, lambda x: x / norm).alias("u"),
    )
    # Block i participates as the A side of keys (i, j≥i) and the B side
    # of keys (ba≤i, i): every unordered block pair meets exactly once.
    a_rep = unit.select(
        "vec_id",
        "u",
        F.col("bid").alias("ba"),
        F.explode(F.sequence(F.col("bid"), F.lit(nb - 1))).alias("bb"),
    )
    # r_-aliases force fresh attribute ids: both cogroup children derive
    # from the same `unit` plan, and same-exprId right-side columns get
    # deduplicated out of the Arrow payload (kernel would see only the
    # grouping keys on the right).
    b_rep = unit.select(
        F.col("vec_id").alias("r_vec_id"),
        F.col("u").alias("r_u"),
        F.explode(F.sequence(F.lit(0), F.col("bid"))).alias("ba"),
        F.col("bid").alias("bb"),
    )

    def gemm_kernel(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        ba, bb = key
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []}).astype(
            {"vec_a": "int64", "vec_b": "int64", "cos": "float64"}
        )
        if left.empty:
            return empty
        A = np.stack(left["u"].to_numpy())
        ida = left["vec_id"].to_numpy()
        if ba == bb:  # diagonal block: pairs within A, x < y
            C = A @ A.T
            mask = (C >= _COS_TAU) & (ida[:, None] < ida[None, :])
            ia, ib = np.nonzero(mask)
            va, vb = ida[ia], ida[ib]
        else:  # off-diagonal: every cross pair is distinct — emit ordered
            if right.empty:
                return empty
            B = np.stack(right["r_u"].to_numpy())
            idb = right["r_vec_id"].to_numpy()
            C = A @ B.T
            ia, ib = np.nonzero(C >= _COS_TAU)
            va = np.minimum(ida[ia], idb[ib])
            vb = np.maximum(ida[ia], idb[ib])
        return pd.DataFrame(
            {"vec_a": va, "vec_b": vb, "cos": np.round(C[ia, ib], 4)}
        )

    return (
        a_rep.groupBy("ba", "bb")
        .cogroup(b_rep.groupBy("ba", "bb"))
        .applyInPandas(gemm_kernel, "vec_a long, vec_b long, cos double")
    )


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs (dedup clustering)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, max_iter: int = 20, barrier: str = "auto"
) -> DataFrame:
    """Cluster an undirected edge list ``(doc_a, doc_b)`` into connected
    components by iterative min-label propagation; returns
    ``(doc_id, component_id)`` with component_id = min doc_id reachable.

    This is the genuinely iterative step of a dedup pipeline (MinHash →
    candidate pairs → components → keep one doc per component) that no
    single SQL query expresses. Each iteration is one co-partitioned
    join + min-agg on the node key; convergence takes O(component
    diameter) rounds — near-dup clusters are shallow (stars/chains of a
    few docs), so this is ~3-5 rounds in practice, not O(|V|).
    A materialization barrier truncates the lineage each round so the
    plan doesn't grow exponentially, and the per-round convergence
    count is the standard driver-side fixpoint test (an O(1)-row
    action, not a data collect). ``barrier`` picks the strategy via
    :mod:`fintech_etl_spark.barrier` — ``"auto"`` is a RELIABLE
    checkpoint when the session has a checkpoint dir (an executor loss
    mid-loop replays from the store instead of failing the job),
    executor-local otherwise; the convergence count materializes each
    round either way.
    """
    edges = materialization_barrier(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct(),
        barrier,
    )
    labels = materialization_barrier(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node")),
        barrier,
    )
    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        prop = materialization_barrier(
            labels.join(nbr_min, labels.node == nbr_min.dst, "left").select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            ),
            barrier,
        )
        # Pointer jumping: comp ← min(comp, comp[comp]). Neighbor
        # propagation alone converges in O(component diameter) rounds —
        # measured 19 rounds on sf0.1's chain-shaped near-dup graph;
        # composing one jump per round makes label distance roughly
        # HALVE per round (O(log diameter)) — same fixpoint, measured
        # 6 rounds on the same graph. At 100 TB diameter is unbounded
        # (crawl chains), so the logarithmic round count is the
        # difference between a bounded job count and a 100-round loop.
        lut = prop.select(
            F.col("node").alias("jnode"), F.col("comp").alias("jcomp")
        )
        new_labels = materialization_barrier(
            prop.join(lut, prop.comp == lut.jnode, "left").select(
                "node",
                F.least(F.col("comp"), F.coalesce("jcomp", "comp")).alias("comp"),
            ),
            barrier,
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") < F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed:
        import warnings

        warnings.warn(
            f"connected_components hit max_iter={max_iter} with {changed} "
            "labels still changing — returned components may be unconverged "
            "(chains deeper than max_iter). Raise max_iter for deep graphs.",
            stacklevel=2,
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("comp").alias("component_id"))


def _component_rollup(comp: DataFrame) -> DataFrame:
    """(component_id, n_members, member_ids) with members serialized to
    a comma-joined string (numeric sort before stringification) so the
    output is flat-hashable by any cross-engine comparator."""
    return (
        comp.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id")).cast("array<string>")
            ).alias("member_ids"),
        )
        .select("component_id", "n_members", "member_ids")
    )


@register(
    "dedup_cluster_components",
    _COMPONENTS_ORACLE,
    doc=(
        "End-to-end fuzzy-dedup clustering: MinHash-LSH verified pairs "
        "(τ=0.7) → connected components via min-label propagation → "
        "per-cluster survivor (min doc_id) and member count. The unit "
        "test cross-checks components against a brute-force union-find "
        "on the same pairs; the DuckDB oracle recomputes the fixpoint "
        "as a WITH RECURSIVE transitive closure over brute-force pairs."
    ),
    tags=("dedup", "iterative"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return _component_rollup(connected_components(pairs))


# ---------------------------------------------------------------------------
# Incremental dedup — new batch vs existing corpus
# ---------------------------------------------------------------------------


@register(
    "dedup_incremental_batch",
    """
    WITH corpus AS (SELECT md5(text) AS fp FROM documents WHERE doc_id < 400),
    batch AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id >= 400)
    SELECT b.doc_id,
           (c.fp IS NOT NULL) AS dup_of_corpus
    FROM batch b LEFT JOIN (SELECT DISTINCT fp FROM corpus) c ON b.fp = c.fp
    """,
    doc=(
        "Incremental dedup: flag which documents of a newly-arrived "
        "batch already exist in the corpus, by content fingerprint "
        "left-joined against the corpus fingerprint set. The production "
        "shape for deduping a new crawl against a 100 TB lake: the "
        "corpus side reduces to distinct 128-bit keys (vastly smaller "
        "than the lake), the join shuffles on the fingerprint, and the "
        "batch side is the small one — at scale the fingerprint set is "
        "a bucketed table maintained incrementally, not recomputed."
    ),
    tags=("dedup", "join"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus_fp = (
        docs.filter(F.col("doc_id") < 400)
        .select(F.md5("text").alias("c_fp"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") >= 400).select(
        "doc_id", F.md5("text").alias("fp")
    )
    return batch.join(corpus_fp, batch.fp == corpus_fp.c_fp, "left").select(
        "doc_id", F.col("c_fp").isNotNull().alias("dup_of_corpus")
    )


_MULTISIGNAL_ORACLE = f"""
    WITH RECURSIVE {_PAIRS_CTES},
    sem AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= {_COS_TAU}),
    all_pairs AS (SELECT doc_a, doc_b FROM pairs
                  UNION SELECT doc_a, doc_b FROM sem),
    {_components_ctes("all_pairs")}
    {_COMPONENT_ROLLUP_SELECT}
"""


@register(
    "dedup_multisignal_components",
    _MULTISIGNAL_ORACLE,
    doc=(
        "Multi-signal fuzzy dedup: union the near-dup pairs found by "
        "lexical MinHash-LSH (trigram Jaccard ≥ 0.7) and, where both "
        "docs have embeddings, the semantic blocked-GEMM tier (cosine "
        "≥ τ), then cluster the combined edge list with the same "
        "connected-components operator. Signals compose at the PAIR "
        "level, so each tier keeps its own pruning strategy — this is "
        "the standard production pipeline (lexical catches verbatim/ "
        "templated dups, embeddings catch paraphrases)."
    ),
    tags=("dedup", "iterative", "similarity"),
)
def dedup_multisignal_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    lexical = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    semantic = dedup_embedding_neardup(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    pairs = lexical.union(semantic).distinct()
    return _component_rollup(connected_components(pairs))


# ---------------------------------------------------------------------------
# MinHash + LSH with document-frequency cap (the skew-bounded scale path)
# ---------------------------------------------------------------------------

_DF_CAP_FRACTION = 0.01  # drop shingles present in > 1% of docs


# Brute-force capped Jaccard: replicate the df-cap (drop shingles in
# > cap docs) and verify ALL pairs at τ — no MinHash needed, because
# LSH recall at 32 bands × 2 rows is 1 - (1-j²)^32 ≥ 1 - 5e-10 for
# j ≥ 0.7 (the uncapped variant is driver-proven identical to its
# brute-force oracle on this data).
_DFCAP_ORACLE = f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents
               WHERE text IS NOT NULL AND trim(text) != ''),
    w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
          FROM documents WHERE text IS NOT NULL AND trim(text) != ''),
    sh AS (SELECT doc_id, {_shingle_sql(3)} AS s FROM w),
    e AS (SELECT doc_id, unnest(s) AS g FROM sh),
    banned AS (SELECT g FROM e GROUP BY g
               HAVING count(*) > (SELECT greatest(2, CAST(floor(n_docs * {_DF_CAP_FRACTION}) AS INTEGER)) FROM n)),
    kept AS (SELECT doc_id, g FROM e ANTI JOIN banned USING (g)),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
               FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= {_VERIFY_TAU}
"""


@register(
    "dedup_minhash_lsh_dfcap",
    _DFCAP_ORACLE,
    doc=(
        "The production variant of dedup_minhash_lsh: shingles whose "
        "document frequency exceeds 1% of the corpus are dropped before "
        "signatures. Boilerplate/stopword shingles are exactly the ones "
        "that land in every doc — without the cap, one hot shingle "
        "makes one LSH bucket (and one reducer) quadratic in corpus "
        "size; with it, candidate pairs per shingle are bounded by "
        "cap², so the shuffle is skew-free by construction. Capped "
        "Jaccard diverges from the exact oracle by design; the unit "
        "test pins that verbatim-duplicate pairs (uncapped j ≥ 0.9) "
        "all survive capping."
    ),
    tags=("dedup", "lsh", "skew"),
)
def dedup_minhash_lsh_dfcap(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: shared subtrees (banned-shingle row, candidate
    # pairs) truncate via the injectable policy — reliable on clusters
    # with a checkpoint dir, executor-local in dev
    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        )
    )
    sh = with_shingles(docs, 3)
    e = sh.select(F.explode_outer("s").alias("g")).filter(F.col("g").isNotNull())
    # The banned set (df > cap, cap = max(2, 1% of docs)) is bounded by
    # construction: Σdf over shingles ≤ n_docs·avg_shingles, so at most
    # avg_shingles/_DF_CAP_FRACTION shingles can exceed the cap (~10k
    # at any corpus size). Collapse it to ONE broadcast array and
    # subtract per-document with array_except — each doc's capped set
    # is rebuilt at scan speed, so no shingle string ever shuffles (the
    # old shape re-grouped every exploded shingle with collect_list: a
    # full-corpus string shuffle plus a checkpoint, ~2× the whole
    # uncapped query's cost). The doc count folds into the same plan as
    # a broadcast scalar — the query triggers no driver-side action.
    cap = F.greatest(
        F.lit(2).cast("long"),
        F.floor(F.col("n_docs") * F.lit(_DF_CAP_FRACTION)).cast("long"),
    )
    banned_arr = (
        e.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs"))))
        .filter(F.col("df") > cap)
        .agg(F.collect_list("g").alias("banned"))
    )
    # one-row result; the barrier stops its two consumers (the
    # signature path's `capped` and the verify sides' candidate
    # re-shingle) from each replanning the whole df-count subtree
    banned_arr = materialization_barrier(banned_arr, barrier)
    capped = (
        sh.crossJoin(F.broadcast(banned_arr))
        .select("doc_id", F.array_except("s", "banned").alias("s"))
        # A doc whose shingles are ALL banned keeps an empty set here;
        # empty sets hash to identical minhash signatures, so they
        # would collide in EVERY band and form one O(m²) candidate
        # clique — exactly the skew this operator exists to bound.
        # Dropping them changes nothing downstream (the oracle's kept
        # CTE excludes them too, and an empty set can't reach the
        # jaccard threshold against any non-empty one).
        .filter(F.size("s") > 0)
        # NOT checkpointed: only the signature path consumes this (the
        # verify sides below re-shingle just the candidate docs), and
        # materializing every doc's full shingle array measured ~1 s
        # slower than recomputing it at scan speed.
    )

    sig = capped.select("doc_id", "s", minhash_signature(F.col("s")).alias("sig"))
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(_LSH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    # In-bucket pair generation (one groupBy shuffle, no two-sided
    # self-join exchange); df-capping bounds every bucket, so the
    # collected member list is small by construction.
    cand = (
        bands.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("m"))
        .filter(F.size("m") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(m, (x, i) -> "
                    "transform(slice(m, i + 2, size(m) - i - 1), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # tiny (pairs only); the barrier lets the two semi-filters below
    # reuse it instead of replanning the whole LSH subtree
    cand = materialization_barrier(cand, barrier)
    # Verify joins only need shingle arrays for docs that appear in a
    # candidate pair — semi-filter the RAW docs first (ids are 8-byte
    # longs, ≤ 2 per pair, broadcastable by construction) and re-shingle
    # just those. Without this, each verify side replans the full-corpus
    # shingling; with it, the corpus is shingled once for signatures and
    # only candidates (a tiny fraction) are shingled for verification.
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    needed = materialization_barrier(
        with_shingles(docs.join(F.broadcast(cand_ids), "doc_id", "semi"), 3)
        .crossJoin(F.broadcast(banned_arr))
        .select("doc_id", F.array_except("s", "banned").alias("s"))
        .filter(F.size("s") > 0),
        # one materialization, two join-side aliases — without the
        # barrier the semi-join + re-shingle + ban-filter subtree is
        # planned (and run) once per side
        barrier,
    )
    sa = needed.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = needed.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = inter / union
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _VERIFY_TAU)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard with df-capped candidate generation
# ---------------------------------------------------------------------------

#: Absolute document-frequency cap for the capped exact-Jaccard tier.
#: Same family constant class as _SIMHASH_BUCKET_CAP/_PHASH_BUCKET_CAP:
#: a shingle present in more than this many docs sits out candidate
#: generation, bounding per-shingle pair work at cap² and TOTAL
#: candidate volume at O(cap · Σdf) = O(cap · corpus_tokens) — linear
#: in corpus size, unlike the dfcap LSH tier's RELATIVE 1% cap, which
#: still lets constant-fraction-df shingles contribute Θ(n²) pairs.
_NGRAM_DF_CAP = 64


# The cap is replayed bit-for-bit: shingles with df > cap sit out the
# inverted index entirely, and the Jaccard is computed over the
# remaining (<= cap-df) shingle subspace — the same trade the dfcap
# LSH tier makes. Wherever no over-cap shingle is involved (the whole
# gate corpus: max df 25 < 64) the output is bit-identical to the
# exact tier's.
_NGRAM_CAPPED_ORACLE = f"""
    WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
               FROM documents),
    sh AS (SELECT doc_id, {_shingle_sql(3)} AS s FROM w),
    e AS (SELECT doc_id, unnest(s) AS g FROM sh),
    kept AS (SELECT doc_id, g
             FROM (SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df
                   FROM e)
             WHERE df <= {_NGRAM_DF_CAP}),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
               FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE c * 1.0 / (sa.n + sb.n - c) >= {_JACCARD_TAU}
"""


@register(
    "dedup_ngram_jaccard_capped",
    _NGRAM_CAPPED_ORACLE,
    doc=(
        "Production twin of dedup_ngram_jaccard: shingles whose "
        f"document frequency exceeds {_NGRAM_DF_CAP} (absolute cap, "
        "same family constant class as the SimHash/phash bucket caps) "
        "sit out the inverted index entirely, and Jaccard is computed "
        "over the remaining <=cap-df shingle subspace — the identical "
        "trade dedup_minhash_lsh_dfcap makes. Wherever a pair "
        "involves no over-cap shingle the output row is bit-identical "
        "to the exact tier's (true for the WHOLE gate corpus: max df "
        "25 < 64, so the tiers coincide there, pinned by test). The "
        "exact tier's pair volume is sum(df(g)^2), measured 10.6x per "
        "data decade at sf1->sf10 on the vocabulary-saturating "
        "corpus; the absolute cap bounds it at cap * sum(df) = "
        "O(cap * corpus_tokens), i.e. linear (a RELATIVE 1%-of-docs "
        "cap would not: constant-fraction-df shingles stay under it "
        "and still contribute Theta(n^2) pairs — measured 19x per "
        "decade before the switch; and verifying candidates on FULL "
        "shingle ARRAYS shuffled ~2 GB of strings where this shape "
        "shuffles only (id, id, int) rows). Plan shape: ONE groupBy "
        "on the shingle (hash aggregation, no sort, no self-join "
        "exchange) -> in-bucket pair emission -> pair-count agg -> "
        "two integer size joins. Cap replayed bit-for-bit in the "
        "oracle. Use this tier in production; use the exact tier "
        "when recall on boilerplate-only overlap matters more than "
        "the quadratic tail."
    ),
    tags=("dedup", "join", "skew"),
)
def dedup_ngram_jaccard_capped(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: the bucket table feeds sizes and pairs — see
    # fintech_etl_spark.barrier for the auto strategy
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = with_shingles(docs, 3)
    e = sh.select("doc_id", F.explode_outer("s").alias("g")).filter(
        F.col("g").isNotNull()
    )
    # ONE groupBy shuffle on the shingle; over-cap buckets sit out on
    # the aggregated row (same emission as the SimHash/phash capped
    # tiers). Checkpointed: sizes and pairs both consume it, and the
    # bucket table is small (one row per distinct shingle).
    buckets = (
        e.groupBy("g")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("m"))
        .filter(F.size("m") <= _NGRAM_DF_CAP)
    )
    buckets = materialization_barrier(buckets, barrier)
    # per-doc kept-shingle counts (the capped |A| and |B|) — barriered:
    # sa and sb below are two aliases, so the explode+agg would
    # otherwise run once per join side
    sizes = materialization_barrier(
        buckets.select(F.explode("m").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n")),
        barrier,
    )
    # shared kept-shingle counts per pair: in-bucket pair emission,
    # then ONE count agg — only (id, id) rows shuffle, never shingle
    # strings or arrays
    common = (
        buckets.filter(F.size("m") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(m, (x, i) -> "
                    "transform(slice(m, i + 2, size(m) - i - 1), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _JACCARD_TAU)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# The end product: the deduplicated corpus
# ---------------------------------------------------------------------------


_SURVIVORS_ORACLE = f"""
    WITH RECURSIVE {_PAIRS_CTES}, {_components_ctes()},
    fp AS (SELECT doc_id, lang, source, n_chars,
                  md5(coalesce(text, '')) AS f
           FROM documents),
    surv AS (SELECT f, min(doc_id) AS md5_survivor FROM fp GROUP BY f)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM fp d
    JOIN surv ON d.f = surv.f
    LEFT JOIN comp ON comp.node = d.doc_id
    WHERE d.doc_id = coalesce(comp.component_id, surv.md5_survivor)
"""


@register(
    "corpus_dedup_survivors",
    _SURVIVORS_ORACLE,
    doc=(
        "The dedup pipeline's end product: the corpus with exact AND "
        "fuzzy duplicates removed. Exact groups (md5) and MinHash-LSH "
        "components each elect their minimum doc_id; a document "
        "survives iff it IS its component representative (or its md5 "
        "survivor when it's in no fuzzy component). Exact duplicates "
        "have Jaccard 1, so they always share a component with their "
        "md5 partner — the component rule subsumes the exact rule "
        "whenever both apply. The unit test proves the guarantees: "
        "partition of the corpus, no surviving near-dup pair, every "
        "dropped doc represented by a survivor."
    ),
    tags=("dedup", "iterative"),
)
def corpus_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # coalesce: md5(NULL) is NULL and the fingerprint equi-join below
    # would silently drop null-text docs (neither surviving nor
    # represented); empty-string fingerprinting groups them together.
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    exact_survivor = docs.groupBy(fp.alias("fp")).agg(
        F.min("doc_id").alias("md5_survivor")
    )
    comp = connected_components(
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    )
    annotated = (
        docs.withColumn("fp", fp)
        .join(F.broadcast(exact_survivor), "fp")
        .join(comp, "doc_id", "left")
    )
    keep = F.col("doc_id") == F.coalesce("component_id", "md5_survivor")
    return annotated.filter(keep).select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Recursive-CTE blocking components (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

#: Hard bound on predecessor-chain length. Walk depth equals segment
#: size and the walk materializes O(segment²) rows, so an uncapped
#: block would (a) exceed Spark's ``spark.sql.cteRecursionLevelLimit``
#: (default 100) the moment one (source, n_chars) block tops 100 docs
#: and (b) go quadratic on hot blocks. Segmenting every block into
#: runs of at most this many docs bounds BOTH: depth ≤ 64 < 100 and
#: walk rows ≤ 64·n. At gate scale the largest block is 5 docs, so
#: segmentation is invisible; at 100 TB it is the difference between
#: a bounded plan and a hard failure.
_BLOCK_SEGMENT = 64

_BLOCK_WALK_SQL = """
WITH RECURSIVE fp AS (SELECT doc_id, source, n_chars FROM {src}),
p AS (SELECT doc_id,
             lag(doc_id)   OVER (PARTITION BY source, n_chars ORDER BY doc_id) AS prev,
             row_number()  OVER (PARTITION BY source, n_chars ORDER BY doc_id) AS rn,
             count(*)      OVER (PARTITION BY source, n_chars) AS block_size
      FROM fp),
grp AS (SELECT doc_id,
               CASE WHEN (rn - 1) % {seg} = 0 THEN NULL ELSE prev END AS prev
        FROM p WHERE block_size > 1),
walk(node, cur) AS (
    SELECT doc_id, doc_id FROM grp
    UNION ALL
    SELECT walk.node, g.prev FROM walk JOIN grp g
    ON walk.cur = g.doc_id AND g.prev IS NOT NULL),
comp AS (SELECT node, min(cur) AS component_id FROM walk GROUP BY node)
SELECT component_id,
       CAST(count(*) AS BIGINT) AS n_members,
       {members} AS member_ids
FROM comp GROUP BY component_id
"""


@register(
    "blocking_components_recursive",
    _BLOCK_WALK_SQL.format(
        src="documents",
        seg=_BLOCK_SEGMENT,
        members="string_agg(CAST(node AS VARCHAR), ',' ORDER BY node)",
    ),
    doc=(
        "Candidate-duplicate components via SQL recursion (Spark 4 "
        "WITH RECURSIVE): sorted-neighborhood blocking on the cheap "
        "(source, n_chars) key links each doc to its predecessor in "
        "the block, and the recursive walk follows the STRICTLY "
        "DECREASING predecessor chain to the block head — an acyclic "
        "formulation, because Spark's recursive CTEs support UNION ALL "
        "only and cyclic min-label propagation would never terminate. "
        "Same min-label component semantics as the iterative "
        "connected_components loop, expressed declaratively; the "
        "iterative form remains the deep-graph tool. Blocks are "
        "segmented into runs of at most 64 docs, so recursion depth "
        "(= segment size) stays under Spark's cteRecursionLevelLimit "
        "default of 100 and the O(segment²) walk stays linear in the "
        "corpus (≤ 64·n rows) no matter how hot one (source, n_chars) "
        "key gets. Both engines run near-identical SQL."
    ),
    tags=("dedup", "recursive", "blocking"),
)
def blocking_components_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    return spark.sql(
        _BLOCK_WALK_SQL.format(
            src=f"parquet.`{path}`",
            seg=_BLOCK_SEGMENT,
            members=(
                "array_join(transform(array_sort(collect_list(node)),"
                " x -> CAST(x AS STRING)), ',')"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Banding-parameter sweep: the b×r tradeoff as data
# ---------------------------------------------------------------------------

#: Bandings swept over the fixed 64-slot signature: (n_bands,
#: rows_per_band) with n_bands·rows_per_band = 64. The S-curve
#: steepens as rows_per_band grows — (64,1) candidates anything
#: sharing one permutation (max recall, worst precision), (8,8) only
#: near-verbatim pairs (near-perfect precision, lowest recall).
_SWEEP_BANDINGS = ((64, 1), (32, 2), (16, 4), (8, 8))

#: Seeded md5-derived minhash for the sweep (NOT xxhash64): DuckDB has
#: no xxhash64, so a value-checked banding sweep needs a hash family
#: both engines can compute bit-identically. Same single-pass
#: accumulator fold as :func:`minhash_signature`.
_SWEEP_SIG_HOF = """
aggregate(s,
  array_repeat(cast(9223372036854775807 as long), 64),
  (acc, g) -> zip_with(acc,
      transform(sequence(0, 63),
                i -> cast(conv(substring(md5(concat(cast(i as string), ':', g)),
                               1, 15), 16, 10) as long)),
      (a, b) -> least(a, b)))
"""


def _sweep_oracle() -> str:
    per_banding = []
    for b, r in _SWEEP_BANDINGS:
        per_banding.append(
            f"""
    bands_{b}_{r} AS (
        SELECT doc_id, k AS band_no,
               array_to_string(list_transform(
                   list_slice(sig, k * {r} + 1, k * {r} + {r}),
                   x -> CAST(x AS VARCHAR)), ',') AS bucket
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {b - 1})) AS k)),
    cand_{b}_{r} AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands_{b}_{r} a JOIN bands_{b}_{r} b
          ON a.band_no = b.band_no AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id),
    stats_{b}_{r} AS (
        SELECT CAST({b} AS INTEGER) AS n_bands,
               CAST({r} AS INTEGER) AS rows_per_band,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(coalesce(sum(CASE WHEN t.doc_a IS NOT NULL
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_caught
        FROM cand_{b}_{r} c LEFT JOIN truep t
          ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT * FROM stats_{b}_{r}" for b, r in _SWEEP_BANDINGS
    )
    return f"""
    WITH {_PAIRS_CTES},
    truep AS (SELECT doc_a, doc_b FROM pairs),
    ntrue AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truep),
    sigv AS (SELECT doc_id, i,
                    min(CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || g),
                              1, 15)) AS BIGINT)) AS v
             FROM e CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) se
             GROUP BY doc_id, i),
    sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sigv GROUP BY doc_id),
    {",".join(per_banding)}
    SELECT n_bands, rows_per_band, n_candidates, n_caught, n_true,
           round(n_caught * 1.0 / n_true, 4) AS recall,
           round(n_caught * 1.0 / n_candidates, 4) AS precision
    FROM ({unions}) CROSS JOIN ntrue
    """


@register(
    "dedup_minhash_banding_sweep",
    _sweep_oracle(),
    doc=(
        "The LSH banding tradeoff AS DATA: one row per (n_bands, "
        "rows_per_band) factorization of the 64-slot signature, with "
        "measured candidate count, true-pair catch count, recall and "
        "precision against exact trigram-Jaccard ≥ 0.7 — the table an "
        "operator of a 100 TB dedup run reads before committing to a "
        "banding. Uses the seeded md5-derived hash family so the ENTIRE "
        "sweep (signatures, buckets, candidate sets, stats) is value-"
        "checked bit-for-bit against the DuckDB oracle, not just "
        "recall-bounded. Signatures and true pairs are each computed "
        "once and checkpointed; the four bandings re-slice the same "
        "signature table."
    ),
    tags=("dedup", "lsh", "sweep"),
)
def dedup_minhash_banding_sweep(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: the true-pair set and the signature frame are
    # each consumed by all bandings — injectable policy, see
    # fintech_etl_spark.barrier
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = with_shingles(docs, 3)

    # true pairs at the verify threshold (same inverted-index shape as
    # dedup_ngram_jaccard; consumed by all four bandings → checkpoint)
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    e = sh.select("doc_id", F.explode_outer("s").alias("g")).filter(
        F.col("g").isNotNull()
    )
    ea = e.select(F.col("doc_id").alias("doc_a"), "g")
    eb = e.select(F.col("doc_id").alias("doc_b"), "g")
    common = (
        ea.join(eb, ["g"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    truep = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _VERIFY_TAU)
        .select("doc_a", "doc_b")
    )
    truep = materialization_barrier(truep, barrier)
    n_true = truep.agg(F.count(F.lit(1)).alias("n_true"))

    # 64 longs/doc; consumed by four bandings → materialize once
    sig = materialization_barrier(
        sh.select("doc_id", F.expr(_SWEEP_SIG_HOF).alias("sig")), barrier
    )

    stats = []
    for b, r in _SWEEP_BANDINGS:
        bands = sig.select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[
                        F.array_join(
                            F.transform(
                                F.slice("sig", k * r + 1, r),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                        for k in range(b)
                    ]
                )
            ).alias("band_no", "bucket"),
        )
        cand = (
            bands.groupBy("band_no", "bucket")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("m"))
            .filter(F.size("m") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(m, (x, i) -> "
                        "transform(slice(m, i + 2, size(m) - i - 1), "
                        "y -> struct(x AS doc_a, y AS doc_b))))"
                    )
                ).alias("p")
            )
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
        stats.append(
            cand.join(
                truep.withColumn("_t", F.lit(1)), ["doc_a", "doc_b"], "left"
            ).agg(
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                F.count(F.lit(1)).alias("n_candidates"),
                F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_caught"),
            )
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return out.crossJoin(F.broadcast(n_true)).select(
        "n_bands",
        "rows_per_band",
        "n_candidates",
        "n_caught",
        "n_true",
        F.round(F.col("n_caught") / F.col("n_true"), 4).alias("recall"),
        F.round(F.col("n_caught") / F.col("n_candidates"), 4).alias("precision"),
    )


# ---------------------------------------------------------------------------
# Entity resolution: fuzzy catalog matching on the distinct vocabulary
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 3
_FUZZY_LEN_BAND = 2


@register(
    "fuzzy_name_match_catalog",
    f"""
    WITH v AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
               FROM part GROUP BY p_name),
    pr AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
                  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
                  a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
           FROM v a JOIN v b
             ON a.p_name < b.p_name
            AND abs(length(a.p_name) - length(b.p_name)) <= {_FUZZY_LEN_BAND})
    SELECT name_a, name_b, dist, n_parts_a, n_parts_b
    FROM pr WHERE dist <= {_FUZZY_MAX_DIST}
    """,
    doc=(
        "Entity resolution for a dirty catalog attribute: near-"
        "identical part-name variants by edit distance ≤ "
        f"{_FUZZY_MAX_DIST}. The load-bearing move is resolving on "
        "the DISTINCT value vocabulary, not on rows — one grouped "
        "count collapses the fact table to its name vocabulary "
        "(carrying per-name support), and the quadratic Levenshtein "
        "join runs on vocab², which for a categorical-ish attribute "
        "is thousands, not billions, no matter how large the table "
        f"(a ±{_FUZZY_LEN_BAND}-char length band prunes further: "
        "|len_a − len_b| is a lower bound on edit distance). The "
        "vocab side broadcasts; the reference's vendor-feed domain "
        "(/root/reference/rules/item.py normalizing dirty item "
        "descriptions) is exactly where these variants arise."
    ),
    tags=("dedup", "entity-resolution", "join"),
)
def fuzzy_name_match_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    v = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    a = v.select(
        F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a")
    )
    b = v.select(
        F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b")
    )
    return (
        a.join(
            F.broadcast(b),
            (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b"))
                <= _FUZZY_LEN_BAND
            ),
        )
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
    )


@register(
    "entity_canonicalize_catalog",
    f"""
    WITH RECURSIVE v AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
                         FROM part GROUP BY p_name),
    pairs AS (SELECT a.p_name AS doc_a, b.p_name AS doc_b
              FROM v a JOIN v b
                ON a.p_name < b.p_name
               AND abs(length(a.p_name) - length(b.p_name)) <= {_FUZZY_LEN_BAND}
              WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}),
    {_components_ctes("pairs")},
    m AS (SELECT comp.node, comp.component_id, v.n_parts
          FROM comp JOIN v ON comp.node = v.p_name),
    canon AS (SELECT component_id, node AS canonical_name,
                     row_number() OVER (PARTITION BY component_id
                                        ORDER BY n_parts DESC, node) AS rn
              FROM m),
    c1 AS (SELECT component_id, canonical_name FROM canon WHERE rn = 1)
    SELECT v.p_name AS name, v.n_parts,
           coalesce(c1.canonical_name, v.p_name) AS canonical_name,
           coalesce(c1.canonical_name, v.p_name) != v.p_name AS is_variant
    FROM v
    LEFT JOIN m ON v.p_name = m.node
    LEFT JOIN c1 ON m.component_id = c1.component_id
    """,
    doc=(
        "The full entity-resolution pipeline over a dirty catalog "
        "attribute: fuzzy_name_match_catalog's edit-distance pairs → "
        "connected components (variant clusters) → one canonical name "
        "per cluster (highest part support, name ascending on ties) → "
        "a complete rewrite map in which every name, matched or not, "
        "resolves (singletons to themselves). This is the survivorship "
        "step a MERGE of dirty vendor feeds needs; label propagation "
        "runs on the name VOCABULARY (thousands of nodes), so the "
        "iterative step costs nothing at any fact-table scale. The "
        "oracle replays min-label closure as a recursive CTE — strings "
        "propagate lexicographically in both engines."
    ),
    tags=("dedup", "entity-resolution", "iterative"),
)
def entity_canonicalize_catalog(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: the vocabulary frame feeds pairs, membership and
    # output — injectable policy, see fintech_etl_spark.barrier
    part = load_table(spark, sf_dir, "part")
    v = materialization_barrier(
        part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts")),
        barrier,
    )  # feeds pairs, membership, and output
    a = v.select(F.col("p_name").alias("doc_a"))
    b = v.select(F.col("p_name").alias("doc_b"))
    pairs = a.join(
        F.broadcast(b),
        (F.col("doc_a") < F.col("doc_b"))
        & (F.abs(F.length("doc_a") - F.length("doc_b")) <= _FUZZY_LEN_BAND)
        & (F.levenshtein("doc_a", "doc_b") <= _FUZZY_MAX_DIST),
    )
    comps = connected_components(pairs)
    m = comps.join(v, comps.doc_id == v.p_name).select(
        F.col("doc_id").alias("node"), "component_id", "n_parts"
    )
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("component_id").orderBy(
            F.col("n_parts").desc(), F.col("node")
        )
    )
    c1 = (
        m.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("component_id", F.col("node").alias("canonical_name"))
    )
    out = (
        v.join(m.select("node", "component_id"), v.p_name == F.col("node"), "left")
        .join(F.broadcast(c1), "component_id", "left")
        .select(
            F.col("p_name").alias("name"),
            "n_parts",
            F.coalesce("canonical_name", "p_name").alias("canonical_name"),
            (F.coalesce("canonical_name", "p_name") != F.col("p_name")).alias(
                "is_variant"
            ),
        )
    )
    return out


@register(
    "near_dup_rate_by_source",
    f"""
    WITH p AS ({_simhash_oracle()}),
    ids AS (SELECT DISTINCT doc_id FROM
            (SELECT doc_a AS doc_id FROM p
             UNION ALL SELECT doc_b AS doc_id FROM p)),
    d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source),
    inv AS (SELECT dd.source, CAST(count(*) AS BIGINT) AS n_near
            FROM ids JOIN documents dd ON ids.doc_id = dd.doc_id
            GROUP BY dd.source)
    SELECT d.source, d.n_docs,
           CAST(coalesce(inv.n_near, 0) AS BIGINT) AS n_near_dup_docs,
           round(coalesce(inv.n_near, 0) * 1.0 / d.n_docs, 4)
               AS near_dup_rate
    FROM d LEFT JOIN inv ON d.source = inv.source
    """,
    doc=(
        "Near-duplication triage per source: the share of each feed's "
        "documents that participate in at least one SimHash near-dup "
        "pair (Hamming ≤ 3) — the fuzzy counterpart of "
        "corpus_dup_rate_by_source, naming the feeds that ship "
        "templated/boilerplate variants rather than byte copies. "
        "Composes the value-checked dedup_simhash pair set (the "
        "oracle embeds the same fingerprint SQL as a CTE), reduces "
        "pairs to distinct involved docs, and rolls up against "
        "per-source totals — the expensive banded join is the same "
        "one the base operator already bounds; everything after it "
        "is id-sized."
    ),
    tags=("dedup", "corpus", "agg"),
)
def near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_simhash(spark, sf_dir)
    ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    d = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    inv = (
        ids.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return d.join(inv, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near_dup_docs"),
        F.round(
            F.coalesce("n_near", F.lit(0)) * 1.0 / F.col("n_docs"), 4
        ).alias("near_dup_rate"),
    )


# ---------------------------------------------------------------------------
# Dense-corpus MinHash tier: 16 bands × 4 rows, cross-engine signatures
# ---------------------------------------------------------------------------

#: Banding for HIGH-BACKGROUND-SIMILARITY corpora. The 32×2 tiers are
#: tuned for near-certain recall (P(miss) ≈ 5e-10 at j ≥ 0.7), which
#: makes a band collide with probability j² — fine when random pairs
#: have j ≈ 0, quadratic when the corpus is saturated (the sf1→sf10
#: run measured 672k → 49.8M candidates, ×74 for ×10 docs, because the
#: synthetic vocabulary makes random word-salads share trigram mass).
#: 4 rows per band collide at j⁴: background candidates shrink by
#: ~j_bg² (≈100× here) while recall at j = 0.7 stays 1-(1-0.7⁴)¹⁶ =
#: 0.988 and reaches ~1 by j = 0.9. Because recall < 1, a brute-force
#: oracle would NOT match — so the signature uses the cross-engine
#: md5-derived hash64 and the DuckDB oracle replays the ENTIRE banding
#: bit-for-bit (buckets, candidates, verification).
_DENSE_BANDS = 16
_DENSE_ROWS = 4
_DENSE_PERMS = _DENSE_BANDS * _DENSE_ROWS

_DENSE_ORACLE = f"""
    WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
               FROM documents WHERE text IS NOT NULL AND trim(text) != ''),
    sh AS (SELECT doc_id, {{shingles}} AS s FROM w),
    sig AS (SELECT doc_id,
            list_transform(generate_series(0, {_DENSE_PERMS - 1}),
              p -> list_aggregate(list_transform(s,
                     g -> CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || g), 1, 15)) AS BIGINT)),
                   'min')) AS sig
            FROM sh),
    bands AS (SELECT doc_id, b,
              CAST(sig[4*b+1] AS VARCHAR) || '_' || CAST(sig[4*b+2] AS VARCHAR)
              || '_' || CAST(sig[4*b+3] AS VARCHAR) || '_' || CAST(sig[4*b+4] AS VARCHAR) AS bucket
              FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {_DENSE_BANDS - 1})) AS b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
             FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bucket = b2.bucket
                                       AND a.doc_id < b2.doc_id),
    v AS (SELECT doc_a, doc_b,
                 len(list_intersect(sa.s, sb.s)) AS c,
                 len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS u
          FROM cand JOIN sh sa ON sa.doc_id = doc_a
                    JOIN sh sb ON sb.doc_id = doc_b)
    SELECT doc_a, doc_b, round(c * 1.0 / u, 4) AS jaccard
    FROM v WHERE c * 1.0 / u >= {_VERIFY_TAU}
""".format(shingles=_shingle_sql(3))


def minhash_signature_hash64(
    shingles: F.Column | str, n_perm: int = _DENSE_PERMS
) -> F.Column:
    """MinHash signature over the cross-engine md5-derived hash64 —
    bit-identical to the oracle's list_transform replay. One md5 per
    (shingle, permutation); heavier than xxhash64 but VERIFIABLE, and
    the md5s run JVM-side inside codegen (no UDF).

    ONE aggregate pass carrying an ``n_perm``-long accumulator (the
    same fold as :func:`minhash_signature` and ``_SWEEP_SIG_HOF``; the
    md5 input string ``concat(cast(i as string), ':', g)`` is exactly
    :func:`hash64`'s seeded prefix) instead of ``n_perm`` separate
    ``array_min(transform(...))`` columns — the wide form re-walked
    the shingle array per permutation and its analysis dominated the
    signature step (the 32-band tier measured 3.5× on the identical
    rewrite). Empty-array semantics cannot diverge: every shingle set
    has ≥ 1 element by :func:`shingles_of_words`' prefix guarantee, so
    the fold's init accumulator never survives to the output.
    ``shingles`` must be a plain column name/attribute (SQL text)."""
    name = shingles if isinstance(shingles, str) else shingles._jc.toString()
    return F.expr(
        f"""
        aggregate(`{name}`,
          array_repeat(cast(9223372036854775807 as long), {n_perm}),
          (acc, g) -> zip_with(acc,
              transform(sequence(0, {n_perm - 1}),
                  i -> cast(conv(substring(md5(concat(cast(i as string),
                                 ':', g)), 1, 15), 16, 10) as long)),
              (a, b) -> least(a, b)))
        """
    )


@register(
    "dedup_minhash_lsh_dense",
    _DENSE_ORACLE,
    doc=(
        "Dense-corpus MinHash tier: 16 bands × 4 rows. The 32×2 tiers "
        "guarantee near-certain recall but collide per band at j² — "
        "quadratic candidate growth once random pairs share vocabulary "
        "(measured ×74 candidates for ×10 docs at the sf1→sf10 "
        "decade). 4-row bands collide at j⁴, cutting background "
        "candidates ~j_bg² (~100×) at 98.8% recall for j = 0.7 (→ ~1 "
        "by j = 0.9). Recall < 1 means a brute-force oracle would "
        "mismatch, so signatures use the cross-engine md5 hash64 and "
        "the DuckDB oracle replays banding, buckets, candidates, and "
        "verification bit-for-bit. This is the tier to reach for when "
        "events_key_skew_report-style diagnostics show candidate "
        "saturation; the 32×2 dfcap tier remains the high-recall "
        "default on diverse corpora."
    ),
    tags=("dedup", "lsh", "skew"),
)
def dedup_minhash_lsh_dense(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        )
    )
    return _dense_band_verify(docs, minhash_signature_hash64("s"), barrier=barrier)


def _dense_band_verify(
    docs: DataFrame,
    sig_col: F.Column,
    bucket_cap: int | None = None,
    barrier: str = "auto",
) -> DataFrame:
    """Shared 16×4 banding → bucket pair-gen → exact-jaccard verify
    pipeline behind both dense tiers (md5-verifiable and xxhash64-fast);
    only the signature expression differs.

    ``bucket_cap``: band buckets holding more than this many docs sit
    out pair generation (the same one-filter mechanism as the capped
    SimHash/phash tiers). The registry rows pass None — the generated
    corpus is template-diverse, and the DuckDB oracles replay the
    uncapped banding — but a HOT corpus (one template stamped onto a
    double-digit share of documents, the adversarial shape receipted in
    SCALE_RECEIPT_r10_skew.json) puts the template's whole clone set
    into ONE bucket per band, and C(hot, 2) candidate pairs go
    quadratic in the clone count. Production posture for such corpora:
    run exact dedup first (clone sets collapse to one survivor — the
    documented dedup-family composition) or set a cap; either bounds
    candidate work at O(cap·n) while pairs OUTSIDE mega-buckets are
    untouched (pinned by tests/test_hashing.py)."""
    sh = with_shingles(docs, 3)
    sig = sh.select("doc_id", sig_col.alias("sig"))
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[
                            F.element_at("sig", 4 * b + r + 1).cast("string")
                            for r in range(_DENSE_ROWS)
                        ],
                    )
                    for b in range(_DENSE_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("m"))
        .filter(F.size("m") >= 2)
    )
    if bucket_cap is not None:
        buckets = buckets.filter(F.size("m") <= bucket_cap)
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(m, (x, i) -> "
                    "transform(slice(m, i + 2, size(m) - i - 1), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # barrier posture: cand feeds the verify join and both id filters —
    # injectable policy, see fintech_etl_spark.barrier
    cand = materialization_barrier(cand, barrier)
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # materialized ONCE: sa and sb are two aliases of this frame, and
    # without the barrier the plan duplicates the whole semi-join +
    # re-shingle subtree per side (seen in the r15 plan capture)
    needed = materialization_barrier(
        with_shingles(docs.join(F.broadcast(cand_ids), "doc_id", "semi"), 3),
        barrier,
    )
    sa = needed.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = needed.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    jac = inter / union
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= _VERIFY_TAU)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signature_xxhash64(
    shingles: F.Column | str, n_perm: int = _DENSE_PERMS
) -> F.Column:
    """Production MinHash signature on Spark's native ``xxhash64``:
    one JVM-codegen'd 64-bit hash per (permutation, shingle) — no md5
    string round-trip, so the signature step runs several times faster
    than :func:`minhash_signature_hash64`. The permutation index is
    mixed in as a leading hash input (not a string concat), which is
    both cheaper and a clean per-permutation family. NOT cross-engine
    replayable (DuckDB has no Spark-compatible xxhash64), hence the
    parity-tested rows-only posture of ``dedup_minhash_lsh_dense_fast``.

    Same single-fold shape as :func:`minhash_signature_hash64` (one
    pass over the shingle array carrying the 64-long accumulator;
    ``xxhash64(i, g)`` with the int lambda variable hashes the same
    (int, string) pair as the wide form's ``xxhash64(lit(i), g)``, so
    signatures are bit-identical — pinned by the equivalence test)."""
    name = shingles if isinstance(shingles, str) else shingles._jc.toString()
    return F.expr(
        f"""
        aggregate(`{name}`,
          array_repeat(cast(9223372036854775807 as long), {n_perm}),
          (acc, g) -> zip_with(acc,
              transform(sequence(0, {n_perm - 1}),
                        i -> xxhash64(i, g)),
              (a, b) -> least(a, b)))
        """
    )


@register(
    "dedup_minhash_lsh_dense_fast",
    None,
    doc=(
        "Production twin of dedup_minhash_lsh_dense: the identical "
        "16-band × 4-row banding, bucket pair generation, and exact-"
        "jaccard verification pipeline (_dense_band_verify), with the "
        "signature on native xxhash64 instead of the md5-derived "
        "hash64 — the md5-per-(shingle × 64 perms) replayability tax "
        "was the single largest cost in the headline suite. No DuckDB "
        "oracle by construction (xxhash64 has no cross-engine twin), "
        "so the driver records the weaker rows-only check; semantics "
        "are pinned instead by tests/test_operators.py's parity bound "
        "(recall >= 0.95 of md5-tier pairs at jaccard >= 0.8 — with a "
        "different hash family, 16x4 banding can probabilistically "
        "miss a j>=0.8 pair at ~2e-4 per pair, so the bound is "
        "statistical, not absolute; both tiers verify with the same "
        "exact-jaccard filter, so any found pair carries identical "
        "(doc_a, doc_b, jaccard) values) "
        "and by the md5 tier keeping the bit-for-bit oracle. Use this "
        "tier in production; use the md5 tier when an audit needs the "
        "replayable trail."
    ),
    tags=("dedup", "lsh", "skew"),
)
def dedup_minhash_lsh_dense_fast(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        )
    )
    return _dense_band_verify(
        docs, minhash_signature_xxhash64("s"), barrier=barrier
    )
