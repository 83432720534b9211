"""Corpus-construction operators: the steps between "deduped documents"
and "training-ready data" that a 100 TB pipeline runs daily — weighted
mixture sampling, deterministic sharded shuffling, lake upserts, and
SCD2 attribute history. All pure column expressions (no UDFs), all
value-checked against DuckDB oracles via the cross-engine
:mod:`fintech_etl_spark.functions.hashing` hash.

Determinism is the design constraint everywhere here: sampling and
shuffling are functions of stable keys (not ``rand()``), so a re-run
after a failure — or an incremental run over a grown corpus — keeps
every prior decision. That is what makes these operators usable in a
reproducible-training setting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_etl_spark.functions.hashing import hash64, hash64_sql
from fintech_etl_spark.barrier import materialization_barrier
from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Weighted mixture sampling (data mixing)
# ---------------------------------------------------------------------------

# Per-source sampling rate, a deterministic function of the source name
# (src0..src19 → 0.1..1.0): stands in for the mixture-weights table a
# real pipeline would broadcast-join.
_RATE_SQL = "(CAST(substr(source, 4) AS INTEGER) % 10 + 1) / 10.0"
_MIX_DENOM = 1000


def _rate_col() -> F.Column:
    return (F.substring("source", 4, 10).cast("int") % 10 + 1) / 10.0


@register(
    "corpus_mixture_sample",
    f"""
    SELECT doc_id, source, n_chars,
           round({_RATE_SQL}, 4) AS sample_rate
    FROM documents
    WHERE ({hash64_sql("('mix:' || CAST(doc_id AS VARCHAR))")} % {_MIX_DENOM})
          < {_RATE_SQL} * {_MIX_DENOM}
    """,
    doc=(
        "Weighted mixture sampling (domain up/down-weighting for data "
        "mixing): each document is kept iff hash(doc_id) mod 1000 falls "
        "under its source's rate — a pure filter, no shuffle, no rand(). "
        "Hash-based Bernoulli means the decision is reproducible per "
        "document: re-runs and incremental runs keep prior picks, and "
        "changing one source's weight only flips that source's docs. At "
        "100 TB the rate map is a broadcast dimension; the scan stays "
        "embarrassingly parallel."
    ),
    tags=("corpus", "sampling"),
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
        F.lit(_MIX_DENOM),
    )
    return docs.filter(bucket < _rate_col() * _MIX_DENOM).select(
        "doc_id",
        "source",
        "n_chars",
        F.round(_rate_col(), 4).alias("sample_rate"),
    )


# ---------------------------------------------------------------------------
# Deterministic sharded training shuffle
# ---------------------------------------------------------------------------

_N_SHARDS = 8


@register(
    "corpus_train_shuffle",
    f"""
    SELECT doc_id,
           CAST({hash64_sql("('shard:' || CAST(doc_id AS VARCHAR))")} % {_N_SHARDS}
                AS INTEGER) AS shard,
           CAST(row_number() OVER (
               PARTITION BY {hash64_sql("('shard:' || CAST(doc_id AS VARCHAR))")} % {_N_SHARDS}
               ORDER BY {hash64_sql("('ord:' || CAST(doc_id AS VARCHAR))")}, doc_id
           ) AS BIGINT) AS pos
    FROM documents
    """,
    doc=(
        "Deterministic global training shuffle, sharded: shard = "
        "hash(doc_id) mod N, position = rank of a second independent "
        "hash within the shard. Equivalent to a seeded permutation of "
        "the corpus but with NO global sort: the only shuffle is the "
        "hash partition into shards and each shard sorts locally — the "
        "scale answer to ORDER BY rand(), whose single total order "
        "bottlenecks on a range exchange. Readers consume shards in "
        "index order for a reproducible epoch."
    ),
    tags=("corpus", "sampling"),
)
def corpus_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    shard = F.pmod(hash64(F.concat(F.lit("shard:"), key)), F.lit(_N_SHARDS))
    ordh = hash64(F.concat(F.lit("ord:"), key))
    w = Window.partitionBy(shard).orderBy(ordh, "doc_id")
    return docs.select(
        "doc_id",
        shard.cast("int").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# Quality-ranked selection under a token budget (data selection)
# ---------------------------------------------------------------------------

_SELECT_BUDGET = 2000  # tokens per source


@register(
    "corpus_budget_select",
    rf"""
    WITH t AS (SELECT doc_id, source,
                      len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                      len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_uniq
               FROM documents),
    r AS (SELECT doc_id, source, n_tokens,
                 n_uniq * 1.0 / n_tokens AS score,
                 sum(n_tokens) OVER (PARTITION BY source
                                     ORDER BY n_uniq * 1.0 / n_tokens DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM t)
    SELECT doc_id, source,
           CAST(n_tokens AS BIGINT)   AS n_tokens,
           score,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= {_SELECT_BUDGET}
    """,
    doc=(
        "Data selection under a token budget: rank each source's docs "
        "by a quality score (unique-token ratio — deterministic, "
        "engine-exact IEEE division, emitted unrounded) and keep the "
        "prefix whose running token sum fits the per-source budget. "
        "One shuffle on source serves both the rank and the running "
        "sum; the greedy prefix-by-quality is the standard high-"
        "quality-subset heuristic. At 100 TB the budget map is a "
        "broadcast dimension keyed by source."
    ),
    tags=("corpus", "sampling", "window"),
)
def corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    base = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    score = F.col("n_uniq") / F.col("n_tokens")
    w = (
        Window.partitionBy("source")
        .orderBy(score.desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _SELECT_BUDGET)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            score.alias("score"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# C4-style span-level exact dedup
# ---------------------------------------------------------------------------

_SPAN = 16  # tokens per dedup unit (the "line" of C4's line-level dedup)


@register(
    "corpus_span_dedup",
    rf"""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
               FROM documents),
    s0 AS (SELECT doc_id, toks,
                  unnest(generate_series(0, CAST((len(toks) - 1) // {_SPAN} AS INTEGER)))
                      AS span_id
           FROM t),
    s AS (SELECT doc_id, CAST(span_id AS INTEGER) AS span_id,
                 array_to_string(toks[(span_id * {_SPAN} + 1):(span_id * {_SPAN} + {_SPAN})], ' ')
                     AS span_text,
                 len(toks[(span_id * {_SPAN} + 1):(span_id * {_SPAN} + {_SPAN})]) AS span_len
          FROM s0),
    k AS (SELECT doc_id, span_id, span_len,
                 row_number() OVER (PARTITION BY span_text ORDER BY doc_id, span_id) = 1
                     AS kept
          FROM s)
    SELECT doc_id,
           CAST(count(*) AS INTEGER)                                AS n_spans,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS INTEGER)   AS kept_spans,
           CAST(sum(CASE WHEN kept THEN span_len ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM k GROUP BY doc_id
    """,
    doc=(
        "C4-style exact span dedup: tokenize, cut each document into "
        f"{_SPAN}-token spans, keep only the globally FIRST occurrence "
        "of each distinct span (ordered by doc_id, span_id), and report "
        "per-document survival. The C4 pipeline does exactly this at "
        "line granularity ('keep one of every three-sentence span'); "
        "here the unit is a fixed token window since the corpus is "
        "unpunctuated. Two shuffles, both necessary and both keyed "
        "wide: hash-partition on span_text for the global first-"
        "occurrence (dup spans are rare → near-uniform keys), then "
        "re-aggregate on doc_id. No UDFs; at 100 TB the explode is a "
        "~6× row fan-out of the scan, not a materialized corpus copy."
    ),
    tags=("corpus", "dedup", "text"),
)
def corpus_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO spread() here — the light span-explode kernel loses to the
    # repartition it pays for (two independent interleaved A/Bs read
    # the spread form 1.25x/1.38x vs the unspread baseline at sf0.1;
    # same verdict as the light media kernels' spread audit)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.floor((F.size(toks) - 1) / F.lit(_SPAN)).cast("int").alias("last_span"),
    )
    spans = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("last_span"))).alias("span_id"),
    )
    sliced = F.slice("toks", F.col("span_id") * _SPAN + 1, _SPAN)
    s = spans.select(
        "doc_id",
        "span_id",
        F.array_join(sliced, " ").alias("span_text"),
        F.size(sliced).alias("span_len"),
    )
    w = Window.partitionBy("span_text").orderBy("doc_id", "span_id")
    k = s.withColumn("kept", F.row_number().over(w) == 1)
    return k.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_spans"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("int").alias("kept_spans"),
        F.sum(F.when(F.col("kept"), F.col("span_len")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------

_CH_WIN = 32  # tokens per chunk
_CH_STRIDE = 24  # chunk start stride (overlap = _CH_WIN - _CH_STRIDE)


@register(
    "doc_chunk_sliding",
    rf"""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
               FROM documents),
    s AS (SELECT doc_id, toks,
                 unnest(generate_series(0, CAST((len(toks) - 1) // {_CH_STRIDE} AS INTEGER)))
                     AS chunk_id
          FROM t)
    SELECT doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(toks[(chunk_id * {_CH_STRIDE} + 1):(chunk_id * {_CH_STRIDE} + {_CH_WIN})])
                AS INTEGER) AS n_tokens,
           array_to_string(toks[(chunk_id * {_CH_STRIDE} + 1):(chunk_id * {_CH_STRIDE} + {_CH_WIN})],
                           ' ') AS chunk_text
    FROM s
    """,
    doc=(
        f"Sliding-window chunking for RAG / sequence prep: {_CH_WIN}-token "
        f"windows starting every {_CH_STRIDE} tokens (={_CH_WIN - _CH_STRIDE}"
        "-token overlap so no boundary context is lost), the standard "
        "retrieval-index unit. Pure per-row explode+slice — ZERO "
        "shuffles, embarrassingly parallel at any scale; a 100 TB corpus "
        "chunks at scan speed with output partitioning inherited from "
        "the input files."
    ),
    tags=("corpus", "text"),
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.floor((F.size(toks) - 1) / F.lit(_CH_STRIDE)).cast("int").alias("last_chunk"),
    )
    chunks = base.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("last_chunk"))).alias("chunk_id"),
    )
    sliced = F.slice("toks", F.col("chunk_id") * _CH_STRIDE + 1, _CH_WIN)
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size(sliced).alias("n_tokens"),
        F.array_join(sliced, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Lake upsert (merge-latest-by-key)
# ---------------------------------------------------------------------------


@register(
    "lake_upsert_latest",
    """
    WITH base AS (SELECT o_orderkey, o_totalprice AS current_price, 1 AS version
                  FROM orders),
    upd AS (SELECT o_orderkey, round(o_totalprice * 1.1, 4), 2
            FROM orders WHERE o_orderkey % 3 = 0),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
    SELECT o_orderkey,
           round(max_by(current_price, version), 4) AS current_price,
           CAST(max(version) AS INTEGER)            AS version
    FROM u GROUP BY o_orderkey
    """,
    doc=(
        "Lakehouse upsert as a set operation: base ∪ updates → latest "
        "row per key by version, via ONE hash aggregation with map-side "
        "combine (max_by) — no window sort, no row_number. This is the "
        "merge-on-read resolve step of a MERGE INTO on a keyed lake; at "
        "100 TB the aggregation shuffles once on the primary key, and a "
        "bucketed base table makes even that shuffle one-sided."
    ),
    tags=("corpus", "lake"),
)
def lake_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("current_price"),
        F.lit(1).alias("version"),
    )
    upd = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 1.1, 4).alias("current_price"),
        F.lit(2).alias("version"),
    )
    return (
        base.unionAll(upd)
        .groupBy("o_orderkey")
        .agg(
            F.round(F.max_by("current_price", "version"), 4).alias("current_price"),
            F.max("version").cast("int").alias("version"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 attribute history (gaps-and-islands)
# ---------------------------------------------------------------------------


@register(
    "scd2_user_event_history",
    """
    WITH e AS (SELECT user_id, ts, event_type FROM events),
    flagged AS (
        SELECT user_id, ts, event_type,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)),
    islands AS (
        SELECT user_id, ts, event_type,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_type
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged),
    intervals AS (
        SELECT user_id, event_type, island,
               min(ts) AS valid_from,
               CAST(count(*) AS BIGINT) AS n_events
        FROM islands GROUP BY user_id, event_type, island)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) AS valid_to,
           n_events
    FROM intervals
    """,
    doc=(
        "SCD2 history build (gaps-and-islands): collapse each user's "
        "consecutive same-type events into validity intervals "
        "[valid_from, valid_to) with the open current interval last — "
        "the standard dimension-history shape. One shuffle on user_id "
        "serves every window; islands come from a running sum over a "
        "change flag, not a self-join. Deterministic under ts ties via "
        "the (ts, event_type) composite order."
    ),
    tags=("corpus", "window", "events"),
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    islands = ev.withColumn(
        "island",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return intervals.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (doc-level n-gram overlap filter)
# ---------------------------------------------------------------------------

_DECON_N = 8  # n-gram size for eval-overlap detection
_DECON_EVAL_MOD = 97  # doc_id % 97 == 0 → held-out "benchmark" set


@register(
    "corpus_decontaminate",
    rf"""
    WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(
                     generate_series(1, greatest(len(w) - {_DECON_N - 1}, 0)),
                     i -> array_to_string(w[i:(i + {_DECON_N - 1})], ' ')))) AS gram
          FROM w),
    eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_EVAL_MOD} = 0),
    t AS (SELECT g.doc_id, g.gram, eg.gram IS NOT NULL AS hit
          FROM g LEFT JOIN eg USING (gram)
          WHERE g.doc_id % {_DECON_EVAL_MOD} != 0)
    SELECT doc_id,
           CAST(count(*) AS INTEGER)                              AS n_grams,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS INTEGER)  AS n_hit_grams,
           sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0               AS contaminated
    FROM t GROUP BY doc_id
    """,
    doc=(
        "Benchmark decontamination, the production step behind "
        "text_contamination_probe's diagnostic: held-out eval docs "
        f"(doc_id % {_DECON_EVAL_MOD} = 0) contribute their distinct "
        f"{_DECON_N}-grams; every training doc sharing ANY of them is "
        "flagged with its overlap count, zero-hit docs included — the "
        "keep-set is `WHERE NOT contaminated`. Eval sets are benchmark-"
        "sized (thousands of docs), so the eval-gram side stays a "
        "broadcast hash set at any corpus scale and the training side "
        "is one explode + one per-doc aggregation — a single shuffle "
        "on doc_id, no corpus self-join."
    ),
    tags=("corpus", "safety", "join"),
)
def corpus_decontaminate(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    from fintech_etl_spark.operators.dedup import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    # hoist the tokenization: an inline split expression inside the
    # transform lambda would re-split the text once per gram index.
    # Materialized once — the eval-gram and corpus-gram branches both
    # consume it, and the plan does not reuse the spread exchange.
    tokenized = materialization_barrier(
        docs.select(
            "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
        ),
        barrier,
    )
    w = F.col("w")
    grams = tokenized.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(w) - (_DECON_N - 1), F.lit(0)),
                    ),
                    lambda i: F.array_join(F.slice(w, i, _DECON_N), " "),
                )
            )
        ).alias("gram"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % _DECON_EVAL_MOD == 0).select("gram").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % _DECON_EVAL_MOD != 0)
        .join(
            F.broadcast(eval_grams.withColumn("hit", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("int").alias("n_hit_grams"),
        )
    )
    return hits.select(
        "doc_id",
        "n_grams",
        "n_hit_grams",
        (F.col("n_hit_grams") > 0).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (exact k per stratum)
# ---------------------------------------------------------------------------

_STRAT_K = 20  # docs kept per source


@register(
    "corpus_stratified_sample",
    f"""
    WITH r AS (SELECT doc_id, source,
                      row_number() OVER (
                          PARTITION BY source
                          ORDER BY {hash64_sql("('samp:' || CAST(doc_id AS VARCHAR))")},
                                   doc_id) AS sample_rank
               FROM documents)
    SELECT doc_id, source, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM r WHERE sample_rank <= {_STRAT_K}
    """,
    doc=(
        f"Stratified sampling with EXACT size guarantees: {_STRAT_K} "
        "docs per source, chosen by ranking a salted hash of the key "
        "within each stratum — the eval-slice/inspection-sample shape "
        "where 'about k' (Bernoulli) isn't acceptable. Deterministic: "
        "re-runs pick the same docs; a grown corpus only swaps docs "
        "whose hash rank crossed the boundary. One shuffle on source; "
        "rank truncation is pushed by WindowGroupLimit so only ~k rows "
        "per stratum survive the exchange."
    ),
    tags=("corpus", "sampling", "window"),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = hash64(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= _STRAT_K)
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights (multilingual/domain balancing)
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.5  # temperature: 1.0 = proportional, 0.0 = uniform


@register(
    "corpus_temperature_weights",
    f"""
    WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(n_chars) AS BIGINT) AS n_chars
               FROM documents GROUP BY source),
    t AS (SELECT sum(power(n_docs, {_MIX_ALPHA})) AS z,
                 sum(n_docs) AS total
          FROM s)
    SELECT source, n_docs, n_chars,
           round(n_docs * 1.0 / total, 4)                    AS raw_share,
           round(power(n_docs, {_MIX_ALPHA}) / z, 4)         AS temp_weight,
           round((power(n_docs, {_MIX_ALPHA}) / z)
                 / (n_docs * 1.0 / total), 4)                AS upweight
    FROM s CROSS JOIN t
    """,
    doc=(
        "Temperature-scaled mixture weights (the multilingual-sampling "
        f"formula: w_s ∝ n_s^α with α={_MIX_ALPHA}): flattens the "
        "source distribution so small domains aren't drowned — "
        "upweight > 1 marks sources the sampler boosts relative to "
        "proportional sampling. Two aggregations (per-source, then the "
        "broadcast normalizer) and no per-document work at all: this "
        "is the planning step whose output feeds corpus_mixture_sample "
        "as its rate map."
    ),
    tags=("corpus", "sampling"),
)
def corpus_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    t = s.agg(
        F.sum(F.pow("n_docs", _MIX_ALPHA)).alias("z"),
        F.sum("n_docs").alias("total"),
    )
    w = F.pow("n_docs", _MIX_ALPHA) / F.col("z")
    raw = F.col("n_docs") * 1.0 / F.col("total")
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_chars",
        F.round(raw, 4).alias("raw_share"),
        F.round(w, 4).alias("temp_weight"),
        F.round(w / raw, 4).alias("upweight"),
    )


# ---------------------------------------------------------------------------
# The end product: one declarative plan from raw corpus to training manifest
# ---------------------------------------------------------------------------


@register(
    "corpus_build_manifest",
    rf"""
    WITH d0 AS (
        SELECT doc_id, source, text
        FROM documents
        WHERE ({hash64_sql("('mix:' || CAST(doc_id AS VARCHAR))")} % {_MIX_DENOM})
              < {_RATE_SQL} * {_MIX_DENOM}),
    fp AS (SELECT doc_id, source, text, md5(coalesce(text, '')) AS f FROM d0),
    surv AS (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY f),
    d1 AS (SELECT fp.doc_id, fp.source, fp.text
           FROM fp JOIN surv ON fp.f = surv.f AND fp.doc_id = surv.keep_id),
    w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(
                     generate_series(1, greatest(len(w) - {_DECON_N - 1}, 0)),
                     i -> array_to_string(w[i:(i + {_DECON_N - 1})], ' ')))) AS gram
          FROM w),
    eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_EVAL_MOD} = 0),
    dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN eg USING (gram)),
    d2 AS (SELECT d1.* FROM d1
           LEFT JOIN dirty ON d1.doc_id = dirty.doc_id
           WHERE dirty.doc_id IS NULL AND d1.doc_id % {_DECON_EVAL_MOD} != 0),
    t AS (SELECT doc_id, source,
                 len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                 len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_uniq
          FROM d2),
    r AS (SELECT doc_id, source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                                     ORDER BY n_uniq * 1.0 / n_tokens DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM t)
    SELECT doc_id, source,
           CAST(n_tokens AS BIGINT)   AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= {_SELECT_BUDGET}
    """,
    doc=(
        "The WHOLE corpus build as one declarative plan: mixture-"
        "sampled (hash-Bernoulli scan filter) → exact-dedup survivors "
        "(min doc_id per md5) → benchmark-decontaminated (no shared "
        f"{_DECON_N}-gram with the eval slice, eval docs excluded) → "
        "per-source quality prefix under the token budget. Composes "
        "four operator families end-to-end exactly as a production "
        "training-set build would, and Catalyst fuses it: the mixture "
        "filter rides the scan, the dedup shuffle keys on md5, the "
        "eval-gram set broadcasts, one source-keyed window closes. "
        "Every stage is individually oracle-checked elsewhere; this "
        "query value-checks their composition."
    ),
    tags=("corpus", "dedup", "sampling", "pipeline"),
)
def corpus_build_manifest(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    from fintech_etl_spark.operators.dedup import spread

    docs = load_table(spark, sf_dir, "documents")

    # Stage 1: mixture sample (pure scan filter)
    bucket = F.pmod(
        hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
        F.lit(_MIX_DENOM),
    )
    d0 = docs.filter(bucket < _rate_col() * _MIX_DENOM).select(
        "doc_id", "source", "text"
    )

    # Stage 2: exact-dedup survivors (min doc_id per fingerprint)
    fp = d0.withColumn("f", F.md5(F.coalesce("text", F.lit(""))))
    surv = fp.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    d1 = fp.join(surv, "f").filter(F.col("doc_id") == F.col("keep_id")).select(
        "doc_id", "source", "text"
    )

    # Stage 3: decontamination (eval grams from the FULL corpus, broadcast).
    # Spread + materialize the tokenized frame once: the eval-gram and
    # dirty-doc branches both consume it, and the plan does not reuse
    # the spread exchange across branches.
    tokenized = materialization_barrier(
        spread(docs).select(
            "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
        ),
        barrier,
    )
    w = F.col("w")
    grams = tokenized.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(w) - (_DECON_N - 1), F.lit(0)),
                    ),
                    lambda i: F.array_join(F.slice(w, i, _DECON_N), " "),
                )
            )
        ).alias("gram"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % _DECON_EVAL_MOD == 0).select("gram").distinct()
    )
    dirty = (
        grams.join(F.broadcast(eval_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    d2 = (
        d1.filter(F.col("doc_id") % _DECON_EVAL_MOD != 0)
        .join(dirty, "doc_id", "left_anti")
    )

    # Stage 4: per-source quality prefix under the token budget
    toks = F.split(F.trim("text"), r"\s+")
    t = d2.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )
    score = F.col("n_uniq") / F.col("n_tokens")
    win = (
        Window.partitionBy("source")
        .orderBy(score.desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(win))
        .filter(F.col("cum_tokens") <= _SELECT_BUDGET)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Epoch plan — the training-run data recipe
# ---------------------------------------------------------------------------

_EPOCH_BUDGET_X = 2.0  # token budget = 2× the corpus (a "2-epoch" run)


@register(
    "corpus_epoch_plan",
    f"""
    WITH s AS (SELECT source,
                      CAST(count(*) AS BIGINT) AS n_docs,
                      sum(n_chars) / 4.0 AS est_tokens
               FROM documents GROUP BY source),
    t AS (SELECT sum(power(n_docs, {_MIX_ALPHA})) AS z,
                 sum(est_tokens) AS corpus_tokens
          FROM s)
    SELECT source,
           n_docs,
           round(est_tokens, 4) AS est_tokens,
           round(power(n_docs, {_MIX_ALPHA}) / z, 4) AS temp_weight,
           round(corpus_tokens * {_EPOCH_BUDGET_X} * (power(n_docs, {_MIX_ALPHA}) / z), 4)
               AS effective_tokens,
           round(corpus_tokens * {_EPOCH_BUDGET_X} * (power(n_docs, {_MIX_ALPHA}) / z)
                 / est_tokens, 4) AS epochs
    FROM s CROSS JOIN t
    """,
    doc=(
        "The training-run data recipe: given a token budget "
        f"({_EPOCH_BUDGET_X}× the corpus) and temperature-scaled "
        f"mixture weights (w_s ∝ n_s^{_MIX_ALPHA}), how many EPOCHS "
        "of each source does the run actually consume? Low-resource "
        "sources get upweighted past the average epoch count and "
        "high-resource ones below it — the over/under-sampling table "
        "every mixture decision is judged by (and the repetition-risk "
        "signal: sources pushed past ~4 epochs start memorizing). "
        "Tokens are estimated at 4 chars/token; one grouped scan, one "
        "broadcast normalizer."
    ),
    tags=("corpus", "sampling"),
)
def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars") / 4.0).alias("est_tokens"),
    )
    t = s.agg(
        F.sum(F.pow("n_docs", F.lit(_MIX_ALPHA))).alias("z"),
        F.sum("est_tokens").alias("corpus_tokens"),
    )
    w = F.pow("n_docs", F.lit(_MIX_ALPHA)) / F.col("z")
    eff = F.col("corpus_tokens") * _EPOCH_BUDGET_X * w
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.round("est_tokens", 4).alias("est_tokens"),
        F.round(w, 4).alias("temp_weight"),
        F.round(eff, 4).alias("effective_tokens"),
        F.round(eff / F.col("est_tokens"), 4).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (data selection via importance resampling)
# ---------------------------------------------------------------------------

#: Hashed-feature bucket count. 256 buckets keeps the weight table a
#: guaranteed broadcast (256 rows regardless of vocabulary size) while
#: still separating content words from boilerplate — the DSIR paper's
#: insight is that bag-of-hashed-ngrams is enough signal for domain
#: weighting, and the bucket count only trades variance, not scale.
_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"


_DSIR_WEIGHTS_SQL = rf"""
    WITH d AS (SELECT doc_id, lang,
                      string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents
               WHERE text IS NOT NULL AND trim(text) != ''),
    tok AS (SELECT doc_id, lang, unnest(w) AS tk FROM d),
    tk2 AS (SELECT doc_id,
                   {hash64_sql('tk')} % {_DSIR_BUCKETS} AS b,
                   lang = '{_DSIR_TARGET_LANG}' AS is_tgt
            FROM tok WHERE tk != ''),
    cnt AS (SELECT b,
                   CAST(count(*) AS DOUBLE) AS c_raw,
                   CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS DOUBLE) AS c_tgt
            FROM tk2 GROUP BY b),
    tot AS (SELECT sum(c_raw) AS raw_tot, sum(c_tgt) AS tgt_tot FROM cnt),
    lw AS (SELECT b,
                  -- per-bucket log-ratio quantized to 1e-12 BIGINT
                  -- units: the per-doc token sum below is then exact
                  -- integer addition (order-independent, both engines)
                  CAST(floor((ln((c_tgt + 1.0) / (tgt_tot + {_DSIR_BUCKETS}))
                            - ln((c_raw + 1.0) / (raw_tot + {_DSIR_BUCKETS})))
                             * 1e12) AS BIGINT) AS lw_e12
           FROM cnt CROSS JOIN tot)
    SELECT doc_id,
           CAST(count(*) AS BIGINT)          AS n_tokens,
           round(sum(lw.lw_e12) / 1e12, 4)   AS dsir_logweight
    FROM tk2 JOIN lw USING (b) GROUP BY doc_id
    """


@register(
    "corpus_dsir_weights",
    _DSIR_WEIGHTS_SQL,
    doc=(
        "DSIR-style importance weights (Xie et al. 2023, 'Data "
        "Selection via Importance Resampling'): per-document "
        "log-likelihood ratio between a target domain (here the "
        f"'{_DSIR_TARGET_LANG}' slice) and the raw corpus, under "
        f"add-1-smoothed bag-of-hashed-unigrams with {_DSIR_BUCKETS} "
        "buckets. The two feature distributions fall out of ONE "
        "grouped count over the hashed token stream (target as a "
        "conditional sum, no second scan), the per-bucket log-ratio "
        f"table is {_DSIR_BUCKETS} rows — broadcast by construction at "
        "any corpus size — and each doc's weight is a map-side join + "
        "one doc_id aggregation. Docs with weight above a chosen "
        "quantile feed corpus_budget_select; the md5-derived hash64 "
        "makes the bucketing bit-identical in both engines. Each "
        "bucket's log-ratio is quantized to 1e-12 BIGINT units before "
        "the per-doc token sum, so the accumulation is exact integer "
        "addition — order-independent and engine-exact (the proven "
        "scaled-integer pattern from graph_link_prediction_aa); only "
        "the 256 per-bucket ln() evaluations touch doubles, computed "
        "from identical integer counts in one expression on both "
        "engines."
    ),
    tags=("corpus", "selection", "agg"),
)
def corpus_dsir_weights(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    from fintech_etl_spark.operators.dedup import spread

    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        )
    )
    tok = docs.select(
        "doc_id",
        (F.col("lang") == _DSIR_TARGET_LANG).alias("is_tgt"),
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tk"),
    ).filter(F.col("tk") != "")
    tk2 = tok.select(
        "doc_id", (hash64("tk") % _DSIR_BUCKETS).alias("b"), "is_tgt"
    )
    # two consumers (the bucket-count aggregation and the final per-doc
    # weight sum) — without a barrier the explode + per-token md5 hash
    # subtree is recomputed for each
    tk2 = materialization_barrier(tk2, barrier)
    cnt = (
        tk2.groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("double").alias("c_raw"),
            F.sum(F.when(F.col("is_tgt"), 1).otherwise(0))
            .cast("double")
            .alias("c_tgt"),
        )
    )
    # two consumers (totals + ratios) — cut the replan of the
    # token-hash aggregation via the injectable barrier policy
    # (fintech_etl_spark.barrier: reliable on checkpoint-dir clusters)
    cnt = materialization_barrier(cnt, barrier)
    tot = cnt.agg(
        F.sum("c_raw").alias("raw_tot"), F.sum("c_tgt").alias("tgt_tot")
    )
    lw = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            (
                F.log((F.col("c_tgt") + 1.0) / (F.col("tgt_tot") + _DSIR_BUCKETS))
                - F.log(
                    (F.col("c_raw") + 1.0) / (F.col("raw_tot") + _DSIR_BUCKETS)
                )
            )
            * 1e12
        )
        .cast("long")
        .alias("lw_e12"),
    )
    return (
        tk2.join(F.broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lw_e12") / 1e12, 4).alias("dsir_logweight"),
        )
    )


@register(
    "corpus_dsir_select",
    f"""
    WITH dw AS ({_DSIR_WEIGHTS_SQL}),
    d2 AS (SELECT dw.doc_id, dw.n_tokens, dw.dsir_logweight, d.source
           FROM dw JOIN documents d USING (doc_id)),
    r AS (SELECT doc_id, source, n_tokens,
                 round(dsir_logweight / n_tokens, 6) AS score,
                 sum(n_tokens) OVER (
                     PARTITION BY source
                     ORDER BY round(dsir_logweight / n_tokens, 6) DESC, doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
          FROM d2)
    SELECT doc_id, source, n_tokens, score,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= {_SELECT_BUDGET}
    """,
    doc=(
        "The DSIR pipeline's second half: rank each source's docs by "
        "PER-TOKEN importance weight (corpus_dsir_weights normalized "
        "by length, so long docs can't buy rank with volume) and keep "
        "the prefix whose running token sum fits the per-source "
        "budget — corpus_budget_select's selection shape driven by "
        "the principled target-domain score instead of the lexical "
        "unique-token heuristic. Ordering is by the ROUNDED score "
        "with doc_id tie-break, so both engines cut an identical "
        "prefix. Same scale posture as budget_select: one shuffle on "
        "source serves rank + running sum; the weight table feeding "
        "the score is a 256-row broadcast."
    ),
    tags=("corpus", "selection", "window"),
)
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    dw = corpus_dsir_weights(spark, sf_dir)
    score = F.round(F.col("dsir_logweight") / F.col("n_tokens"), 6)
    d2 = dw.join(docs, "doc_id").withColumn("score", score)
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d2.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _SELECT_BUDGET)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "score",
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
        )
    )


@register(
    "corpus_dup_rate_by_source",
    """
    WITH f AS (SELECT source, md5(text) AS fp FROM documents
               WHERE text IS NOT NULL),
    g AS (SELECT source, fp, CAST(count(*) AS BIGINT) AS n
          FROM f GROUP BY source, fp)
    SELECT source,
           CAST(sum(n) AS BIGINT)                       AS n_docs,
           CAST(count(*) AS BIGINT)                     AS n_distinct,
           CAST(sum(n) - count(*) AS BIGINT)            AS n_redundant,
           round((sum(n) - count(*)) * 1.0 / sum(n), 4) AS dup_rate
    FROM g GROUP BY source
    """,
    doc=(
        "Per-source exact-duplication rate: md5 fingerprint counts "
        "collapsed per (source, fp), then rolled up to docs vs "
        "distinct vs redundant per source — the triage view that "
        "tells a corpus team WHICH feed is flooding the lake with "
        "copies before any expensive near-dup pass runs. Two grouped "
        "aggregations sharing the source key prefix; fingerprints "
        "are md5 (bit-identical cross-engine), counts exact."
    ),
    tags=("corpus", "dedup", "agg"),
)
def corpus_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    g = docs.groupBy("source", F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_redundant"),
        F.round(
            (F.sum("n") - F.count(F.lit(1))) * 1.0 / F.sum("n"), 4
        ).alias("dup_rate"),
    )
