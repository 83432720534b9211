"""Text-analysis operators for LLM training-data pipelines (north star).

All pure column expressions over the ``documents`` table — tokenize,
language-ID heuristic, quality scoring, fingerprinting — no Python in
the row path, so each scales as a single projection/aggregation over
arbitrarily many parquet splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.barrier import materialization_barrier
from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table

# A small deterministic English stopword set for the language-ID /
# quality heuristics (public-domain list prefix).
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def tokens(col: F.Column | str) -> F.Column:
    """Whitespace tokenization (the baseline tokenizer; BPE-ish regex
    splitting below in ``token_count_bpe_ish``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


@register(
    "text_stats_by_lang",
    r"""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(len(string_split_regex(trim(text), '\s+'))), 4) AS avg_tokens,
           CAST(max(len(string_split_regex(trim(text), '\s+'))) AS INTEGER) AS max_tokens
    FROM documents GROUP BY lang
    """,
    doc="Corpus statistics per language: doc counts, char/token means.",
    tags=("text",),
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(tokens("text"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.max(ntok).alias("max_tokens"),
    )


@register(
    "token_totals_by_source",
    r"""
    SELECT source,
           CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
    doc="Token/char budget accounting per source shard.",
    tags=("text",),
)
def token_totals_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(F.size(tokens("text")).cast("long")).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "token_count_bpe_ish",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER)
               AS bpe_ish_tokens
    FROM documents
    """,
    doc=(
        "Token counting two ways: whitespace and a BPE-ish regex "
        "(letter-runs / digit-runs / single punctuation) — the standard "
        "cheap proxy for tokenizer budgeting."
    ),
    tags=("text",),
)
def token_count_bpe_ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bpe_ish = F.regexp_extract_all(
        F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
    )
    return docs.select(
        "doc_id",
        F.size(tokens("text")).alias("ws_tokens"),
        F.size(bpe_ish).alias("bpe_ish_tokens"),
    )


@register(
    "lang_id_stopword_heuristic",
    rf"""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        x -> x IN ({_SW_SQL}))) AS DOUBLE)
                   / len(string_split_regex(trim(text), '\s+')) AS ratio
        FROM documents)
    SELECT doc_id, lang, round(ratio, 4) AS stopword_ratio,
           ratio >= 0.08 AS pred_en
    FROM t
    """,
    doc=(
        "n-gram-free language ID heuristic: English stopword density. "
        "Real lang-ID would be a fastText Pandas UDF (lib not in image); "
        "the distributed shape — per-doc scalar projection — is identical."
    ),
    tags=("text",),
)
def lang_id_stopword_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    ratio = n_sw.cast("double") / F.size(tokens("text"))
    return docs.select(
        "doc_id",
        "lang",
        F.round(ratio, 4).alias("stopword_ratio"),
        (ratio >= 0.08).alias("pred_en"),
    )


@register(
    "quality_score",
    rf"""
    SELECT doc_id,
           round(0.4 * least(len(string_split_regex(trim(text), '\s+')) / 200.0, 1.0)
               + 0.4 * least(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                x -> x IN ({_SW_SQL}))) AS DOUBLE)
                             / len(string_split_regex(trim(text), '\s+')) / 0.1, 1.0)
               + 0.2 * least(n_chars / 1000.0, 1.0), 4) AS quality
    FROM documents
    """,
    doc=(
        "Composite document quality score: length, stopword density, "
        "char budget — the usual pre-training filter features, computed "
        "as one codegen'd projection."
    ),
    tags=("text",),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(tokens("text"))
    toks_low = tokens(F.lower(F.col("text")))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    sw_ratio = (
        F.size(F.filter(toks_low, lambda x: F.array_contains(sw, x))).cast("double")
        / ntok
    )
    quality = (
        0.4 * F.least(ntok / F.lit(200.0), F.lit(1.0))
        + 0.4 * F.least(sw_ratio / 0.1, F.lit(1.0))
        + 0.2 * F.least(F.col("n_chars") / 1000.0, F.lit(1.0))
    )
    return docs.select("doc_id", F.round(quality, 4).alias("quality"))


@register(
    "doc_fingerprint",
    """
    SELECT doc_id, md5(text) AS fingerprint,
           substr(md5(text), 1, 8) AS shard_key
    FROM documents
    """,
    doc=(
        "Content fingerprinting (md5 here; xxhash64 in-engine when cross-"
        "engine portability isn't needed). The shard_key prefix is the "
        "natural partition key for a 100 TB dedup shuffle."
    ),
    tags=("text", "dedup"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.col("text"))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("shard_key")
    )


# ---------------------------------------------------------------------------
# Rolling-hash (winnowing-style) fingerprints
# ---------------------------------------------------------------------------

_WINNOW_K = 8   # char n-gram width
_WINNOW_W = 16  # winnow window: keep the min hash of each window


def _winnow_oracle() -> str:
    from fintech_etl_spark.functions.hashing import hash64_sql

    k, w = _WINNOW_K, _WINNOW_W
    return f"""
    WITH t AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
    gh AS (SELECT doc_id,
                  list_transform(
                      generate_series(1, CASE WHEN length(t) >= {k}
                                              THEN length(t) - {k - 1} ELSE 0 END),
                      i -> {hash64_sql(f"substr(t, i, {k})")}) AS gh
           FROM t),
    wm AS (SELECT doc_id,
                  list_transform(
                      generate_series(1, CASE WHEN len(gh) >= {w}
                                              THEN len(gh) - {w - 1} ELSE 0 END),
                      i -> list_min(gh[i:i + {w - 1}])) AS wm
           FROM gh),
    fp AS (SELECT doc_id, list_sort(list_distinct(wm)) AS fp FROM wm)
    SELECT doc_id,
           CAST(len(fp) AS INTEGER) AS n_fingerprints,
           md5(array_to_string(fp, ',')) AS fingerprint_set_id
    FROM fp
"""


def _empty_guarded_sequence(n: F.Column) -> F.Column:
    """1..n as an array, empty when n < 1. Spark's ``sequence(1, 0)``
    returns the DESCENDING ``[1, 0]`` (step defaults to -1 when start >
    stop) — not the empty array an ANSI ``generate_series(1, 0)``
    yields — so short inputs need an explicit guard for oracle parity."""
    return F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )


@register(
    "doc_winnow_fingerprint",
    _winnow_oracle(),
    doc=(
        "Winnowing document fingerprints (the MOSS scheme): hash every "
        "8-char gram, keep each 16-gram window's minimum — ~2/(w+1) of "
        "grams survive, position-robust. Pure higher-order-function "
        "projection (sequence→transform→aggregate); the fingerprint set "
        "is the standard near-dup index key at corpus scale. Gram "
        "hashes are the md5-derived cross-engine hash64 and the set id "
        "is md5 of the sorted hash list, so the DuckDB oracle verifies "
        "the full fingerprint set bit-for-bit."
    ),
    tags=("text", "dedup"),
)
def doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fintech_etl_spark.functions.hashing import hash64
    from fintech_etl_spark.operators.dedup import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    # Materialize each stage at a projection boundary: gram_hashes is
    # referenced by every window's slice, so inlining it would make
    # Catalyst re-hash every gram once per window (O(n·w) rehashes —
    # measured minutes instead of seconds at sf0.1).
    t = docs.select("doc_id", F.lower(F.trim(F.col("text"))).alias("t"))
    n_grams = (F.length("t") - (_WINNOW_K - 1)).cast("int")
    hashed = t.select(
        "doc_id",
        F.transform(
            _empty_guarded_sequence(n_grams),
            lambda i: hash64(F.col("t").substr(i.cast("int"), F.lit(_WINNOW_K))),
        ).alias("gh"),
    )
    n_windows = (F.size("gh") - (_WINNOW_W - 1)).cast("int")
    mins = hashed.select(
        "doc_id",
        F.transform(
            _empty_guarded_sequence(n_windows),
            lambda i: F.array_min(F.slice("gh", i.cast("int"), _WINNOW_W)),
        ).alias("wm"),
    )
    fp = F.array_sort(F.array_distinct(F.col("wm")))
    return mins.select(
        "doc_id",
        F.size(fp).alias("n_fingerprints"),
        F.md5(F.concat_ws(",", fp.cast("array<string>"))).alias(
            "fingerprint_set_id"
        ),
    )


@register(
    "text_top_bigrams_per_lang",
    r"""
    WITH w AS (SELECT doc_id, lang,
                      string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents),
    grams AS (SELECT lang, unnest(list_transform(
                  generate_series(1, greatest(len(w)-1, 1)),
                  i -> w[i] || ' ' || w[i+1])) AS g
              FROM w),
    counts AS (SELECT lang, g, count(*) AS n FROM grams GROUP BY 1, 2)
    SELECT lang, g AS bigram, n, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT lang, g, n,
                 row_number() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rnk
          FROM counts) t
    WHERE rnk <= 5
    """,
    doc=(
        "Top-5 bigrams per language: explode bigrams (NOT distinct — "
        "frequency matters), count per (lang, gram), window top-k. The "
        "vocabulary rollup shape behind every n-gram LM / contamination "
        "check at corpus scale."
    ),
    tags=("text", "topk"),
)
def text_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from fintech_etl_spark.operators.dedup import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    w = docs.select(
        "lang", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w")
    )
    grams = w.select(
        "lang",
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("w") - 1, F.lit(1))),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("w", i.cast("int")),
                    F.element_at("w", (i + 1).cast("int")),
                ),
            )
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    counts = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("n"))
    win = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("g"))
    return (
        counts.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= 5)
        .select("lang", F.col("g").alias("bigram"), "n", "rnk")
    )


# ---------------------------------------------------------------------------
# Safety / hygiene scans (pre-training pipeline staples)
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IDLIKE_RE = r"\b\d{3}-\d{2}-\d{4}\b"


@register(
    "text_pii_scan",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INTEGER)  AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INTEGER)  AS n_phones,
           CAST(len(regexp_extract_all(text, '{_IDLIKE_RE}')) AS INTEGER) AS n_idlike,
           (len(regexp_extract_all(text, '{_EMAIL_RE}')) +
            len(regexp_extract_all(text, '{_PHONE_RE}')) +
            len(regexp_extract_all(text, '{_IDLIKE_RE}'))) > 0            AS has_pii
    FROM documents
    """,
    doc=(
        "PII surface scan: per-doc counts of email / phone / SSN-shaped "
        "matches as one regexp projection — the filter stage every "
        "pre-training corpus runs before anything else. Redaction is the "
        "same plan with regexp_replace."
    ),
    tags=("text", "safety"),
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fintech_etl_spark.operators.dedup import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    n = lambda pat: F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
    total = n(_EMAIL_RE) + n(_PHONE_RE) + n(_IDLIKE_RE)
    return docs.select(
        "doc_id",
        n(_EMAIL_RE).alias("n_emails"),
        n(_PHONE_RE).alias("n_phones"),
        n(_IDLIKE_RE).alias("n_idlike"),
        (total > 0).alias("has_pii"),
    )


@register(
    "text_contamination_probe",
    r"""
    WITH probes(pid, probe) AS (VALUES
        (0, 'window merge spark'), (1, 'the quick brown'), (2, 'batch table window')),
    w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
          FROM documents),
    sh AS (SELECT doc_id, list_distinct(list_transform(
               generate_series(1, greatest(len(w)-2, 1)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM w),
    hits AS (SELECT pid, probe, doc_id FROM sh JOIN probes ON list_contains(s, probe))
    SELECT pid, probe,
           CAST(count(*) AS BIGINT)        AS n_docs_hit,
           CAST(min(doc_id) AS BIGINT)     AS first_doc
    FROM hits GROUP BY pid, probe
    """,
    doc=(
        "Benchmark-contamination probe: a tiny broadcast set of eval "
        "n-grams joined against the corpus shingle index. At 100 TB the "
        "probe side stays broadcast and the corpus side reuses the same "
        "exploded-shingle shuffle as the dedup family."
    ),
    tags=("text", "safety", "join"),
)
def text_contamination_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fintech_etl_spark.operators.dedup import spread, with_shingles

    probes = spark.createDataFrame(
        [(0, "window merge spark"), (1, "the quick brown"), (2, "batch table window")],
        "pid int, probe string",
    )
    sh = with_shingles(spread(load_table(spark, sf_dir, "documents")), 3)
    hits = sh.join(
        F.broadcast(probes), F.array_contains(F.col("s"), F.col("probe"))
    )
    return hits.groupBy("pid", "probe").agg(
        F.count(F.lit(1)).alias("n_docs_hit"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "quality_repetition_signals",
    r"""
    WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents),
    wc  AS (SELECT doc_id, unnest(w) AS word FROM w),
    wcc AS (SELECT doc_id, word, count(*) AS c FROM wc GROUP BY 1, 2),
    ws  AS (SELECT doc_id,
                   CAST(sum(c) AS BIGINT)   AS n_words,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   max(c)                   AS top_c
            FROM wcc GROUP BY 1),
    bg  AS (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 1),
                                         i -> w[i] || ' ' || w[i+1])) AS g
            FROM w),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
    bgs AS (SELECT doc_id, sum(c) AS totb, max(c) AS topb FROM bgc GROUP BY 1)
    SELECT ws.doc_id, n_words,
           round(n_distinct * 1.0 / n_words, 4) AS distinct_word_ratio,
           round(top_c * 1.0 / n_words, 4)      AS top_word_frac,
           round(topb * 1.0 / totb, 4)          AS top_bigram_frac
    FROM ws LEFT JOIN bgs ON ws.doc_id = bgs.doc_id
    """,
    doc=(
        "Gopher/C4-style repetition quality signals per document: "
        "distinct-word ratio, most-frequent-word fraction and "
        "most-frequent-bigram fraction — the standard filters for "
        "boilerplate / degenerate text. Two explode+agg passes keyed on "
        "doc_id, so both shuffles are co-partitioned and the doc text "
        "itself never moves."
    ),
    tags=("text", "quality"),
)
def quality_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Every signal is a function of ONE document's token multiset, so
    # none of it needs a shuffle: sort the array and a single
    # sequential `aggregate` fold yields the distinct count (boundary
    # count) and the top frequency (max equal-run length) per row. The
    # previous shape exploded words AND bigrams into two
    # (doc_id, token) aggregation pipelines joined back on doc_id —
    # four exchanges and a ~100× row fan-out for per-row arithmetic
    # (guide §2.3/§2.4: the counts, and therefore every emitted value,
    # are identical — pinned by the unchanged DuckDB oracle).
    # explode dropped null-text docs; the filter keeps that contract.
    w = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w")
    ).filter(F.col("w").isNotNull())

    def run_fold(arr: str) -> str:
        # (distinct count, max run length) of the SORTED array in one
        # pass: run tracks the current equal-run, best its max, nd the
        # number of value boundaries. Elements are non-null (split
        # output), so <=> only guards the initial null prev.
        return f"""
        aggregate(array_sort({arr}),
          named_struct('prev', cast(null as string),
                       'run', 0L, 'best', 0L, 'nd', 0L),
          (a, x) -> named_struct(
              'prev', x,
              'run', IF(a.prev <=> x, a.run + 1L, 1L),
              'best', greatest(a.best, IF(a.prev <=> x, a.run + 1L, 1L)),
              'nd', a.nd + IF(a.prev <=> x, 0L, 1L)))
        """

    # bigram list via a 0-based transform over the words array — the
    # old sequence(1, size-1) spelling produced a DESCENDING [1, 0]
    # sequence for a 1-word doc and element_at(w, 2) then threw
    # INVALID_ARRAY_INDEX (latent: the corpus has no 1-word docs);
    # slicing the zip of (w, w[1:]) cannot go out of bounds, and a
    # 1-word doc gets the empty list → null top_bigram_frac, which is
    # what the old left-join shape was documented to produce.
    bigrams = (
        "zip_with(slice(w, 1, greatest(size(w) - 1, 0)), "
        "slice(w, 2, greatest(size(w) - 1, 0)), "
        "(a, b) -> concat(a, ' ', b))"
    )
    stats = w.select(
        "doc_id",
        F.size("w").cast("long").alias("n_words"),
        F.expr(run_fold("w")).alias("_ws"),
        F.expr(bigrams).alias("_bg"),
    ).select(
        "doc_id",
        "n_words",
        F.col("_ws.nd").alias("n_distinct"),
        F.col("_ws.best").alias("top_c"),
        F.size("_bg").cast("long").alias("totb"),
        F.expr(run_fold("_bg"))["best"].alias("topb"),
    )
    return stats.select(
        "doc_id",
        "n_words",
        F.round(F.col("n_distinct") / F.col("n_words"), 4).alias(
            "distinct_word_ratio"
        ),
        F.round(F.col("top_c") / F.col("n_words"), 4).alias("top_word_frac"),
        # 0-bigram docs get an explicit null — the same null the old
        # left join produced for a missing bgs row (0/0 throws under
        # Spark 4's default ANSI mode, so the guard is load-bearing)
        F.when(
            F.col("totb") > 0, F.round(F.col("topb") / F.col("totb"), 4)
        ).alias("top_bigram_frac"),
    )


@register(
    "split_train_val_test",
    """
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
    doc=(
        "Deterministic train/val/test assignment by content-stable hash "
        "(~80/10/10 via the first md5 hex byte) — the standard leakage- "
        "safe split for training corpora: no RNG, no ordering dependence, "
        "stable under re-partitioning and incremental arrivals. Pure "
        "projection + 3-key rollup; the hex-threshold comparison is "
        "engine-portable so DuckDB value-checks the exact assignment."
    ),
    tags=("text", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    split = (
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "text_normalize_battery",
    r"""
    SELECT doc_id,
           lower(trim(text))                                             AS lowered,
           regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g')      AS alnum_only,
           regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
                          ' +', ' ', 'g')                                AS collapsed,
           CAST(length(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'))
                AS BIGINT)                                               AS n_alnum_chars
    FROM documents
    """,
    doc=(
        "Canonical text normalization for dedup/tokenization "
        "preprocessing: lowercase, strip non-alphanumerics, collapse "
        "whitespace runs — the step every fuzzy-dedup pipeline applies "
        "before shingling so punctuation variants hash identically. "
        "Pure regexp projection, fully codegen'd, zero shuffle."
    ),
    tags=("text", "scalar"),
)
def text_normalize_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.trim("text"))
    alnum = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.regexp_replace(alnum, " +", " ")
    return docs.select(
        "doc_id",
        lowered.alias("lowered"),
        alnum.alias("alnum_only"),
        collapsed.alias("collapsed"),
        F.length(alnum).cast("long").alias("n_alnum_chars"),
    )


@register(
    "corpus_health_by_source",
    r"""
    WITH w AS (SELECT doc_id, source, n_chars,
                      string_split_regex(lower(trim(text)), '\s+') AS w
               FROM documents),
    stats AS (SELECT doc_id, source, n_chars,
                     len(w)               AS n_words,
                     len(list_distinct(w)) AS n_distinct
              FROM w)
    SELECT source,
           count(*)                                            AS n_docs,
           CAST(sum(n_chars) AS BIGINT)                        AS total_chars,
           round(avg(n_words), 4)                              AS avg_words,
           round(avg(n_distinct * 1.0 / n_words), 4)           AS avg_distinct_ratio,
           CAST(sum(CASE WHEN n_words < 20 THEN 1 ELSE 0 END) AS BIGINT)
                                                               AS n_short_docs
    FROM stats GROUP BY source
    """,
    doc=(
        "Per-source corpus health report: volume, mean length, lexical "
        "diversity, short-doc count — the rollup a data curator reads "
        "before deciding per-source sampling weights. One projection + "
        "one agg shuffle on the (low-cardinality) source key; the "
        "distinct-ratio comes from array ops, not an explode."
    ),
    tags=("text", "quality", "agg"),
)
def corpus_health_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    stats = docs.select(
        "source",
        "n_chars",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    )
    return stats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_words"), 4).alias("avg_words"),
        F.round(F.avg(F.col("n_distinct") / F.col("n_words")), 4).alias(
            "avg_distinct_ratio"
        ),
        F.sum(F.when(F.col("n_words") < 20, 1).otherwise(0)).alias("n_short_docs"),
    )


# ---------------------------------------------------------------------------
# TF-IDF term ranking and LM-based quality scoring
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    r"""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    d AS (SELECT doc_id, term, tf,
                 count(*) OVER (PARTITION BY term)  AS df,
                 sum(tf)  OVER (PARTITION BY doc_id) AS doc_len
          FROM tf),
    s AS (SELECT doc_id, term,
                 (tf * 1.0 / doc_len)
                 * ln((SELECT count(*) FROM documents) * 1.0 / df) AS tfidf
          FROM d),
    r AS (SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rk
          FROM s)
    SELECT doc_id, term, CAST(rk AS INTEGER) AS rk, round(tfidf, 4) AS tfidf
    FROM r WHERE rk <= 3
    """,
    doc=(
        "Per-document top-3 TF-IDF terms — the classic keyword/topic "
        "signal feeding clustering and mixture labeling. tf from one "
        "(doc_id, term) aggregation; df as a count window over term; "
        "doc length and the final rank share ONE doc_id exchange "
        "(adjacent same-key windows reuse the partitioning — the plan "
        "has no second doc_id shuffle); the corpus size N joins in as "
        "a broadcast scalar. Ranking ties are exact-equal tfidf values "
        "(identical integer inputs), broken by term, so cross-engine "
        "order is stable despite ulp-level ln() differences."
    ),
    tags=("text", "window"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    d = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w_doc = Window.partitionBy("doc_id")
    s = (
        d.crossJoin(F.broadcast(n))
        .withColumn("doc_len", F.sum("tf").over(w_doc))
        .withColumn(
            "tfidf",
            (F.col("tf") * 1.0 / F.col("doc_len"))
            * F.log(F.col("n_docs") * 1.0 / F.col("df")),
        )
    )
    rk = F.row_number().over(w_doc.orderBy(F.col("tfidf").desc(), "term"))
    return (
        s.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "rk", F.round("tfidf", 4).alias("tfidf"))
    )


@register(
    "doc_unigram_lm_score",
    r"""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
                 FROM documents),
    cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
    tot AS (SELECT count(*) AS total FROM tok)
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_tokens,
           round(avg(ln(c * 1.0 / total)), 4) AS avg_logp,
           round(exp(-avg(ln(c * 1.0 / total))), 4) AS ppl
    FROM tok JOIN cnt USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc=(
        "Unigram language-model quality score: corpus unigram "
        "probabilities, then each document's mean log-probability and "
        "perplexity — the cheap KenLM stand-in that flags gibberish "
        "(very low avg_logp) and boilerplate (very high). The "
        "vocabulary count table broadcasts to the token stream (at "
        "100 TB: broadcast the top-V vocabulary and OOV-bucket the "
        "tail), so the only shuffles are the two aggregations; the "
        "scoring join itself is shuffle-free."
    ),
    tags=("text", "quality"),
)
def doc_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("total"))
    logp = F.log(F.col("c") * 1.0 / F.col("total"))
    return (
        tok.join(F.broadcast(cnt), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(F.avg(logp), 4).alias("avg_logp"),
            F.round(F.exp(-F.avg(logp)), 4).alias("ppl"),
        )
    )


@register(
    "quality_mad_outliers",
    r"""
    WITH t AS (SELECT doc_id, source,
                      len(list_distinct(string_split_regex(trim(text), '\s+'))) * 1.0
                      / len(string_split_regex(trim(text), '\s+')) AS score
               FROM documents),
    r AS (SELECT doc_id, source, score,
                 row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn,
                 count(*)    OVER (PARTITION BY source) AS n
          FROM t),
    m AS (SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN score END)
                        OVER (PARTITION BY source) AS med
          FROM r),
    d AS (SELECT *, abs(score - med) AS dev FROM m),
    dr AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS drn
           FROM d),
    mm AS (SELECT *, max(CASE WHEN drn = (n + 1) // 2 THEN dev END)
                         OVER (PARTITION BY source) AS mad
           FROM dr)
    SELECT doc_id, source,
           round(score, 4) AS score,
           round(med, 4)   AS med,
           round(mad, 4)   AS mad,
           (score < med - 3 * mad OR score > med + 3 * mad) AS is_outlier
    FROM mm
    """,
    doc=(
        "Robust per-source quality outliers (median ± 3·MAD): both the "
        "median and the MAD are RANK-SELECTED elements (the lower "
        "median at position (n+1)/2 by (value, doc_id)), never an "
        "interpolating percentile — interpolation arithmetic differs "
        "across engines in the last ulp, rank selection cannot. The "
        "outlier comparison runs on exact unrounded doubles that both "
        "engines compute identically (IEEE division, subtraction, one "
        "multiply). One shuffle on source feeds every window; the two "
        "rank passes add sorts, not exchanges."
    ),
    tags=("text", "quality", "window"),
)
def quality_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    t = docs.select(
        "doc_id",
        "source",
        (F.size(F.array_distinct(toks)) * 1.0 / F.size(toks)).alias("score"),
    )
    ws = Window.partitionBy("source")
    r = t.select(
        "*",
        F.row_number().over(ws.orderBy("score", "doc_id")).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    med_pos = F.floor((F.col("n") + 1) / 2)
    m = r.withColumn(
        "med",
        F.max(F.when(F.col("rn") == med_pos, F.col("score"))).over(ws),
    )
    d = m.withColumn("dev", F.abs(F.col("score") - F.col("med")))
    dr = d.withColumn(
        "drn", F.row_number().over(ws.orderBy("dev", "doc_id"))
    )
    mm = dr.withColumn(
        "mad",
        F.max(F.when(F.col("drn") == med_pos, F.col("dev"))).over(ws),
    )
    lo = F.col("med") - 3 * F.col("mad")
    hi = F.col("med") + 3 * F.col("mad")
    return mm.select(
        "doc_id",
        "source",
        F.round("score", 4).alias("score"),
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        ((F.col("score") < lo) | (F.col("score") > hi)).alias("is_outlier"),
    )


_POSTINGS_CAP = 20  # posting-list prefix emitted per term


@register(
    "build_inverted_index",
    rf"""
    WITH tok AS (SELECT DISTINCT doc_id,
                        unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
                 FROM documents),
    p AS (SELECT term,
                 CAST(count(*) AS BIGINT) AS df,
                 list_sort(list(doc_id)) AS postings
          FROM tok GROUP BY term)
    SELECT term, df,
           array_to_string(postings[1:{_POSTINGS_CAP}], ',') AS postings_head,
           CAST(len(postings) AS INTEGER) AS postings_len
    FROM p
    """,
    doc=(
        "Inverted-index construction — the retrieval artifact a RAG/"
        "search stack builds from the corpus: per term, document "
        "frequency and the doc-id-sorted posting list (emitted as a "
        f"{_POSTINGS_CAP}-entry head + length; the production writer "
        "keeps the full list as array<long> partitioned by term "
        "range). One distinct-explode and one term-keyed aggregation "
        "with map-side combine; at 100 TB the term key is naturally "
        "high-cardinality, and hot stopword terms are exactly what the "
        "df-cap machinery in the dedup family drops before indexing."
    ),
    tags=("text", "index"),
)
def build_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    ).distinct()
    p = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_sort(F.collect_list("doc_id")).alias("postings"),
    )
    return p.select(
        "term",
        "df",
        F.array_join(F.slice("postings", 1, _POSTINGS_CAP), ",").alias(
            "postings_head"
        ),
        F.size("postings").alias("postings_len"),
    )


# ---------------------------------------------------------------------------
# PII redaction (the rewrite stage text_pii_scan's doc promises)
# ---------------------------------------------------------------------------


@register(
    "text_pii_redact",
    f"""
    WITH r AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(coalesce(text, ''),
                                      '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_PHONE_RE}', '<PHONE>', 'g'),
                   '{_IDLIKE_RE}', '<ID>', 'g') AS red,
               len(regexp_extract_all(coalesce(text, ''), '{_EMAIL_RE}'))
               + len(regexp_extract_all(coalesce(text, ''), '{_PHONE_RE}'))
               + len(regexp_extract_all(coalesce(text, ''), '{_IDLIKE_RE}'))
                   AS n_red
        FROM documents)
    SELECT doc_id,
           CAST(n_red AS INTEGER) AS n_redactions,
           md5(red)               AS redacted_fingerprint,
           n_red > 0              AS changed
    FROM r
    """,
    doc=(
        "PII redaction: the rewrite stage over text_pii_scan's match "
        "surface — email, phone and SSN-shaped spans replaced by typed "
        "placeholders in one chained regexp_replace projection (scan "
        "speed, no shuffle, trivially parallel at 100 TB). The redacted "
        "text is value-checked via its md5 so the driver hash stays "
        "compact; the literal-string behavior (overlaps, placement, "
        "multi-hit docs) is pinned by the unit test on crafted rows."
    ),
    tags=("text", "safety"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fintech_etl_spark.operators.dedup import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    text = F.coalesce(F.col("text"), F.lit(""))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IDLIKE_RE,
        "<ID>",
    )
    n = lambda pat: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
    n_red = n(_EMAIL_RE) + n(_PHONE_RE) + n(_IDLIKE_RE)
    return docs.select(
        "doc_id",
        n_red.cast("int").alias("n_redactions"),
        F.md5(red).alias("redacted_fingerprint"),
        (n_red > 0).alias("changed"),
    )


# ---------------------------------------------------------------------------
# Boilerplate report (CCNet-style df-based common-span detection)
# ---------------------------------------------------------------------------

_BOILER_N = 5  # word n-gram width for boilerplate detection


def _boilerplate_oracle() -> str:
    from fintech_etl_spark.operators.dedup import _DF_CAP_FRACTION, _shingle_sql

    return f"""
    WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
               FROM documents
               WHERE text IS NOT NULL AND trim(text) <> ''),
    sh AS (SELECT doc_id, {_shingle_sql(_BOILER_N)} AS s FROM w),
    e AS (SELECT doc_id, unnest(s) AS g FROM sh),
    nd AS (SELECT count(*) AS n_docs FROM w),
    dfc AS (SELECT g, count(*) AS df FROM e GROUP BY g),
    b AS (SELECT coalesce(list(g), []) AS banned
          FROM dfc CROSS JOIN nd
          WHERE df > greatest(2, CAST(floor(n_docs * {_DF_CAP_FRACTION}) AS BIGINT)))
    SELECT doc_id,
           CAST(len(s) AS INTEGER) AS n_grams,
           CAST(len(list_intersect(s, banned)) AS INTEGER) AS n_boiler,
           round(len(list_intersect(s, banned)) * 1.0
                 / greatest(len(s), 1), 4) AS boilerplate_ratio
    FROM sh CROSS JOIN b
    """


@register(
    "text_boilerplate_report",
    _boilerplate_oracle(),
    doc=(
        "CCNet-style boilerplate detector: word 5-grams whose document "
        "frequency exceeds max(2, 1% of docs) are boilerplate (nav "
        "chrome, license headers, templated footers); each doc reports "
        "how much of its distinct-gram surface is boilerplate — the "
        "signal corpus builders threshold on before training. Same "
        "bounded-banned-set shape as dedup_minhash_lsh_dfcap: the df "
        "aggregation is the only shuffle, the banned set collapses to "
        "ONE broadcast array (Σdf bounds its size at ~n-grams/1% "
        "regardless of corpus size), and the per-doc intersect runs at "
        "scan speed."
    ),
    tags=("text", "quality", "skew"),
)
def text_boilerplate_report(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    # barrier posture: the one-row banned-set feeds every doc row —
    # injectable policy, see fintech_etl_spark.barrier
    from fintech_etl_spark.operators.dedup import (
        _DF_CAP_FRACTION,
        spread,
        with_shingles,
    )

    docs = spread(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.trim("text") != "")
        )
    )
    sh = with_shingles(docs, _BOILER_N)
    e = sh.select(F.explode_outer("s").alias("g")).filter(F.col("g").isNotNull())
    cap = F.greatest(
        F.lit(2).cast("long"),
        F.floor(F.col("n_docs") * F.lit(_DF_CAP_FRACTION)).cast("long"),
    )
    banned_arr = (
        e.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs"))))
        .filter(F.col("df") > cap)
        # collect_list over zero rows still yields one row with [] —
        # no coalesce needed on the Spark side (the oracle's list()
        # returns NULL on empty input, hence its coalesce)
        .agg(F.collect_list("g").alias("banned"))
    )
    banned_arr = materialization_barrier(banned_arr, barrier)
    boiler = F.size(F.array_intersect("s", "banned"))
    return sh.crossJoin(F.broadcast(banned_arr)).select(
        "doc_id",
        F.size("s").cast("int").alias("n_grams"),
        boiler.cast("int").alias("n_boiler"),
        F.round(boiler / F.greatest(F.size("s"), F.lit(1)), 4).alias(
            "boilerplate_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Quality-gate funnel (per-stage attrition of the corpus filter chain)
# ---------------------------------------------------------------------------

_GATE_MIN_CHARS = 50
_GATE_LANGS = ("en", "de", "fr", "es", "zh")
_GATE_MIN_TTR = 0.3  # distinct-token / token floor (repetition gate)
_GATE_MAX_DIGIT = 0.3  # digit-character ceiling


@register(
    "corpus_quality_funnel",
    rf"""
    WITH g AS (
        SELECT (text IS NOT NULL AND trim(text) <> '') AS c1,
               coalesce(n_chars, 0) >= {_GATE_MIN_CHARS} AS c2,
               lang IN ({", ".join(f"'{l}'" for l in _GATE_LANGS)}) AS c3,
               len(list_distinct(string_split_regex(lower(trim(coalesce(text, ''))), '\s+'))) * 1.0
                   / greatest(len(string_split_regex(lower(trim(coalesce(text, ''))), '\s+')), 1)
                   >= {_GATE_MIN_TTR} AS c4,
               len(regexp_extract_all(coalesce(text, ''), '[0-9]')) * 1.0
                   / greatest(coalesce(n_chars, 0), 1) <= {_GATE_MAX_DIGIT} AS c5
        FROM documents),
    f AS (SELECT CAST(count(*) AS BIGINT) AS s0,
                 CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                 CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
                 CAST(sum(CASE WHEN c1 AND c2 AND c3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
                 CAST(sum(CASE WHEN c1 AND c2 AND c3 AND c4 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
                 CAST(sum(CASE WHEN c1 AND c2 AND c3 AND c4 AND c5 THEN 1 ELSE 0 END) AS BIGINT) AS s5
          FROM g)
    SELECT u.stage_no, u.stage, u.n_in, u.n_out,
           u.n_in - u.n_out AS n_dropped,
           round((u.n_in - u.n_out) * 1.0 / greatest(u.n_in, 1), 4) AS drop_pct
    FROM f, LATERAL (VALUES
        (1, 'has_text',       s0, s1),
        (2, 'min_length',     s1, s2),
        (3, 'known_lang',     s2, s3),
        (4, 'low_repetition', s3, s4),
        (5, 'digit_ratio',    s4, s5)) AS u(stage_no, stage, n_in, n_out)
    """,
    doc=(
        "The corpus filter chain as a funnel: five conjunctive gates "
        "(non-empty, length, language allowlist, type-token repetition "
        "floor, digit-ratio ceiling) counted in ONE scan + ONE "
        "aggregate — every per-doc gate boolean is a scan-fused "
        "projection, the funnel is six conditional counts, and the "
        "per-stage reshape happens on the single aggregate row. The "
        "attrition report every corpus build reads before committing "
        "to a gate config; at 100 TB its cost is exactly one pass."
    ),
    tags=("text", "quality", "corpus"),
)
def corpus_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fintech_etl_spark.operators.dedup import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    text = F.coalesce(F.col("text"), F.lit(""))
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    c1 = F.col("text").isNotNull() & (F.trim("text") != "")
    c2 = F.coalesce(F.col("n_chars"), F.lit(0)) >= _GATE_MIN_CHARS
    c3 = F.col("lang").isin(*_GATE_LANGS)
    c4 = (
        F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))
    ) >= _GATE_MIN_TTR
    c5 = (
        F.size(F.regexp_extract_all(text, F.lit("[0-9]"), F.lit(0)))
        / F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(1))
    ) <= _GATE_MAX_DIGIT
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    f = docs.agg(
        F.count(F.lit(1)).alias("s0"),
        cnt(c1).alias("s1"),
        cnt(c1 & c2).alias("s2"),
        cnt(c1 & c2 & c3).alias("s3"),
        cnt(c1 & c2 & c3 & c4).alias("s4"),
        cnt(c1 & c2 & c3 & c4 & c5).alias("s5"),
    )
    stages = f.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("stage_no"),
                        F.lit(name).alias("stage"),
                        F.col(f"s{i - 1}").alias("n_in"),
                        F.col(f"s{i}").alias("n_out"),
                    )
                    for i, name in (
                        (1, "has_text"),
                        (2, "min_length"),
                        (3, "known_lang"),
                        (4, "low_repetition"),
                        (5, "digit_ratio"),
                    )
                ]
            )
        ).alias("u")
    ).select("u.*")
    return stages.select(
        "stage_no",
        "stage",
        "n_in",
        "n_out",
        (F.col("n_in") - F.col("n_out")).alias("n_dropped"),
        F.round(
            (F.col("n_in") - F.col("n_out")) / F.greatest(F.col("n_in"), F.lit(1)), 4
        ).alias("drop_pct"),
    )


@register(
    "text_readability_scores",
    r"""
    WITH t AS (SELECT doc_id, lower(trim(text)) AS tx FROM documents
               WHERE text IS NOT NULL AND trim(text) != ''),
    c AS (SELECT doc_id,
                 CAST(len(string_split_regex(tx, '\s+')) AS BIGINT) AS n_words,
                 CAST(greatest(len(list_filter(
                      string_split_regex(tx, '[.!?]+'),
                      x -> trim(x) != '')), 1) AS BIGINT)           AS n_sentences,
                 CAST(len(regexp_extract_all(tx, '[aeiouy]+')) AS BIGINT)
                     AS n_syllables
          FROM t)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(0.39 * (n_words * 1.0 / n_sentences)
                 + 11.8 * (n_syllables * 1.0 / n_words) - 15.59, 4)
               AS fk_grade
    FROM c WHERE n_words > 0
    """,
    doc=(
        "Readability scoring (Flesch-Kincaid grade with the standard "
        "vowel-group syllable proxy): words by whitespace, sentences "
        "by terminal punctuation (floored at 1 so headline-style docs "
        "don't divide by zero), syllables as [aeiouy]+ runs — the "
        "classic corpus quality feature complementing the stopword/"
        "repetition signals. Pure per-row string expressions (regex "
        "count, split, arithmetic on exact integer counts), zero "
        "shuffles beyond the scan; both engines evaluate the same "
        "literal formula on identical integers, so round-4 is exact."
    ),
    tags=("text", "quality"),
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    tx = F.lower(F.trim("text"))
    n_words = F.size(F.split(tx, r"\s+")).cast("long")
    n_sentences = F.greatest(
        F.size(
            F.filter(
                F.split(tx, r"[.!?]+"), lambda x: F.trim(x) != ""
            )
        ),
        F.lit(1),
    ).cast("long")
    n_syllables = F.size(F.regexp_extract_all(tx, F.lit("[aeiouy]+"), 0)).cast(
        "long"
    )
    c = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    fk = (
        0.39 * (F.col("n_words") * 1.0 / F.col("n_sentences"))
        + 11.8 * (F.col("n_syllables") * 1.0 / F.col("n_words"))
        - 15.59
    )
    return c.filter(F.col("n_words") > 0).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(fk, 4).alias("fk_grade"),
    )


@register(
    "lang_id_eval_report",
    rf"""
    WITH t AS (
        SELECT lang = 'en' AS actual,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                        x -> x IN ({_SW_SQL}))) AS DOUBLE)
                   / len(string_split_regex(trim(text), '\s+')) >= 0.08 AS pred
        FROM documents),
    c AS (SELECT
              CAST(sum(CASE WHEN pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS tp,
              CAST(sum(CASE WHEN pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS fp,
              CAST(sum(CASE WHEN NOT pred AND actual THEN 1 ELSE 0 END) AS BIGINT) AS fn,
              CAST(sum(CASE WHEN NOT pred AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS tn
          FROM t)
    SELECT tp, fp, fn, tn,
           round(tp * 1.0 / greatest(tp + fp, 1), 4) AS precision,
           round(tp * 1.0 / greatest(tp + fn, 1), 4) AS recall,
           round(2.0 * tp / greatest(2 * tp + fp + fn, 1), 4) AS f1,
           round((tp + tn) * 1.0 / (tp + fp + fn + tn), 4) AS accuracy
    FROM c
    """,
    doc=(
        "Classifier evaluation as a query: the stopword-density "
        "lang-ID heuristic scored against the gold `lang` label — "
        "confusion counts (TP/FP/FN/TN) plus precision/recall/F1/"
        "accuracy in ONE scan and one scalar rollup. The "
        "model-evaluation primitive a data-quality pipeline runs "
        "after every heuristic change; exact integer counts make "
        "every ratio engine-identical. Also the honest receipt on "
        "the heuristic itself: its errors are visible, not claimed "
        "away."
    ),
    tags=("text", "quality", "eval"),
)
def lang_id_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    ratio = (
        F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast("double")
        / F.size(tokens("text"))
    )
    t = docs.select(
        (F.col("lang") == "en").alias("actual"), (ratio >= 0.08).alias("pred")
    )
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    c = t.agg(
        cnt(F.col("pred") & F.col("actual")).alias("tp"),
        cnt(F.col("pred") & ~F.col("actual")).alias("fp"),
        cnt(~F.col("pred") & F.col("actual")).alias("fn"),
        cnt(~F.col("pred") & ~F.col("actual")).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp * 1.0 / F.greatest(tp + fp, F.lit(1)), 4).alias("precision"),
        F.round(tp * 1.0 / F.greatest(tp + fn, F.lit(1)), 4).alias("recall"),
        F.round(
            2.0 * tp / F.greatest(2 * tp + fp + fn, F.lit(1)), 4
        ).alias("f1"),
        F.round((tp + tn) * 1.0 / (tp + fp + fn + tn), 4).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# CCNet-style LM perplexity filter
# ---------------------------------------------------------------------------

#: head/middle/tail cut points on per-token negative log-likelihood
#: (CCNet buckets by LM perplexity and keeps the head for training).
#: Chosen at the ~30/70 percentiles of this corpus's nll distribution
#: (observed range 3.23–3.66 nats/token under the add-1 bigram LM).
_PPL_HEAD_NLL = 3.38
_PPL_TAIL_NLL = 3.43

_PPL_BIGRAMS_SQL = (
    "unnest(list_transform(generate_series(2, len(t)), "
    "i -> {'w1': t[i-1], 'w2': t[i]}))"
)


@register(
    "text_lm_perplexity_bucket",
    rf"""
    WITH tok AS (SELECT doc_id, lang,
                        string_split_regex(lower(trim(text)), '\s+') AS t
                 FROM documents
                 WHERE text IS NOT NULL AND trim(text) <> ''),
    tb AS (SELECT {_PPL_BIGRAMS_SQL} AS b FROM tok WHERE lang = 'en'),
    big AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS c
            FROM tb GROUP BY 1, 2),
    uni AS (SELECT b.w1 AS w1, CAST(count(*) AS BIGINT) AS cw
            FROM tb GROUP BY 1),
    vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS V FROM
              (SELECT unnest(t) AS w FROM tok WHERE lang = 'en')),
    bg AS (SELECT doc_id, {_PPL_BIGRAMS_SQL} AS b FROM tok),
    p AS (SELECT doc_id,
                 ln((coalesce(big.c, 0) + 1.0)
                    / (coalesce(uni.cw, 0) + vocab.V)) AS lp
          FROM bg CROSS JOIN vocab
          LEFT JOIN big ON bg.b.w1 = big.w1 AND bg.b.w2 = big.w2
          LEFT JOIN uni ON bg.b.w1 = uni.w1),
    d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 -sum(lp) AS nll
          FROM p GROUP BY doc_id)
    SELECT tok.doc_id, tok.lang,
           CAST(len(tok.t) AS INTEGER)  AS n_tokens,
           round(d.nll / d.n_bigrams, 4) AS nll_per_token,
           CASE WHEN d.n_bigrams IS NULL THEN 'tail'
                WHEN d.nll / d.n_bigrams < {_PPL_HEAD_NLL} THEN 'head'
                WHEN d.nll / d.n_bigrams < {_PPL_TAIL_NLL} THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM tok LEFT JOIN d ON tok.doc_id = d.doc_id
    """,
    doc=(
        "CCNet-style LM quality filter (Wenzek et al. 2020): an add-1-"
        "smoothed bigram LM is trained on the target slice (lang='en') "
        "— p(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V) with context counts from "
        "the same bigram stream — and EVERY document is scored by per-"
        "token negative log-likelihood, then bucketed head/middle/tail "
        "(training keeps the head). Counts and vocab are exact "
        "integers; the LM table is bounded by observed bigrams and "
        "broadcasts here (at web-scale vocab it becomes a hash-bucket "
        "join keyed on w1 — same plan with the broadcast hint "
        "dropped). Determinism posture: per-bigram ln() of an exact "
        "integer ratio is one IEEE op per row; the per-DOC sum is "
        "order-dependent only at ~1e-13 absolute (small magnitudes), "
        "far inside the 4-decimal rounding — tolerance-checked like "
        "the cosine family. Docs with <2 tokens score null → 'tail'."
    ),
    tags=("text", "quality", "agg"),
)
def text_lm_perplexity_bucket(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    tok = materialization_barrier(
        docs.select(
            "doc_id", "lang", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
        ),
        barrier,
    )
    # ^ feeds the train counts, the vocab, AND the scoring explode —
    # without the barrier (fintech_etl_spark.barrier: reliable on
    # checkpoint-dir clusters) the tokenization would re-run three times
    bigrams = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(t[i-1] AS w1, t[i] AS w2))"
        ),
    ).otherwise(F.expr("cast(array() as array<struct<w1:string,w2:string>>)"))
    tb = (
        tok.filter(F.col("lang") == "en")
        .select(F.explode(bigrams).alias("b"))
        .select("b.w1", "b.w2")
    )
    big = materialization_barrier(
        tb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")), barrier
    )
    # context counts re-aggregate the (small) bigram table, not the
    # full token stream — one full-stream shuffle instead of two
    uni = big.groupBy("w1").agg(F.sum("c").alias("cw"))
    vocab = (
        tok.filter(F.col("lang") == "en")
        .select(F.explode("t").alias("w"))
        .agg(F.count_distinct("w").alias("V"))
    )
    bg = tok.select("doc_id", F.explode(bigrams).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    p = (
        bg.crossJoin(F.broadcast(vocab))
        .join(F.broadcast(big), ["w1", "w2"], "left")
        .join(F.broadcast(uni), ["w1"], "left")
        .select(
            "doc_id",
            F.log(
                (F.coalesce("c", F.lit(0)) + 1.0)
                / (F.coalesce("cw", F.lit(0)) + F.col("V"))
            ).alias("lp"),
        )
    )
    d = p.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), (-F.sum("lp")).alias("nll")
    )
    nllpt = F.col("nll") / F.col("n_bigrams")
    return tok.join(d, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.size("t").alias("n_tokens"),
        F.round(nllpt, 4).alias("nll_per_token"),
        F.when(F.col("n_bigrams").isNull(), "tail")
        .when(nllpt < _PPL_HEAD_NLL, "head")
        .when(nllpt < _PPL_TAIL_NLL, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )
