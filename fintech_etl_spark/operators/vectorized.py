"""Arrow-vectorized Python operators: the sanctioned escape hatch.

The engine's rule is no Python in the hot path — every reference rule
compiles to JVM column expressions. When Python is genuinely needed
(ML featurization, codec calls, numpy math), the right shape is an
Arrow-batched Pandas UDF / applyInPandas, never a row-at-a-time UDF.
These two operators demonstrate that plumbing with oracle-checkable
semantics, so the pattern itself is under test:

- scalar ``pandas_udf``: whole-column numpy arithmetic per batch;
- grouped ``applyInPandas``: per-group standardization where the
  group must be materialized together (the grouped-map contract).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table


def _margin_kernel(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized per-batch arithmetic (numpy under the hood): the
    Arrow transfer amortizes Python overhead over whole columns.
    No rounding anywhere in this query: numpy and the oracle perform
    the same IEEE ops in the same order, so the raw doubles are
    bit-identical, while each engine's round() disagrees on short
    decimal boundaries (Spark rounds the shortest decimal string,
    DuckDB the binary value)."""
    return price * (1.0 - discount) * (1.0 + tax)


@register(
    "vectorized_margin_score",
    """
    SELECT l_orderkey, l_linenumber, l_partkey,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS margin
    FROM lineitem
    """,
    doc=(
        "Scalar Pandas UDF over Arrow batches — deliberately a formula "
        "SQL can mirror, so the Python batch path itself is what the "
        "oracle verifies. ~100× a row-at-a-time Python UDF; still the "
        "slow path vs the pure-Column twin (q1's sum_charge)."
    ),
    tags=("pandas_udf",),
)
def vectorized_margin_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # The udf is created here, not at module import: a module-level
    # @pandas_udf needs an active session, which breaks worker-side
    # re-import of this module when sibling kernels are pickled.
    margin = pandas_udf(_margin_kernel, "double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        margin("l_extendedprice", "l_discount", "l_tax").alias("margin"),
    )


def _zscore_partition(pdfs) -> "pd.DataFrame":
    """Partition-map kernel: vectorized per-customer standardization for
    EVERY group in the partition in one Python call.

    The naive shape here is ``groupBy(key).applyInPandas`` — but that
    invokes Python once per group, and at 15k customers × 10 orders the
    ~1 ms/call overhead dominates (measured 14 s at sf0.1 vs 0.6 s for
    this form). With high-cardinality/small groups the scalable pattern
    is: hash-repartition on the key (co-locates each group), then ONE
    mapInPandas call per partition with a cythonized groupby-transform
    inside. Batches are concatenated first because Arrow may split a
    partition into multiple batches mid-group; memory stays bounded by
    partition size, which the repartition controls."""
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if pdf.empty:
        yield pdf.assign(z=pd.Series(dtype="float64"))[
            ["o_custkey", "o_orderkey", "z"]
        ]
        return
    g = pdf.groupby("o_custkey")["o_totalprice"]
    mu = g.transform("mean")
    sd = g.transform("std")  # ddof=1, matches stddev_samp
    n = g.transform("count")
    out = pdf[["o_custkey", "o_orderkey"]].copy()
    # unrounded: JVM-side F.round matches the oracle's half-up rounding
    out["z"] = ((pdf["o_totalprice"] - mu) / sd).where(n > 1, 0.0)
    yield out


@register(
    "grouped_zscore_applyinpandas",
    """
    SELECT o_custkey, o_orderkey,
           CASE WHEN count(*) OVER w > 1
                THEN round((o_totalprice - avg(o_totalprice) OVER w)
                           / stddev_samp(o_totalprice) OVER w, 4)
                ELSE 0.0 END AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    """,
    doc=(
        "Grouped standardization through the Arrow Python path, shaped "
        "for high group cardinality: hash-repartition on the key + one "
        "mapInPandas call per partition with a vectorized groupby inside "
        "(per-group applyInPandas measured 23× slower at 15k tiny "
        "groups — see _zscore_partition). The oracle computes the same "
        "standardization with window functions — also the pure-SQL plan "
        "you'd prefer when the kernel IS expressible; the operator "
        "exists for when it isn't."
    ),
    tags=("pandas_udf", "window"),
)
def grouped_zscore_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    out = orders.repartition("o_custkey").mapInPandas(
        _zscore_partition, "o_custkey long, o_orderkey long, z double"
    )
    return out.withColumn("z", F.round("z", 4))


# ---------------------------------------------------------------------------
# Sequence packing — LLM pretraining data prep
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per packed training sequence


def _pack_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy first-fit-decreasing packing of one shard's documents into
    fixed token-budget sequences. Runs per (source, shard) group, so
    each Python invocation sees a bounded slice regardless of corpus
    size."""
    budget = int(pdf["budget"].iloc[0])
    docs = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
    bins: list[tuple[int, list[int], int]] = []  # (free, doc_ids, n_docs)
    for doc_id, n in zip(docs["doc_id"], docs["n_tokens"]):
        n = int(n)
        placed = False
        for i, (free, ids, nd) in enumerate(bins):
            if n <= free:
                bins[i] = (free - n, ids + [int(doc_id)], nd + 1)
                placed = True
                break
        if not placed:
            # oversize docs get a dedicated (overflowing) sequence —
            # truncation is the tokenizer's job downstream, not the packer's
            bins.append((max(budget - n, 0), [int(doc_id)], 1))
    return pd.DataFrame(
        {
            "source": pdf["source"].iloc[0],
            "seq_id": range(len(bins)),
            "n_docs": [nd for _, _, nd in bins],
            "n_tokens": [budget - free for free, _, _ in bins],
            # serialized (placement order) so the output is flat-
            # hashable by the cross-engine comparator — array columns
            # crash a pandas-canonicalizing harness
            "doc_ids": [",".join(str(i) for i in ids) for _, ids, _ in bins],
        }
    )


def _ffd_oracle() -> str:
    """Greedy FFD replayed as a DuckDB recursive CTE: one recursion
    step per document (sorted tokens-desc, doc_id-asc within source),
    carrying the bins' free capacities and the placement list as LIST
    state. ``nullif(..., 0)`` because list_position signals a miss as
    0 here."""
    pos = (
        "nullif(list_position("
        "list_transform(f.frees, x -> x >= o.n_tokens), true), 0)"
    )
    b = _PACK_BUDGET
    return rf"""
    WITH RECURSIVE
    d AS (SELECT source, doc_id,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
          FROM documents),
    ord AS (SELECT source, doc_id, n_tokens,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_tokens DESC, doc_id) AS step,
                  count(*) OVER (PARTITION BY source) AS n_steps
            FROM d),
    ffd AS (
        SELECT source, CAST(0 AS BIGINT) AS step, n_steps,
               CAST([] AS BIGINT[]) AS frees,
               CAST([] AS STRUCT(doc_id BIGINT, bin BIGINT)[]) AS assign
        FROM (SELECT DISTINCT source, n_steps FROM ord)
        UNION ALL
        SELECT f.source, f.step + 1, f.n_steps,
               CASE WHEN {pos} IS NULL
                    THEN list_append(f.frees, greatest({b} - o.n_tokens, 0))
                    ELSE list_transform(f.frees,
                         (x, i) -> CASE WHEN i = {pos} THEN x - o.n_tokens ELSE x END)
               END,
               list_append(f.assign,
                   {{'doc_id': o.doc_id,
                     'bin': CAST(coalesce({pos}, len(f.frees) + 1) AS BIGINT)}})
        FROM ffd f
        JOIN ord o ON o.source = f.source AND o.step = f.step + 1
        WHERE f.step < f.n_steps
    ),
    final AS (SELECT source, frees, assign FROM ffd WHERE step = n_steps),
    flat AS (SELECT source, i, assign[i].doc_id AS doc_id,
                    assign[i].bin AS bin, frees
             FROM final, unnest(generate_series(1, len(assign))) t(i))
    SELECT source,
           bin - 1                                 AS seq_id,
           CAST(count(*) AS BIGINT)                AS n_docs,
           CAST({b} - frees[bin] AS BIGINT)        AS n_tokens,
           string_agg(doc_id::VARCHAR, ',' ORDER BY i) AS doc_ids
    FROM flat
    GROUP BY source, bin, frees
"""


@register(
    "pack_sequences",
    _ffd_oracle(),
    doc=(
        "Sequence packing for pretraining: greedy first-fit-decreasing "
        "of documents into fixed token-budget rows (budget=256 here). "
        "Token counts are computed JVM-side; only the packing decision "
        "runs in Python, per (source) group via applyInPandas, so the "
        "work distributes by source shard and each group is bounded. "
        "At 100 TB the group key becomes (source, hash-shard) to cap "
        "group size; the kernel is unchanged. The DuckDB oracle replays "
        "the exact greedy sequence as a recursive CTE, so even this "
        "order-sensitive kernel is value-checked bin-for-bin."
    ),
    tags=("pandas_udf", "text"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.lit(_PACK_BUDGET).alias("budget"),
    )
    return with_tokens.groupBy("source").applyInPandas(
        _pack_kernel,
        "source string, seq_id long, n_docs long, n_tokens long, doc_ids string",
    )
