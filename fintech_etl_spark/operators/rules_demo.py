"""Business-rule expressions exercised through the DuckDB oracle.

The vendor-invoice pipeline runs on CSV fixtures (pinned by golden
tests in tests/), but the driver's correctness gate only sees
``queries()`` — so this module routes the §2.3 rule expressions over
star-schema columns with equivalent ANSI SQL, proving the column
semantics (null-tolerant casts, trim/upper, lpad-14 UPC shaping,
contains-chain categorization, notes assembly) against a second engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.functions import rules as R
from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table


@register(
    "rules_battery",
    """
    SELECT p_partkey,
           upper(trim(coalesce(p_name, '')))                       AS norm_name,
           coalesce(trim(p_brand), 'Unknown Vendor')               AS vendor_default,
           substr(lpad(CAST(p_partkey AS VARCHAR), 14, '0'), 1, 14) AS upc14,
           (regexp_matches(CAST(p_partkey AS VARCHAR), '^[0-9]+$')
             AND length(CAST(p_partkey AS VARCHAR)) <= 14)         AS upc_valid,
           CASE WHEN upper(trim(p_type)) LIKE '%ECONOMY%' THEN 'BEER'
                WHEN upper(trim(p_type)) LIKE '%PREMIUM%' THEN 'WINE'
                WHEN upper(trim(p_type)) LIKE '%STANDARD%' THEN 'SPIRITS'
                ELSE 'MISCELLANEOUS' END                           AS category_like,
           CAST(coalesce(TRY_CAST(p_retailprice AS DOUBLE), 0.0) AS DOUBLE) AS safe_price
    FROM part
    """,
    doc=(
        "Rule column expressions (F1/F2/F15/F16/F18/F3-shape) against "
        "the oracle: safe numeric coercion, norm_text, zfill-14 UPC "
        "shaping, digits-validation, ordered contains-chain "
        "categorization — the same Column factories the receipt "
        "pipeline uses, on oracle-checkable columns."
    ),
    tags=("rules", "scalar"),
)
def rules_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    key_str = F.col("p_partkey").cast("string")
    pt = R.norm_text("p_type")
    category_like = (
        F.when(pt.contains("ECONOMY"), "BEER")
        .when(pt.contains("PREMIUM"), "WINE")
        .when(pt.contains("STANDARD"), "SPIRITS")
        .otherwise("MISCELLANEOUS")
    )
    return part.select(
        "p_partkey",
        R.norm_text("p_name").alias("norm_name"),
        R.vendor_name("p_brand").alias("vendor_default"),
        F.lpad(key_str, 14, "0").alias("upc14"),
        R.validate_upc(key_str).alias("upc_valid"),
        category_like.alias("category_like"),
        R.safe_num("p_retailprice", 0.0).alias("safe_price"),
    )


@register(
    "rules_notes_assembly",
    """
    SELECT l_orderkey, l_linenumber, l_partkey,
           nullif(concat_ws('; ',
               CASE WHEN l_discount <> 0 THEN 'Discount: ' || CAST(round(l_discount, 4) AS VARCHAR) END,
               CASE WHEN l_tax <> 0      THEN 'Tax: '      || CAST(round(l_tax, 4)      AS VARCHAR) END
           ), '') AS notes
    FROM lineitem
    """,
    doc=(
        "Notes assembly (F23 shape): only non-zero terms, '; '-joined, "
        "all-zero → NULL — concat_ws skipping null whens, cross-checked. "
        "Values rounded so both engines render identical decimal text."
    ),
    tags=("rules", "scalar"),
)
def rules_notes_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def term(label: str, col: str) -> F.Column:
        v = F.round(F.col(col), 4)
        return F.when(v != 0, F.concat(F.lit(f"{label}: "), v.cast("string")))

    joined = F.concat_ws("; ", term("Discount", "l_discount"), term("Tax", "l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.nullif(joined, F.lit("")).alias("notes"),
    )
