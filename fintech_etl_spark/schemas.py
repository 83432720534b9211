"""Declared schemas for every table the engine touches.

The reference infers everything with ``pd.read_csv`` (no dtype spec,
see /root/reference/stream/util.py:97-100) which creates the float-UPC
hazard documented in SURVEY §1.5. We declare the input schema instead:
deterministic types at any scale, and the CSV scan can prune columns.

UPC columns are deliberately StringType (SURVEY §1.5: the reference's
``"123.0"`` zfill artifact is a pandas inference accident, not intent).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Vendor-invoice CSV (Fintech.net export format) — SURVEY §1.3.
# Column names are the exact CSV headers, including the space-free
# `DepositAdjustmentTotal` (real header, /root/reference/rules/price.py:30-32).
# ---------------------------------------------------------------------------

INVOICE_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Invoice Number", T.StringType(), True),
        T.StructField("Vendor Name", T.StringType(), True),
        T.StructField("Retailer Name", T.StringType(), True),
        T.StructField("Retailer VendorID", T.StringType(), True),
        T.StructField("Vendor Store Number", T.StringType(), True),
        T.StructField("Retailer Store Number", T.StringType(), True),
        T.StructField("Fintech Process Date", T.StringType(), True),
        T.StructField("Invoice Date", T.StringType(), True),
        T.StructField("Invoice DueDate", T.StringType(), True),
        T.StructField("Invoice Amount", T.StringType(), True),
        T.StructField("Invoice Item Count", T.StringType(), True),
        T.StructField("Quantity", T.StringType(), True),
        T.StructField("Packs Per Case", T.StringType(), True),
        T.StructField("Units Per Pack", T.StringType(), True),
        T.StructField("Unit Of Measure", T.StringType(), True),
        T.StructField("GL Code", T.StringType(), True),
        T.StructField("Product Class", T.StringType(), True),
        T.StructField("Product Description", T.StringType(), True),
        T.StructField("Product Number", T.StringType(), True),
        T.StructField("Product Volume", T.StringType(), True),
        T.StructField("Extended Price", T.StringType(), True),
        T.StructField("Discount Adjustment Total", T.StringType(), True),
        T.StructField("DepositAdjustmentTotal", T.StringType(), True),
        T.StructField("Miscellaneous Adjustment Total", T.StringType(), True),
        T.StructField("Tax Adjustment Total", T.StringType(), True),
        T.StructField("Delivery Adjustment Total", T.StringType(), True),
        T.StructField("Pack UPC", T.StringType(), True),
        T.StructField("Clean UPC", T.StringType(), True),
        T.StructField("Case UPC", T.StringType(), True),
    ]
)
# Numeric-ish columns stay StringType at the scan and are coerced by the
# null-tolerant rule expressions (functions/rules.py safe_num): the
# reference accepts arbitrary garbage in any cell and degrades to a
# default (/root/reference/rules/base.py:25-31); a typed scan would
# instead null the whole row in PERMISSIVE mode column-by-column and
# diverge on mixed-garbage files.

# ---------------------------------------------------------------------------
# Receipt document — SURVEY §1.4 (/root/reference/stream/schema.py:6-35).
# ---------------------------------------------------------------------------

LINE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("qty", T.LongType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("discount", T.DoubleType(), True),
        T.StructField("upc", T.StringType(), True),
        T.StructField("sku", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("unitOfMeasure", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("tax", T.DoubleType(), True),
        T.StructField("notes", T.StringType(), True),
        T.StructField("packs_per_case", T.LongType(), True),
        T.StructField("units_per_pack", T.LongType(), True),
    ]
)

RECEIPT_SCHEMA = T.StructType(
    [
        T.StructField("receipt_id", T.StringType(), True),
        T.StructField("vendor", T.StringType(), True),
        T.StructField("transaction_date", T.DateType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
        T.StructField("sales_tax", T.DoubleType(), True),
        T.StructField("subtotal", T.DoubleType(), True),
        T.StructField("item_count", T.IntegerType(), True),
        T.StructField("line_items", T.ArrayType(LINE_ITEM_SCHEMA), True),
        T.StructField("source_file", T.StringType(), True),
        T.StructField("processed_at", T.StringType(), True),
        T.StructField("gcs_bucket", T.StringType(), True),
        T.StructField("gcs_path", T.StringType(), True),
        T.StructField("document_id", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver star schema (TESTDATA.md) — declared so streaming readers and
# tests never rely on inference.
# ---------------------------------------------------------------------------

STAR_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TABLE_NAMES = tuple(STAR_SCHEMAS)

# Multimodal asset column family — SURVEY north star. Media payloads are
# opaque binary; everything the engine needs to plan with lives in typed
# metadata so Catalyst can prune/partition without touching bytes.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)
