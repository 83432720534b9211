"""fintech_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
NateDemi/fintech-etl (a pandas/FastAPI vendor-invoice ETL microservice),
widened into a full relational + LLM-data-pipeline engine designed for
100 TB scale:

- ``schemas``     — declared StructTypes for every table (no inference).
- ``functions``   — the reference's business rules as pure Column
                    expressions (no UDFs in the hot path).
- ``sources``     — CSV / parquet readers, star-schema table loader.
- ``operators``   — receipts pipeline, relational query surface, dedup,
                    similarity search, text analysis, multimodal plumbing.
- ``streaming``   — Structured Streaming intake + idempotent sinks.

All dataflow is declared through the DataFrame/SQL API so Catalyst
supplies pushdown, pruning, partial aggregation, AQE and codegen.
"""

__version__ = "0.1.0"
