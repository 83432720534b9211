from fintech_etl_spark.sinks.landing import land_raw_files
from fintech_etl_spark.sinks.receipts import (
    SchemaEvolutionError,
    read_receipts,
    write_receipts_parquet,
)
from fintech_etl_spark.sinks.webhook import WebhookSink

__all__ = [
    "SchemaEvolutionError",
    "WebhookSink",
    "land_raw_files",
    "read_receipts",
    "write_receipts_parquet",
]
