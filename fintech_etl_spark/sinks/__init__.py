from fintech_etl_spark.sinks.receipts import write_receipts_parquet
from fintech_etl_spark.sinks.webhook import WebhookSink

__all__ = ["WebhookSink", "write_receipts_parquet"]
