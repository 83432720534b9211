from fintech_etl_spark.operators.receipts import build_receipts, to_webhook_payloads

__all__ = ["build_receipts", "to_webhook_payloads"]
