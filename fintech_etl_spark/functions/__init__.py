from fintech_etl_spark.functions import rules

__all__ = ["rules"]
