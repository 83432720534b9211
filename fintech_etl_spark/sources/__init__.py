from fintech_etl_spark.sources.tables import load_table, load_tables, register_views
from fintech_etl_spark.sources.invoice_csv import read_invoice_csv

__all__ = ["load_table", "load_tables", "register_views", "read_invoice_csv"]
