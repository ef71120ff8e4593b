"""Source connectors: parquet star schema, Excel positional grid,
binary files, and REST source/sink stubs."""

from xero_api_etl_utilities_spark.sources.parquet import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
