"""Parquet star-schema source (the engine's primary batch source).

The reference reads facts/dims from Postgres via per-query select lists
(/root/reference/src/queries.ts:12-121); here every table is a parquet
scan whose projection and predicates Catalyst pushes into the reader
(`PushedFilters`/`ReadSchema` in `.explain`), which is the scan
discipline that survives a 100 TB table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table as a DataFrame (lazy parquet scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table; values are lazy scans so unused ones cost nothing."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
