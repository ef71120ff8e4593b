"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``xero_api_etl_utilities_spark``; this module
is only the wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xero_api_etl_utilities_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (daily P&L roll-up) on /root/testdata/sf0.001."""
    from xero_api_etl_utilities_spark.plans.flagship import daily_pnl_rollup

    return daily_pnl_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each queries() entry."""
    return catalog.oracle_sql()
