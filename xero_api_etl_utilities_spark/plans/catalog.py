"""Central query/oracle catalog.

Each plans module contributes named (spark, sf_dir) -> DataFrame
builders plus their DuckDB oracle SQL. This module merges them into
the two dicts the driver contract (__spark_entry__.py) expects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from xero_api_etl_utilities_spark.plans import flagship

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str | Callable[[], str]] = {}


def register(
    name: str, fn: QueryFn, oracle: str | Callable[[], str] | None = None
) -> None:
    """``oracle`` may be a SQL string or a zero-arg callable returning
    one — callables defer data-dependent oracle generation (e.g. the
    IVF oracle inlines centroids trained from the sf0.01 parquet) to
    ``oracle_sql()`` time, keeping ``queries()`` import cheap for
    consumers like bench that never read oracles."""
    if name in _QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


register("daily_pnl_rollup", flagship.daily_pnl_rollup, flagship.FLAGSHIP_ORACLE)


def _load_extra_modules() -> None:
    """Import catalog-contributing modules (they call register())."""
    from xero_api_etl_utilities_spark.plans import (  # noqa: F401
        relational,
        extensions,
        windows_extra,
        tpch_like,
        corpus_ops,
        analytics_extra,
    )


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        _load_extra_modules()
        _loaded = True


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    out: dict[str, str] = {}
    for name, o in _ORACLES.items():
        if callable(o):
            o = o()
            _ORACLES[name] = o  # cache the generated SQL
        out[name] = o
    return out
