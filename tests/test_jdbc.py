"""JDBC source tests (S4/S6). No JDBC driver ships in this container,
so these pin the option assembly and config-error handling, plus the
pushdown parity contract: the same Column filters the JDBC path relies
on reach the storage layer on the parquet twin (Catalyst pushes
filters into whichever source the DataFrame came from)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.sources.jdbc import (
    JdbcConfig,
    day_predicates,
    reader_options,
)

CFG = JdbcConfig(
    url="jdbc:postgresql://db.example/till",
    driver="org.postgresql.Driver",
    user="etl",
    password="secret",
)


def test_reader_options_table_form_pushdown_and_partitioning():
    opts = reader_options(
        CFG,
        table="charge",
        partition_column="date",
        lower_bound="2024-01-01",
        upper_bound="2024-12-31",
        num_partitions=32,
    )
    assert opts["dbtable"] == "charge"
    assert opts["pushDownPredicate"] == "true"
    assert opts["pushDownAggregate"] == "true"
    assert opts["pushDownLimit"] == "true"
    assert opts["partitionColumn"] == "date"
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "10000"
    assert opts["driver"] == "org.postgresql.Driver"


def test_reader_options_query_form_and_errors():
    opts = reader_options(CFG, query="SELECT id, amount FROM charge WHERE date = ?")
    assert "query" in opts and "dbtable" not in opts
    assert "pushDownPredicate" not in opts  # invalid on the query form
    with pytest.raises(ValueError, match="exactly one"):
        reader_options(CFG, table="charge", query="SELECT 1")
    with pytest.raises(ValueError, match="exactly one"):
        reader_options(CFG)
    with pytest.raises(ValueError, match="ALL of"):
        reader_options(CFG, table="charge", partition_column="date")
    with pytest.raises(ValueError, match="table= form"):
        reader_options(
            CFG,
            query="SELECT 1",
            partition_column="d",
            lower_bound=0,
            upper_bound=1,
            num_partitions=2,
        )


def test_day_predicates():
    assert day_predicates("date", ["2024-01-01", "2024-01-02"]) == [
        "date = DATE '2024-01-01'",
        "date = DATE '2024-01-02'",
    ]


def test_day_predicates_rejects_injection():
    # both arguments reach pushed-down SQL — malformed/hostile strings
    # must raise client-side, never travel to the remote database
    with pytest.raises(ValueError):
        day_predicates("date", ["2024-01-01' OR '1'='1"])
    with pytest.raises(ValueError):
        day_predicates("date", ["not-a-date"])
    with pytest.raises(ValueError):
        day_predicates("date; DROP TABLE charge", ["2024-01-01"])


def test_reader_builds_without_driver(spark):
    # Construction is lazy: options validate client-side; only .load()
    # would need the driver class.
    reader = spark.read.format("jdbc").options(**reader_options(CFG, table="charge"))
    assert reader is not None


def test_filter_parity_pushdown_on_parquet_twin(spark):
    """The Prisma-where equivalents (date + customer + type filters)
    must reach the storage scan — asserted on the parquet twin, the
    same DataFrame shape the JDBC load yields."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    df = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_custkey") == 7)
    ).select("o_orderkey", "o_totalprice")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters:" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "EqualTo(o_custkey,7)" in plan
