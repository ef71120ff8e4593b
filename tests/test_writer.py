"""Storage-layout sinks: partition pruning and audit write modes."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.sources.writer import (
    read_partitioned,
    write_json_audit,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "facts")
    df = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0), (3, "2024-01-02", 30.0)],
        "id long, day string, amount double",
    )
    write_partitioned(df, path, ["day"])
    back = read_partitioned(spark, path).filter(F.col("day") == "2024-01-01")
    assert back.count() == 2
    # the day filter must prune partitions, not scan-and-filter
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2024-01-01" in plan


def test_json_audit_write_modes(spark, tmp_path):
    path = str(tmp_path / "audit")
    df = spark.createDataFrame([(1, "ok")], "id long, status string")
    write_json_audit(df, path)
    assert spark.read.json(path).count() == 1
    # second write to the same path must refuse, not silently suffix
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        write_json_audit(df, path)
