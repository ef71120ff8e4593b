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


def test_bucketed_join_elides_shuffle(spark, sf_dir, tmp_path):
    """The 100 TB co-location claim, proven at the plan level: both
    sides bucketed by the join key -> SortMergeJoin with ZERO Exchange
    nodes, and the same row count as the shuffled plain-parquet join."""
    import contextlib
    import io

    from xero_api_etl_utilities_spark.sources.writer import write_bucketed_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/wh'")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed_table(
            orders, "bdemo.o_b", ["o_orderkey"], num_buckets=8,
            sort_by=["o_orderkey"],
        )
        write_bucketed_table(
            li, "bdemo.l_b", ["l_orderkey"], num_buckets=8,
            sort_by=["l_orderkey"],
        )
        a, b = spark.table("bdemo.o_b"), spark.table("bdemo.l_b")
        joined = a.join(b, a["o_orderkey"] == b["l_orderkey"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing elided BOTH shuffles
        assert joined.count() == orders.join(
            li, orders["o_orderkey"] == li["l_orderkey"]
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")


def test_versioned_run_probes_next_free_dir(spark, tmp_path):
    from xero_api_etl_utilities_spark.sources.writer import write_versioned_run

    base = str(tmp_path / "audit")
    df = spark.createDataFrame([(1, "x")], "id long, note string")
    assert write_versioned_run(df, base) == base
    assert write_versioned_run(df, base) == f"{base}_v2"
    assert write_versioned_run(df, base) == f"{base}_v3"
    # each version holds a full copy
    assert spark.read.json(f"{base}_v2").count() == 1


def test_versioned_run_exhaustion_raises(spark, tmp_path):
    from xero_api_etl_utilities_spark.sources.writer import write_versioned_run

    base = str(tmp_path / "audit")
    df = spark.createDataFrame([(1,)], "id long")
    write_versioned_run(df, base)
    write_versioned_run(df, base)
    with pytest.raises(RuntimeError, match="no free version"):
        write_versioned_run(df, base, max_versions=2)


def test_compact_dir_reduces_files(spark, tmp_path):
    """Many small files collapse to the byte-target count; data
    survives bit-exact and re-compaction is a stable no-op."""
    import glob

    from xero_api_etl_utilities_spark.sources.writer import compact_dir

    p = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(64).write.parquet(p)
    assert len(glob.glob(f"{p}/*.parquet")) == 64
    before = spark.read.parquet(p).groupBy().sum("id").collect()[0][0]

    n = compact_dir(spark, p, target_file_bytes=1 << 20)
    files = glob.glob(f"{p}/*.parquet")
    assert len(files) == n < 64
    assert spark.read.parquet(p).groupBy().sum("id").collect()[0][0] == before
    # idempotent: same target -> same count
    assert compact_dir(spark, p, target_file_bytes=1 << 20) == n


def test_versioned_run_reraises_non_collision_errors(spark, tmp_path):
    """An AnalysisException that is NOT a path collision (here: CSV
    cannot serialize an array column) must surface immediately instead
    of burning every probe and reporting 'no free version'."""
    from pyspark.errors import AnalysisException

    from xero_api_etl_utilities_spark.sources.writer import write_versioned_run

    df = spark.createDataFrame([(1, [1, 2])], "id long, xs array<long>")
    with pytest.raises(AnalysisException):
        write_versioned_run(df, str(tmp_path / "bad"), fmt="csv")
    # no version directories were probed into existence
    assert not (tmp_path / "bad").exists()


def test_compact_dir_recovers_interrupted_swap(spark, tmp_path):
    """Crash between the two publish renames strands data in
    .precompact; the next compact_dir restores and completes."""
    import glob
    import os

    from xero_api_etl_utilities_spark.sources.writer import compact_dir

    p = str(tmp_path / "frag")
    spark.range(0, 1000).repartition(16).write.parquet(p)
    total = spark.read.parquet(p).groupBy().sum("id").collect()[0][0]
    # simulate the crash window: old dir renamed away, new never landed
    os.rename(p, f"{p}.precompact")
    assert not os.path.isdir(p)

    n = compact_dir(spark, p, target_file_bytes=1 << 30)
    assert os.path.isdir(p) and not os.path.isdir(f"{p}.precompact")
    assert len(glob.glob(f"{p}/*.parquet")) == n == 1
    assert spark.read.parquet(p).groupBy().sum("id").collect()[0][0] == total
