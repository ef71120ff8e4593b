"""EP1 end-to-end: workbook grid → parse → verify → gates → documents
→ idempotent delivery, plus the as-of join operator."""

from __future__ import annotations

import datetime
import json
import os
from decimal import Decimal

import pytest

from xero_api_etl_utilities_spark.operators.asof import asof_join_backward
from xero_api_etl_utilities_spark.operators.quality import QualityGateError
from xero_api_etl_utilities_spark.plans.pipeline import (
    EntityConfig,
    deliver,
    run_daily_import,
)
from xero_api_etl_utilities_spark.sources.excel_grid import grid_from_rows


def _cell_row(src, idx, **cells):
    return (
        src, idx,
        cells.get("A"), cells.get("B"), cells.get("C"), cells.get("D"),
        cells.get("E"), cells.get("F"), cells.get("G"),
    )


@pytest.fixture()
def fixtures(spark):
    grid = grid_from_rows(
        spark,
        [
            _cell_row("DD 01.xls", 3, B="45292"),  # 2024-01-01
            _cell_row("DD 01.xls", 21, C="Amount"),
            _cell_row("DD 01.xls", 22, C="100.50", D="10643", E="12"),
            _cell_row("DD 01.xls", 23, C="59.50", D="45678", E="13"),
            _cell_row("DD 01.xls", 26, C="Amount"),
            _cell_row("DD 01.xls", 27, C="-40.00", D="10643", E="7"),
            _cell_row("DD 01.xls", 28, D="Total Charges"),
            _cell_row("DD 01.xls", 31, F="Total Debtors", G="120.00"),
        ],
    )
    d = datetime.date(2024, 1, 1)
    t = datetime.datetime(2024, 1, 1, 9, 30)
    charge_table = spark.createDataFrame(
        [
            (d, Decimal("100.50"), "10643", "0012", "T1", t),
            (d, Decimal("59.50"), "45678", "0013", "T1", t),
            (d, Decimal("-40.00"), "10643", "0007", "T2", t),
        ],
        "date date, amount decimal(12,2), customer_id string, seq_no string,"
        " terminal_id string, tran_timestamp timestamp",
    )
    customer_dim = spark.createDataFrame(
        [
            ("10643", "xero-10643", "DAYSAFTERBILLDATE", 14),
            ("45678", "xero-45678", None, None),
        ],
        "customer_id string, xero_id string, terms_type string, terms_days int",
    )
    return grid, charge_table, customer_dim


def test_daily_import_end_to_end(spark, fixtures, tmp_path):
    grid, charge_table, customer_dim = fixtures
    cfg = EntityConfig(entity="pw", transport_root=str(tmp_path / "xero"))
    out = run_daily_import(grid, charge_table, customer_dim, cfg)

    assert out["unverified"].count() == 0
    assert out["matched"].count() == 3
    assert out["all_balanced"] is True

    docs = {r["reference"]: r for r in out["documents"].collect()}
    assert docs["T1/0012"]["doc_type"] == "ACCREC"
    assert docs["T1/0012"]["contact_id"] == "xero-10643"
    assert docs["T1/0012"]["doc_due_date"] == "2024-01-15"
    assert docs["T2/0007"]["doc_type"] == "ACCRECCREDIT"  # negative amount
    assert docs["T1/0013"]["line_items"][0]["account_code"] == "42010"  # 45678 routing

    # delivery is idempotent across retries (S8 discipline)
    deliver(out["payloads"], cfg)
    deliver(out["payloads"], cfg)
    with open(os.path.join(cfg.transport_root, "invoices.out.jsonl")) as f:
        refs = sorted(json.loads(line)["reference"] for line in f)
    assert refs == ["T1/0012", "T1/0013", "T2/0007"]


def test_daily_import_unverified_aborts(spark, fixtures):
    grid, charge_table, customer_dim = fixtures
    # remove one DB row → that workbook charge becomes unverified
    broken = charge_table.filter("seq_no <> '0012'")
    cfg = EntityConfig(entity="wb", transport_root="/tmp/unused")
    with pytest.raises(QualityGateError, match="unverified"):
        run_daily_import(grid, broken, customer_dim, cfg)
    # non-strict mode: same pipeline surfaces the rows instead
    out = run_daily_import(grid, broken, customer_dim, cfg, strict=False)
    assert out["unverified"].count() == 1
    assert out["matched"].count() == 2


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [
            (1, 10, datetime.datetime(2024, 1, 1, 12, 0)),
            (2, 10, datetime.datetime(2024, 1, 1, 9, 0)),   # before any right
            (3, 20, datetime.datetime(2024, 1, 1, 12, 0)),
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (101, 10, datetime.datetime(2024, 1, 1, 10, 0)),
            (102, 10, datetime.datetime(2024, 1, 1, 11, 30)),
            (103, 20, datetime.datetime(2024, 1, 1, 12, 0)),  # equal ts matches
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    got = {
        r["event_id"]: (r["event_id_right"], r["ts_right"])
        for r in asof_join_backward(left, right, on="user_id", right_cols=["event_id"]).collect()
    }
    assert got[1][0] == 102   # latest at-or-before 12:00
    assert got[2][0] is None  # nothing before 9:00
    assert got[3][0] == 103   # equal timestamp matches (>= semantics)


def test_validate_entity_config():
    import pytest

    from xero_api_etl_utilities_spark.plans.pipeline import (
        ConfigError,
        EntityConfig,
        validate_entity_config,
    )

    ok = EntityConfig(entity="pw", transport_root="/tmp/x")
    assert validate_entity_config(ok) is ok
    with pytest.raises(ConfigError) as exc:
        validate_entity_config(
            EntityConfig(entity="zz", transport_root=" ", expense_gl_code="abc")
        )
    msg = str(exc.value)  # every problem reported at once
    assert "entity" in msg and "transport_root" in msg and "expense_gl_code" in msg


def test_fan_out_single_materialization(spark):
    """Five consumers over one source (the reference's Promise.all
    shape): each consumer's plan reads the in-memory cache, results
    are correct, cache is released afterwards."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from xero_api_etl_utilities_spark.plans.pipeline import fan_out

    src = spark.range(0, 1000).withColumn("v", F.col("id") % 7)

    plans = {}

    def consumer(agg_fn, name):
        def run(df):
            buf = io.StringIO()
            with redirect_stdout(buf):
                agg_fn(df).explain()
            plans[name] = buf.getvalue()
            return agg_fn(df).collect()

        return run

    out = fan_out(
        src,
        {
            "n": consumer(lambda d: d.agg(F.count("*").alias("n")), "n"),
            "s": consumer(lambda d: d.agg(F.sum("v").alias("s")), "s"),
            "mx": consumer(lambda d: d.agg(F.max("id").alias("m")), "mx"),
            "grp": consumer(lambda d: d.groupBy("v").count(), "grp"),
            "f": consumer(lambda d: d.filter(F.col("v") == 0), "f"),
        },
    )
    assert out["n"][0]["n"] == 1000
    assert out["mx"][0]["m"] == 999
    assert len(out["grp"]) == 7
    assert all("InMemoryTableScan" in p for p in plans.values())
    assert src.storageLevel.useMemory is False  # released
