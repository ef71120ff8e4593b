"""Unit tests for the F1–F24 scalar pack, incl. the reference's edge
semantics (SURVEY.md §5: due-date rollovers, Excel serial dates,
first-dash strip)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.functions.scalars import (
    due_date,
    excel_serial_to_date,
    lpad4,
    strip_dashes,
    strip_non_digits,
)


def one(spark, expr, **cols):
    df = spark.createDataFrame([Row(**cols)])
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_excel_serial_epoch(spark):
    # serial 1 = 1899-12-31; 45292 = 2024-01-01 (Excel 1900 system)
    assert one(spark, excel_serial_to_date(F.col("s")), s=1) == datetime.date(1899, 12, 31)
    assert one(spark, excel_serial_to_date(F.col("s")), s=45292) == datetime.date(2024, 1, 1)


def test_lpad4(spark):
    assert one(spark, lpad4(F.col("v")), v="7") == "0007"
    assert one(spark, lpad4(F.col("v")), v="12345") == "2345"  # slice(-4) keeps last 4


def test_strip_dashes_first_only(spark):
    # the reference regex has no /g flag (src/parse.ts:88-90)
    assert one(spark, strip_dashes(F.col("v")), v="a-b-c") == "ab-c"
    assert one(spark, strip_dashes(F.col("v")), v="abc") == "abc"


def test_strip_non_digits(spark):
    assert one(spark, strip_non_digits(F.col("v")), v="G42x7") == "427"


@pytest.mark.parametrize(
    "bill,terms_type,days,expected",
    [
        # DAYSAFTERBILLDATE: plain day add
        (datetime.date(2024, 1, 15), "DAYSAFTERBILLDATE", 10, datetime.date(2024, 1, 25)),
        # OFFOLLOWINGMONTH: day N of next month
        (datetime.date(2024, 1, 15), "OFFOLLOWINGMONTH", 20, datetime.date(2024, 2, 20)),
        # OFFOLLOWINGMONTH with year rollover (src/helpers.ts:237-243)
        (datetime.date(2024, 12, 15), "OFFOLLOWINGMONTH", 5, datetime.date(2025, 1, 5)),
        # default: end of the following month (src/helpers.ts:248-256)
        (datetime.date(2024, 1, 15), None, None, datetime.date(2024, 2, 29)),  # leap
        (datetime.date(2024, 12, 2), None, None, datetime.date(2025, 1, 31)),
    ],
)
def test_due_date_terms(spark, bill, terms_type, days, expected):
    df = spark.createDataFrame(
        [(bill, terms_type, days)], "bill date, terms_type string, terms_days int"
    )
    got = df.select(
        due_date(F.col("bill"), F.col("terms_type"), F.col("terms_days")).alias("v")
    ).collect()[0]["v"]
    assert got == expected
