"""Semantics pins for the r12 wave's negated-funnel pattern (X168).

The oracle gate proves Spark == DuckDB on the generated events table;
these cases pin the CLASSIFICATION RULES themselves on crafted inputs
where the generated data may never exercise the edge: the exclusion
term, the 7-day window boundary, error-before-view innocence, and the
same-timestamp tie resolved by event_id on both sides of the compare.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from xero_api_etl_utilities_spark.plans.wave12 import events_funnel_exclusion

_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _t(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, 0) + dt.timedelta(seconds=sec)


def _run(spark, rows):
    events = spark.createDataFrame(
        [(i, ts, uid, et, 0.0, "{}") for i, (uid, ts, et) in enumerate(rows)],
        _SCHEMA,
    )
    with tempfile.TemporaryDirectory() as d:
        events.write.parquet(os.path.join(d, "events.parquet"))
        return {
            r["user_id"]: (
                r["n_purchases"],
                r["n_converted"],
                r["first_conversion_ts"],
            )
            for r in events_funnel_exclusion(spark, d).collect()
        }


def test_exclusion_and_window_rules(spark):
    rows = [
        # user 1: error strictly between view and purchase → blocked
        (1, _t(1), "view"),
        (1, _t(2), "error"),
        (1, _t(3), "purchase"),
        # user 2: clean view → purchase within 7 days → converts
        (2, _t(1), "view"),
        (2, _t(3), "purchase"),
        # user 3: error BEFORE the view is innocent → converts
        (3, _t(1), "error"),
        (3, _t(2), "view"),
        (3, _t(4), "purchase"),
        # user 4: purchase 8 days after the view → outside the window
        (4, _t(1), "view"),
        (4, _t(9), "purchase"),
        # user 5: purchase with no view at all → counted, not converted
        (5, _t(1), "purchase"),
        # user 6: blocked first purchase, then a fresh view redeems the
        # second → first_conversion_ts is the SECOND purchase
        (6, _t(1), "view"),
        (6, _t(2), "error"),
        (6, _t(3), "purchase"),
        (6, _t(4), "view"),
        (6, _t(5), "purchase"),
    ]
    got = _run(spark, rows)
    assert got[1] == (1, 0, None)
    assert got[2] == (1, 1, _t(3))
    assert got[3] == (1, 1, _t(4))
    assert got[4] == (1, 0, None)
    assert got[5] == (1, 0, None)
    assert got[6] == (2, 1, _t(5))
    # exactly-7-days lands ON the boundary → still inside (<=)
    boundary = _run(
        spark, [(7, _t(1), "view"), (7, _t(8), "purchase")]
    )
    assert boundary[7] == (1, 1, _t(8))


def test_same_timestamp_tie_resolved_by_event_id(spark):
    # rows get event_id = list index: the error (id 0) sorts BEFORE the
    # view (id 1) at the identical timestamp, so it does not block
    innocent = _run(
        spark,
        [
            (1, _t(1), "error"),
            (1, _t(1), "view"),
            (1, _t(2), "purchase"),
        ],
    )
    assert innocent[1] == (1, 1, _t(2))
    # flipped ids: the error (id 1) sorts AFTER the view (id 0) at the
    # same timestamp → strictly between → blocks
    blocked = _run(
        spark,
        [
            (1, _t(1), "view"),
            (1, _t(1), "error"),
            (1, _t(2), "purchase"),
        ],
    )
    assert blocked[1] == (1, 0, None)


def test_users_without_purchases_are_absent(spark):
    got = _run(
        spark,
        [
            (1, _t(1), "view"),
            (2, _t(1), "view"),
            (2, _t(2), "purchase"),
        ],
    )
    assert set(got) == {2}


# ---------------------------------------------------------------------------
# streaming twin: funnel_exclusion_stream parity + cross-batch state
# ---------------------------------------------------------------------------

import pyspark.sql.types as T  # noqa: E402

_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _run_stream(spark, drop, ckpt, out):
    from xero_api_etl_utilities_spark.streaming.filestream import (
        stream_drop_dir,
    )
    from xero_api_etl_utilities_spark.streaming.stateful import (
        funnel_exclusion_stream,
    )

    q = (
        funnel_exclusion_stream(stream_drop_dir(spark, drop, _STREAM_SCHEMA))
        .writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def _final_per_user(rows):
    last = {}
    for r in rows:
        k = (r["at_us"], r["event_id"])
        if r["user_id"] not in last or k > last[r["user_id"]][0]:
            last[r["user_id"]] = (
                k,
                (r["n_purchases"], r["n_converted"], r["first_conversion_us"]),
            )
    return {u: v for u, (_, v) in last.items()}


def test_funnel_exclusion_stream_state_crosses_batches(spark, tmp_path):
    drop, ckpt, out = (
        str(tmp_path / "drop"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    # batch 1: user 1 views then errors — no emission (no purchase yet)
    spark.createDataFrame(
        [(1, _t(1), 1, "view"), (2, _t(2), 1, "error")], _STREAM_SCHEMA
    ).write.mode("append").parquet(drop)
    assert _run_stream(spark, drop, ckpt, out).count() == 0
    # batch 2 (restart from checkpoint): the purchase must see the
    # carried view AND the carried blocking error
    spark.createDataFrame(
        [(3, _t(3), 1, "purchase")], _STREAM_SCHEMA
    ).write.mode("append").parquet(drop)
    rows = _run_stream(spark, drop, ckpt, out).collect()
    assert _final_per_user(rows)[1] == (1, 0, -1)
    # batch 3: a fresh view redeems the next purchase
    spark.createDataFrame(
        [(4, _t(4), 1, "view"), (5, _t(5), 1, "purchase")], _STREAM_SCHEMA
    ).write.mode("append").parquet(drop)
    rows = _run_stream(spark, drop, ckpt, out).collect()
    us = int(_t(5).timestamp() * 1_000_000)
    assert _final_per_user(rows)[1] == (2, 1, us)


def test_funnel_exclusion_stream_matches_batch(spark, tmp_path):
    """End-state parity on the GENERATED events table: the last emitted
    row per user equals plans/wave12.events_funnel_exclusion."""
    import datetime as dt
    import os

    drop, ckpt, out = (
        str(tmp_path / "drop"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    sf = "/root/testdata/sf0.001"
    spark.read.parquet(os.path.join(sf, "events.parquet")).select(
        "event_id", "ts", "user_id", "event_type"
    ).write.mode("append").parquet(drop)
    got = _final_per_user(_run_stream(spark, drop, ckpt, out).collect())

    want = {}
    for r in events_funnel_exclusion(spark, sf).collect():
        fc = r["first_conversion_ts"]
        fc_us = (
            -1
            if fc is None
            else int(
                (fc - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
            )
        )
        want[r["user_id"]] = (r["n_purchases"], r["n_converted"], fc_us)
    assert got == want
