"""CUSUM drift detection on transformWithStateInPandas: accumulation
must survive the checkpoint — an alert whose evidence is split across
two availableNow micro-batches has to fire in the second."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from xero_api_etl_utilities_spark.streaming.drift import cusum_drift_stream
from xero_api_etl_utilities_spark.streaming.filestream import stream_drop_dir

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

T0 = datetime.datetime(2024, 5, 1, 9, 0, 0)


def _write(spark, drop, rows, name):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(drop)


def _run(spark, drop, ckpt, out):
    q = (
        cusum_drift_stream(
            stream_drop_dir(spark, drop, EVENT_SCHEMA),
            mu0_cents=1000,  # calibrated mean $10.00
            slack_cents=100,  # ignore drift below $1.00
            threshold_cents=500,  # alert after $5.00 of accumulation
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (tuple(r) for r in spark.read.parquet(out).collect()),
        key=lambda t: (t[0], t[1]),
    )


def _ev(i, minutes, user, dollars):
    return (i, T0 + datetime.timedelta(minutes=minutes), user, dollars)


class TestCusumDrift:
    def test_alert_accumulates_across_batches(self, spark, tmp_path):
        drop, ckpt, out = (
            str(tmp_path / "drop"),
            str(tmp_path / "ckpt"),
            str(tmp_path / "out"),
        )
        # batch 1: user 7 drifts +$3 per event over 2 events →
        # c_pos = 2*(1300-1000-100) = 400, UNDER the 500 threshold
        _write(
            spark,
            drop,
            [_ev(1, 0, 7, 13.0), _ev(2, 1, 7, 13.0), _ev(3, 2, 8, 10.0)],
            "b1",
        )
        assert _run(spark, drop, ckpt, out) == []  # no alert yet

        # batch 2: one more drifted event pushes 400+200=600 > 500 —
        # only provable if batch-1 state survived the restart
        _write(spark, drop, [_ev(4, 3, 7, 13.0), _ev(5, 4, 8, 10.0)], "b2")
        alerts = _run(spark, drop, ckpt, out)
        assert len(alerts) == 1
        user_id, ts_us, direction, magnitude, n_seen = alerts[0]
        assert (user_id, direction, magnitude, n_seen) == (7, "up", 600, 3)

    def test_downward_drift_and_reset(self, spark, tmp_path):
        drop, ckpt, out = (
            str(tmp_path / "drop2"),
            str(tmp_path / "ckpt2"),
            str(tmp_path / "out2"),
        )
        # user 9 collapses to $4: each event adds (400-1000+100) = -500
        # to c_neg → fires at the 2nd event (-1000 < -500), resets,
        # fires again at the 4th
        _write(
            spark,
            drop,
            [_ev(i, i, 9, 4.0) for i in range(1, 5)],
            "b1",
        )
        alerts = _run(spark, drop, ckpt, out)
        assert [(a[0], a[2], a[3], a[4]) for a in alerts] == [
            (9, "down", 1000, 2),
            (9, "down", 1000, 4),
        ]
