"""applyInPandasWithState sessionization: state must persist across
micro-batches (two availableNow runs sharing one checkpoint)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from xero_api_etl_utilities_spark.streaming.filestream import stream_drop_dir
from xero_api_etl_utilities_spark.streaming.stateful import sessionize_stream

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _run_batch(spark, drop, ckpt, out):
    # file sink (not memory): the memory sink cannot recover from a
    # checkpoint, and checkpoint recovery is exactly what batch 2 tests
    q = (
        sessionize_stream(stream_drop_dir(spark, drop, EVENT_SCHEMA), gap_minutes=30)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).collect()


def test_sessions_close_across_batches(spark, tmp_path):
    drop, ckpt = str(tmp_path / "drop"), str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    mins = datetime.timedelta(minutes=1)

    # batch 1: user 1 has a 40-min gap → first session closes, second
    # stays open in state; user 2 has one open session
    spark.createDataFrame(
        [
            (1, t0, 1),
            (2, t0 + 5 * mins, 1),
            (3, t0 + 50 * mins, 1),
            (4, t0, 2),
        ],
        EVENT_SCHEMA,
    ).write.mode("append").parquet(drop)
    out = str(tmp_path / "out")
    rows = _run_batch(spark, drop, ckpt, out)
    assert len(rows) == 1
    s = rows[0]
    assert s["user_id"] == 1 and s["n_events"] == 2
    epoch = datetime.datetime(1970, 1, 1)
    us = lambda dt: int((dt - epoch).total_seconds() * 1_000_000)  # noqa: E731
    assert s["session_start_us"] == us(t0)

    # batch 2: an event 10 min after user 1's open session extends it
    # (no close); an event 2h later closes it → emitted with 2 events
    # (t0+50' from batch 1 + t0+60' from batch 2), proving the open
    # session SURVIVED in the state store across the restart
    spark.createDataFrame(
        [(5, t0 + 60 * mins, 1), (6, t0 + 180 * mins, 1)],
        EVENT_SCHEMA,
    ).write.mode("append").parquet(drop)
    rows2 = [r for r in _run_batch(spark, drop, ckpt, out) if r["session_start_us"] != us(t0)]
    assert len(rows2) == 1
    s2 = rows2[0]
    assert s2["user_id"] == 1 and s2["n_events"] == 2
    epoch = datetime.datetime(1970, 1, 1)
    us = lambda dt: int((dt - epoch).total_seconds() * 1_000_000)  # noqa: E731
    assert s2["session_start_us"] == us(t0 + 50 * mins)
    assert s2["session_end_us"] == us(t0 + 60 * mins)


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def test_funnel_stream_advances_across_batches(spark, tmp_path):
    from xero_api_etl_utilities_spark.streaming.stateful import funnel_stream

    drop, ckpt, out = (
        str(tmp_path / "fdrop"),
        str(tmp_path / "fckpt"),
        str(tmp_path / "fout"),
    )
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    mins = datetime.timedelta(minutes=1)

    def run():
        q = (
            funnel_stream(stream_drop_dir(spark, drop, FUNNEL_SCHEMA))
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r["user_id"], r["stage"]) for r in spark.read.parquet(out).collect()
        )

    # batch 1: user 1 views then clicks (stages 1, 2);
    # user 2's click arrives BEFORE any view -> nothing
    spark.createDataFrame(
        [
            (1, t0, 1, "view"),
            (2, t0 + mins, 1, "click"),
            (3, t0, 2, "click"),
        ],
        FUNNEL_SCHEMA,
    ).write.mode("append").parquet(drop)
    assert run() == [(1, 1), (1, 2)]

    # batch 2: user 1 purchases (state crossed the batch boundary ->
    # stage 3); user 2 finally views (stage 1); a STALE purchase for
    # user 1 predating its click timestamp is ignored
    spark.createDataFrame(
        [
            (4, t0 + 2 * mins, 1, "purchase"),
            (5, t0 + 3 * mins, 2, "view"),
        ],
        FUNNEL_SCHEMA,
    ).write.mode("append").parquet(drop)
    assert run() == [(1, 1), (1, 2), (1, 3), (2, 1)]


def test_event_time_timeout_finalizes_open_session(spark, tmp_path):
    """EventTimeTimeout path: once the WATERMARK passes a session's
    last event + gap, the open session is emitted and state evicted —
    no wall-clock dependence, deterministic on replay."""
    from xero_api_etl_utilities_spark.streaming.stateful import (
        sessionize_stream_finalizing,
    )

    drop, ckpt = str(tmp_path / "drop"), str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    hours = datetime.timedelta(hours=1)

    def run():
        q = (
            sessionize_stream_finalizing(
                stream_drop_dir(spark, drop, EVENT_SCHEMA),
                gap_minutes=30,
                watermark_delay="10 minutes",
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    # batch 1: user 1 at 10:00 — session open, timer armed for 10:30,
    # watermark only reaches 09:50, nothing emits
    spark.createDataFrame([(1, t0, 1)], EVENT_SCHEMA).write.mode("append").parquet(drop)
    assert run() == []

    # batch 2: only user 2 has events (at 12:00) — the watermark
    # advance to 11:50 fires user 1's 10:30 timer: their idle session
    # surfaces WITHOUT any user-1 event arriving
    spark.createDataFrame(
        [(2, t0 + 2 * hours, 2)], EVENT_SCHEMA
    ).write.mode("append").parquet(drop)
    rows = run()
    assert len(rows) == 1
    s = rows[0]
    assert s["user_id"] == 1 and s["n_events"] == 1

    # batch 3: user 1 returns at 14:00 — state was EVICTED, so this
    # starts a FRESH session (no merge with the finalized one), and
    # the watermark advance to 13:50 fires user 2's 12:30 timer
    spark.createDataFrame(
        [(3, t0 + 4 * hours, 1)], EVENT_SCHEMA
    ).write.mode("append").parquet(drop)
    rows = run()
    assert sorted(r["user_id"] for r in rows) == [1, 2]


def test_stream_stream_interval_join_across_batches(spark, tmp_path):
    """Stream-stream interval join: pairs emit only when both sides
    have arrived; a left row buffered in batch 1 matches a right row
    arriving in batch 2 (state survives the checkpoint restart); rows
    outside the 10-minute horizon never pair."""
    from xero_api_etl_utilities_spark.streaming.filestream import (
        stream_drop_dir,
        stream_stream_interval_join,
    )

    drop, ckpt, out = (
        str(tmp_path / "jdrop"),
        str(tmp_path / "jckpt"),
        str(tmp_path / "jout"),
    )
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    mins = datetime.timedelta(minutes=1)

    def run():
        src = stream_drop_dir(spark, drop, FUNNEL_SCHEMA)
        q = (
            stream_stream_interval_join(src, src, within_minutes=10)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r["l_id"], r["r_id"]) for r in spark.read.parquet(out).collect()}

    # batch 1: user 1 view@0 + click@5 (pairs now); user 2 view@0 with
    # no click yet (buffers); user 3 view@0 + click@20 (outside horizon)
    spark.createDataFrame(
        [
            (1, t0, 1, "view"),
            (2, t0 + 5 * mins, 1, "click"),
            (3, t0, 2, "view"),
            (4, t0, 3, "view"),
            (5, t0 + 20 * mins, 3, "click"),
        ],
        FUNNEL_SCHEMA,
    ).write.mode("append").parquet(drop)
    assert run() == {(1, 2)}

    # batch 2: user 2's click@8 arrives late — it must pair with the
    # view BUFFERED ACROSS THE RESTART; user 1's second click@7 also
    # pairs with the batch-1 view (both-sides state)
    spark.createDataFrame(
        [(6, t0 + 8 * mins, 2, "click"), (7, t0 + 7 * mins, 1, "click")],
        FUNNEL_SCHEMA,
    ).write.mode("append").parquet(drop)
    assert run() == {(1, 2), (3, 6), (1, 7)}


def test_native_session_window_stream(spark, tmp_path):
    """The NATIVE F.session_window aggregate in streaming mode — the
    built-in complement to the custom applyInPandasWithState
    sessionizer above: watermarked, merges windows across micro-batch
    boundaries, finalizes once the watermark passes. Two availableNow
    drains through one checkpoint; the session split across the
    batches must come out MERGED, proving the session-window state
    survived the restart."""
    import datetime as dt

    from pyspark.sql import functions as F

    drop, ckpt, out = (
        str(tmp_path / "nsw_drop"),
        str(tmp_path / "nsw_ckpt"),
        str(tmp_path / "nsw_out"),
    )
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def run():
        stream = stream_drop_dir(spark, drop, EVENT_SCHEMA)
        # watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
        # TYPE on NTZ); the session-tz pin in conftest keeps the cast
        # deterministic
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        q = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("s"),
                F.col("session_window.end").alias("e"),
                "n_events",
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def ev(i, minutes, user=1):
        return (i, t0 + dt.timedelta(minutes=minutes), user)

    # batch 1: two events 10:00, 10:10 (open session)
    spark.createDataFrame([ev(1, 0), ev(2, 10)], EVENT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(drop)
    run()
    # batch 2: 10:25 extends the SAME session (gap 15m < 30m), then a
    # watermark-advancing event hours later closes it
    spark.createDataFrame(
        [ev(3, 25), ev(4, 300)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(drop)
    run()
    rows = [
        (r["user_id"], (r["e"] - r["s"]).total_seconds(), r["n_events"])
        for r in spark.read.parquet(out).collect()
    ]
    # the merged session: batch-1's two events + batch-2's 10:25 event
    # in ONE 55-minute window (last event + 30m gap) — only possible
    # if the open session-window state crossed the checkpoint restart
    assert (1, 55 * 60.0, 3) in rows
