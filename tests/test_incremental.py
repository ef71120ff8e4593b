"""Incremental view maintenance (operators/incremental.py): the
delta-scoped recompute must equal the full rebuild, row for row."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from xero_api_etl_utilities_spark.operators.events import session_stats
from xero_api_etl_utilities_spark.operators.incremental import incremental_by_key


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _rows(n, users, start):
    out = []
    for i in range(n):
        u = users[i % len(users)]
        # deterministic pseudo-random gaps: some > 30 min (session
        # breaks), some below
        gap = (i * 7919) % 90
        out.append(
            (
                i,
                start + dt.timedelta(minutes=i * 11 + gap),
                u,
                "t%d" % (i % 3),
            )
        )
    return out


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


class TestIncrementalSessions:
    def test_matches_full_rebuild(self, spark):
        start = dt.datetime(2024, 3, 1, 8, 0)
        base_rows = _rows(120, [1, 2, 3, 4, 5], start)
        delta_rows = [
            (1000, start + dt.timedelta(days=2), 2, "t0"),
            (1001, start + dt.timedelta(days=2, minutes=10), 2, "t1"),
            (1002, start + dt.timedelta(days=2), 5, "t2"),
        ]
        base = _events(spark, base_rows)
        delta = _events(spark, delta_rows)
        history = base.unionByName(delta)

        snapshot = session_stats(base)  # yesterday's materialized state
        maintained = incremental_by_key(
            snapshot, history, delta, "user_id", session_stats
        )
        rebuilt = session_stats(history)
        assert _canon(maintained) == _canon(rebuilt)

    def test_untouched_users_pass_through_unrecomputed(self, spark):
        start = dt.datetime(2024, 3, 1, 8, 0)
        base = _events(spark, _rows(60, [1, 2, 3], start))
        delta = _events(spark, [(500, start + dt.timedelta(days=1), 3, "t0")])
        history = base.unionByName(delta)
        snapshot = session_stats(base)
        maintained = incremental_by_key(
            snapshot, history, delta, "user_id", session_stats
        )
        # users 1 and 2 rows must be byte-identical to the old snapshot
        old = _canon(snapshot.filter(F.col("user_id").isin(1, 2)))
        new = _canon(maintained.filter(F.col("user_id").isin(1, 2)))
        assert old == new

    def test_empty_delta_is_identity(self, spark):
        start = dt.datetime(2024, 3, 1, 8, 0)
        base = _events(spark, _rows(40, [1, 2], start))
        delta = base.limit(0)
        snapshot = session_stats(base)
        maintained = incremental_by_key(
            snapshot, base, delta, "user_id", session_stats
        )
        assert _canon(maintained) == _canon(snapshot)
