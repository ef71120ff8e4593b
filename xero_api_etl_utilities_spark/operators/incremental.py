"""Incremental view maintenance for batch rollups — recompute only
what a delta touches.

No reference counterpart; north-star scale surface. The streaming
sinks (streaming/cdc_sink.py) maintain snapshots micro-batch by
micro-batch; this is the BATCH twin for the daily-delta case: a 100 TB
session/rollup table must not be rebuilt because one day of events
arrived. The correct unit of invalidation for any per-key aggregate is
the KEY: a new event can only change its own user's sessions, so

    new_snapshot = (old_snapshot ANTI JOIN affected_keys)
                   UNION (recompute over affected keys' full history)

touches |affected_users| × their history instead of |all history|. The
recompute side reads the events table SEMI-JOINED to the affected-key
list — with user-bucketed storage (sources/writer.py
write_bucketed_table) that semi join is also shuffle-free, and with
key-partitioned storage it prunes files.

Equivalence to the full rebuild is exact (per-key determinism of the
underlying operator), and pinned by test_incremental.py against
session_stats over random splits.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_by_key(
    snapshot: DataFrame,
    history: DataFrame,
    delta: DataFrame,
    key: str,
    recompute: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Maintain ``snapshot = recompute(history)`` after ``delta`` rows
    were appended to ``history`` (``history`` ALREADY includes them).

    ``recompute`` must be per-key deterministic: its output for a key
    depends only on that key's rows. Affected keys come from the delta
    (tiny); untouched snapshot rows pass through an anti join — no
    per-row comparison, no full rebuild.
    """
    affected = delta.select(key).distinct()
    untouched = snapshot.join(F.broadcast(affected), key, "left_anti")
    recomputed = recompute(history.join(F.broadcast(affected), key, "left_semi"))
    return untouched.unionByName(recomputed)
