"""Custom stateful streaming operator: gap-based session tracking via
``applyInPandasWithState`` (the north-star's custom-stateful-operator
slot; no reference counterpart).

Batch sessionization (operators/events.py:sessionize) is a window
computation; the STREAMING version cannot be — sessions span
micro-batches, so per-user open-session state must live in the state
store. Each micro-batch:

  1. new events for a user are appended in (ts, event_id) order,
  2. a gap > ``gap_minutes`` closes the open session → EMIT it,
  3. the still-open session is written back to state (timestamps kept
     as int64 epoch-micros — Arrow-stable, timezone-free).

Emitted rows are CLOSED sessions only; open sessions surface when a
later batch closes them. State is per-user and O(1) — bounded
regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_us", LongType(), False),
        StructField("session_end_us", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

# open-session state: (start_us, last_us, n_events)
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType(), False),
        StructField("last_us", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)


_SESSION_COLS = ["user_id", "session_start_us", "session_end_us", "n_events"]


def _fold_sessions(user_id, open_state, pdfs, gap_us, ts_col="ts"):
    """Shared micro-batch fold: (open-session tuple | None, pandas
    chunks) → (closed-session rows, new open-session tuple | None).

    A group larger than one Arrow batch arrives as MULTIPLE pandas
    chunks; sorting per-chunk would process events out of global
    order, so the whole group's timestamps concatenate before the
    sort. ``ts_col`` may already be int64 epoch-micros (the timeout
    variant pre-computes ``unix_micros`` JVM-side) — datetime columns
    are converted, int columns pass through."""
    start_us, last_us, n_events = open_state if open_state else (None, None, None)
    closed: list[tuple[int, int, int, int]] = []
    chunks = [pdf[ts_col] for pdf in pdfs]
    if chunks:
        ts_us = pd.concat(chunks)
        if ts_us.dtype != "int64":
            ts_us = ts_us.astype("datetime64[us]").astype("int64")
        ts_us = ts_us.sort_values()
        for t in ts_us:
            t = int(t)
            if start_us is None:
                start_us, last_us, n_events = t, t, 1
            elif t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n_events))
                start_us, last_us, n_events = t, t, 1
            else:
                # max(): a cross-batch late event with t < last_us
                # joins the open session without rewinding its end.
                last_us, n_events = max(last_us, t), n_events + 1
    open_out = (start_us, last_us, n_events) if start_us is not None else None
    return closed, open_out


def _session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed, open_out = _fold_sessions(
            user_id, state.get if state.exists else None, pdfs, gap_us
        )
        if open_out is not None:
            state.update(open_out)
        if closed:
            yield pd.DataFrame(closed, columns=_SESSION_COLS)

    return fn


def _session_timeout_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # the watermark passed last_event + gap with no new events:
            # the open session is FINAL by the gap rule itself, so emit
            # it and evict the state — the half of session semantics
            # NoTimeout cannot express (a user who never returns would
            # otherwise hold state forever and never surface).
            start_us, last_us, n_events = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start_us, last_us, n_events)], columns=_SESSION_COLS
            )
            return
        closed, open_out = _fold_sessions(
            user_id, state.get if state.exists else None, pdfs, gap_us, ts_col="ts_us"
        )
        if open_out is not None:
            state.update(open_out)
            # fire when event time passes session end + gap. ts_us is
            # TRUE epoch micros (unix_micros, JVM-side), the same
            # frame as the watermark — a pandas datetime conversion
            # would instead yield session-LOCAL naive micros, shifting
            # the timer by the tz offset (10 h under the engine's
            # Australia/Brisbane default) so it never fires. Spark
            # rejects a timeout at-or-before the current watermark, so
            # clamp just above it (the timer then fires on the next
            # watermark advance — the session is already final by
            # then, the emit is merely catching up).
            fire_ms = open_out[1] // 1000 + gap_us // 1000
            state.setTimeoutTimestamp(max(fire_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(closed, columns=_SESSION_COLS)

    return fn


FUNNEL_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("stage", LongType(), False),
        StructField("at_us", LongType(), False),
    ]
)

# per-user funnel state: (stage, timestamp of last advance)
FUNNEL_STATE = StructType(
    [
        StructField("stage", LongType(), False),
        StructField("t_us", LongType(), False),
    ]
)

_FUNNEL_ORDER = ["view", "click", "purchase"]


def _funnel_fn():
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        stage, t_us = state.get if state.exists else (0, 0)
        emitted: list[tuple[int, int, int]] = []
        chunks = [pdf[["ts", "event_type"]] for pdf in pdfs]
        if chunks:
            ev = pd.concat(chunks)
            ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
            # whole-group sort (chunk-local order would replay events
            # out of ts order); (ts, type) matches the batch fold's
            # struct sort, so tie handling is identical
            ev = ev.sort_values(["ts_us", "event_type"])
            for t, et in zip(ev["ts_us"], ev["event_type"]):
                t = int(t)
                if (
                    stage < 3
                    and et == _FUNNEL_ORDER[stage]
                    and (stage == 0 or t > t_us)
                ):
                    stage += 1
                    t_us = t
                    emitted.append((user_id, stage, t))
        if stage > 0:
            state.update((stage, t_us))
        if emitted:
            yield pd.DataFrame(emitted, columns=["user_id", "stage", "at_us"])

    return fn


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of plans/analytics_extra.events_funnel: the
    per-user view → click → purchase stage machine lives in the state
    store, so conversions spanning micro-batches (and restarts, via
    the checkpoint) advance correctly; each ADVANCE emits a
    (user_id, stage, at_us) progress row.

    Forward-only semantics, documented: within a batch, events replay
    in (ts, type) order exactly like the batch fold; a CROSS-batch
    late event predating the current stage's timestamp is ignored —
    a monotone real-time funnel, not a retroactive recomputation
    (that is the batch query's job). State is O(1) per user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming gap-sessionization over (user_id, ts) — emits closed
    sessions as they close; open sessions persist in the state store
    across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * 1_000_000),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream_finalizing(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Gap-sessionization that also FINALIZES idle sessions via
    EVENT-TIME state timeouts: once the watermark passes a session's
    last event + gap, the gap rule says no future event can extend it
    — the open session is emitted and its state evicted. This bounds
    state to ACTIVE users (NoTimeout holds every user ever seen) and
    is fully deterministic on replay — the production posture for an
    unbounded key space at 100 TB.

    Deliberately NOT ProcessingTimeTimeout: wall-clock timers make the
    output depend on batch scheduling, and (measured here) Spark's
    ``FlatMapGroupsWithStateExec.shouldRunAnotherBatch`` is always
    true under processing-time timeouts, so a ``Trigger.AvailableNow``
    drain never terminates — it spins no-data micro-batches forever.
    Event-time timers fire on watermark ADVANCE, which stops when the
    source is drained, so bounded runs terminate."""
    # watermarks require TIMESTAMP (tz-adjusted); the events table
    # carries TIMESTAMP_NTZ — the cast reinterprets in the session
    # zone. ts_us is true epoch micros computed JVM-SIDE so the state
    # fn's timer math shares the watermark's epoch frame (see
    # _session_timeout_fn).
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("ts_us", F.unix_micros(F.col("ts")))
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_timeout_fn(gap_minutes * 60 * 1_000_000),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# negated-funnel stream: the X168 pattern with per-user state
# ---------------------------------------------------------------------------

FUNNEL_EXCL_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("at_us", LongType(), False),
        StructField("converted", LongType(), False),  # 0/1 (Arrow-stable)
        StructField("n_purchases", LongType(), False),
        StructField("n_converted", LongType(), False),
        StructField("first_conversion_us", LongType(), False),  # -1 = none
    ]
)

# per-user pattern state: last view / last error as (epoch-micros, id)
# pairs (-1 sentinels = never seen) + the running purchase totals
FUNNEL_EXCL_STATE = StructType(
    [
        StructField("lv_us", LongType(), False),
        StructField("lv_id", LongType(), False),
        StructField("le_us", LongType(), False),
        StructField("le_id", LongType(), False),
        StructField("np", LongType(), False),
        StructField("nc", LongType(), False),
        StructField("fc_us", LongType(), False),
    ]
)

_EXCL_WINDOW_US = 7 * 24 * 3600 * 1_000_000


def _funnel_exclusion_fn():
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        lv_us, lv_id, le_us, le_id, np_, nc, fc_us = (
            state.get if state.exists else (-1, -1, -1, -1, 0, 0, -1)
        )
        out: list[tuple[int, ...]] = []
        chunks = [pdf[["event_id", "ts", "event_type"]] for pdf in pdfs]
        if chunks:
            ev = pd.concat(chunks)
            ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
            # (ts, event_id) order — the batch fold's struct sort, so
            # same-timestamp ties resolve identically
            ev = ev.sort_values(["ts_us", "event_id"])
            for eid, t, et in zip(ev["event_id"], ev["ts_us"], ev["event_type"]):
                eid, t = int(eid), int(t)
                if et == "view":
                    lv_us, lv_id = t, eid
                elif et == "error":
                    le_us, le_id = t, eid
                elif et == "purchase":
                    converts = (
                        lv_us >= 0
                        and t - lv_us <= _EXCL_WINDOW_US
                        and (le_us < 0 or (le_us, le_id) < (lv_us, lv_id))
                    )
                    np_ += 1
                    if converts:
                        nc += 1
                        if fc_us < 0:
                            fc_us = t
                    out.append(
                        (user_id, eid, t, int(converts), np_, nc, fc_us)
                    )
        state.update((lv_us, lv_id, le_us, le_id, np_, nc, fc_us))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "event_id",
                    "at_us",
                    "converted",
                    "n_purchases",
                    "n_converted",
                    "first_conversion_us",
                ],
            )

    return fn


def funnel_exclusion_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of plans/wave12.events_funnel_exclusion (X168):
    the negated sequence pattern — purchase converts iff a view
    precedes it within 7 days with no error strictly between — run
    incrementally with the last-view/last-error pair and the running
    totals in the per-user state store.  Each purchase EMITS its
    classification plus the totals as of that purchase, so the final
    row per user equals the batch query's row (the parity pytest pins
    this on the generated events table, checkpoint-restart included).

    Forward-only semantics, same caveat as funnel_stream: within a
    batch events replay in (ts, event_id) order exactly like the
    batch fold; a CROSS-batch late view/error predating an
    already-classified purchase does not retro-classify it — the
    real-time answer is monotone, the retroactive one is the batch
    query's job.  State is O(1) per user (two pairs + three
    counters), bounded regardless of stream length."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_exclusion_fn(),
        outputStructType=FUNNEL_EXCL_OUTPUT,
        stateStructType=FUNNEL_EXCL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
