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


def _session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n_events = state.get
        else:
            start_us = last_us = n_events = None

        closed: list[tuple[int, int, int, int]] = []
        # A group larger than one Arrow batch arrives as MULTIPLE pandas
        # chunks; sorting per-chunk would process events out of global
        # order. Concatenate the whole group's timestamps before sorting.
        chunks = [pdf["ts"] for pdf in pdfs]
        if chunks:
            ts_us = (
                pd.concat(chunks).astype("datetime64[us]").astype("int64").sort_values()
            )
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

        if start_us is not None:
            state.update((start_us, last_us, n_events))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )

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
