"""Per-key CUSUM drift detection — custom stateful streaming operator
(``applyInPandasWithState``).

No reference counterpart; §2.11 north-star surface. The monitor a
training-data ingest runs per source: has this source's value
distribution DRIFTED from its calibrated mean? CUSUM is the classic
sequential test — cumulative sum of (value − μ0 − slack) clipped at
zero; an alert fires when the accumulation crosses the decision
threshold, catching small persistent shifts long before a per-batch
mean comparison would.

Everything is INTEGER (values in cents, thresholds in cents): the
alert positions are deterministic and engine-independent — the same
integerization rule the batch catalog follows (PLANS.md).

State: (c_pos, c_neg, n_seen) per key — O(1) regardless of stream
length, exactly-once across micro-batches via the checkpoint (pinned
by a two-batch restart test: an alert whose accumulation STARTED in
batch 1 must fire in batch 2).

API note: Spark 4 ships ``transformWithStateInPandas`` as the
successor API (typed state handles, RocksDB-only). This operator
stays on ``applyInPandasWithState`` deliberately — the new API's
python runner requires protobuf at runtime, unavailable in minimal
deployments like this container, and the old API is not deprecated.
The state layout here (one flat tuple) ports to a ValueState
one-for-one when migrating."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("alert_ts_us", LongType(), False),
        StructField("direction", StringType(), False),
        StructField("magnitude_cents", LongType(), False),
        StructField("n_seen", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("c_pos", LongType(), False),
        StructField("c_neg", LongType(), False),
        StructField("n_seen", LongType(), False),
    ]
)

_ALERT_COLS = ["user_id", "alert_ts_us", "direction", "magnitude_cents", "n_seen"]


def _cusum_fn(mu0: int, k: int, h: int):
    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        c_pos, c_neg, n_seen = state.get if state.exists else (0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic replay order inside the micro-batch
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        alerts: list[tuple] = []
        for ts_us, cents in zip(batch["ts_us"], batch["value_cents"]):
            n_seen += 1
            c_pos = max(0, c_pos + (int(cents) - mu0 - k))
            c_neg = min(0, c_neg + (int(cents) - mu0 + k))
            if c_pos > h:
                alerts.append((user_id, int(ts_us), "up", c_pos, n_seen))
                c_pos = 0
            if c_neg < -h:
                alerts.append((user_id, int(ts_us), "down", -c_neg, n_seen))
                c_neg = 0
        state.update((c_pos, c_neg, n_seen))
        if alerts:
            yield pd.DataFrame(alerts, columns=_ALERT_COLS)

    return fn


def cusum_drift_stream(
    events: DataFrame,
    mu0_cents: int,
    slack_cents: int,
    threshold_cents: int,
) -> DataFrame:
    """Streaming drift alerts per user over ``events`` with columns
    (event_id, ts, user_id, value). Timestamps leave the operator as
    int64 epoch-micros (Arrow-stable, timezone-free — same convention
    as the sessionizer); values enter as integer cents."""
    prepared = events.select(
        "user_id",
        "event_id",
        # NTZ has no epoch; reinterpret as UTC wall-clock micros (the
        # sessionizer's documented convention)
        F.unix_micros(
            F.to_utc_timestamp(F.col("ts").cast("timestamp_ntz"), "UTC")
        ).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _cusum_fn(mu0_cents, slack_cents, threshold_cents),
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
