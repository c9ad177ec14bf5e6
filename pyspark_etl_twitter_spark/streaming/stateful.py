"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 engine-added; the escape hatch for semantics the built-in
windowed aggregations cannot express).

``running_user_stats`` keeps per-user state (event count, value sum, last
timestamp) across micro-batches and emits the updated row for every user
seen in a batch — an "update-stream" materialized view of per-key totals.
State is keyed by user_id, Arrow-batched per group; at scale state lives in
the state store (RocksDB on a real cluster), sized by cardinality of the
key space, not by stream length. A timeout (``GroupStateTimeout``) would
expire idle keys; kept NoTimeout here because the testdata key space is
bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_user(key, batches: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts_max = pdf["ts"].max()
        last_us = max(last_us, int(pd.Timestamp(ts_max).value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running totals as an update stream. Input: a streaming
    events relation with (user_id, ts, value)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("furthest_step", T.IntegerType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t0_us", T.LongType()),
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
    ]
)

FUNNEL_STEPS = ("view", "click", "purchase")


def _update_funnel(key, batches: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    t = list(state.get) if state.exists else [0, 0, 0]
    for pdf in batches:
        pdf = pdf.sort_values("ts")
        for ts, et in zip(pdf["ts"], pdf["event_type"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if et == FUNNEL_STEPS[0]:
                if t[0] == 0 or us < t[0]:
                    t[0] = us
            elif et == FUNNEL_STEPS[1]:
                if t[0] != 0 and us >= t[0] and (t[1] == 0 or us < t[1]):
                    t[1] = us
            elif et == FUNNEL_STEPS[2]:
                if t[1] != 0 and us >= t[1] and (t[2] == 0 or us < t[2]):
                    t[2] = us
    state.update(tuple(t))
    furthest = 3 if t[2] else 2 if t[1] else 1 if t[0] else 0
    yield pd.DataFrame({"user_id": [user_id], "furthest_step": [furthest]})


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Streaming twin of operators/funnel.funnel_reach: per-user ordered
    view→click→purchase progress as update-mode state
    (applyInPandasWithState; state = three step timestamps, 24 bytes/user).

    Matches the batch funnel exactly when events arrive in event-time
    order (the replay fixture guarantees it); under true out-of-order
    arrival a late early-step event cannot retroactively re-qualify
    intermediate steps that already streamed past — the watermark-style
    caveat every incremental funnel carries, documented rather than
    hidden."""
    return (
        events.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
