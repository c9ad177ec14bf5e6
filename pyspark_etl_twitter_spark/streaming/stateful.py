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
