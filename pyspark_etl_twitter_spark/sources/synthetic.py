"""Deterministic synthetic table generators (engine-added; no reference twin).

The streaming/test suites replay the ``events`` table through file sources;
round 2 showed that a single schema drift in the shared testdata can take
out the entire streaming family. These generators produce schema-identical
tables from ``spark.range`` + pure column expressions — fully distributed
(no driver-side data), deterministic across runs and partitionings
(xxhash64-derived columns, no RNG), so any stream-vs-batch equality test
can fall back to them when the on-disk table is unreadable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ("click", "view", "purchase", "scroll", "hover")


def synthetic_events(
    spark: SparkSession,
    *,
    n_events: int = 2000,
    n_users: int = 40,
    start: str = "2024-01-01 00:00:00",
    mean_gap_s: int = 120,
) -> DataFrame:
    """Schema-compatible stand-in for the testdata ``events`` table.

    Timestamps advance ~``mean_gap_s`` apart with hash jitter so tumbling /
    sliding / session windows all see multi-window, multi-session shapes;
    user/event_type/value/props derive from ``xxhash64(event_id)`` — one
    narrow projection over ``range``, no shuffle, no Python.
    """
    h = lambda salt: F.pmod(  # noqa: E731
        F.xxhash64(F.col("event_id"), F.lit(salt)), F.lit(2**31)
    )
    return (
        spark.range(n_events)
        .withColumnRenamed("id", "event_id")
        .select(
            "event_id",
            F.timestamp_seconds(
                F.unix_timestamp(F.lit(start))
                + F.col("event_id") * mean_gap_s
                + F.pmod(h(1), F.lit(mean_gap_s))
            ).alias("ts"),
            F.pmod(h(2), F.lit(n_users)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in EVENT_TYPES]),
                (F.pmod(h(3), F.lit(len(EVENT_TYPES))) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(h(4), F.lit(100000)) / 100.0).alias("value"),
            F.concat(
                F.lit('{"k":'), F.pmod(h(5), F.lit(10)).cast("string"), F.lit("}")
            ).alias("props"),
        )
    )
