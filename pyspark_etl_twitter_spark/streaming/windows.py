"""Engine-added streaming operators (SURVEY.md §2.10): watermarked
tumbling/sliding/session windows and streaming dedup over the events
stream. The reference has none of these (its plan is stateless map-only);
they are the stateful half of a streaming analytics engine.

Scale notes: state is keyed by (window, group) — watermarks bound state
size; without them complete/update state grows forever. Shuffle partitions
for streaming stateful ops are fixed at query start (state is partition-
bound across restarts) — size them for the target load up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event type. Batch twin:
    plans/relational.py::hourly_event_rollup (same logical result on
    non-late data)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts. Batch twin: sliding_window_events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-merged). Batch twin: sessionize_events
    (lag + cumulative-sum formulation) — same session boundaries for
    gap >= semantics."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with *bounded* state: the streaming twin of
    exact_dedup (engine-added row in SURVEY.md §2.10).

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+): state for a key is
    evicted once the watermark passes the first-seen event time, so state
    holds one entry per distinct key inside the watermark horizon. A plain
    ``dropDuplicates(keys)`` would NOT be bounded here — Spark only evicts
    dedup state when the event-time column is part of the key subset, and
    duplicates of the same event share the same key but state would still
    grow with the number of distinct keys forever."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def streaming_content_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    time_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of ``operators.dedup.incremental_dedup``: drop
    documents whose CONTENT (sha256 of text) was already seen inside the
    watermark horizon, keeping the first arrival.

    Keying the state on the 32-byte sha rather than the raw text keeps the
    state store bounded in *bytes per key*, not just key count — the same
    never-shuffle-bodies rule the batch dedup operators follow. When the
    stream has no event-time column, ingest processing time is attached for
    the watermark; deduping against all history is an offline job
    (``incremental_dedup``), not a streaming one."""
    withsha = docs.withColumn("_sha", F.sha2(F.col(text_col), 256))
    tcol = time_col
    if tcol is None:
        tcol = "_ingest_ts"
        withsha = withsha.withColumn(tcol, F.current_timestamp())
    out = withsha.withWatermark(tcol, watermark).dropDuplicatesWithinWatermark(["_sha"])
    return out.drop("_sha", *([tcol] if time_col is None else []))


def chained_hourly_to_daily(
    events: DataFrame,
    *,
    watermark: str = "2 hours",
) -> DataFrame:
    """CHAINED stateful aggregation (Spark 4: multiple stateful operators
    in one append-mode query): hourly per-type counts re-aggregated into
    daily totals inside the SAME streaming query — the streaming form of
    ``multi_resolution_rollup``. The first agg emits finalized hourly
    rows as the watermark passes; the second keys its state on the
    derived day window via ``window(window_time(...))``. State stays
    bounded at both levels: (hour, type) then (day, type)."""
    hourly = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w1"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_hour"))
    )
    return (
        hourly.groupBy(
            F.window(F.window_time("w1"), "1 day").alias("w2"), "event_type"
        )
        .agg(
            F.sum("n_hour").alias("n_events"),
            F.count(F.lit(1)).alias("n_hours_seen"),
        )
        .select(
            F.col("w2.start").alias("day_start"),
            "event_type",
            "n_events",
            "n_hours_seen",
        )
    )
