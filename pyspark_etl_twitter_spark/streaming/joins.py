"""Stream-stream joins (SURVEY.md §2.10 engine-added family).

``click_purchase_attribution``: inner join of two event streams on user_id
with an interval condition — each purchase matched to clicks at most
``horizon`` before it. Both sides carry watermarks so the join state is
bounded: Spark buffers each side only until the watermark passes the
interval bound, then evicts. This is the streaming twin of the batch as-of
join (plans/relational.py::asof_purchase_click) with a bounded horizon —
at 100 TB/day the state held is horizon × ingest-rate per side, not the
stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution(
    events: DataFrame,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """events: a streaming relation with (event_id, ts, user_id,
    event_type). Returns (purchase_id, user_id, purchase_ts, click_id,
    click_ts) for every click within ``horizon`` before each purchase."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    *,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    CURRENT contents of the static relation (Spark re-plans the static
    side per batch, so a dim table updated between batches is picked up —
    slowly-changing enrichment without restarting the query).

    The dim is broadcast: stateless, no watermark, no join state at all —
    the right shape for code↔name/config/feature-flag enrichment where
    the dim is orders of magnitude smaller than the stream. For a dim too
    big to broadcast, drop the hint and let the stream side shuffle per
    batch (still stateless)."""
    return stream.join(F.broadcast(dim), on, how)


def purchase_attribution_outer(
    events: DataFrame,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every purchase, attributed clicks
    where one exists within ``horizon``, NULL click columns where none
    does — the "unattributed conversions" feed an attribution pipeline
    needs alongside the inner join.

    Outer semantics are the hard part of stream-stream joins: a NULL
    match for a purchase can only be emitted once the CLICK side's
    watermark has passed the interval bound (before that, a matching
    click could still arrive), so unmatched results trail the stream by
    the watermark delay, and a finite replay only flushes them when a
    later event advances the watermark past the last purchase's bound —
    the test appends a sentinel late event for exactly that reason.
    State stays bounded exactly as in the inner variant."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "left_outer",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )
