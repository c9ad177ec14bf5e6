"""Event-analytics operators: ordered funnels and cohort retention.

Engine-added family (the reference — five Kafka scripts, SURVEY.md §2 —
has no analytics surface); these are the standard event-warehouse queries
a 100 TB events table answers daily.

Scale design:
- `funnel_reach` computes the sequential step timestamps as CHAINED
  CONDITIONAL WINDOW MINS over one `user_id` partitioning: step i's
  timestamp is ``min(ts) where type = step_i and ts >= t_{i-1}`` over the
  same window. All step columns share one hash partitioning, so Catalyst
  plans a single Exchange followed by one Window operator per step — the
  fact table shuffles ONCE regardless of funnel depth, then a tiny
  global aggregate counts users per step.
- `cohort_retention` derives each user's cohort (first-activity week) with
  the same single-partitioning window trick — no self-join of the events
  table against a per-user dimension — then one hash aggregate on
  (cohort_week, week_offset). Two exchanges total, both on keys whose
  cardinality grows with users/weeks, not events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_reach(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel user counts: a user reaches step i when an event of
    ``steps[i]`` occurs at-or-after their step-(i-1) completion time
    (first qualifying occurrence; same-timestamp completion allowed).
    Returns (step_index, step, n_users) — n_users monotonically
    non-increasing down the funnel."""
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(user_col)
    df = events
    prev: F.Column | None = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= prev)
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(f"_t{i}")
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"t{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.count(F.when(F.col(f"t{i}").isNotNull(), 1)).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    steps_df = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step_index"),
                        F.lit(step).alias("step"),
                        F.col(f"n{i}").alias("n_users"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        ).alias("s")
    )
    return steps_df.select("s.step_index", "s.step", "s.n_users")


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: cohort = the user's first-activity week
    (date_trunc week); for each (cohort_week, week_offset) count the
    distinct users with any activity in that offset week. Returns
    (cohort_week, week_offset, n_users)."""
    w = Window.partitionBy(user_col)
    # Offset via calendar-day datediff of the truncated weeks, floor-div 7:
    # TZ/DST-safe, unlike an epoch-seconds subtraction which is only an
    # exact multiple of 604800 when the session timezone is UTC.
    df = events.withColumn(
        "_cohort", F.date_trunc("week", F.min(F.col(ts_col)).over(w))
    ).withColumn(
        "_offset",
        F.floor(
            F.datediff(
                F.date_trunc("week", F.col(ts_col)).cast("date"),
                F.col("_cohort").cast("date"),
            )
            / 7
        ).cast("bigint"),
    )
    if max_offset is not None:
        df = df.filter(F.col("_offset") <= max_offset)
    return (
        df.groupBy(
            F.col("_cohort").cast("date").alias("cohort_week"),
            F.col("_offset").alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )
