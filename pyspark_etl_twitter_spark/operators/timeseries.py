"""Time-series resampling: regular-grid spine generation + gap fill.

The reference's only time handling is a processing-time string column
(consumer.py:49, `DATE_FORMAT(current_timestamp(), ...)`); hourly/sliding
rollups live in streaming/windows.py. This module adds the batch
time-series surface a metrics pipeline needs: resample an irregular event
stream onto a regular grid and forward-fill the gaps.

Scale shape: the spine is generated per group from one tiny bounds
aggregate (`sequence()` + `explode` — rows appear only after the group
aggregate, so the explode fans out grid rows, never raw events). The
gap-fill window partitions by group; at 100 TB with few huge groups,
sub-partition by calendar chunk (day/week) and seed each chunk with the
previous chunk's closing value — same two-pass trick as the salted packing
cumsum (operators/packing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_ffill(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    trunc_unit: str = "hour",
    round_dp: int = 6,
    exact_dp: tuple[int, int] | None = None,
) -> DataFrame:
    """Resample an irregular event stream onto a regular ``step`` grid per
    group: (group, bucket, avg, is_gap), where empty buckets carry the
    last preceding bucket's average (forward fill) and ``is_gap`` marks
    them. The grid spans each group's [min, max] event time, truncated to
    ``trunc_unit``, so the first bucket always has data and the fill
    never needs a default.

    With ``exact_dp=(in_dp, out_dp)`` the average is computed in exact
    integer fixed-point: values are ``in_dp``-decimal data, the per-bucket
    mean comes out as a BIGINT in ``10^-out_dp`` units via integer
    division (``avg_value_u{out_dp}``; engines agree on integer division
    for the non-negative sums here — for data with negative means, pin
    one floor/truncate semantic on both sides). This exists because
    ``round(avg(x), 6)`` over 2-decimal data and a 2^a·5^b bucket size
    lands on a true decimal halfway point where Spark (HALF_UP on the
    shortest decimal) and other engines (round the binary) legitimately
    differ by one ulp — DESIGN.md §5. Integer division has no such
    boundary; the float path remains the human-friendly default."""
    lo_hi = events.groupBy(group_col).agg(
        F.date_trunc(trunc_unit, F.min(time_col)).alias("_lo"),
        F.date_trunc(trunc_unit, F.max(time_col)).alias("_hi"),
    )
    spine = lo_hi.select(
        group_col,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
        ).alias("bucket"),
    )
    grouped = events.groupBy(
        group_col, F.date_trunc(trunc_unit, F.col(time_col)).alias("bucket")
    )
    if exact_dp is None:
        out_name = "avg_value"
        actual = grouped.agg(F.round(F.avg(value_col), round_dp).alias("_avg"))
    else:
        in_dp, out_dp = exact_dp
        out_name = f"avg_value_u{out_dp}"
        actual = grouped.agg(
            F.expr(
                f"sum(cast(round({value_col} * {10**in_dp}) as bigint))"
                f" * {10 ** (out_dp - in_dp)} div count(1)"
            ).alias("_avg")
        )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(actual, [group_col, "bucket"], "left")
        .withColumn("is_gap", F.col("_avg").isNull())
        .withColumn(out_name, F.last("_avg", ignorenulls=True).over(w))
        .drop("_avg")
        .select(group_col, "bucket", out_name, "is_gap")
    )
