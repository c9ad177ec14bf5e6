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


def rolling_range_mean(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    frame_us: int = 3_600_000_000,
    in_dp: int = 2,
    out_dp: int = 6,
) -> DataFrame:
    """Trailing time-range rolling mean per row (exact fixed-point, see
    ``resample_ffill``): one RANGE-frame window over microsecond epoch.
    Output: all input columns + rolling_avg_u{out_dp} + n_win.

    Parallelism equals the number of groups — correct and fastest when
    groups are plentiful; for few huge groups use
    ``rolling_range_mean_chunked``."""
    over = (
        f"OVER (PARTITION BY {group_col} ORDER BY unix_micros({time_col}) "
        f"RANGE BETWEEN {frame_us} PRECEDING AND CURRENT ROW)"
    )
    cents = f"cast(round({value_col} * {10**in_dp}) as bigint)"
    return events.selectExpr(
        "*",
        f"(sum({cents}) {over} * {10 ** (out_dp - in_dp)}) div count(1) {over}"
        f" AS rolling_avg_u{out_dp}",
        f"count(1) {over} AS n_win",
    )


def rolling_range_mean_chunked(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    frame_us: int = 3_600_000_000,
    chunk_us: int = 86_400_000_000,
    in_dp: int = 2,
    out_dp: int = 6,
) -> DataFrame:
    """``rolling_range_mean`` for FEW HUGE GROUPS: identical output, but
    the window partitions by (group, time chunk) so parallelism scales
    with data volume instead of group cardinality.

    A trailing frame at the start of a chunk must see the previous
    chunk's tail, so every row in the last ``frame_us`` of a chunk is
    replicated into the next chunk as a helper: it contributes to frames
    there but is dropped from the output (``_helper`` flag). Replication
    factor is frame_us/chunk_us (~4% for 1 h into 1 day) — the shuffle
    stays one exchange on (group, chunk). Rows are never compared across
    a chunk gap wider than the frame, which is exactly when the frame is
    empty of them anyway, so chunked ≡ unchunked for any chunk_us ≥
    frame_us (asserted in tests)."""
    if chunk_us < frame_us:
        raise ValueError("chunk_us must be >= frame_us for boundary overlap")
    base = events.withColumn("_us", F.unix_micros(F.col(time_col)))
    chunk = F.floor(F.col("_us") / chunk_us)
    main = base.withColumn("_chunk", chunk).withColumn("_helper", F.lit(False))
    helpers = (
        base.filter(F.col("_us") % chunk_us >= chunk_us - frame_us)
        .withColumn("_chunk", chunk + 1)
        .withColumn("_helper", F.lit(True))
    )
    unioned = main.unionByName(helpers)
    over = (
        f"OVER (PARTITION BY {group_col}, _chunk ORDER BY _us "
        f"RANGE BETWEEN {frame_us} PRECEDING AND CURRENT ROW)"
    )
    cents = f"cast(round({value_col} * {10**in_dp}) as bigint)"
    return (
        unioned.selectExpr(
            "*",
            f"(sum({cents}) {over} * {10 ** (out_dp - in_dp)}) div count(1) {over}"
            f" AS rolling_avg_u{out_dp}",
            f"count(1) {over} AS n_win",
        )
        .filter(~F.col("_helper"))
        .drop("_us", "_chunk", "_helper")
    )


def resample_interpolate(
    events: DataFrame,
    *,
    group_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    trunc_unit: str = "hour",
    in_dp: int = 2,
) -> DataFrame:
    """Resample onto a regular grid with LINEAR INTERPOLATION across gaps:
    (group, bucket, value_interp, is_gap). Gap buckets get
    ``v_prev + (v_next - v_prev) * (t - t_prev)/(t_next - t_prev)``;
    trailing gaps (no next observation) forward-fill.

    Cross-engine determinism without integer gymnastics: bucket averages
    are first made EXACT (integer fixed-point, as resample_ffill), so the
    interpolation inputs are identical doubles on every engine, and
    +,-,*,/ are IEEE-exact — the full expression is bit-reproducible as
    long as the oracle mirrors the operation order. Same scale shape as
    resample_ffill: spine join + two frame windows over ONE group
    partitioning (one exchange)."""
    lo_hi = events.groupBy(group_col).agg(
        F.date_trunc(trunc_unit, F.min(time_col)).alias("_lo"),
        F.date_trunc(trunc_unit, F.max(time_col)).alias("_hi"),
    )
    spine = lo_hi.select(
        group_col,
        F.explode(F.sequence("_lo", "_hi", F.expr(f"interval {step}"))).alias(
            "bucket"
        ),
    )
    actual = events.groupBy(
        group_col, F.date_trunc(trunc_unit, F.col(time_col)).alias("bucket")
    ).agg(
        F.expr(
            f"sum(cast(round({value_col} * {10**in_dp}) as bigint))"
            f" * {10 ** (6 - in_dp)} div count(1)"
        ).alias("_avg_u6")
    )
    base = Window.partitionBy(group_col).orderBy("bucket")
    wb = base.rowsBetween(Window.unboundedPreceding, 0)
    wf = base.rowsBetween(0, Window.unboundedFollowing)
    obs_bucket = F.when(F.col("_avg_u6").isNotNull(), F.col("bucket"))
    joined = (
        spine.join(actual, [group_col, "bucket"], "left")
        .withColumn("_vp", F.last("_avg_u6", ignorenulls=True).over(wb))
        .withColumn("_tp", F.last(obs_bucket, ignorenulls=True).over(wb))
        .withColumn("_vn", F.first("_avg_u6", ignorenulls=True).over(wf))
        .withColumn("_tn", F.first(obs_bucket, ignorenulls=True).over(wf))
    )
    vp = F.col("_vp").cast("double") / 1000000.0
    vn = F.col("_vn").cast("double") / 1000000.0
    tp = F.unix_timestamp("_tp").cast("double")
    tn = F.unix_timestamp("_tn").cast("double")
    t = F.unix_timestamp("bucket").cast("double")
    interp = (
        F.when(F.col("_avg_u6").isNotNull(), vp)  # observed bucket: vp == v
        .when(F.col("_vn").isNull(), vp)  # trailing gap: ffill
        .otherwise(vp + (vn - vp) * ((t - tp) / (tn - tp)))
    )
    return joined.select(
        group_col,
        "bucket",
        F.round(interp, 6).alias("value_interp"),
        F.col("_avg_u6").isNull().alias("is_gap"),
    )


def ewma_by_group(
    events: DataFrame,
    *,
    alpha: float = 0.3,
    group_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group exponentially weighted moving average — the operator tier
    where built-in expressions genuinely stop: the recurrence
    ``e_t = alpha*x_t + (1-alpha)*e_{t-1}`` is sequential, and the closed
    form needs ``(1-alpha)^(-i)`` factors that overflow doubles for long
    series. So this is an Arrow-batched ``applyInPandas`` per group
    (pandas ``ewm``; adjust=False matches the recurrence), NOT a row-wise
    Python UDF: one hash exchange on the group key, then each group
    processed as a single vectorized pandas call. Parallelism = number of
    groups — correct for the many-small-groups shape this targets
    (per-user/device smoothing); for few huge groups chunk like
    ``rolling_range_mean_chunked``.

    Output: (group, id, time, value, ewma) sorted within group by
    (time, id)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField(group_col, LongType()),
            StructField(id_col, LongType()),
            StructField(time_col, TimestampType()),
            StructField(value_col, DoubleType()),
            StructField("ewma", DoubleType()),
        ]
    )

    def _ewma(pdf):
        pdf = pdf.sort_values([time_col, id_col])
        out = pdf[[group_col, id_col, time_col, value_col]].copy()
        out["ewma"] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean().round(6)
        )
        return out

    return (
        events.select(group_col, id_col, time_col, value_col)
        .groupBy(group_col)
        .applyInPandas(_ewma, schema)
    )


def cumulative_sum_chunked(
    df: DataFrame,
    *,
    partition_col: str,
    order_cols: list[str],
    value_cents_expr,
    chunk_expr,
    out_col: str = "running_cents",
) -> DataFrame:
    """Running (cumulative) sum for SKEWED/HUGE partitions: identical
    output to ``sum(value) OVER (PARTITION BY p ORDER BY o ROWS UNBOUNDED
    PRECEDING)``, but the row-level window partitions by
    (partition, chunk) so one zipfian key holding 20% of the corpus no
    longer serializes into a single sort+scan (the third wired chunked
    fallback, after rolling_range_mean_chunked and sessionize_chunked —
    AQE splits skewed JOINS, never windows).

    Two-phase, the with_global_rank scheme applied to sums: a chunk-local
    running sum (parallel across chunks), then per-(partition, chunk)
    totals prefix-summed by a window over ONE ROW PER CHUNK (bounded by
    partitions × chunks, independent of row count) and joined back as an
    offset on the keys the local window already clustered.

    ``chunk_expr`` must be non-decreasing along ``order_cols`` within a
    partition (e.g. the leading order column's month) — chunk boundaries
    then split the order without reordering it. ``value_cents_expr`` must
    be an INTEGER expression (fixed-point cents): integer addition is
    associative, so regrouping chunk totals cannot flip a rounding
    boundary the way float re-association can (DESIGN.md §5)."""
    w_local = (
        Window.partitionBy(partition_col, "_chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = (
        df.withColumn("_chunk", chunk_expr)
        .withColumn("_cents", value_cents_expr)
        .withColumn("_run_local", F.sum("_cents").over(w_local))
    )
    totals = local.groupBy(partition_col, "_chunk").agg(
        F.sum("_cents").alias("_tot")
    )
    w_prefix = (
        Window.partitionBy(partition_col)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        partition_col,
        "_chunk",
        F.coalesce(F.sum("_tot").over(w_prefix), F.lit(0)).alias("_off"),
    )
    # join strategy is left to Catalyst/AQE: the fact side is already
    # partitioned by (partition, chunk) from the local window; measured
    # at 50x, forcing shuffle-hash was no better than the default
    return (
        local.join(offsets, [partition_col, "_chunk"])
        .withColumn(out_col, F.col("_run_local") + F.col("_off"))
        .drop("_chunk", "_cents", "_run_local", "_off")
    )


def ewma_portable(
    df: DataFrame,
    *,
    alpha: float = 0.3,
    group_col: str = "group",
    time_col: str = "t",
    value_col: str = "v",
    round_dp: int | None = 6,
) -> DataFrame:
    """PORTABLE twin of ``ewma_by_group``: the same adjust=False
    recurrence ``e_t = alpha·x_t + (1-alpha)·e_{t-1}`` (e_1 = x_1)
    computed as ONE array fold per group — collect the group's ordered
    values, left-fold building the EWMA array (identical floating-point
    operation sequence to the pandas recurrence: two products and one
    add per step), posexplode back. Zero Python, and DuckDB replays the
    fold with ``list_reduce`` over per-row prefixes, so the smoothing
    tier gets a driver-hash-verified row next to the Arrow production
    twin (equality pinned in pytest).

    Scale contract: the GROUP is collected as one array, so partitions
    must be bounded by construction (per-type hourly series, per-device
    daily series — the rollup shapes this targets). For unbounded
    per-group series use ``ewma_by_group``'s chunked guidance."""
    grouped = df.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(time_col).alias("t"), F.col(value_col).alias("v")
                )
            )
        ).alias("xs")
    )
    step = lambda acc, x: F.concat(  # noqa: E731
        acc,
        F.array(
            F.when(F.size(acc) == 0, x["v"].cast("double")).otherwise(
                F.lit(alpha) * x["v"] + F.lit(1.0 - alpha) * F.element_at(acc, -1)
            )
        ),
    )
    ew = F.aggregate(F.col("xs"), F.array().cast("array<double>"), step)
    z = F.arrays_zip(F.col("xs"), ew.alias("ew"))
    return (
        grouped.select(group_col, F.explode(z).alias("r"))
        .select(
            group_col,
            F.col("r.xs.t").alias(time_col),
            F.col("r.xs.v").alias(value_col),
            (
                F.round(F.col("r.ew"), round_dp)
                if round_dp is not None
                else F.col("r.ew")
            ).alias("ewma"),
        )
    )


def cusum_portable(
    df: DataFrame,
    *,
    group_col: str = "group",
    time_col: str = "t",
    value_col: str = "v",
    k: float = 0.0,
    h: float = 3.0,
    round_dp: int | None = 6,
) -> DataFrame:
    """Two-sided CUSUM changepoint detector per bounded group — the
    CHANGE-POINT ruler next to the engine's level rulers (KS/PSI compare
    two snapshots, EWMA smooths a series; CUSUM localizes WHEN a mean
    shift happened): ``s⁺_t = max(0, s⁺_{t-1} + (x_t − target − k))``,
    ``s⁻_t = max(0, s⁻_{t-1} + (target − x_t − k))``, alarm when either
    exceeds ``h`` (Page 1954). The reference level ``target`` is the
    series' FIRST value — deterministic on both engines, no mean to
    pin — and ``k`` is the usual half-shift slack.

    Same portability construction as ``ewma_portable``: the ordered
    group series folds as one array aggregate (identical FP op sequence
    ``max(0, a + (v − target − k))`` on both engines; each one-sided
    recurrence depends only on its own state, so DuckDB replays it with
    ``list_reduce`` over per-row prefixes). Same scale contract too:
    groups must be bounded by construction (per-type hourly rollups),
    the corpus collapses to those series in one aggregate."""
    grouped = df.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(time_col).alias("t"), F.col(value_col).alias("v")
                )
            )
        ).alias("xs")
    )
    target = F.element_at(F.col("xs"), 1)["v"].cast("double")

    def side(sign: float):
        def step(acc, x):
            d = (
                (x["v"].cast("double") - target - F.lit(k))
                if sign > 0
                else (target - x["v"].cast("double") - F.lit(k))
            )
            # first step guarded like ewma_portable: element_at(acc, -1)
            # on an empty array raises under ANSI; s_0 = 0 and 0 + d ≡ d
            # in IEEE, so the branch keeps the fold's FP sequence equal
            # to the oracle's 0.0-prepended list_reduce
            return F.concat(
                acc,
                F.array(
                    F.when(
                        F.size(acc) == 0, F.greatest(F.lit(0.0), d)
                    ).otherwise(
                        F.greatest(F.lit(0.0), F.element_at(acc, -1) + d)
                    )
                ),
            )
        return F.aggregate(F.col("xs"), F.array().cast("array<double>"), step)

    z = F.arrays_zip(
        F.col("xs"), side(1.0).alias("sp"), side(-1.0).alias("sn")
    )
    return (
        grouped.select(group_col, F.explode(z).alias("r"))
        .select(
            group_col,
            F.col("r.xs.t").alias(time_col),
            F.col("r.xs.v").alias(value_col),
            (
                F.round(F.col("r.sp"), round_dp)
                if round_dp is not None
                else F.col("r.sp")
            ).alias("cusum_pos"),
            (
                F.round(F.col("r.sn"), round_dp)
                if round_dp is not None
                else F.col("r.sn")
            ).alias("cusum_neg"),
            (
                (F.col("r.sp") > F.lit(h)) | (F.col("r.sn") > F.lit(h))
            ).alias("alarm"),
        )
    )
