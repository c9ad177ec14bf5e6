"""Data-quality operators for pipeline gating.

``data_quality_report``: a one-aggregate-pass expectation report — row
count, null counts, range violations, key duplication — the pre-flight
check a training-data job runs before consuming a table. Everything is a
conditional aggregate, so cost is one scan regardless of how many
expectations are attached.

``observed_pipeline``: Spark's ``DataFrame.observe`` API — metrics
accumulated *during* another query's execution (zero extra passes). At
100 TB an extra validation scan is real money; observe() rides along with
whatever action runs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def data_quality_report(
    df: DataFrame,
    *,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """One-row report: n_rows plus per-expectation violation counts.
    Column naming: ``null_<col>``, ``dup_<col>``, ``oob_<col>``."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null or []:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}"))
    for c in unique or []:
        aggs.append(
            (F.count(F.lit(1)) - F.countDistinct(c)).alias(f"dup_{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        aggs.append(
            F.count(F.when((F.col(c) < lo) | (F.col(c) > hi), 1)).alias(f"oob_{c}")
        )
    return df.agg(*aggs)


def observed_pipeline(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach in-flight metrics to a plan: returns (df, observation).
    After any action on the returned df, ``observation.get`` holds the
    metrics — no second pass over the data."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(df.columns[0]).isNull(), 1).otherwise(0)).alias(
            f"null_{df.columns[0]}"
        ),
    )
    return observed, obs


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier flagging per group: adds ``_med``, ``_mad`` and
    ``is_outlier`` (|x − median| > k·MAD) columns.

    Exact medians need two aggregate passes over the fact (median, then
    median of absolute deviations), but both aggregates reduce to one tiny
    row per group, re-attached via broadcast joins — the fact table itself
    never shuffles. At 100 TB swap ``F.median`` for
    ``F.percentile_approx(value, 0.5)`` to fold both passes into one scan
    each with bounded-memory sketches; exact is kept here because the
    oracle (DuckDB ``median``) is exact."""
    med = df.groupBy(*group_cols).agg(F.median(value_col).alias("_med"))
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(*group_cols).agg(F.median("_adev").alias("_mad"))
    return dev.join(F.broadcast(mad), group_cols).withColumn(
        "is_outlier", F.col("_adev") > k * F.col("_mad")
    )
