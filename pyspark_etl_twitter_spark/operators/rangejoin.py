"""Binned range join: the shuffle-scalable form of interval containment.

The BNLJ form (plans/relational.py range_join_price_bands) is right when
the interval side is tiny and broadcastable — O(fact × intervals)
comparisons, no shuffle. When the interval side is LARGE (thousands to
millions of intervals — IP ranges, price tiers per merchant, time windows
per device), BNLJ is O(n·m) and a broadcast no longer fits. The standard
scale-out: discretize the value domain into fixed-width bins, explode each
interval into the bins it overlaps, equi-join fact bins against interval
bins, and re-check exact containment. Work becomes
O(n + m·(avg_span/bin_width)) with an ordinary hash shuffle — AQE and
skew-join handling apply, and Catalyst pushes the bin computation into the
scan projection.

Bin width trades replication (interval side) against candidate false
positives (filtered post-join); pick ~ the median interval span so each
interval lands in 1-2 bins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to interval rows with ``lo <= value < hi`` via
    fixed-width bin equi-join. Exact: candidates from shared bins are
    re-filtered on the true predicate, so results equal the theta join.

    The interval side explodes into ``sequence(floor(lo/w), floor((hi-ε)/w))``
    bin ids; the fact side computes ``floor(value/w)`` — a narrow projection,
    no data movement until the single hash shuffle on bin id.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(float(bin_width))

    def _bin(c: Column) -> Column:
        return F.floor(c / w).cast("bigint")

    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _bin(F.col(lo_col)),
                # hi is exclusive: a bin is only relevant if [lo, hi) overlaps
                # it, so the last bin holds the largest value strictly < hi
                _bin(F.col(hi_col) - F.lit(1e-9)),
            )
        ),
    )
    fx = facts.withColumn("_bin", _bin(F.col(value_col)))
    joined = fx.join(iv, "_bin", how).filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return joined.drop("_bin")
