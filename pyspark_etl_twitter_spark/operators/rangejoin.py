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
) -> DataFrame:
    """Join fact rows to interval rows with ``lo <= value < hi`` via
    fixed-width bin equi-join. Exact: candidates from shared bins are
    re-filtered on the true predicate, so results equal the theta join.
    Inner semantics only — the post-join containment filter makes any
    null-extended outer row vanish, so offering outer modes would lie.

    The interval side explodes into ``sequence(floor(lo/w), floor(hi/w))``
    bin ids; the fact side computes ``floor(value/w)`` — a narrow projection,
    no data movement until the single hash shuffle on bin id. The upper
    bound deliberately over-includes one bin when ``hi`` sits exactly on a
    bin boundary (hi is exclusive): the exact re-filter discards those
    candidates, and over-inclusion is robust at any value granularity,
    unlike an epsilon subtraction. Degenerate intervals (``hi <= lo``)
    match nothing and are dropped before the explode — without the guard,
    ``sequence`` would raise or fabricate a descending bin list.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(float(bin_width))

    def _bin(c: Column) -> Column:
        return F.floor(c / w).cast("bigint")

    iv = intervals.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_bin",
        F.explode(F.sequence(_bin(F.col(lo_col)), _bin(F.col(hi_col)))),
    )
    fx = facts.withColumn("_bin", _bin(F.col(value_col)))
    joined = fx.join(iv, "_bin", "inner").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return joined.drop("_bin")
