"""Distributed global ranking without a single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the whole
relation to one partition — fine for a 30-row demo, a ceiling for a
multi-million-term vocabulary. ``with_global_rank`` produces the identical
total-order rank in three scale-safe steps, the same scheme
``RDD.zipWithIndex`` uses internally (Spark core, zipWithIndex: one
count-per-partition job, offsets folded back):

1. range-partition by the sort key, so partition *i* holds only keys that
   sort before everything in partition *i+1*;
2. count rows per partition and fold the counts into per-partition start
   offsets — the offset relation is ONE ROW PER PARTITION, O(shuffle
   partitions) P, independent of data size; the prefix sum is a broadcast
   theta self-join over those P rows (P² pairs, trivially small), chosen
   over a global-window cumsum so NO stage anywhere in the plan is
   Exchange SinglePartition (the invariant tests/test_plans.py pins);
3. per-partition ``row_number`` (partitioned window — parallel) plus the
   broadcast offset.

The order must be total (include a unique tiebreak column); with a total
order the result is byte-identical to the single-partition form.

Consistency contract: ``_pid`` must agree between the count branch and
the rank branch even though range-boundary sampling is seeded per
execution. The partitioned relation is a LAZY ``localCheckpoint``
(``eager=False``): building the plan runs no jobs (the round-4 review's
requirement — plan sweeps and bench fingerprint passes construct these
plans constantly), the first action materializes the partitions exactly
once, and both branches read that one materialization because the
checkpoint TRUNCATES LINEAGE — there is no recompute path left that
could re-sample boundaries. If checkpoint blocks are lost (executor
death), Spark FAILS THE JOB loudly instead of silently recomputing with
different boundaries — precisely the failure mode the round-4 advisory
flagged against the persist()+cache-registry design, whose correctness
silently depended on cache retention (eviction → two independent
boundary samples → wrong ranks). The bounded cache registry
(operators/cachereg.py) remains for PERFORMANCE-only reuse
(source_vocab_overlap), where eviction costs recompute, never
correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def release_cache() -> None:
    """Unpersist relations cached by recent operator calls (the rank no
    longer registers caches — kept as the public release hook for the
    registry's remaining perf-only users)."""
    from pyspark_etl_twitter_spark.operators.cachereg import release_all

    release_all()


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    *,
    rank_col: str = "rank0",
) -> DataFrame:
    """Append 0-based global rank ``rank_col`` under the total order
    ``order_cols`` (pass sort expressions, e.g. ``F.col("df").desc()``)
    with no single-partition stage over the data and no eager jobs."""
    part = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    prior = counts.select(
        F.col("_pid").alias("_qid"), F.col("_n").alias("_qn")
    )
    off = (
        counts.join(F.broadcast(prior), F.col("_qid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_qn"), F.lit(0)).alias("_off"))
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off), "_pid", "left")
        .withColumn(rank_col, F.coalesce("_off", F.lit(0)) + F.col("_rn") - 1)
        .drop("_pid", "_rn", "_off")
    )
