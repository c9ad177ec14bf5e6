"""Distributed global ranking without a single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the whole
relation to one partition — fine for a 30-row demo, a ceiling for a
multi-million-term vocabulary. ``with_global_rank`` produces the identical
total-order rank in three scale-safe steps, the same scheme
``RDD.zipWithIndex`` uses internally (Spark core, zipWithIndex: one
count-per-partition job, offsets broadcast back):

1. range-partition by the sort key, so partition *i* holds only keys that
   sort before everything in partition *i+1*;
2. count rows per partition and fold the counts into per-partition start
   offsets — the only driver-side data is ONE ROW PER PARTITION, O(shuffle
   partitions), independent of data size;
3. per-partition ``row_number`` (partitioned window — parallel) plus the
   broadcast offset.

The order must be total (include a unique tiebreak column); with a total
order the result is byte-identical to the single-partition form. The
input is localCheckpoint-ed before the counting job so the upstream plan
(typically an aggregate) computes once, not once per downstream action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    *,
    rank_col: str = "rank0",
) -> DataFrame:
    """Append 0-based global rank ``rank_col`` under the total order
    ``order_cols`` (pass sort expressions, e.g. ``F.col("df").desc()``)
    with no single-partition stage."""
    part = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid", "left")
        .withColumn(rank_col, F.coalesce("_off", F.lit(0)) + F.col("_rn") - 1)
        .drop("_pid", "_rn", "_off")
    )
