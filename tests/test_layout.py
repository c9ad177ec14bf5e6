"""Layout-management tests: compaction, range-sorted total order, and
Z-order clustering measured by the actual skipping metric (files a
min/max-pruned box scan must open)."""

import glob
import os

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.layout import (
    compact_write,
    file_minmax_stats,
    files_touched_by_box,
    range_sorted_write,
    zorder_write,
)

SF_TINY = "/root/testdata/sf0.001"


def _events(spark):
    # integer projection of the events table: (user_id, value bucket)
    return (
        spark.read.parquet(f"{SF_TINY}/lineitem.parquet")
        .select(
            F.col("l_orderkey").alias("a"),
            F.col("l_partkey").alias("b"),
            F.col("l_extendedprice").alias("payload"),
        )
    )


def test_compact_write_layout(spark, tmp_path):
    dst = str(tmp_path / "compact")
    df = spark.read.parquet(f"{SF_TINY}/orders.parquet")
    compact_write(
        df,
        dst,
        partition_by=("o_orderstatus",),
        sort_within=("o_orderdate",),
        max_records_per_file=500,
    )
    part_dirs = {p for p in os.listdir(dst) if p.startswith("o_orderstatus=")}
    assert len(part_dirs) >= 2  # hive directories exist
    for f in glob.glob(f"{dst}/*/*.parquet"):
        import pyarrow.parquet as pq

        assert pq.ParquetFile(f).metadata.num_rows <= 500
    # read-back equality
    back = spark.read.parquet(dst)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_range_sorted_write_total_order(spark, tmp_path):
    dst = str(tmp_path / "ranged")
    df = _events(spark)
    range_sorted_write(df, dst, ("a",), n_files=6)
    stats = file_minmax_stats(dst, ["a"])
    spans = sorted(
        ((s["min"]["a"], s["max"]["a"]) for s in stats if s["min"]),
    )
    # disjoint, ordered key ranges across files = total order
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
    # a narrow key range touches exactly one file
    key = spans[2][0]
    assert files_touched_by_box(stats, {"a": (key, key)}) == 1


def test_zorder_beats_linear_sort_on_trailing_dim(spark, tmp_path):
    df = _events(spark)
    lin, zo = str(tmp_path / "linear"), str(tmp_path / "zorder")
    # linear layout: range-sorted by (a, b) — tight on a only
    range_sorted_write(df, lin, ("a", "b"), n_files=8)
    zorder_write(df, zo, ["a", "b"], n_files=8)
    stats_lin = file_minmax_stats(lin, ["a", "b"])
    stats_zo = file_minmax_stats(zo, ["a", "b"])
    bmin = df.agg(F.min("b"), F.max("b")).first()
    lo, hi = bmin[0], bmin[1]
    # box on the TRAILING dimension only: 10% slice of b's range
    box = {"b": (lo, lo + (hi - lo) * 0.1)}
    touched_lin = files_touched_by_box(stats_lin, box)
    touched_zo = files_touched_by_box(stats_zo, box)
    # the linear sort is blind on b (every file spans all of b); z-order
    # must skip at least some files
    assert touched_lin == len(stats_lin)
    assert touched_zo < touched_lin
    # and on a leading-dimension slice z-order still skips
    amin = df.agg(F.min("a"), F.max("a")).first()
    abox = {"a": (amin[0], amin[0] + (amin[1] - amin[0]) * 0.1)}
    assert files_touched_by_box(stats_zo, abox) < len(stats_zo)


def test_zorder_write_preserves_rows(spark, tmp_path):
    dst = str(tmp_path / "zorder_rows")
    df = _events(spark)
    zorder_write(df, dst, ["a", "b"], n_files=4)
    back = spark.read.parquet(dst)
    assert back.count() == df.count()
    assert "_zkey" not in back.columns
    got = back.agg(F.sum("payload")).first()[0]
    want = df.agg(F.sum("payload")).first()[0]
    assert abs(got - want) < 1e-3  # double sum order differs post-shuffle


def test_backfill_overwrites_only_target_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.layout import backfill_partitions

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(d, i, float(i)) for d in ("d1", "d2", "d3") for i in range(10)],
        ["day", "k", "v"],
    )
    base.write.partitionBy("day").parquet(path)

    # backfill d2 with corrected values (half the rows, v*10)
    fix = spark.createDataFrame(
        [("d2", i, float(i) * 10) for i in range(5)], ["day", "k", "v"]
    )
    backfill_partitions(fix, path, ["day"])

    after = spark.read.parquet(path)
    assert after.filter("day = 'd1'").count() == 10        # untouched
    assert after.filter("day = 'd3'").count() == 10        # untouched
    d2 = after.filter("day = 'd2'")
    assert d2.count() == 5                                  # replaced, not appended
    assert d2.agg(F.sum("v")).first()[0] == sum(i * 10 for i in range(5))

    # idempotence: re-running the same backfill changes nothing
    backfill_partitions(fix, path, ["day"])
    assert spark.read.parquet(path).count() == 25
