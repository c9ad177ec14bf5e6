"""Skew-salting correctness + bucketed co-located join tests."""

import pytest
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


def test_salted_aggregate_equals_plain(spark):
    li = load_table(spark, SF_TINY, "lineitem")
    got = {
        r.l_suppkey: (r.n, round(r.total, 4), r.max_qty)
        for r in salted_aggregate(
            li,
            "l_suppkey",
            {"n": "count:*", "total": "sum:l_extendedprice", "max_qty": "max:l_quantity"},
        ).collect()
    }
    want = {
        r.l_suppkey: (r.n, round(r.total, 4), r.max_qty)
        for r in li.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_extendedprice").alias("total"),
            F.max("l_quantity").alias("max_qty"),
        )
        .collect()
    }
    assert got == want


def test_salted_aggregate_rejects_non_reassociable(spark):
    li = load_table(spark, SF_TINY, "lineitem")
    with pytest.raises(ValueError):
        salted_aggregate(li, "l_suppkey", {"a": "avg:l_quantity"})


def test_salted_join_equals_plain(spark):
    li = load_table(spark, SF_TINY, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    sup = load_table(spark, SF_TINY, "supplier")
    got = salted_broadcast_left(li, sup, "s_suppkey")
    want = li.join(sup, "s_suppkey")
    assert got.count() == want.count()
    g = got.groupBy("s_suppkey").count().collect()
    w = want.groupBy("s_suppkey").count().collect()
    assert sorted(map(tuple, g)) == sorted(map(tuple, w))


def test_salted_join_left_keeps_unmatched(spark):
    """Default how='left': fact rows whose key is missing from dim survive
    with null dim columns, exactly like a plain left join."""
    li = load_table(spark, SF_TINY, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    sup = load_table(spark, SF_TINY, "supplier").filter(F.col("s_suppkey") % 2 == 0)
    got = salted_broadcast_left(li, sup, "s_suppkey")
    want = li.join(sup, "s_suppkey", "left")
    assert got.count() == want.count() == li.count()
    n_null_got = got.filter(F.col("s_name").isNull()).count()
    n_null_want = want.filter(F.col("s_name").isNull()).count()
    assert n_null_got == n_null_want > 0
    inner = salted_broadcast_left(li, sup, "s_suppkey", how="inner")
    assert inner.count() == li.join(sup, "s_suppkey").count() < li.count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """bucketBy co-location: a join between two tables bucketed on the key
    runs with zero Exchange operators — the 100 TB repeated-join answer.
    (warehouse dir is a static conf → uses ./spark-warehouse, gitignored.)"""
    import os

    t_orders, t_li = f"b_orders_{os.getpid()}", f"b_lineitem_{os.getpid()}"
    orders = load_table(spark, SF_TINY, "orders")
    li = load_table(spark, SF_TINY, "lineitem")
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_li}")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(t_orders)
    li.withColumnRenamed("l_orderkey", "o_orderkey").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable(t_li)
    # at test scale the planner prefers broadcast (which also avoids a
    # shuffle); disable it to expose the bucketed sort-merge path a 100 TB
    # fact⋈fact join would take
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_li).join(spark.table(t_orders), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located buckets
        assert "Bucketed: true" in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew-join handling: a planted hot key (90% of the
    fact side) makes one shuffle partition dwarf the rest; with
    skewJoin enabled and thresholds lowered to testdata scale, AQE must
    split the hot partition (OptimizeSkewedJoin) — the runtime half of
    the skew story next to the manual salting operators above."""
    from pyspark.sql import functions as F

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # force a sort-merge join (skew handling targets shuffle joins)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        dim = spark.range(50_000).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
        )
        joined = fact.join(dim, "k")
        # AQE decisions appear only in THIS DataFrame's executed plan —
        # count() would build (and adapt) a separate aggregate plan
        rows = joined.collect()
        assert len(rows) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not mark the skewed join"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
