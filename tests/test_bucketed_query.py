"""Plan + correctness assertions for the registry-visible bucketed join."""

from pyspark_etl_twitter_spark.plans.bucketed import bucketed_join_revenue
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY

from pyspark.sql import functions as F


def test_bucketed_join_revenue_zero_exchange_plan(spark):
    df = bucketed_join_revenue(spark, SF_TINY)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert "SortMergeJoin" in plan
    # the only exchange allowed is the 5-row priority agg AFTER the join:
    # nothing between the bucketed scans and the join itself
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning" not in join_part


def test_bucketed_join_revenue_matches_plain_join(spark):
    got = {
        r.o_orderpriority: (r.n_items, r.revenue)
        for r in bucketed_join_revenue(spark, SF_TINY).collect()
    }
    li = load_table(spark, SF_TINY, "lineitem")
    orders = load_table(spark, SF_TINY, "orders")
    want = {
        r.o_orderpriority: (r.n_items, r.revenue)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_bucketed_tables_reused_across_calls(spark):
    """Second call must not rewrite the bucketed tables (the whole point is
    amortizing the write-time shuffle)."""
    bucketed_join_revenue(spark, SF_TINY)
    names = {t.name for t in spark.catalog.listTables() if t.name.startswith("bkt_")}
    assert names  # created by first call
    bucketed_join_revenue(spark, SF_TINY)
    assert {
        t.name for t in spark.catalog.listTables() if t.name.startswith("bkt_")
    } == names
