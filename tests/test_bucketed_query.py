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


def test_bucket_pruning_on_key_filter(spark):
    """Filtering a bucketed table on its bucket key must prune buckets at
    the scan (SelectedBucketsCount < total) — the read-side payoff of
    bucketing beyond zero-exchange joins: a point lookup touches 1/k of
    the files."""
    from pyspark_etl_twitter_spark.plans.bucketed import _ensure_bucketed

    t = _ensure_bucketed(spark, SF_TINY, "orders", "o_orderkey")
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    old_auto = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    try:
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        # without a join/agg needing the distribution, the planner falls
        # back to a plain scan; force the bucketed read so pruning applies
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        df = spark.table(t).filter(F.col("o_orderkey") == 7)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old_auto
        )
    assert "SelectedBucketsCount: 1 out of" in plan
    # and the filter still returns the right rows
    keys = {r.o_orderkey for r in df.collect()}
    assert keys <= {7}
