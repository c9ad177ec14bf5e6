"""Physical-plan shape assertions for the TPC-H suite (plans/tpch.py).

Correct rows are the oracle check's job; these tests pin the 100 TB plan
properties — dims broadcast, EXISTS/NOT-EXISTS become semi/anti joins,
top-k avoids a global sort, disjunctive predicates stay in an equi-join.
"""

from pyspark_etl_twitter_spark.plans import tpch as H
from tests.conftest import SF_TINY
from tests.test_plans import plan_of


def test_q3_broadcasts_customer_and_heaps_topk(spark):
    plan = plan_of(H.tpch_q3_shipping_priority(spark, SF_TINY))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # both date filters reach their scans
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_q4_exists_is_left_semi(spark):
    plan = plan_of(H.tpch_q4_order_priority(spark, SF_TINY))
    assert "LeftSemi" in plan


def test_q7_q8_q9_broadcast_all_dims(spark):
    # every dim joins as a broadcast; the only sort-merge/shuffle joins
    # allowed are fact⋈fact (lineitem⋈orders)
    for fn, n_dims in (
        (H.tpch_q7_nation_volume, 4),
        (H.tpch_q8_market_share, 5),
        (H.tpch_q9_profit_by_nation, 3),
    ):
        plan = plan_of(fn(spark, SF_TINY))
        assert plan.count("BroadcastHashJoin") >= n_dims, fn.__name__


def test_q19_disjunction_stays_equi_join(spark):
    plan = plan_of(H.tpch_q19_disjunctive_revenue(spark, SF_TINY))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q22_not_exists_is_left_anti(spark):
    plan = plan_of(H.tpch_q22_dormant_customers(spark, SF_TINY))
    assert "LeftAnti" in plan
    # dormancy window filter reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q18_broadcasts_having_output_not_fact(spark):
    # the HAVING aggregate's tiny output is the build side of both joins
    plan = plan_of(H.tpch_q18_large_volume_customers(spark, SF_TINY))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan


def test_q21_is_two_aggregates_no_self_join_explosion(spark):
    # the EXISTS/NOT-EXISTS pair compiles to per-order arithmetic: two
    # hash aggregates over lineitem, no BroadcastNestedLoopJoin
    plan = plan_of(H.tpch_q21_waiting_suppliers(spark, SF_TINY))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final × two levels


def test_q6_predicates_reach_scan(spark):
    from pyspark_etl_twitter_spark.plans.tpch import tpch_q6_forecast_revenue

    plan = (
        tpch_q6_forecast_revenue(spark, SF_TINY)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    # every Q6 predicate column is pushable; the scan must not read
    # columns beyond the 4 referenced
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q5_broadcasts_all_dims_single_fact_shuffle(spark):
    from pyspark_etl_twitter_spark.plans.tpch import (
        tpch_q5_local_supplier_volume,
    )

    plan = (
        tpch_q5_local_supplier_volume(spark, SF_TINY)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q15_max_is_broadcast_one_row(spark):
    from pyspark_etl_twitter_spark.plans.tpch import tpch_q15_top_supplier

    plan = (
        tpch_q15_top_supplier(spark, SF_TINY)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # scalar-max side and supplier dim both broadcast; the revenue view
    # never re-shuffles for the max comparison
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2


def test_derived_partsupp_properties(spark):
    """4 distinct suppliers per part, keys within [1, |supplier|], fully
    deterministic — and the build plan has no shuffle exchange (one narrow
    pass over part with a 1-row broadcast)."""
    from pyspark.sql import functions as F

    ps = H.derived_partsupp(spark, SF_TINY)
    chk = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("n"),
        F.min("ps_suppkey").alias("lo"),
        F.max("ps_suppkey").alias("hi"),
    )
    bad = chk.filter((F.col("n") != 4) | (F.col("lo") < 1)).count()
    assert bad == 0
    n_supp = ps.sparkSession.read.parquet(f"{SF_TINY}/supplier.parquet").count()
    assert ps.agg(F.max("ps_suppkey")).first()[0] <= n_supp
    plan = plan_of(ps)
    assert "Exchange hashpartitioning" not in plan


def test_q2_decorrelates_to_single_min_agg(spark):
    # the correlated min subquery becomes one groupBy(ps_partkey).min —
    # exactly one aggregate-exchange pair, every dim a broadcast
    plan = plan_of(H.tpch_q2_min_cost_supplier(spark, SF_TINY))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q11_threshold_is_one_row_broadcast(spark):
    plan = plan_of(H.tpch_q11_important_stock(spark, SF_TINY))
    # per-part agg + grand total; threshold compare rides a broadcast,
    # never a shuffle of the per-part relation against itself
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q20_semi_join_carries_only_suppkeys(spark):
    plan = plan_of(H.tpch_q20_excess_stock(spark, SF_TINY))
    assert "LeftSemi" in plan
    # the shipdate window reaches the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
