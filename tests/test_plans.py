"""Physical-plan shape tests: the scale guarantees are plan properties,
so they are asserted like any other behavior (SURVEY.md §4).

If one of these breaks, the query still returns correct rows — but the
100 TB story (pushdown, broadcast, partial agg, no token shuffles) is gone.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.sentiment import fit_and_score
from pyspark_etl_twitter_spark.plans import relational as R
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


def plan_of(df, *, execute: bool = False) -> str:
    if execute:
        # AQE finalizes (and codegen-annotates) the plan only at execution
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    df = R.pricing_summary(spark, SF_TINY)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read unused columns
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    assert "HashAggregate" in plan  # partial+final hash agg, not sort agg


def test_pricing_summary_is_codegen(spark):
    df = R.pricing_summary(spark, SF_TINY)
    plan = plan_of(df, execute=True)
    # codegen stage markers "*(n)" appear once AQE finalizes the plan
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan  # no Python in the row path


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = plan_of(R.revenue_by_nation(spark, SF_TINY))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_global_top_orders_avoids_full_sort(spark):
    plan = plan_of(R.global_top_orders(spark, SF_TINY))
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, not a global sort


def test_semi_and_anti_join_physical(spark):
    assert "LeftSemi" in plan_of(R.semi_join_customers(spark, SF_TINY))
    assert "LeftAnti" in plan_of(R.anti_join_customers(spark, SF_TINY))


def test_range_join_is_broadcast_nested_loop(spark):
    plan = plan_of(R.range_join_price_bands(spark, SF_TINY))
    assert "BroadcastNestedLoopJoin" in plan  # tiny dim side, no shuffle of facts


def test_fit_and_score_has_no_token_shuffle(spark):
    """The (id, term) aggregations must reuse the doc-id partitioning:
    exactly one exchange below the TF aggregate (the compact-docs
    repartition), none between explode and groupBy."""
    docs = load_table(spark, SF_TINY, "documents")
    plan = plan_of(fit_and_score(docs))
    assert "BroadcastHashJoin" in plan  # weight dim never shuffles the fact side
    assert "BatchEvalPython" not in plan
    # doc_id exchanges (dedup by plan_id — cached subtrees print twice):
    # 1. the compact-docs repartition feeding the TF aggregate, which then
    #    needs no exchange of exploded tokens (subset-key clustering);
    # 2. the post-join margin aggregate — AQE's cache boundary hides tf's
    #    partitioning, but the preceding partial agg reduces that shuffle to
    #    one row per (doc, partition). Anything beyond 2 = a token shuffle.
    import re

    ids = set(re.findall(r"Exchange hashpartitioning\(doc_id[^]]*plan_id=(\d+)", plan))
    assert len(ids) <= 2, plan


def test_no_python_udfs_anywhere_in_query_pack(spark):
    from pyspark_etl_twitter_spark.plans.registry import QUERIES

    for name in (
        "sentiment_classes",
        "dedup_minhash_pairs",
        "dedup_simhash_fingerprints",
        "knn_brute_cosine",
        "text_quality_by_source",
        "doc_fingerprints",
    ):
        plan = plan_of(QUERIES[name](spark, SF_TINY))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_asof_is_single_pass_window(spark):
    """The as-of join must be a window over one shuffle, not a join."""
    plan = plan_of(R.asof_purchase_click(spark, SF_TINY))
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_training_mix_is_exchange_free_filter(spark):
    """Deterministic mix sampling must compile to a pure per-row filter over
    the scan — no exchange, no sort, no Python."""
    from pyspark_etl_twitter_spark.operators.packing import training_mix

    docs = load_table(spark, SF_TINY, "documents")
    plan = plan_of(training_mix(docs, {"src0": 1.0, "src1": 0.5}))
    assert "Exchange" not in plan and "Sort" not in plan
    assert "Filter" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_counts_are_partially_aggregated(spark):
    """The (id, gram) frequency aggregates must map-side combine: two
    HashAggregate phases per explode (partial before any exchange)."""
    from pyspark_etl_twitter_spark.operators.textstats import repetition_columns

    docs = load_table(spark, SF_TINY, "documents")
    plan = plan_of(repetition_columns(docs))
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_asof_nearest_resolves_ties_backward(spark):
    import datetime

    from pyspark_etl_twitter_spark.plans import relational as R

    # user 1: clicks 1h before AND 1h after the purchase (tie → backward);
    # user 2: only a following click; user 3: no clicks at all
    rows = [
        (1, datetime.datetime(2024, 1, 1, 9), 1, "click", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 10), 1, "purchase", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 11), 1, "click", 1.0, "{}"),
        (4, datetime.datetime(2024, 1, 1, 10), 2, "purchase", 1.0, "{}"),
        (5, datetime.datetime(2024, 1, 1, 12), 2, "click", 1.0, "{}"),
        (6, datetime.datetime(2024, 1, 1, 10), 3, "purchase", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    ev.createOrReplaceTempView("_asof_ev")

    import pyspark_etl_twitter_spark.sources.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda spark, sf_dir, name: spark.table("_asof_ev")
        R.load_table = cat.load_table
        got = {r.user_id: r.nearest_click_ts for r in R.asof_nearest_click(spark, "x").collect()}
    finally:
        cat.load_table = orig
        R.load_table = orig
    assert got[1] == datetime.datetime(2024, 1, 1, 9)   # tie → backward
    assert got[2] == datetime.datetime(2024, 1, 1, 12)  # forward only
    assert got[3] is None                                # no click


def test_vocab_ranking_has_no_single_partition_window(spark):
    """The two-phase distributed rank (operators/ranking.py) must keep
    vocabulary/weight construction free of Exchange SinglePartition — the
    100 TB ceiling the old global row_number imposed."""
    from pyspark_etl_twitter_spark.operators.encoding import build_vocab
    from pyspark_etl_twitter_spark.operators.sentiment import build_weight_table
    from pyspark_etl_twitter_spark.plans.registry import QUERIES

    docs = load_table(spark, SF_TINY, "documents")
    for df in (
        build_vocab(docs),
        build_weight_table(docs),
        QUERIES["vocab_head"](spark, SF_TINY),
        QUERIES["encoded_docs"](spark, SF_TINY),
        QUERIES["sentiment_weights_head"](spark, SF_TINY),
    ):
        assert "SinglePartition" not in plan_of(df)


def test_with_global_rank_matches_global_row_number(spark):
    """Two-phase rank ≡ single-partition row_number under the same total
    order, including duplicate sort values with unique tiebreaks."""
    from pyspark.sql import Window

    from pyspark_etl_twitter_spark.operators.ranking import with_global_rank

    df = spark.createDataFrame(
        [(i % 7, f"t{i:03d}") for i in range(500)], ["n", "term"]
    ).repartition(13)
    order = [F.col("n").desc(), F.col("term")]
    got = {
        r.term: r.rank0
        for r in with_global_rank(df, order, rank_col="rank0").collect()
    }
    w = Window.orderBy(*order)
    expect = {
        r.term: r.rank0
        for r in df.withColumn("rank0", F.row_number().over(w) - 1).collect()
    }
    assert got == expect


def test_with_global_rank_empty_input(spark):
    from pyspark_etl_twitter_spark.operators.ranking import with_global_rank

    df = spark.createDataFrame([], "n long, term string")
    assert with_global_rank(df, [F.col("n")], rank_col="r").count() == 0


def test_with_global_rank_interleaved_build_then_execute(spark):
    """The review scenario the bounded cache registry exists for: build
    several rank plans, then execute an EARLIER one — its persisted
    relation must still be live so both branches read one computation
    and ranks stay exact."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.ranking import with_global_rank

    df = spark.range(5000).select((F.col("id") * 13 % 997).alias("k"), "id")
    first = with_global_rank(df, [F.col("k").asc(), F.col("id").asc()], rank_col="r")
    for i in range(3):  # later builds must not evict the first plan's cache
        with_global_rank(df, [F.col("k").desc(), F.col("id").asc()])
    want = df.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.col("k").asc(), F.col("id").asc())) - 1,
    )
    bad = first.alias("a").join(want.alias("b"), ["k", "id"]).filter("a.r != b.r")
    assert bad.count() == 0
