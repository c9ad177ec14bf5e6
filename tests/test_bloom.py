"""Bloom join pruning: exactness (prefiltered join ≡ plain join),
no-false-negatives property, and the broadcast-semi plan shape."""

import pytest
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.bloom import (
    bloom_prefilter,
    bloom_prefilter_join,
    bloom_positions,
)
from tests.conftest import SF_TINY
from tests.test_plans import plan_of


@pytest.fixture()
def fact_dim(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 600).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 100).select(
        (F.col("id") * 3).alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    return fact, dim


def test_bloom_join_equals_plain_join(spark, fact_dim):
    fact, dim = fact_dim
    got = bloom_prefilter_join(fact, dim, "k").select("k", "payload", "dim_val")
    want = fact.join(dim, "k").select("k", "payload", "dim_val")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_join_exact_even_when_tiny_filter_saturates(spark, fact_dim):
    # 64 bits for 100 keys → filter saturates, prunes nothing, still exact
    fact, dim = fact_dim
    got = bloom_prefilter_join(fact, dim, "k", n_bits=64).select("k", "payload", "dim_val")
    want = fact.join(dim, "k").select("k", "payload", "dim_val")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_prefilter_never_drops_matches_and_prunes_most_misses(spark, fact_dim):
    fact, dim = fact_dim
    kept = bloom_prefilter(fact, dim, "k")
    matches = fact.join(dim.select("k"), "k", "left_semi")
    # no false negatives
    assert kept.join(matches, ["k", "payload"], "left_semi").count() == matches.count()
    # real pruning: kept is far below the full fact (FP rate ~0 at 2^20 bits)
    assert matches.count() <= kept.count() < fact.count() * 0.6


def test_positions_table_is_bounded(spark, fact_dim):
    _, dim = fact_dim
    pos = bloom_positions(dim, "k", n_bits=1 << 20, n_hashes=2)
    assert pos.count() <= 200  # ≤ |dim| · n_hashes


def test_bloom_join_plan_shape(spark):
    from pyspark_etl_twitter_spark.plans.advanced_queries import (
        bloom_join_urgent_revenue,
    )

    plan = plan_of(bloom_join_urgent_revenue(spark, SF_TINY))
    # two hash functions → two broadcast left-semi prunes before the join
    assert plan.count("LeftSemi") >= 2
    assert "BatchEvalPython" not in plan
