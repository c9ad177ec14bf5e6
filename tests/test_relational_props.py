"""Property checks for non-oracle-able aggregates: sketches must land
within their documented error bounds of the exact answers."""

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.plans.relational2 import approx_summary, percentile_prices
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


def test_approx_distinct_within_hll_error(spark):
    approx = {r.l_returnflag: r.approx_parts for r in approx_summary(spark, SF_TINY).collect()}
    li = load_table(spark, SF_TINY, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("n")).collect()
    }
    for flag, n in exact.items():
        assert abs(approx[flag] - n) / n < 0.05  # HLL++ default rsd is 5%


def test_approx_percentile_near_exact(spark):
    approx = {r.l_returnflag: r.approx_p50 for r in approx_summary(spark, SF_TINY).collect()}
    exact = {r.l_returnflag: r.p50 for r in percentile_prices(spark, SF_TINY).collect()}
    for flag, p50 in exact.items():
        assert abs(approx[flag] - p50) / p50 < 0.05
