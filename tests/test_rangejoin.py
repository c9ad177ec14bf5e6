"""Binned interval join: exactness vs the theta join, edges, plan shape."""

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.rangejoin import binned_interval_join


def _data(spark):
    facts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 499.9, 500.0, 1499.9, 1500.0, 2750.0, 9999.9])],
        ["fact_id", "v"],
    )
    intervals = spark.createDataFrame(
        [
            ("a", 0.0, 1500.0),
            ("b", 500.0, 2000.0),   # overlaps a
            ("c", 1500.0, 1500.0),  # empty interval
            ("d", 2500.0, 3000.0),
            ("e", 9999.9, 10000.0), # exact-boundary lo
        ],
        ["band", "lo", "hi"],
    )
    return facts, intervals


def test_binned_equals_theta_join(spark):
    facts, intervals = _data(spark)
    for width in (100.0, 700.0, 1500.0, 10000.0):
        got = {
            (r.fact_id, r.band)
            for r in binned_interval_join(
                facts, intervals, value_col="v", bin_width=width
            ).collect()
        }
        want = {
            (r.fact_id, r.band)
            for r in facts.join(
                intervals, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
            ).collect()
        }
        assert got == want, f"width={width}"
    # boundary semantics: lo inclusive, hi exclusive
    assert (4, "a") not in got and (2, "a") in got and (2, "b") in got
    # empty interval matches nothing; exact-lo boundary matches
    assert all(b != "c" for _, b in got)
    assert (6, "e") in got


def test_binned_join_is_equi_not_nested_loop(spark):
    facts, intervals = _data(spark)
    plan = (
        binned_interval_join(facts, intervals, value_col="v", bin_width=1000.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_binned_join_output_drops_helper_column(spark):
    facts, intervals = _data(spark)
    out = binned_interval_join(facts, intervals, value_col="v", bin_width=250.0)
    assert "_bin" not in out.columns


def test_binned_interval_join_degenerate_intervals_dropped(spark):
    """hi <= lo intervals match nothing (instead of exploding a bogus
    descending bin sequence)."""
    facts = spark.createDataFrame([(i, float(i)) for i in range(10)], ["fid", "v"])
    intervals = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 7.0, 3.0), (3, 2.0, 4.0)], ["iid", "lo", "hi"]
    )
    out = binned_interval_join(facts, intervals, value_col="v", bin_width=2.0)
    got = sorted((r.iid, r.fid) for r in out.collect())
    assert got == [(3, 2), (3, 3)]


def test_binned_interval_join_boundary_hi_on_bin_edge(spark):
    """hi exactly on a bin boundary stays exclusive at any granularity."""
    facts = spark.createDataFrame([(1, 4.0), (2, 3.999999999999)], ["fid", "v"])
    intervals = spark.createDataFrame([(1, 0.0, 4.0)], ["iid", "lo", "hi"])
    out = binned_interval_join(facts, intervals, value_col="v", bin_width=2.0)
    assert [r.fid for r in out.collect()] == [2]
