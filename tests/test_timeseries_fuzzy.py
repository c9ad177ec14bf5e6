"""Time-series resample/forward-fill and blocked fuzzy name matching."""

from datetime import datetime

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.curation import fuzzy_name_pairs
from pyspark_etl_twitter_spark.operators.timeseries import resample_ffill
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY
from tests.test_plans import plan_of


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def test_resample_fills_gap_with_last_average(spark):
    ev = _events(
        spark,
        [
            ("a", datetime(2024, 1, 1, 0, 10), 10.0),
            ("a", datetime(2024, 1, 1, 0, 50), 20.0),
            # hour 1 empty → gap, carries 15.0
            ("a", datetime(2024, 1, 1, 2, 5), 7.0),
        ],
    )
    out = {
        r["bucket"]: (r["avg_value"], r["is_gap"])
        for r in resample_ffill(ev).collect()
    }
    assert out[datetime(2024, 1, 1, 0, 0)] == (15.0, False)
    assert out[datetime(2024, 1, 1, 1, 0)] == (15.0, True)
    assert out[datetime(2024, 1, 1, 2, 0)] == (7.0, False)


def test_resample_grid_is_dense_per_group(spark):
    ev = load_table(spark, SF_TINY, "events")
    out = resample_ffill(ev).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r["event_type"], []).append(r["bucket"])
    for buckets in by_group.values():
        buckets.sort()
        deltas = {
            int((b - a).total_seconds()) for a, b in zip(buckets, buckets[1:])
        }
        assert deltas == {3600}  # no holes in the grid
    assert all(r["avg_value"] is not None for r in out)  # fill is total


def test_resample_exact_units_match_float_path(spark):
    ev = load_table(spark, SF_TINY, "events")
    exact = {
        (r["event_type"], r["bucket"]): r["avg_value_u6"]
        for r in resample_ffill(ev, exact_dp=(2, 6)).collect()
    }
    approx = {
        (r["event_type"], r["bucket"]): r["avg_value"]
        for r in resample_ffill(ev).collect()
    }
    assert exact.keys() == approx.keys()
    for key, u6 in exact.items():
        # truncating fixed-point vs rounded double: within one micro-unit
        # (truncation can sit a full unit below a rounded-up float)
        assert abs(u6 / 1e6 - approx[key]) <= 1.01e-6


def test_rolling_chunked_equals_unchunked(spark):
    import pytest

    from pyspark_etl_twitter_spark.operators.timeseries import (
        rolling_range_mean,
        rolling_range_mean_chunked,
    )

    ev = load_table(spark, SF_TINY, "events")
    plain = {
        r["event_id"]: (r["rolling_avg_u6"], r["n_win"])
        for r in rolling_range_mean(ev).collect()
    }
    # 6-hour chunks over a 30-day span → ~120 window partitions per group
    chunked = {
        r["event_id"]: (r["rolling_avg_u6"], r["n_win"])
        for r in rolling_range_mean_chunked(
            ev, chunk_us=6 * 3_600_000_000
        ).collect()
    }
    assert plain == chunked
    # degenerate chunk = frame: maximum helper replication, still identical
    edge = {
        r["event_id"]: (r["rolling_avg_u6"], r["n_win"])
        for r in rolling_range_mean_chunked(
            ev, chunk_us=3_600_000_000
        ).collect()
    }
    assert plain == edge
    with pytest.raises(ValueError):
        rolling_range_mean_chunked(ev, chunk_us=1)


def test_rolling_chunked_window_partitions_by_chunk(spark):
    from pyspark_etl_twitter_spark.operators.timeseries import (
        rolling_range_mean_chunked,
    )

    ev = load_table(spark, SF_TINY, "events")
    plan = plan_of(rolling_range_mean_chunked(ev))
    assert "_chunk" in plan  # window partition key includes the time chunk


def test_fuzzy_pairs_planted(spark):
    df = spark.createDataFrame(
        [("cold widget",), ("bold widget",), ("cold bolt",), ("cold widget",)],
        "p_name string",
    )
    out = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in fuzzy_name_pairs(df, max_dist=4).collect()
    }
    # same block (widget), distance 1; "cold bolt" blocks separately
    assert out == {("bold widget", "cold widget"): 1}


def test_fuzzy_pairs_compare_vocabulary_not_rows(spark):
    # 1000 rows of the same two names → still exactly one candidate pair
    rows = [("cold widget",), ("bold widget",)] * 500
    df = spark.createDataFrame(rows, "p_name string")
    assert fuzzy_name_pairs(df, max_dist=4).count() == 1


def test_fuzzy_join_is_blocked_equi_join(spark):
    part = load_table(spark, SF_TINY, "part")
    plan = plan_of(fuzzy_name_pairs(part))
    # blocked ER must hash-join on the block key, not nested-loop the vocab
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_resample_interpolate_planted_gap(spark):
    import datetime

    from pyspark_etl_twitter_spark.operators.timeseries import (
        resample_interpolate,
    )

    # one group, values 10.0 at 00h and 40.0 at 03h → gaps at 01h, 02h
    # interpolate to 20.0 and 30.0; trailing gap after last obs ffills
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 30), 1, "g", 10.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 3, 15), 1, "g", 40.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        r.bucket.hour: (r.value_interp, r.is_gap)
        for r in resample_interpolate(ev).collect()
    }
    assert got[0] == (10.0, False)
    assert got[1] == (20.0, True)
    assert got[2] == (30.0, True)
    assert got[3] == (40.0, False)


def test_ewma_matches_pandas_and_is_arrow_batched(spark, events_tiny):
    import pandas as pd

    from pyspark_etl_twitter_spark.operators.timeseries import ewma_by_group

    df = ewma_by_group(events_tiny, alpha=0.3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan   # Arrow-batched, per group
    assert "BatchEvalPython" not in plan     # never row-wise Python

    got = df.filter(F.col("user_id").isin([1, 2, 3])).toPandas()
    src = (
        events_tiny.filter(F.col("user_id").isin([1, 2, 3]))
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    for uid, g in src.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        want = g["value"].ewm(alpha=0.3, adjust=False).mean().round(6).tolist()
        sub = got[got.user_id == uid].sort_values(["ts", "event_id"])
        assert sub["ewma"].tolist() == want
        # recurrence sanity: first ewma equals first value
        assert sub["ewma"].iloc[0] == round(g["value"].iloc[0], 6)
