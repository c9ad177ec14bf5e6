"""Event-analytics operators: planted-sequence correctness + plan shape."""

import datetime

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.funnel import cohort_retention, funnel_reach


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, d, h), u, t, 1.0, "{}")
            for i, (u, t, d, h) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_funnel_order_matters(spark):
    # u1 completes in order; u2 clicked BEFORE viewing (click must not count);
    # u3 only views; u4 completes view+click same timestamp (>= allows it)
    rows = [
        (1, "view", 1, 1), (1, "click", 1, 2), (1, "purchase", 1, 3),
        (2, "click", 2, 1), (2, "view", 2, 2), (2, "purchase", 2, 3),
        (3, "view", 3, 1),
        (4, "view", 4, 5), (4, "click", 4, 5),
    ]
    got = {
        r.step: r.n_users
        for r in funnel_reach(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    }
    # u2's purchase requires a click at-or-after their view: click(1h) < view(2h),
    # so u2 stops at "view"; u4 reaches click via the same-timestamp rule
    assert got == {"view": 4, "click": 2, "purchase": 1}


def test_funnel_monotone_on_events(spark, events_tiny):
    rows = funnel_reach(events_tiny, ["view", "click", "purchase"]).collect()
    ns = [r.n_users for r in sorted(rows, key=lambda r: r.step_index)]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] > 0


def test_funnel_single_events_exchange(spark, events_tiny):
    plan = funnel_reach(
        events_tiny, ["view", "click", "purchase"]
    )._jdf.queryExecution().executedPlan().toString()
    # chained conditional window mins share one user_id partitioning: the
    # events relation is exchanged once (further exchanges aggregate tiny
    # per-user / single-row relations)
    n_window = plan.count("Window ")
    assert n_window <= 3
    before_agg = plan.split("HashAggregate")[-1]
    assert "Exchange hashpartitioning(user_id" in plan


def test_cohort_retention_planted(spark):
    rows = [
        # u1 first seen week of Jan 1 (Mon), active again Jan 10 (offset 1)
        (1, "view", 1, 1), (1, "view", 10, 1),
        # u2 first seen Jan 10 week (Jan 8 Mon), active Jan 22 (offset 2)
        (2, "view", 10, 1), (2, "view", 22, 1),
    ]
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }


def test_cohort_offsets_nonnegative(spark, events_tiny):
    df = cohort_retention(events_tiny)
    assert df.filter(F.col("week_offset") < 0).count() == 0
    # every cohort has an offset-0 row (the cohort's own week)
    cohorts = df.select("cohort_week").distinct().count()
    zero_rows = df.filter("week_offset = 0").count()
    assert cohorts == zero_rows
