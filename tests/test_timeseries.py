

def test_ewma_portable_equals_pandas_twin(spark):
    """The portable array-fold EWMA must equal the Arrow ewma_by_group
    production twin (pandas ewm adjust=False) on the same series — the
    recurrence is replayed with the identical floating-point operation
    sequence, so the 6dp outputs match exactly; single-point groups
    return their own value."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.timeseries import (
        ewma_by_group,
        ewma_portable,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(500)
        .select("user_id", "event_id", "ts", "value")
    )
    want = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma_by_group(ev, alpha=0.3).collect()
    }
    # portable twin keyed the same way: order inside group by (ts, id)
    got_rows = ewma_portable(
        ev.select(
            "user_id",
            F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("id")).alias("tk"),
            "value",
        ),
        alpha=0.3,
        group_col="user_id",
        time_col="tk",
        value_col="value",
    ).collect()
    got = {(r.user_id, r.tk.id): r.ewma for r in got_rows}
    assert got == want

    single = spark.createDataFrame([(1, 5, 2.5)], "g long, t long, v double")
    out = ewma_portable(single, group_col="g", time_col="t", value_col="v").collect()
    assert out[0].ewma == 2.5


def test_cusum_portable_detects_planted_shift(spark):
    """CUSUM changepoint semantics on a hand-planted series: flat at the
    target → both sides stay 0 (the k slack absorbs noise below it); a
    sustained +2 shift after t=5 accumulates s⁺ by (2 − k) per step and
    alarms once past h; the mirrored −2 series alarms on s⁻; and the
    recurrence matches a Python reference exactly."""
    from pyspark_etl_twitter_spark.operators.timeseries import cusum_portable

    k, h = 0.5, 3.0
    up = [10.0] * 5 + [12.0] * 5
    down = [10.0] * 5 + [8.0] * 5
    rows = [("up", t, v) for t, v in enumerate(up)] + [
        ("down", t, v) for t, v in enumerate(down)
    ]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    got = {
        (r.g, r.t): (r.cusum_pos, r.cusum_neg, r.alarm)
        for r in cusum_portable(
            df, group_col="g", time_col="t", value_col="v", k=k, h=h
        ).collect()
    }

    def ref(xs):
        sp = sn = 0.0
        out = []
        for x in xs:
            sp = max(0.0, sp + (x - xs[0] - k))
            sn = max(0.0, sn + (xs[0] - x - k))
            out.append((round(sp, 6), round(sn, 6), sp > h or sn > h))
        return out

    for g, xs in (("up", up), ("down", down)):
        for t, want in enumerate(ref(xs)):
            assert got[(g, t)] == want, (g, t)
    # flat prefix never alarms; the shifted tail does, on the right side
    assert not any(got[("up", t)][2] for t in range(5))
    assert got[("up", 9)][2] and got[("up", 9)][0] > h
    assert got[("down", 9)][2] and got[("down", 9)][1] > h


def test_cusum_portable_property_vs_python_oracle(spark):
    """Hypothesis: on arbitrary small multi-group series (2dp values,
    including constant, negative, and alternating shapes), the fold's
    cusum columns and alarm flags equal an independently written Python
    reference executing the same recurrence — state per group never
    leaks across groups, and the q6-free raw semantics match at the
    operator's default rounding."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_etl_twitter_spark.operators.timeseries import cusum_portable

    series = st.lists(
        st.integers(min_value=-500, max_value=500).map(lambda c: c / 100.0),
        min_size=1,
        max_size=12,
    )
    corpora = st.lists(series, min_size=1, max_size=3)

    @given(groups=corpora, k=st.sampled_from([0.0, 0.25]), h=st.sampled_from([1.0, 3.0]))
    @settings(
        max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(groups, k, h):
        rows = [
            (f"g{gi}", t, v)
            for gi, xs in enumerate(groups)
            for t, v in enumerate(xs)
        ]
        df = spark.createDataFrame(rows, "g string, t long, v double")
        got = {
            (r.g, r.t): (r.cusum_pos, r.cusum_neg, r.alarm)
            for r in cusum_portable(
                df, group_col="g", time_col="t", value_col="v", k=k, h=h
            ).collect()
        }
        for gi, xs in enumerate(groups):
            sp = sn = 0.0
            for t, x in enumerate(xs):
                sp = max(0.0, sp + (x - xs[0] - k))
                sn = max(0.0, sn + (xs[0] - x - k))
                assert got[(f"g{gi}", t)] == (
                    round(sp, 6),
                    round(sn, 6),
                    sp > h or sn > h,
                ), (gi, t)

    run()
