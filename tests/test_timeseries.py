

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
