"""The streaming family's self-contained fallback (round-2 verdict ask #8):
if the shared events table is unreadable, `events_tiny` falls back to
`sources/synthetic.synthetic_events`. These tests drive the stream-vs-batch
equality through the synthetic path DIRECTLY, proving the whole replay →
window-agg → compare loop works with an events-less testdata dir."""

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.sources.synthetic import synthetic_events
from pyspark_etl_twitter_spark.streaming.pipeline import replay_to_json, stream_events
from pyspark_etl_twitter_spark.streaming.windows import tumbling_counts


def test_synthetic_events_schema_and_determinism(spark):
    df = synthetic_events(spark, n_events=500)
    assert [c for c, _ in df.dtypes] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    assert dict(df.dtypes)["ts"] == "timestamp"
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, synthetic_events(spark, n_events=500).repartition(7).collect()))
    assert a == b  # deterministic across runs and partitionings
    assert df.select("event_type").distinct().count() == 5
    # multi-window, multi-user spread
    assert df.select(F.window("ts", "1 hour")).distinct().count() > 3
    assert df.select("user_id").distinct().count() > 10


def test_tumbling_stream_equals_batch_on_synthetic(spark, tmp_path):
    events = synthetic_events(spark, n_events=800)
    replay = str(tmp_path / "replay")
    replay_to_json(events, replay, n_files=4)
    q = (
        tumbling_counts(stream_events(spark, replay, max_files_per_trigger=2))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("synth_tumbling")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM synth_tumbling")
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value"
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
