"""Rate-source → consumer-pipeline smoke: the full reference topology
(producer wire encode → stream → decode → score → sink) with the rate
source standing in for the Twitter firehose (S1)."""

import pytest

from pyspark_etl_twitter_spark.operators.sentiment import load_mllib_weights
from pyspark_etl_twitter_spark.pipelines import consumer_pipeline
from pyspark_etl_twitter_spark.sources.streaming_sources import kafka_source, rate_source


@pytest.mark.slow
def test_rate_source_through_consumer_pipeline(spark, tmp_path):
    weights, intercept = load_mllib_weights(spark, "/root/reference/pre_trained_model")
    src = rate_source(spark, rows_per_second=200)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def write_batch(batch_df, epoch_id):
        consumer_pipeline(batch_df, weights, intercept=intercept).write.mode(
            "append"
        ).parquet(out)

    q = (
        src.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    time.sleep(15)
    q.stop()
    rows = spark.read.parquet(out).collect()
    assert len(rows) >= 10
    preds = {r.prediction for r in rows}
    assert preds <= {0.0, 1.0} and len(preds) == 2  # both classes observed
    # Reference quirk (SURVEY.md §2.2 P2): consumer.py scores the *raw JSON
    # string* — the from_json struct is never consumed — so the pipeline's
    # message column is the wire payload, not the extracted text.
    assert all(
        r.message.startswith('{"message":"synthetic tweet number ') for r in rows
    )


def test_kafka_source_builds_plan(spark):
    """The Kafka relation must construct (plan-level parity with
    consumer.py:31-38); starting it requires a broker + package, which the
    container lacks."""
    try:
        df = kafka_source(spark)
        cols = set(df.columns)
    except Exception:
        import pytest

        pytest.skip("kafka datasource not on classpath in this container")
    assert {"key", "value", "topic", "partition", "offset"} <= cols
