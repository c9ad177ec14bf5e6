"""Stream-stream interval join: streaming result must equal the batch
twin of the same join over the full replay."""

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.sources.catalog import load_table
from pyspark_etl_twitter_spark.streaming.joins import click_purchase_attribution
from pyspark_etl_twitter_spark.streaming.pipeline import replay_to_json, stream_events
from tests.conftest import SF_TINY


def test_stream_stream_join_equals_batch(spark, events_tiny, tmp_path):
    replay = str(tmp_path / "replay")
    events = events_tiny
    replay_to_json(events, replay, n_files=4)

    stream = stream_events(spark, replay, max_files_per_trigger=1)
    q = (
        click_purchase_attribution(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attribution_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM attribution_out").collect()
    }

    # batch twin on the same data
    clicks = events.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_enrich_stream_static(spark, events_tiny, tmp_path):
    """Each micro-batch joins the current static dim; the streamed result
    equals the batch twin."""
    from pyspark_etl_twitter_spark.sources.catalog import load_table
    from pyspark_etl_twitter_spark.streaming.joins import enrich_stream_static
    from pyspark_etl_twitter_spark.streaming.pipeline import (
        EVENTS_STREAM_SCHEMA,
        replay_to_json,
        stream_events,
    )

    events = events_tiny.limit(500)
    replay = str(tmp_path / "replay")
    replay_to_json(events, replay, n_files=5)
    dim = spark.createDataFrame(
        [("click", "interaction"), ("view", "impression"), ("purchase", "revenue")],
        ["event_type", "category"],
    )
    enriched = enrich_stream_static(
        stream_events(spark, replay, max_files_per_trigger=2), dim, "event_type"
    ).select("event_id", "event_type", "category")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_static")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from enrich_static")
    want = events.join(dim, "event_type", "left").select(
        "event_id", "event_type", "category"
    )
    assert got.count() == 500
    assert (
        sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    )
    # unknown types survive the left join with null category
    assert got.filter(F.col("category").isNull()).count() == want.filter(
        F.col("category").isNull()
    ).count()
