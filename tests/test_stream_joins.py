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


def test_outer_stream_stream_join_equals_batch(spark, events_tiny, tmp_path):
    """LEFT OUTER stream-stream join: purchases WITH a click match the
    inner join; purchases WITHOUT one appear with NULL click columns once
    the watermark passes — a far-future sentinel click (dummy user)
    advances the watermark so every trailing unmatched purchase flushes
    before the replay drains."""
    from pyspark_etl_twitter_spark.streaming.joins import (
        purchase_attribution_outer,
    )

    import json
    import os
    import time as _time

    events = events_tiny
    max_ts = events.agg(F.max("ts")).first()[0]
    replay = str(tmp_path / "replay_outer")
    paths = replay_to_json(events, replay, n_files=4)
    # two sentinel files AFTER the data: the first advances the event-time
    # high-water mark past every purchase's join bound, the second gives
    # Spark the follow-up trigger in which that new watermark actually
    # evicts state and emits the NULL-matched rows
    last_mtime = os.path.getmtime(paths[-1])
    import datetime

    for i in range(2):
        ts = (max_ts + datetime.timedelta(days=30 + i)).strftime(
            "%Y-%m-%dT%H:%M:%S.000000"
        )
        p = os.path.join(replay, f"sentinel_{i}.json")
        # BOTH a click and a purchase: the global watermark is the MIN of
        # every per-stream watermark, so each filtered side needs its own
        # high-water event or eviction never happens
        with open(p, "w") as f:
            for j, etype in enumerate(("click", "purchase")):
                f.write(
                    json.dumps(
                        {
                            "event_id": 999_999_900 + 10 * i + j,
                            "ts": ts,
                            "user_id": -1,
                            "event_type": etype,
                            "value": 0.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )
        os.utime(p, times=(last_mtime + 1 + i, last_mtime + 1 + i))

    stream = stream_events(spark, replay, max_files_per_trigger=1)
    q = (
        purchase_attribution_outer(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attribution_outer_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql(
            "SELECT * FROM attribution_outer_out WHERE user_id != -1"
        ).collect()
    }

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
            "left_outer",
        ).collect()
    }
    assert got == want
    assert any(c is None for _, c in want)  # the outer rows are exercised
