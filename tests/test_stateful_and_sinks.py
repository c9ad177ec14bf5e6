"""Custom stateful operator + S4/S5 sink tests."""

import os

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.sources.catalog import load_table
from pyspark_etl_twitter_spark.streaming.pipeline import (
    console_sink,
    json_sink,
    replay_to_json,
    stream_events,
)
from pyspark_etl_twitter_spark.streaming.stateful import running_user_stats
from tests.conftest import SF_TINY


def _replay(events, tmp_path, n_files=4):
    out = str(tmp_path / "replay")
    replay_to_json(events, out, n_files=n_files)
    return out


def test_running_user_stats_final_state_matches_batch(spark, events_tiny, tmp_path):
    stream = stream_events(spark, _replay(events_tiny, tmp_path), max_files_per_trigger=1)
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last update per user == batch totals (state accumulated across batches)
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 6), r.last_ts)
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                                              ORDER BY n_events DESC) AS rn
                 FROM user_stats) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n, round(r.s, 6), r.m)
        for r in events_tiny
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"), F.max("ts").alias("m"))
        .collect()
    }
    assert got == want
    # multiple micro-batches actually contributed state updates
    n_updates = spark.sql("SELECT count(*) AS c FROM user_stats").first().c
    assert n_updates > len(want)


def test_json_sink_writes_commit_log(spark, events_tiny, tmp_path):
    """S5: append JSON sink with exactly-once via _spark_metadata
    (consumer_local.py:59-66; commit-log evidence SURVEY.md §2.1)."""
    stream = stream_events(spark, _replay(events_tiny, tmp_path), max_files_per_trigger=2)
    out, ckpt = str(tmp_path / "json_out"), str(tmp_path / "json_ckpt")
    q = json_sink(stream.select("event_id", "event_type"), out, ckpt)
    q.processAllAvailable()
    q.stop()
    assert os.path.isdir(os.path.join(out, "_spark_metadata"))
    back = spark.read.json(out)
    assert back.count() == events_tiny.count()


def test_console_sink_runs(spark, events_tiny, tmp_path):
    """S4: console sink, update mode (consumer.py:58-63) — smoke."""
    stream = stream_events(spark, _replay(events_tiny, tmp_path, n_files=2))
    q = console_sink(stream.groupBy("event_type").count(), output_mode="complete")
    q.processAllAvailable()
    q.stop()
    assert q.lastProgress is not None


def test_streaming_funnel_final_state_matches_batch(spark, events_tiny, tmp_path):
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.funnel import funnel_reach
    from pyspark_etl_twitter_spark.streaming.stateful import streaming_funnel

    stream = stream_events(spark, _replay(events_tiny, tmp_path), max_files_per_trigger=1)
    q = (
        streaming_funnel(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_state")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last update per user = final funnel position
    final = spark.sql(
        """SELECT user_id, furthest_step FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id
                                          ORDER BY furthest_step DESC) AS rn
             FROM funnel_state) WHERE rn = 1"""
    )
    got = {
        i: final.filter(F.col("furthest_step") >= i).count() for i in (1, 2, 3)
    }
    want = {
        r.step_index + 1: r.n_users
        for r in funnel_reach(events_tiny, ["view", "click", "purchase"]).collect()
    }
    assert got == want
