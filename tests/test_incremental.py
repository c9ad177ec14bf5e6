"""Trigger.AvailableNow incremental ingestion: each run processes exactly
the files that arrived since the last run's checkpoint; reruns with no
new input are no-ops."""

import os

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.streaming.incremental import incremental_ingest
from pyspark_etl_twitter_spark.streaming.pipeline import (
    EVENTS_STREAM_SCHEMA,
    replay_to_json,
)

SF_TINY = "/root/testdata/sf0.001"


def test_incremental_ingest_exactly_once(spark, events_tiny, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckp = str(tmp_path / "ckp")

    events = events_tiny.limit(600)
    files = replay_to_json(events, src, n_files=6)
    # hold back the last two files to simulate later arrivals
    hold_dir = str(tmp_path / "held")
    os.makedirs(hold_dir)
    moved = []
    for f in files[4:]:
        hidden = os.path.join(hold_dir, os.path.basename(f))
        os.rename(f, hidden)
        moved.append((hidden, f))

    def transform(df):
        return df.filter(F.col("value").isNotNull()).withColumn(
            "ingest_marker", F.lit("r2")
        )

    kw = dict(schema=EVENTS_STREAM_SCHEMA, transform=transform)
    incremental_ingest(spark, src, dst, ckp, **kw)
    n1 = spark.read.parquet(dst).count()
    assert 0 < n1 <= 400  # only the first four files

    # new arrivals → second scheduled run picks up exactly the delta
    for hidden, orig in moved:
        os.rename(hidden, orig)
    incremental_ingest(spark, src, dst, ckp, **kw)
    out = spark.read.parquet(dst)
    assert out.count() == 600
    # no duplicates: event ids are unique in the source
    assert out.select("event_id").distinct().count() == 600
    assert out.filter(F.col("ingest_marker") != "r2").count() == 0

    # third run with nothing new: no-op
    incremental_ingest(spark, src, dst, ckp, **kw)
    assert spark.read.parquet(dst).count() == 600
