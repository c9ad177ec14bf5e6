"""Streaming source builders (SURVEY.md §2.1 S1/S3).

``kafka_source`` mirrors the reference consumer's source relation
(consumer.py:31-38) exactly — minus its no-op ``option("header","true")``
(a CSV option, silently ignored by the Kafka source; defect d) — and is
gated: the container has no Kafka broker or spark-sql-kafka package, so the
builder validates and constructs the plan but callers must provide a real
bootstrap server to start it.

``rate_source`` is the in-container stand-in for the Twitter firehose
(S1): a deterministic-rate record stream shaped like the producer's wire
records via ``encode_wire``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.sources.wire import encode_wire


def kafka_source(
    spark: SparkSession,
    *,
    bootstrap_servers: str = "localhost:9092",
    topic: str = "twitter",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka streaming source relation (S3). Requires the
    spark-sql-kafka-0-10 package on the classpath at session build time —
    ``get_session(extra_conf={"spark.jars.packages":
    "org.apache.spark:spark-sql-kafka-0-10_2.13:<version>"})`` on a real
    deployment. The returned relation has Spark's fixed Kafka schema
    (key, value, topic, partition, offset, timestamp, timestampType)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def kafka_sink(
    df: DataFrame,
    *,
    bootstrap_servers: str = "localhost:9092",
    topic: str = "twitter",
    checkpoint: str,
):
    """S2 engine twin: stream writer to Kafka. The input must have a
    ``value`` (binary/string) column — pair with ``encode_wire``. Gated on
    the same package/broker requirements as ``kafka_source``."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def rate_source(
    spark: SparkSession, *, rows_per_second: int = 100
) -> DataFrame:
    """S1 stand-in: rate source emitting producer-shaped records —
    (offset, value) where value is the UTF-8 JSON wire payload of a
    deterministic synthetic tweet."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    text = F.concat(
        F.lit("synthetic tweet number "),
        F.col("value").cast("string"),
        F.when(F.col("value") % 3 == 0, F.lit(" love it great day"))
        .when(F.col("value") % 3 == 1, F.lit(" awful terrible hate this"))
        .otherwise(F.lit(" just another neutral message")),
    )
    return rate.select(
        F.col("value").alias("offset"), encode_wire(text).alias("value")
    )
