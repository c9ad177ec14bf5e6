"""Tweet wire format (SURVEY.md §2.1 S1-S3, §2.2 P1-P2, §2.8 F1/F2/F7/F8).

The reference's wire protocol: the producer strips commas from tweet text
and sends ``{"message": <text>}`` UTF-8 JSON to Kafka (producer.py:40-42);
consumers cast the Kafka binary value to string (consumer.py:39) and parse
it with a one-field struct schema (consumer.py:28,41-42) — malformed JSON
yields a null struct (the implicit validity probe of P2).

These are pure column expressions usable on either batch or streaming
relations (a Kafka source would feed ``decode_wire(col("value"))``
unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

WIRE_SCHEMA = T.StructType([T.StructField("message", T.StringType())])


def encode_wire(text: Column | str) -> Column:
    """Producer side: strip commas (F7, producer.py:40) and JSON-wrap —
    ``to_json(struct(message))`` then UTF-8 bytes (S2)."""
    c = F.col(text) if isinstance(text, str) else text
    payload = F.to_json(F.struct(F.regexp_replace(c, ",", "").alias("message")))
    return F.encode(payload, "UTF-8")


def decode_wire(value: Column | str) -> Column:
    """Consumer side: binary → string cast (F1) + from_json with the
    one-field schema (F2). Malformed input → null struct, matching
    ``from_json`` permissive mode."""
    c = F.col(value) if isinstance(value, str) else value
    return F.from_json(c.cast("string"), WIRE_SCHEMA)


def with_processing_time(df, col_name: str = "created_at"):
    """F8: the ``yyyy-MM-dd HH:mm:ss`` processing-time column observed in
    the reference's committed outputs (locally_saved_results/part-*.json)."""
    return df.withColumn(
        col_name, F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
    )
