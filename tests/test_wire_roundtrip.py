"""End-to-end wire-format round trip (r5 verdict ask #7): producer encode
→ file-replay stream → consumer decode → sentiment score → sink, with
BYTE-level framing assertions against Spark's ``to_json`` rendering of
the reference's semantic frame (producer.py:40-42 comma stripping +
``{"message": ...}``; the consumer scores the raw JSON string — the P2
quirk; consumer_local.py S5 JSON sink with the ``_spark_metadata``
commit log). NOT the reference producer's exact bytes (r6 ADVICE): its
``json.dumps`` defaults emit ``", "``/``": "`` separators and
``ensure_ascii=True`` ``\\uXXXX`` escapes, where ``encode_wire`` emits
compact UTF-8 — semantically identical after ``from_json``, but under
the P2 raw-string-scoring quirk a non-ASCII payload (``café``)
tokenizes differently than the reference's escaped form would.
Kafka itself is env-blocked (no broker/package in the container); the
file layer stands in for the topic, carrying the exact bytes a Kafka
value would."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.sentiment import (
    build_weight_table,
    score_documents,
)
from pyspark_etl_twitter_spark.pipelines import consumer_pipeline
from pyspark_etl_twitter_spark.sources.catalog import load_table
from pyspark_etl_twitter_spark.sources.wire import decode_wire, encode_wire
from tests.conftest import SF_TINY

TEXTS = [
    "i love this, really great day",          # comma must be stripped
    "awful, terrible, hate it",               # multiple commas
    "just neutral text no punctuation",
    'quotes "inside" and unicode café — ok',  # JSON escaping
    "",                                        # empty message survives
]


def _producer_bytes(spark):
    """Wire payloads exactly as the producer would emit them."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["i", "text"])
    rows = df.select("i", encode_wire("text").alias("value")).collect()
    return [bytes(r.value) for r in sorted(rows, key=lambda r: r.i)]


def test_producer_framing_matches_reference_oracle(spark):
    """Byte identity against an independent Python rendering of the
    reference SEMANTICS: strip commas, wrap as {"message": text}, UTF-8.
    The oracle deliberately pins json.dumps to compact separators and
    ensure_ascii=False — Spark's to_json rendering — which differs from
    the reference producer's dumps-default bytes (", "/": " separators,
    \\uXXXX escapes) while encoding the same frame; see module docstring."""
    got = _producer_bytes(spark)
    for raw, text in zip(got, TEXTS):
        want = json.dumps(
            {"message": text.replace(",", "")},
            separators=(",", ":"),
            ensure_ascii=False,
        ).encode("utf-8")
        assert raw == want, (raw, want)


def test_wire_roundtrip_stream_score_sink(spark, tmp_path):
    payloads = _producer_bytes(spark)

    # --- the "topic": one file per record, payload bytes verbatim --------
    topic_dir = tmp_path / "topic"
    topic_dir.mkdir()
    for i, raw in enumerate(payloads):
        (topic_dir / f"m_{i:04d}.txt").write_bytes(raw)

    # --- consumer: stream the files, decode, score, sink -----------------
    docs = load_table(spark, SF_TINY, "documents")
    weights = build_weight_table(docs)
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 2)
        .load(str(topic_dir))
        .select(F.xxhash64("value").alias("offset"), F.col("value"))
    )
    out, ckpt = str(tmp_path / "scored"), str(tmp_path / "ckpt")

    def write_batch(batch_df, epoch_id):
        consumer_pipeline(batch_df, weights, id_col="offset").write.mode(
            "append"
        ).json(out)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.json(out).collect()
    assert len(got) == len(payloads)

    # 1. RAW-STRING quirk (P2): the consumer's message column is the wire
    #    payload itself, byte-identical once re-encoded to UTF-8.
    messages = {r.message.encode("utf-8") for r in got}
    assert messages == set(payloads)

    # 2. Decode inverts encode, and re-encoding the decoded text reproduces
    #    the payload bytes exactly (commas are already stripped, so the
    #    producer transform is idempotent on its own output).
    wire = spark.createDataFrame([(bytearray(p),) for p in payloads], "value binary")
    decoded = wire.select(decode_wire("value").alias("v")).select("v.message")
    texts = sorted(r.message for r in decoded.collect())
    assert texts == sorted(t.replace(",", "") for t in TEXTS)
    re_encoded = {
        bytes(r.value)
        for r in decoded.select(encode_wire("message").alias("value")).collect()
    }
    assert re_encoded == set(payloads)

    # 3. Stream scoring equals batch scoring of the same payload strings.
    batch = spark.createDataFrame(
        [(i, p.decode("utf-8")) for i, p in enumerate(payloads)],
        ["doc_id", "text"],
    )
    want = sorted(
        (r.text, r.prediction)
        for r in score_documents(batch, weights)
        .join(batch, "doc_id")
        .select("text", "prediction")
        .collect()
    )
    assert sorted((r.message, r.prediction) for r in got) == want

    # 4. S5 sink shape: a streaming JSON sink over the decoded projection
    #    writes the reference's exact one-field frame + _spark_metadata.
    frame_dir, frame_ckpt = str(tmp_path / "frames"), str(tmp_path / "fckpt")
    frames = (
        spark.readStream.format("text").load(str(topic_dir))
        .select(decode_wire("value").alias("v"))
        .select("v.message")
        .select(F.to_json(F.struct("message")).alias("line"))
    )
    q2 = (
        frames.writeStream.outputMode("append")
        .format("text")
        .option("path", frame_dir)
        .option("checkpointLocation", frame_ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert os.path.isdir(os.path.join(frame_dir, "_spark_metadata"))
    sunk = set()
    for f in os.listdir(frame_dir):
        if f.endswith(".txt"):
            with open(os.path.join(frame_dir, f), "rb") as fh:
                sunk |= {ln for ln in fh.read().split(b"\n") if ln}
    assert sunk == set(payloads)
