"""End-to-end consumer-chain equivalence: wire bytes in → (message,
prediction) out, against the reference's actual fitted model, in both
batch and streaming bindings (SURVEY.md §3.2)."""

import json
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_etl_twitter_spark.functions.text import CLEAN_PATTERN
from pyspark_etl_twitter_spark.operators.sentiment import load_mllib_weights
from pyspark_etl_twitter_spark.pipelines import consumer_pipeline

MODEL_PATH = "/root/reference/pre_trained_model"

TWEETS = [
    "I absolutely love this, best thing ever!",
    "worst experience of my life, never again",
    "ChatGPT wrote my homework http://chat.openai.com lol",
    "",
    "the of and a",  # stopwords only
    "today was okay nothing special happened",
]


def _kafka_shaped(spark, texts, with_bad_rows=True):
    rows = [
        Row(offset=i, value=json.dumps({"message": t.replace(",", "")}).encode())
        for i, t in enumerate(texts)
    ]
    if with_bad_rows:
        rows.append(Row(offset=900, value=b"{malformed"))
        rows.append(Row(offset=901, value=None))
    schema = T.StructType(
        [T.StructField("offset", T.LongType()), T.StructField("value", T.BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def ref_weights(spark):
    return load_mllib_weights(spark, MODEL_PATH)


def test_batch_consumer_chain_vs_mllib(spark, ref_weights):
    from pyspark.ml import PipelineModel

    weights, intercept = ref_weights
    out = consumer_pipeline(
        _kafka_shaped(spark, TWEETS), weights, intercept=intercept
    ).collect()
    got = {r.message: r.prediction for r in out}

    # null value is dropped (dropna); malformed JSON survives the cast
    # (it is a valid *string*), matching the reference chain where only the
    # unused from_json probe sees the malformation
    assert None not in got
    assert "{malformed" in got
    assert len(out) == len(TWEETS) + 1

    model = PipelineModel.load(MODEL_PATH)
    df = spark.createDataFrame(
        [
            Row(message=m, cleaned_data=re.sub(CLEAN_PATTERN, "", m.lower().strip()).split())
            for m in got
        ],
        T.StructType(
            [
                T.StructField("message", T.StringType()),
                T.StructField("cleaned_data", T.ArrayType(T.StringType())),
            ]
        ),
    )
    want = {r.message: r.prediction for r in model.transform(df).collect()}
    assert got == want


def test_streaming_consumer_chain_equals_batch(spark, ref_weights, tmp_path):
    weights, intercept = ref_weights
    src = _kafka_shaped(spark, TWEETS)
    batch = {
        (r.message, r.prediction)
        for r in consumer_pipeline(src, weights, intercept=intercept).collect()
    }

    # replay the same kafka-shaped rows as a streaming source (2 files)
    replay = tmp_path / "wire"
    replay.mkdir()
    pdf = src.toPandas()
    pdf["value"] = pdf["value"].map(lambda b: None if b is None else b.decode("utf-8", "replace"))
    for i, chunk in enumerate((pdf.iloc[:4], pdf.iloc[4:])):
        chunk.to_json(replay / f"b{i}.json", orient="records", lines=True)
    schema = T.StructType(
        [T.StructField("offset", T.LongType()), T.StructField("value", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(replay))
        .withColumn("value", F.encode("value", "UTF-8"))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def write_batch(batch_df, epoch_id):
        consumer_pipeline(batch_df, weights, intercept=intercept).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = {
        (r.message, r.prediction) for r in spark.read.parquet(out_dir).collect()
    }
    assert streamed == batch
