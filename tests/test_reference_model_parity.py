"""Behavioral parity vs the reference's actual fitted model.

The strongest equivalence evidence (SURVEY.md §5.3 golden pipeline test):
run the reference's 5-stage MLlib PipelineModel (pre_trained_model/) and
our native explode/broadcast-join/agg scorer over the same texts, from the
same raw strings, and require identical predictions and matching margins.

MLlib side: tokens via the reference UDF expression (consumer.py:45-47
semantics, computed in Python here as the oracle); model.transform appends
prediction. Native side: score_documents(reference_clean=True) with the
weight table flattened from the model's own parquet artifacts.
"""

import math
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_etl_twitter_spark.functions.text import CLEAN_PATTERN
from pyspark_etl_twitter_spark.operators.sentiment import (
    load_mllib_weights,
    score_documents,
)

MODEL_PATH = "/root/reference/pre_trained_model"

TEXTS = [
    "I love this new phone it is amazing and works great",
    "this is the worst product I have ever bought, totally broken",
    "ChatGPT is changing everything http://example.com check it out",
    "feeling sad and disappointed today nothing goes right",
    "what a wonderful sunny day with friends and good food",
    "terrible service never coming back here again",
    "the the the a an of and or",  # all stopwords
    "",  # empty
    "zzzqqqxxy unknownword anotherunknown",  # fully OOV
    "happy happy joy joy excellent fantastic",
    "awful horrible disgusting experience hate it",
    "meh it was okay I guess could be better",
    "best day of my life thank you all so much",
    "crying myself to sleep again tonight",
    "www.spam.com buy now cheap pills 100% free",
    "Congratulations on your promotion, well deserved!",
]


@pytest.fixture(scope="module")
def parity_frames(spark):
    from pyspark.ml import PipelineModel

    model = PipelineModel.load(MODEL_PATH)
    rows = [
        Row(
            doc_id=i,
            message=t,
            cleaned_data=re.sub(CLEAN_PATTERN, "", t.lower().strip()).split(),
        )
        for i, t in enumerate(TEXTS)
    ]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("message", T.StringType()),
            T.StructField("cleaned_data", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    mllib_rows = model.transform(df).select("doc_id", "prediction", "rawPrediction").collect()
    weights, intercept = load_mllib_weights(spark, MODEL_PATH)
    native_rows = score_documents(
        df,
        weights,
        text_col="message",
        intercept=intercept,
        stop=True,
        reference_clean=True,
    ).collect()
    return mllib_rows, native_rows


def test_predictions_match_mllib(parity_frames):
    mllib_rows, native_rows = parity_frames
    mllib = {r.doc_id: r.prediction for r in mllib_rows}
    native = {r.doc_id: r.prediction for r in native_rows}
    assert set(mllib) == set(native)
    for doc_id in mllib:
        assert native[doc_id] == mllib[doc_id], (doc_id, TEXTS[doc_id])


def test_margins_match_mllib(parity_frames):
    """rawPrediction = [-margin, margin] for binary LR; our margin must
    match to float tolerance (BLAS dot vs sum-join ordering)."""
    mllib_rows, native_rows = parity_frames
    mllib = {r.doc_id: float(r.rawPrediction[1]) for r in mllib_rows}
    native = {r.doc_id: r.margin for r in native_rows}
    for doc_id, m in mllib.items():
        assert math.isclose(native[doc_id], m, rel_tol=1e-9, abs_tol=1e-9), (
            doc_id,
            TEXTS[doc_id],
            native[doc_id],
            m,
        )


def test_label_polarity(parity_frames):
    """prediction 1.0 = Sentiment140 label '0' = negative (SURVEY.md §1.4);
    the all-stopwords/empty/OOV docs fall back to the intercept, which is
    negative → prediction 0.0 (positive class)? No: margin = intercept
    < 0 → σ(m) < 0.5 → prediction 0.0. Assert exactly that."""
    mllib_rows, native_rows = parity_frames
    native = {r.doc_id: (r.margin, r.prediction) for r in native_rows}
    for doc_id in (6, 7, 8):  # stopwords-only, empty, OOV
        margin, pred = native[doc_id]
        assert math.isclose(margin, -0.24585153897212955, rel_tol=1e-12)
        assert pred == 0.0
