"""Native TF-IDF+LR scorer vs a pure-Python oracle (SURVEY.md §5.3).

The oracle recomputes the deterministic weight table and margins with
pandas/Counter — independent of Spark — over the sf0.001 documents table.
"""

import math
from collections import Counter

import pandas as pd
import pytest

from pyspark_etl_twitter_spark.functions.stopwords import ENGLISH_STOPWORDS
from pyspark_etl_twitter_spark.operators.sentiment import (
    INTERCEPT,
    MIN_DOC_FREQ,
    build_weight_table,
    score_documents,
    sentiment_class_counts,
)
from tests.conftest import SF_TINY

STOP = set(ENGLISH_STOPWORDS)


def _oracle(docs: pd.DataFrame):
    toks = {
        r.doc_id: [t for t in r.text.split(" ") if t and t.lower() not in STOP]
        for r in docs.itertuples()
    }
    n = len(docs)
    df_counts = Counter()
    for ts in toks.values():
        df_counts.update(set(ts))
    vocab = sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    weights = {}
    for idx, (term, dfreq) in enumerate(vocab):
        idf = 0.0 if dfreq < MIN_DOC_FREQ else math.log((n + 1) / (dfreq + 1))
        coef = ((idx % 13) - 6) / 5.0
        weights[term] = (idx, dfreq, idf, coef)
    margins = {}
    for doc_id, ts in toks.items():
        tf = Counter(ts)
        margins[doc_id] = (
            sum(c * weights[t][2] * weights[t][3] for t, c in tf.items() if t in weights)
            + INTERCEPT
        )
    return weights, margins


@pytest.fixture(scope="module")
def docs_pd():
    return pd.read_parquet(f"{SF_TINY}/documents.parquet")


def test_weight_table_matches_oracle(spark, docs_pd):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    got = {r.term: (r.idx, r.df, r.idf, r.coef) for r in build_weight_table(docs).collect()}
    want, _ = _oracle(docs_pd)
    assert set(got) == set(want)
    for term, (idx, dfreq, idf, coef) in want.items():
        g = got[term]
        assert g[0] == idx and g[1] == dfreq, term
        assert abs(g[2] - idf) < 1e-12, term
        assert g[3] == coef, term


def test_scores_match_oracle(spark, docs_pd):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    weights = build_weight_table(docs)
    scored = score_documents(docs, weights).collect()
    _, margins = _oracle(docs_pd)
    assert len(scored) == len(margins)
    for r in scored:
        m = margins[r.doc_id]
        assert abs(r.margin - m) < 1e-9, r.doc_id
        assert r.prediction == (1.0 if m > 0 else 0.0), r.doc_id


def test_class_counts(spark, docs_pd):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    scored = score_documents(docs, build_weight_table(docs))
    counts = {r.prediction: r.n_docs for r in sentiment_class_counts(scored).collect()}
    _, margins = _oracle(docs_pd)
    want = Counter(1.0 if m > 0 else 0.0 for m in margins.values())
    assert counts == dict(want)


def test_scoring_is_broadcast_join(spark):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    plan = score_documents(docs, build_weight_table(docs))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # weight dim must never shuffle the fact side
