"""Property tests for curation operators (hypothesis-driven).

Invariants that must hold for ANY input, not just fixtures:
- global_row_index is exactly the global sort order, contiguous from 0;
- epoch_shuffle output is a permutation for any seed;
- contamination n_shared is monotone in the eval set (adding eval docs
  never lowers any document's overlap count).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators import curation as C

_ids = st.lists(
    st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60, unique=True
)

_words = st.lists(
    st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()),
    min_size=0,
    max_size=12,
)


@given(ids=_ids, seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
def test_global_row_index_is_the_sort_order(spark, ids, seed):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").withColumn(
        "_k", C.shuffle_key("doc_id", seed)
    )
    idx = C.global_row_index(df, "_k", n_buckets=8)
    rows = idx.orderBy("pos").collect()
    assert [r["pos"] for r in rows] == list(range(len(ids)))
    assert [r["doc_id"] for r in rows] == [
        r["doc_id"] for r in df.orderBy("_k").collect()
    ]


@given(
    docs=st.lists(_words, min_size=1, max_size=10),
    eval_a=st.lists(_words, min_size=0, max_size=3),
    eval_b=st.lists(_words, min_size=1, max_size=3),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
def test_contamination_monotone_in_eval_set(spark, docs, eval_a, eval_b):
    def mk(rows, base):
        return spark.createDataFrame(
            [(base + i, " ".join(w)) for i, w in enumerate(rows)],
            "doc_id long, text string",
        )

    corpus = mk(docs, 0)
    small = mk(eval_a, 1000)
    large = mk(eval_a + eval_b, 1000)  # superset eval set
    n = 2
    a = {
        r["doc_id"]: r["n_shared"]
        for r in C.contamination_overlap(corpus, small, n=n).collect()
    }
    b = {
        r["doc_id"]: r["n_shared"]
        for r in C.contamination_overlap(corpus, large, n=n).collect()
    }
    assert a.keys() == b.keys()
    assert all(b[k] >= a[k] for k in a)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abzAZ059 .,!?-_") + list("привет你好世界и界")
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@pytest.mark.slow
def test_script_fractions_match_python_re(spark, texts):
    """Spark's script/charset fractions must equal a Python re oracle on
    mixed latin/cyrillic/CJK/digit text — the literal character classes
    are engine-portable by construction."""
    import re

    from pyspark_etl_twitter_spark.operators.textstats import (
        SCRIPT_CLASSES,
        script_fractions,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.asDict()
        for r in docs.select("doc_id", *script_fractions("text")).collect()
    }
    for i, t in enumerate(texts):
        for name, cls in SCRIPT_CLASSES:
            want = (
                round(len(re.findall(cls, t)) / len(t), 6) if len(t) > 0 else 0.0
            )
            assert got[i][f"frac_{name}"] == want, (t, name)
