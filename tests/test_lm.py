"""Unit tests for operators/lm.py: exact smoothed probabilities on a
hand-computable corpus, OOV handling with a held-out model, and the
every-doc-scored rule for empty documents."""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.lm import (
    doc_logprob,
    unigram_model,
    vocab_coverage,
)


@pytest.fixture()
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a c"),
            (3, ""),  # zero tokens — must still be scored
        ],
        "doc_id long, text string",
    )


def test_unigram_model_exact(spark, tiny_docs):
    # counts: a=3, b=1, c=1 → N=5, V=3; logp(t) = ln((c+1)/8)
    rows = {r.term: (r.c, r.logp) for r in unigram_model(tiny_docs).collect()}
    assert rows["a"][0] == 3
    assert rows["a"][1] == pytest.approx(math.log(4 / 8), abs=1e-12)
    assert rows["b"][1] == pytest.approx(math.log(2 / 8), abs=1e-12)


def test_doc_logprob_self_model_and_empty_doc(spark, tiny_docs):
    got = {r.doc_id: r for r in doc_logprob(tiny_docs).collect()}
    mean1 = (2 * math.log(4 / 8) + math.log(2 / 8)) / 3
    assert got[1].mean_logp == pytest.approx(round(mean1, 6), abs=1e-9)
    assert got[1].n_tokens == 3
    assert got[1].ppl == pytest.approx(round(math.exp(-mean1), 4), abs=1e-6)
    # empty doc: scored with the neutral defaults, not dropped
    assert got[3].n_tokens == 0
    assert got[3].mean_logp == 0.0
    assert got[3].ppl == 1.0


def test_doc_logprob_held_out_model_hits_oov_path(spark, tiny_docs):
    model = unigram_model(
        spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    )
    # model: a=2, b=1 → N=3, V=2; oov logp = ln(1/5)
    got = {r.doc_id: r for r in doc_logprob(tiny_docs, model).collect()}
    mean2 = (math.log(3 / 5) + math.log(1 / 5)) / 2  # "a c": c is OOV
    assert got[2].mean_logp == pytest.approx(round(mean2, 6), abs=1e-9)


def test_doc_logprob_shuffle_join_variant_matches(spark, tiny_docs):
    a = doc_logprob(tiny_docs, broadcast_model=True).collect()
    b = doc_logprob(tiny_docs, broadcast_model=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_vocab_coverage(spark):
    docs = spark.createDataFrame(
        [(1, "x x x y"), (2, "x z"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in vocab_coverage(docs, min_count=2).collect()}
    # vocab (count ≥ 2) = {x}; doc1: y OOV (1/4); doc2: z OOV (1/2)
    assert (got[1].n_oov, got[1].oov_rate) == (1, 0.25)
    assert (got[2].n_oov, got[2].oov_rate) == (1, 0.5)
    assert (got[3].n_tokens, got[3].n_oov, got[3].oov_rate) == (0, 0, 0.0)


def test_lm_plans_are_python_free(spark):
    from tests.conftest import SF_TINY
    from tests.test_plans import plan_of
    from pyspark_etl_twitter_spark.plans.lm_queries import (
        lm_quality_by_source,
        oov_rate_by_source,
    )

    for fn in (lm_quality_by_source, oov_rate_by_source):
        plan = plan_of(fn(spark, SF_TINY))
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "BroadcastHashJoin" in plan, fn.__name__


def test_bigram_pairs_edges(spark):
    from pyspark_etl_twitter_spark.operators.lm import bigram_pairs

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, "x y")],
        ["doc_id", "text"],
    )
    got = {(r.doc_id, r.w1, r.w2) for r in bigram_pairs(docs).collect()}
    assert got == {(1, "a", "b"), (1, "b", "c"), (4, "x", "y")}


def test_bigram_logprob_separates_predictable_from_salad(spark):
    from pyspark_etl_twitter_spark.operators.lm import bigram_doc_logprob

    # corpus where "the quick brown fox" is a frozen phrase; salad doc uses
    # the SAME unigrams in never-seen orders plus one seen bigram so every
    # pair still scores (self-trained model has no unseen-bigram rows for
    # pairs absent from the corpus — salad doc itself adds its pairs once)
    phrase = "the quick brown fox"
    docs = spark.createDataFrame(
        [(i, phrase) for i in range(20)] + [(100, "fox the brown quick")],
        ["doc_id", "text"],
    )
    scored = {r.doc_id: r.mean_logp2 for r in bigram_doc_logprob(docs).collect()}
    assert scored[0] > scored[100]
    # short docs score 0 with 0 bigrams
    docs2 = spark.createDataFrame([(1, "one"), (2, "")], ["doc_id", "text"])
    rows = {r.doc_id: (r.n_bigrams, r.mean_logp2) for r in bigram_doc_logprob(docs2).collect()}
    assert rows == {1: (0, 0.0), 2: (0, 0.0)}


def test_pmi_collocations_hand_computed(spark):
    """PMI on a tiny fixture: corpus 'a b a b' has c(a,b)=2, c(b,a)=1,
    B=3, c_a=c_b=2, T=4 -> PMI(a,b) = ln((2/3)/(0.5*0.5)) = ln(8/3),
    PMI(b,a) = ln(4/3); min_count floors hapax pairs; ordering is by
    rounded PMI then (w1, w2)."""
    import math

    from pyspark_etl_twitter_spark.operators.lm import pmi_collocations

    docs = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    got = {
        (r.w1, r.w2): r
        for r in pmi_collocations(docs, min_count=1, k=10).collect()
    }
    assert got[("a", "b")].c_xy == 2
    assert got[("a", "b")].pmi == round(math.log(8.0 / 3.0), 6)
    assert got[("b", "a")].pmi == round(math.log(4.0 / 3.0), 6)

    # min_count=2 drops the hapax (b, a)
    only = pmi_collocations(docs, min_count=2, k=10).collect()
    assert [(r.w1, r.w2) for r in only] == [("a", "b")]

    # k truncates after the (rounded pmi desc, w1, w2) order
    docs2 = spark.createDataFrame(
        [(0, "x y x y p q")], "doc_id long, text string"
    )
    top1 = pmi_collocations(docs2, min_count=1, k=1).collect()
    assert len(top1) == 1


def test_trigram_doc_logprob_hand_computed(spark):
    """Interpolated trigram LM on a tiny fixture: corpus 'a b c a b c'
    has trigrams (a,b,c)x2, (b,c,a), (c,a,b); hand-compute one doc's
    mean; <3-token docs score 0.0 with n_trigrams=0; the per-trigram
    probability mass is a valid interpolation (component weights sum
    to 1)."""
    import math

    from pyspark_etl_twitter_spark.operators.lm import trigram_doc_logprob

    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "x y")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in trigram_doc_logprob(docs).collect()}
    assert got[1].n_trigrams == 0 and got[1].mean_logp3 == 0.0
    assert got[0].n_trigrams == 4

    # unigram add-one: tokens = a,b,c,a,b,c,x,y (n=8, v=5):
    # p(a)=p(b)=p(c)=3/13, p(x)=p(y)=2/13
    # trigram counts: abc=2, bca=1, cab=1; contexts: ab=2, bc=1, ca=1
    # bigram counts: ab=2, bc=2, ca=1, xy=1; contexts: a=2, b=2, c=1, x=1
    def p(c3, ctx3, c2, ctx2, pu):
        return 0.5 * c3 / ctx3 + 0.3 * c2 / ctx2 + 0.2 * pu

    lps = [
        math.log(p(2, 2, 2, 2, 3 / 13)),  # a b c (x2)
        math.log(p(2, 2, 2, 2, 3 / 13)),
        math.log(p(1, 1, 1, 1, 3 / 13)),  # b c a
        math.log(p(1, 1, 2, 2, 3 / 13)),  # c a b
    ]
    assert got[0].mean_logp3 == round(sum(lps) / 4, 6)


def test_trigram_doc_logprob_property_vs_python_oracle(spark):
    """Property test vs a direct count-model Python oracle on random
    tiny corpora: per-doc (n_trigrams, mean_logp3) match the
    independent reimplementation of the interpolated model exactly at
    6dp."""
    import math
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_etl_twitter_spark.operators.lm import trigram_doc_logprob

    token = st.sampled_from(["a", "b", "c"])
    text = st.lists(token, min_size=0, max_size=8).map(" ".join)
    corpus = st.lists(text, min_size=1, max_size=4)

    def oracle(texts):
        toks = [[t for t in x.split(" ") if t] for x in texts]
        uni = Counter(t for ts in toks for t in ts)
        n, v = sum(uni.values()), len(uni)
        c3, c2b = Counter(), Counter()
        for ts in toks:
            for i in range(len(ts) - 2):
                c3[(ts[i], ts[i + 1], ts[i + 2])] += 1
            for i in range(len(ts) - 1):
                c2b[(ts[i], ts[i + 1])] += 1
        ctx3 = Counter()
        for (w1, w2, _), c in c3.items():
            ctx3[(w1, w2)] += c
        ctx2 = Counter()
        for (w1, _), c in c2b.items():
            ctx2[w1] += c
        out = {}
        for d, ts in enumerate(toks):
            lps = []
            for i in range(len(ts) - 2):
                w1, w2, w3 = ts[i], ts[i + 1], ts[i + 2]
                p = (
                    0.5 * c3[(w1, w2, w3)] / ctx3[(w1, w2)]
                    + 0.3 * c2b[(w2, w3)] / ctx2[w2]
                    + 0.2 * (uni[w3] + 1) / (n + v)
                )
                lps.append(math.log(p))
            out[d] = (
                len(lps),
                round(sum(lps) / len(lps), 6) if lps else 0.0,
            )
        return out

    @given(texts=corpus)
    @settings(
        max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_trigrams, r.mean_logp3)
            for r in trigram_doc_logprob(df).collect()
        }
        assert got == oracle(texts)

    run()
