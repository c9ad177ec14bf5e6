"""Repetition metrics + composite quality gate."""

from pyspark_etl_twitter_spark.operators.textstats import (
    quality_gate,
    repetition_columns,
)


def test_repetition_metrics_values(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a a a"),             # one token repeated
            (1, "x y z w"),             # all distinct
            (2, "p q p q p q"),         # dominant bigram loop
            (3, ""),                    # empty doc must survive with zeros
            (4, "solo"),                # single token, no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_columns(docs).collect()}
    assert got[0].n_tokens == 4
    assert got[0].dup_token_ratio == 0.75 and got[0].top_token_share == 1.0
    assert got[0].top_bigram_share == 1.0  # "a a" x3
    assert got[1].dup_token_ratio == 0.0 and got[1].top_token_share == 0.25
    assert got[2].top_bigram_share == 0.6  # "p q" 3 of 5 bigrams
    assert got[3].n_tokens == 0 and got[3].dup_token_ratio == 0.0
    assert got[4].n_tokens == 1 and got[4].top_bigram_share == 0.0


def test_quality_gate_flags(spark):
    docs = spark.createDataFrame(
        [
            (0, "tiny doc", "web"),  # < 5 tokens -> dropped
            (1, "spam spam spam spam spam spam", "web"),  # dup ratio -> dropped
            (2, "a perfectly normal sentence with enough distinct words", "web"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.doc_id: r.kept for r in quality_gate(docs).collect()}
    assert got == {0: False, 1: False, 2: True}


def test_top_tfidf_terms(spark):
    import math

    from pyspark_etl_twitter_spark.operators.textstats import top_tfidf_terms

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "common cherry"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.rnk): (r.term, r.tfidf) for r in top_tfidf_terms(docs, k=2).collect()}
    # N=4 (empty doc counts); df: apple 1, banana 2, cherry 2, common 3
    idf = lambda df: math.log(5.0 / (df + 1.0))
    assert got[(0, 1)] == ("apple", round(2 * idf(1), 6))
    assert got[(0, 2)] == ("banana", round(1 * idf(2), 6))
    # doc 2: cherry beats common; empty doc 3 emits no rows
    assert got[(2, 1)][0] == "cherry"
    assert (3, 1) not in got


# -- round 4: char entropy + repeated spans -------------------------------


def test_char_entropy_known_values(spark):
    from pyspark_etl_twitter_spark.operators.textstats import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),        # one symbol → H = 0
            (2, "abab"),        # two equiprobable symbols → H = 1
            (3, "abcd"),        # four equiprobable symbols → H = 2
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_chars_counted, r.entropy_bits) for r in char_entropy(docs).collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (4, 1.0)
    assert got[3] == (4, 2.0)


def test_repeated_ngram_spans_planted(spark):
    from pyspark_etl_twitter_spark.operators.textstats import (
        repeated_ngram_spans,
    )

    boiler = "all rights reserved by the original author"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique one"),
            (2, boiler + " unique two"),
            (3, boiler + " unique three"),
            (4, "completely different text with no shared spans at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {r.span: (r.n_docs, r.n_occurrences) for r in repeated_ngram_spans(docs, n=7, min_docs=3).collect()}
    assert out[boiler] == (3, 3)
    # nothing from doc 4 and no sub-threshold span leaks through
    assert all(n >= 3 for n, _ in out.values())
    # hashed variant: same group count survives the 8-byte key swap
    hashed = repeated_ngram_spans(docs, n=7, min_docs=3, hash_spans=True)
    assert hashed.count() == len(out)
