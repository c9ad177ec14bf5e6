"""Tokenizer bit-parity tests (SURVEY.md §5.3 property tests).

Oracle = the reference's exact Python expression (consumer.py:46):
``re.sub(r'[^A-Za-z\\n ]|(http\\S+)|(www.\\S+)', '', x.lower().strip()).split()``.
The quirks under test: unescaped ``.`` in ``www.\\S+``, ``\\n`` retained in
the keep-class, leftmost-first alternation, empty string → ``[]``.
"""

import pytest
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.functions.stopwords import ENGLISH_STOPWORDS
from pyspark_etl_twitter_spark.functions.text import (
    CLEAN_PATTERN,
    clean_text,
    remove_stopwords,
    tokenize,
)


def python_oracle(x: str) -> list[str]:
    return re.sub(CLEAN_PATTERN, "", x.lower().strip()).split()


ADVERSARIAL = [
    "Hello, World! 123",
    "  leading and trailing  ",
    "check http://example.com/foo?bar=1 out",
    "see www.example.com now",
    "wwwX-unescaped-dot-quirk",
    "MiXeD CaSe TEXT",
    "tabs\tand\nnewlines\nkept",
    "",
    " ",
    "\n",
    "éàü non latin stays? 漢字",
    "http://a http://b www.c wwwd",
    "a,b.c;d:e!f?g",
    "don't stop me now",
    "100% pure numbers 42",
    "trailing url http://x.co",
    "  http://only.url  ",
    "emoji 🎉 party",
    "CRLF\r\nline",
    # fuzz-found: Python's `.` matches \r (only \n excluded); Java needs
    # UNIX_LINES for the same — the unescaped dot in www.\S+ hits this
    "wa*ww)X.é? pwtxX\\p'! pb#w  )é\t\tp1w  \twwww\rwx0$\rw*_ 🎉ta",
    "ü!wwww\r/wc.X bc),Za& ^h)t\",w _",
    "www\rafter-carriage-return",
    "www\nafter-newline",
]


def _spark_tokenize(spark, texts):
    df = spark.createDataFrame([Row(i=i, t=t) for i, t in enumerate(texts)])
    rows = df.select("i", tokenize("t").alias("toks")).collect()
    return [r.toks for r in sorted(rows, key=lambda r: r.i)]


def test_tokenize_adversarial(spark):
    got = _spark_tokenize(spark, ADVERSARIAL)
    want = [python_oracle(t) for t in ADVERSARIAL]
    for text, g, w in zip(ADVERSARIAL, got, want):
        assert g == w, f"mismatch for {text!r}: spark={g} python={w}"


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="aB zZ.,!?\n\t\rhttp://wwwx0189%ü·",
            max_size=40,
        ),
        min_size=1,
        max_size=20,
    )
)
@pytest.mark.slow
def test_tokenize_property(spark, texts):
    got = _spark_tokenize(spark, texts)
    want = [python_oracle(t) for t in texts]
    assert got == want


def test_empty_string_gives_empty_array_not_null(spark):
    df = spark.createDataFrame([Row(t="")])
    row = df.select(tokenize("t").alias("toks")).first()
    assert row.toks == []  # Python ''.split() == []; dropna must not fire


def test_remove_stopwords_preserves_order_and_duplicates(spark):
    # array_except would dedup; StopWordsRemover must not (SURVEY.md §2.9 M1).
    df = spark.createDataFrame([Row(toks=["the", "cat", "The", "cat", "sat", "a"])])
    row = df.select(remove_stopwords(F.col("toks")).alias("out")).first()
    assert row.out == ["cat", "cat", "sat"]
    assert "the" in ENGLISH_STOPWORDS and "a" in ENGLISH_STOPWORDS


def test_stopword_filter_case_insensitive(spark):
    df = spark.createDataFrame([Row(toks=["THE", "Keep", "ITSELF"])])
    row = df.select(remove_stopwords(F.col("toks")).alias("out")).first()
    assert row.out == ["Keep"]


def test_clean_text_scalar(spark):
    df = spark.createDataFrame([Row(t="Visit www.site.com NOW!!")])
    row = df.select(clean_text("t").alias("c")).first()
    assert row.c == re.sub(CLEAN_PATTERN, "", "Visit www.site.com NOW!!".lower().strip())


def test_bm25_ranks_denser_matches_higher(spark):
    from pyspark_etl_twitter_spark.operators.textstats import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "join join join filter"),          # dense in 'join'
            (2, "join merge sort hash group by"),  # one 'join', longer
            (3, "scan scan scan scan"),            # no query term
            (4, "join"),                           # short, one term
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.score for r in bm25_scores(docs, ["join", "merge"]).collect()}
    assert 3 not in got                 # non-matching doc absent
    assert all(v > 0 for v in got.values())
    # same term ('join', df=3): tf=3 in a 4-token doc beats tf=1 — density
    assert got[1] > got[4]
    # doc 2 matches the RARE term 'merge' (df=1, high idf) plus 'join':
    # two-term match with a rare term outranks a dense common-term match
    assert got[2] > got[1]


def test_script_profile_planted_scripts(spark):
    """Cyrillic/CJK/digit fractions computed on planted non-ASCII docs."""
    from pyspark_etl_twitter_spark.operators.textstats import script_profile

    docs = spark.createDataFrame(
        [
            (1, "hello world", "a"),
            (2, "привет мир", "b"),
            (3, "你好世界", "c"),
            (4, "12345", "d"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in script_profile(docs).collect()}
    assert got["a"].avg_frac_latin == 0.909091  # 10 letters / 11 chars
    assert got["b"].avg_frac_cyrillic == 0.9  # 9 cyrillic / 10 chars
    assert got["b"].avg_frac_latin == 0.0
    assert got["c"].avg_frac_cjk == 1.0
    assert got["d"].avg_frac_digit == 1.0


def test_normalized_dedup_finds_case_and_punct_dupes(spark):
    from pyspark_etl_twitter_spark.operators.dedup import (
        normalized_dedup_summary,
    )

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "goodbye world"),
        ],
        "doc_id long, text string",
    )
    row = normalized_dedup_summary(docs).first()
    assert row.n_docs == 4
    assert row.n_distinct_norm == 2  # {hello world, goodbye world}
    assert row.n_norm_dup_docs == 2
    assert row.n_extra_vs_exact == 2  # raw texts were all distinct (4) - 2


def test_compression_ratio_matches_local_zlib(spark):
    """mapInPandas zlib ratios must equal local zlib byte-for-byte, and
    discriminate boilerplate (repetitive => low ratio) from word salad."""
    import zlib

    from pyspark_etl_twitter_spark.operators.textstats import compression_ratio

    rows = [
        (1, "spam ham " * 200),          # highly compressible
        (2, " ".join(f"w{i}x{i*7%97}" for i in range(400))),  # salad
        (3, ""),                          # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio(docs).collect()}
    for doc_id, text in rows:
        raw = text.encode("utf-8")
        assert got[doc_id].n_bytes == len(raw)
        if raw:
            assert got[doc_id].n_compressed == len(zlib.compress(raw, 6))
            assert got[doc_id].ratio == round(len(zlib.compress(raw, 6)) / len(raw), 6)
        else:
            assert got[doc_id].ratio == 1.0
    assert got[1].ratio < 0.05 < got[2].ratio


def test_gopher_quality_flags_rules(spark):
    """Each Gopher rule trips on its designed pathology and the healthy
    doc passes all five (published thresholds; min_words lowered so the
    short fixtures exercise the other rules)."""
    from pyspark.sql import Row

    from pyspark_etl_twitter_spark.operators.textstats import (
        gopher_quality_flags,
    )

    healthy = "the quick brown fox jumps over that lazy dog with style and have be to of grace"
    rows = [
        Row(doc_id=0, text=healthy),
        Row(doc_id=1, text="a a a a a a a a a a the of"),            # mean word len < 3
        Row(doc_id=2, text="### ### ... ... ### the of and extra"),  # symbol ratio > 0.1
        Row(doc_id=3, text="1 2 3 4 5 6 7 8 9 0 the of"),            # alpha words < 80%
        Row(doc_id=4, text="lorem ipsum dolor sit amet sed"),        # 0 stopword hits
        Row(doc_id=5, text=""),                                      # empty: fails, no NaN
    ]
    flags = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_flags(
            spark.createDataFrame(rows), min_words=5
        ).collect()
    }
    assert flags[0]["kept"]
    assert not flags[1]["ok_mean_word_len"] and flags[1]["ok_word_count"]
    assert not flags[2]["ok_symbol_ratio"]
    assert not flags[3]["ok_alpha_words"]
    assert not flags[4]["ok_stopwords"]
    assert not flags[5]["kept"] and flags[5]["ok_mean_word_len"] is False


def test_gopher_line_flags_rules(spark):
    """Line-shape Gopher rules on a hand-planted multi-line fixture:
    exact boundary behavior of both cross-multiplied thresholds
    (bullet <= 90% of lines, ellipsis <= 30% of lines), blank-line
    exclusion, and the vacuous pass for empty documents."""
    from pyspark_etl_twitter_spark.operators.textstats import gopher_line_flags

    docs = spark.createDataFrame(
        [
            # 10 lines, 9 bullets = exactly 90% -> ok; 3 ellipsis = 30% -> ok
            (0, "\n".join(["- b"] * 6 + ["- c ..."] * 3 + ["plain"])),
            # 10 lines, all 10 bullets -> fail bullet rule
            (1, "\n".join(["* x"] * 10)),
            # 10 lines, 4 ellipsis = 40% -> fail ellipsis rule
            (2, "\n".join(["end ..."] * 4 + ["mid"] * 6)),
            # unicode bullet + unicode ellipsis, 1 of 2 lines each:
            # bullet 50% ok; ellipsis 50% -> fail
            (3, "• dot\nplain …"),
            # blank lines excluded: 2 real lines, 1 bullet = 50% -> ok
            (4, "- a\n\n\nplain"),
            # empty doc: no lines -> both vacuously true
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_line_flags(docs).collect()}
    assert got[0].ok_bullet_lines and got[0].ok_ellipsis_lines
    assert got[0].n_lines == 10
    assert not got[1].ok_bullet_lines and got[1].ok_ellipsis_lines
    assert got[2].ok_bullet_lines and not got[2].ok_ellipsis_lines
    assert got[3].ok_bullet_lines and not got[3].ok_ellipsis_lines
    assert got[4].n_lines == 2 and got[4].kept
    assert got[5].n_lines == 0 and got[5].kept


def test_c4_quality_flags_rules(spark):
    """C4 cleaning rules (Raffel et al. 2020, §2.2) on a hand-planted
    fixture: each line rule (terminal punctuation, >=5 words, no
    'javascript') and each document rule (>=3 sentences, no 'lorem
    ipsum', no '{') verified at its boundary, plus kept_text rebuild."""
    from pyspark_etl_twitter_spark.operators.textstats import c4_quality_flags

    good = "alpha beta gamma delta epsilon."  # 5 words, terminal .
    docs = spark.createDataFrame(
        [
            # 3 good lines -> kept (3 sentences)
            (0, "\n".join([good] * 3)),
            # 2 good lines -> fails the sentence rule
            (1, "\n".join([good] * 2)),
            # line rules: no terminal punct / short / javascript
            (2, "\n".join([
                "alpha beta gamma delta epsilon",   # no punct
                "one two three four.",              # 4 words
                "alpha beta gamma JavaScript epsilon.",  # js, case-insens
                good, good, good,
            ])),
            # exclamation/question/quote all count as terminal
            (3, "a b c d e!\nf g h i j?\nk l m n \"o.\""),
            # lorem ipsum anywhere in RAW text kills the doc
            (4, "\n".join([good] * 3) + "\nLorem Ipsum dolor sit amet."),
            # brace anywhere in RAW text kills the doc
            (5, "\n".join([good] * 3) + "\nvar x = { 1 }"),
            # empty doc: no lines, 0 sentences -> dropped
            (6, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in c4_quality_flags(docs).collect()}
    assert got[0].kept and got[0].n_kept_lines == 3 and got[0].n_sentences == 3
    assert got[0].kept_text == "\n".join([good] * 3)
    assert not got[1].kept and got[1].ok_lorem and got[1].ok_brace
    r2 = got[2]
    assert r2.n_lines == 6 and r2.n_kept_lines == 3
    assert r2.n_fail_punct == 1 and r2.n_fail_short == 1 and r2.n_fail_js == 1
    assert r2.kept  # 3 kept sentences survive
    assert got[3].n_kept_lines == 3 and got[3].kept
    assert not got[4].kept and not got[4].ok_lorem and got[4].ok_sentences
    assert not got[5].kept and not got[5].ok_brace
    assert not got[6].kept and got[6].n_lines == 0 and got[6].n_sentences == 0


def test_flesch_reading_ease_semantics(spark):
    """Flesch scoring on hand-countable fixtures: known word/sentence/
    syllable counts give the formula value exactly; unpunctuated text
    counts one sentence; no-vowel words floor at one syllable; empty
    docs score 0.0 in the 'empty' bucket; simple prose scores easier
    than clause-heavy prose."""
    from pyspark_etl_twitter_spark.operators.textstats import (
        flesch_reading_ease,
    )

    docs = spark.createDataFrame(
        [
            # 4 words, 2 sentences, syllables: the(1)+cat(1)+sat(1)+down(1)=4
            (0, "the cat sat. down!"),
            # unpunctuated: 3 words, 1 sentence, tv has no vowel -> 1
            (1, "tv hums xyz"),
            (2, ""),
            # clause-heavy: many words, one sentence, polysyllabic
            (3, "considerable administrative organizations repeatedly "
                "demonstrate extraordinary bureaucratic complications"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in flesch_reading_ease(docs).collect()}

    r0 = out[0]
    assert (r0.n_words, r0.n_sentences, r0.n_syllables) == (4, 2, 4)
    want0 = round(206.835 - 1.015 * (4 / 2) - 84.6 * (4 / 4), 6)
    assert r0.flesch == want0 and r0.flesch_bucket == "easy"

    r1 = out[1]
    # hums: 'u' one group; xyz: 'y' one group; tv: floored to 1
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (3, 1, 3)
    assert r1.flesch == round(206.835 - 1.015 * 3 - 84.6 * 1, 6)

    r2 = out[2]
    assert r2.flesch == 0.0 and r2.flesch_bucket == "empty"

    assert out[3].flesch < out[0].flesch
    assert out[3].flesch_bucket == "difficult"


def test_zipf_fit_recovers_planted_power_law(spark):
    """Fitting a corpus built to an exact power law recovers the planted
    slope: term t_r occurs round(1000·r^s) times (s = −1), so the
    regression over the ranked log-log points returns slope ≈ −1 with
    r² ≈ 1; a uniform-frequency corpus returns slope 0; and the rank
    ordering tie-breaks deterministically on the term."""
    import math

    from pyspark_etl_twitter_spark.operators.textstats import zipf_fit

    def corpus(name, freq):
        words = []
        for r in range(1, 31):
            words += [f"{name}t{r:02d}"] * freq(r)
        return (0, " ".join(words), name)

    rows = [
        corpus("zipf", lambda r: round(1000 / r)),
        corpus("flat", lambda r: 50),
    ]
    docs = spark.createDataFrame(
        [(i, t, s) for i, (_, t, s) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in zipf_fit(docs, top_n=30).collect()}
    z, f = out["zipf"], out["flat"]
    assert z.n_terms == 30 and f.n_terms == 30
    assert abs(z.zipf_slope - (-1.0)) < 0.02 and z.zipf_r2 > 0.999
    assert abs(f.zipf_slope) < 1e-9

    # closed-form check on a tiny exact case: two points (r=1,c=4),(r=2,c=2)
    tiny = spark.createDataFrame(
        [(0, "a a a a b b", "s")], "doc_id long, text string, source string"
    )
    t = zipf_fit(tiny, top_n=10).collect()[0]
    want = (math.log(2.0) - math.log(4.0)) / (math.log(2.0) - math.log(1.0))
    assert t.zipf_slope == round(want, 6) and t.zipf_r2 == 1.0


def test_zipf_fit_degenerate_single_term_group_is_null(spark):
    """A group whose ranked list has a single term makes the slope
    denominator n·sxx − sx² exactly 0 — engine-dependent 0/0 unless
    pinned: zipf_fit emits explicit NULL slope/intercept/r² (r13 advice),
    and the DuckDB oracle mirrors the same n_terms >= 2 guard."""
    from pyspark_etl_twitter_spark.operators.textstats import zipf_fit

    docs = spark.createDataFrame(
        [(0, "solo solo solo", "deg"), (1, "a a b", "ok")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in zipf_fit(docs).collect()}
    d = out["deg"]
    assert d.n_terms == 1
    assert d.zipf_slope is None and d.zipf_intercept is None and d.zipf_r2 is None
    assert out["ok"].zipf_slope is not None
