"""Text analytics operators (BASELINE.json north star: language-ID, quality
scoring, token counting, document fingerprinting).

Everything is a single-pass column expression over the tokens array — no
explode, no shuffle until the final aggregate — except the positional
fingerprint which needs posexplode (order-sensitive rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.fanout import fan_out

from pyspark_etl_twitter_spark.functions.lits import lit_strings
from pyspark_etl_twitter_spark.functions.stopwords import ENGLISH_STOPWORDS

# Small deterministic marker-word profiles for the language-ID heuristic.
# Ordered: earlier languages win score ties (priority = position).
LANG_PROFILES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for")),
    ("es", ("el", "la", "de", "que", "y", "en", "un", "se", "no", "los")),
    ("de", ("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "ist")),
    ("fr", ("le", "la", "les", "de", "un", "et", "il", "je", "ne", "pas")),
)


def ws_tokens(text: Column | str) -> Column:
    """Single-space tokens, no empties (documents.text is pre-normalized)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(ws_tokens(text))


def regex_token_count(text: Column | str, pattern: str = "[a-z]+|[0-9]+|[^a-z0-9 ]") -> Column:
    """BPE-ish regex tokenizer count: letter runs, digit runs, single
    punctuation — the cheap token-budget estimator for LLM pipelines."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def avg_token_length(tokens: Column) -> Column:
    total = F.aggregate(
        F.transform(tokens, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return total.cast("double") / F.size(tokens).cast("double")


def stopword_ratio(tokens: Column, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    stop_lit = lit_strings(stopwords)  # one py4j call (functions/lits)
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_lit, F.lower(t))))
    return n_stop.cast("double") / F.size(tokens).cast("double")


def quality_columns(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-doc quality signals: token count, mean token length,
    stop-word ratio. One narrow map stage."""
    toks = ws_tokens(text_col)
    return (
        docs.withColumn("n_tokens", F.size(toks))
        .withColumn("avg_token_len", avg_token_length(toks))
        .withColumn("stop_ratio", stopword_ratio(toks))
    )


def profile_score(tokens: Column, profile: tuple[str, ...]) -> Column:
    prof_lit = lit_strings(profile)
    return F.size(F.filter(tokens, lambda t: F.array_contains(prof_lit, t)))


def detect_language(text: Column | str) -> Column:
    """Marker-word language-ID: argmax profile hit-count with deterministic
    tie-break (profile order). Pure expression — argmax via array_max over
    (score, priority, lang) structs, compared lexicographically."""
    toks = ws_tokens(text)
    n = len(LANG_PROFILES)
    candidates = [
        F.struct(
            profile_score(toks, profile).alias("score"),
            F.lit(n - i).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, profile) in enumerate(LANG_PROFILES)
    ]
    return F.array_max(F.array(*candidates)).getField("lang")


def doc_fingerprints(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-sensitive positional fingerprint:
    Σ_p (p+1) · (31·len(term_p) + ascii(term_p[0])) — a rolling-hash-style
    content signature that is also expressible in ANSI SQL (oracle-able,
    unlike xxhash64). posexplode + one groupBy(id) sum."""
    toks = ws_tokens(text_col)
    exploded = fan_out(docs, F.col(id_col)).select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    )
    contrib = (F.col("pos") + 1).cast("long") * (
        F.lit(31) * F.length("term") + F.ascii(F.substring("term", 1, 1))
    ).cast("long")
    return exploded.groupBy(id_col).agg(F.sum(contrib).alias("fingerprint"))


# --------------------------------------------------------------------------
# Within-document repetition metrics + composite quality gate
# (Gopher-style repetition filters for training-data curation)
# --------------------------------------------------------------------------

def repetition_columns(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition profile: (id, n_tokens, dup_token_ratio,
    top_token_share, top_bigram_share). High values mark boilerplate /
    keyword-stuffed / looping documents that repetition filters drop.

    Shape: one pre-partitioned explode per n-gram order, frequency counts
    via map-side-combined (id, gram) aggregates, then per-id maxima — the
    shuffle carries counts, never text. Zero-token docs are preserved via
    the left joins (ratios 0.0), matching the oracle's LEFT JOIN semantics.
    """
    from pyspark_etl_twitter_spark.operators.dedup import shingle_array

    toks = ws_tokens(text_col)
    base = fan_out(docs, F.col(id_col)).select(
        F.col(id_col), toks.alias("_toks")
    )
    uni = (
        base.select(id_col, F.explode("_toks").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("_nt"),
            F.count(F.lit(1)).alias("_nd"),
            F.max("c").alias("_topc"),
        )
    )
    bi = (
        base.select(id_col, F.explode(shingle_array(F.col("_toks"), 2)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("_nb"), F.max("c").alias("_topb"))
    )
    nt = F.col("_nt").cast("double")
    return (
        base.select(F.col(id_col), F.size("_toks").alias("n_tokens"))
        .join(uni, id_col, "left")
        .join(bi, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.coalesce(1 - F.col("_nd").cast("double") / nt, F.lit(0.0)), 6
            ).alias("dup_token_ratio"),
            F.round(
                F.coalesce(F.col("_topc").cast("double") / nt, F.lit(0.0)), 6
            ).alias("top_token_share"),
            F.round(
                F.coalesce(
                    F.col("_topb").cast("double") / F.col("_nb").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("top_bigram_share"),
        )
    )


def quality_gate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 5000,
    max_dup_ratio: float = 0.3,
    max_top_bigram: float = 0.25,
) -> DataFrame:
    """Composite curation gate: append a ``kept`` flag combining length
    bounds and repetition thresholds. One id-partitioned join of the
    repetition profile back onto the corpus; downstream pipelines filter on
    ``kept`` so the decision is auditable (flag, not silent drop)."""
    rep = repetition_columns(docs, id_col=id_col, text_col=text_col)
    return docs.join(rep, id_col).withColumn(
        "kept",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("dup_token_ratio") <= max_dup_ratio)
        & (F.col("top_bigram_share") <= max_top_bigram),
    )


def top_tfidf_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k keyword extraction per document by smoothed TF-IDF:
    score = tf · ln((N+1)/(df+1)), ties broken by term. The corpus pass is
    the same TF shape as sentiment scoring (pre-partitioned explode,
    map-side-combined counts); df is a second small aggregate over distinct
    (doc, term); the final ranking window partitions by doc id — never a
    global sort. N counts all documents (empty docs included; a broadcast
    in-plan scalar, not a driver-side count action) so the IDF denominator
    is stable under curation filters upstream."""
    from pyspark.sql import Window

    n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    tf = (
        fan_out(docs, F.col(id_col))
        .select(F.col(id_col), F.explode(ws_tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log((F.col("_n") + 1.0) / (F.col("df").cast("double") + 1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tfidf", "rnk")
    )


def bm25_scores(
    docs,
    query_terms,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 relevance of every document to a bag-of-terms query:
    ``(id, score)`` for docs matching ≥1 query term, Lucene idf form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Scale shape: doc length comes from ``size(ws_tokens(text))`` — a
    narrow per-row expression, no explode of the full corpus. Only tokens
    MATCHING the (broadcast-literal) query survive the explode, so the
    tf aggregate's shuffle carries matched rows only; N and avgdl travel
    as broadcast 1-row frames. Work scales with hits, not corpus."""
    from pyspark.sql import functions as F

    terms = [t for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    base = docs.select(
        F.col(id_col),
        ws_tokens(text_col).alias("_toks"),
    ).select(
        id_col, F.size("_toks").cast("double").alias("_dl"), F.col("_toks")
    )
    scalars = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    )
    matched = base.select(
        id_col, "_dl", F.explode("_toks").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = matched.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("_tf"),
        F.first("_dl").alias("_dl"),
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("_df"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            id_col,
            (
                F.log(1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
                * (F.col("_tf") * (k1 + 1.0))
                / (
                    F.col("_tf")
                    + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
                )
            ).alias("_s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )


# --------------------------------------------------------------------------
# Round 4: char-entropy quality signal + cross-doc repeated span detection
# --------------------------------------------------------------------------


def char_entropy(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution — the compression-ratio-style quality signal (gibberish
    and boilerplate both sit at distribution extremes; natural text
    clusters in a narrow band).

    Plan: explode to (doc, char) → map-side-combined count → one
    aggregate computing H = log2(n) - Σ c·log2(c) / n from the per-char
    counts (the algebraic form avoids a second pass for p_i). Shuffle
    carries (doc, char, count) — at most |alphabet| rows per doc
    regardless of document length, so the exchange is bounded by
    docs × ~100, not corpus bytes."""
    counts = (
        fan_out(docs, F.col(id_col))
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy(id_col).agg(
        F.sum("c").alias("n_chars_counted"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            6,
        ).alias("entropy_bits"),
    )


def repeated_ngram_spans(
    docs: DataFrame,
    *,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_spans: bool = False,
) -> DataFrame:
    """Cross-document repeated spans: word ``n``-grams appearing in at
    least ``min_docs`` DISTINCT documents, with how many docs carry each —
    the span-level dedup diagnostic (boilerplate headers, licence blocks,
    templated text) that document-level dedup misses.

    Returns (span, n_docs, n_occurrences). Scale: one explode →
    distinct-per-doc → groupBy(span) count chain; the shuffle key is the
    span (or its 8-byte xxhash64 with ``hash_spans=True`` — the knob for
    when raw span strings dominate exchange bytes; collisions merge spans
    at ~2⁻⁶⁴ odds, acceptable for the diagnostic, NOT for removal).
    Hot spans (a licence block in half the corpus) are a groupBy skew
    concern, not a pair blowup — counts, never pairs, are emitted, so the
    worst case is AQE splitting one hot reducer."""
    from pyspark_etl_twitter_spark.operators.dedup import shingle_array

    span = F.explode(shingle_array(ws_tokens(text_col), n)).alias("span")
    per_doc = (
        fan_out(docs, F.col(id_col))
        .select(F.col(id_col), span)
        .groupBy(id_col, "span")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    if hash_spans:
        per_doc = per_doc.select(
            id_col, F.xxhash64("span").alias("span"), "occ"
        )
    return (
        per_doc.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


# --------------------------------------------------------------------------
# Script / character-class profile (round 5)
# --------------------------------------------------------------------------

#: (name, regex character class) — identical syntax in Java regex (Spark)
#: and RE2 (DuckDB oracle): literal ranges only, no \p{} properties (whose
#: unicode tables differ across engines).
SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("latin", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("cjk", "[一-鿿]"),
)


def script_fractions(text: Column | str) -> list[Column]:
    """Per-character-class fraction columns ``frac_<name>`` — the script/
    charset signal a multilingual curation mix keys on (a "lang=en" doc
    that is 40% CJK by characters is mislabeled; a high digit fraction
    flags tables/logs). Implemented as length-difference after class
    removal — narrow codegen string ops, zero shuffle, and expressible
    verbatim in the DuckDB oracle."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    out = []
    for name, cls in SCRIPT_CLASSES:
        frac = F.when(n > 0, (n - F.length(F.regexp_replace(c, cls, ""))) / n).otherwise(
            F.lit(0.0)
        )
        out.append(F.round(frac, 6).alias(f"frac_{name}"))
    return out


def script_profile(
    docs: DataFrame, *, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group mean script fractions + doc count: one narrow projection
    and one hash aggregate — shuffle carries |groups| × 5 doubles."""
    per_doc = docs.select(F.col(group_col), *script_fractions(text_col))
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.round(F.avg(f"frac_{name}"), 6).alias(f"avg_frac_{name}")
            for name, _ in SCRIPT_CLASSES
        ],
    )


# --------------------------------------------------------------------------
# Compression-ratio quality signal (round 5)
# --------------------------------------------------------------------------


def compression_ratio(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap
    boilerplate/repetition signal (highly compressible text is template
    or repeated content; near-incompressible text is often binary salad
    or hash dumps). Returns (id_col, n_bytes, n_compressed, ratio) with
    ratio = compressed/raw rounded to 6 dp; empty docs get ratio 1.0.

    Arrow-batched ``mapInPandas`` — the sanctioned Python path: zlib is
    a C core, per-batch overhead is one Arrow exchange, and nothing
    here is expressible as a Catalyst expression (DEFLATE is not SQL).
    No oracle twin for the same reason; parity is pytest vs local zlib
    byte-for-byte. Narrow (no shuffle); pair it with
    ``quality_columns``/``repetition_columns`` thresholds downstream."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_bytes long, n_compressed long, ratio double"
    )

    def batches(it):
        import zlib

        for pdf in it:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len()
            n_comp = raw.map(lambda b: len(zlib.compress(b, level)))
            ratio = (n_comp / n_bytes.where(n_bytes > 0)).fillna(1.0).round(6)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "ratio": ratio,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)


# Gopher quality-rule constants (Rae et al. 2021, arXiv:2112.11446,
# Appendix A1.1 — the published web-corpus filter most pipelines quote).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality_flags(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stop_hits: int = GOPHER_MIN_STOPWORD_HITS,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document Gopher quality rules (Rae et al. 2021, A1.1) as one
    pass of column expressions — the named ruleset LLM pipelines apply
    before dedup. Emits one boolean per rule plus the composite ``kept``
    so the decision is auditable per rule, not a silent drop:

    - ``ok_word_count``: word count in [min_words, max_words]
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_symbol_ratio``: (# '#' + # '...') / words <= 0.1
    - ``ok_alpha_words``: >= 80% of words contain a letter
    - ``ok_stopwords``: contains >= ``min_stop_hits`` distinct words
      from ``stopwords`` (published defaults: >= 2 of the 8-word Gopher
      list; parameterized because a corpus whose register lacks English
      function words — code, tables, synthetic fixtures — needs a
      corpus-appropriate list to make the rule discriminate rather than
      reject everything)

    The paper's line-shape rules (bullet/ellipsis line fractions) are
    line-based and live in the companion ``gopher_line_flags`` — join on
    ``id_col`` and AND its ``kept`` into this composite for multi-line
    corpora (the single-line pre-normalized ``documents`` testdata
    passes them trivially). Every ratio comparison is cross-multiplied
    into EXACT INTEGER arithmetic (mean_wl in [3,10] ⇔ 3n ≤ Σlen ≤ 10n;
    symbols/words ≤ 0.1 ⇔ 30·#hash + 10·ell_chars ≤ 3n; alpha ≥ 0.8 ⇔
    5·alpha ≥ 4n) — no division, no NaN on empty docs, bit-identical
    across engines, so the whole gate is DuckDB-verifiable."""
    t = F.col(text_col)
    toks = ws_tokens(text_col)
    n_words = F.size(toks)
    sum_wl = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    hash_count = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    # ell_chars = 3 × (number of non-overlapping '...' occurrences)
    ell_chars = F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            lit_strings(stopwords),
        )
    )
    # keep_cols ride along in the same narrow pass — rule consumers that
    # aggregate by a corpus column (source, lang) must NOT have to
    # re-join the corpus on id just to recover it (a 100 TB shuffle for
    # a column that was already in hand)
    flags = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_words.alias("n_words"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("ok_word_count"),
        (
            (n_words > 0)
            & (sum_wl >= 3 * n_words)
            & (sum_wl <= 10 * n_words)
        ).alias("ok_mean_word_len"),
        ((30 * hash_count + 10 * ell_chars) <= 3 * n_words).alias(
            "ok_symbol_ratio"
        ),
        ((5 * alpha_words) >= 4 * n_words).alias("ok_alpha_words"),
        (stop_hits >= min_stop_hits).alias("ok_stopwords"),
    )
    return flags.withColumn(
        "kept",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords"),
    )


#: line-shape rule constants (Rae et al. 2021, A1.1): remove documents
#: where >90% of lines start with a bullet or >30% end with an ellipsis
GOPHER_BULLET_CHARS = ("-", "*", "•")
GOPHER_ELLIPSIS_SUFFIXES = ("...", "…")


def gopher_line_flags(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The two line-shape Gopher rules (Rae et al. 2021, A1.1) over
    ``split(text, '\\n')`` — the companion to ``gopher_quality_flags``
    for multi-line (web) corpora:

    - ``ok_bullet_lines``: <= 90% of lines start with a bullet
      character (``GOPHER_BULLET_CHARS``)
    - ``ok_ellipsis_lines``: <= 30% of lines end with an ellipsis
      (``GOPHER_ELLIPSIS_SUFFIXES``)

    Lines are the non-empty segments of the newline split (blank lines
    carry no shape evidence); a document with no lines passes both
    rules vacuously. Both fractions are cross-multiplied into exact
    integer arithmetic (bullet <= 0.9·n ⇔ 10·bullet <= 9·n; ellipsis
    <= 0.3·n ⇔ 10·ellipsis <= 3·n) — no division, engine-portable,
    fully DuckDB-verifiable. One narrow codegen pass, zero shuffle.
    ``kept`` is the AND of both flags; join on ``id_col`` to fold into
    the word-level composite."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda ln: F.length(ln) > 0
    )
    is_bullet = lambda ln: F.substring(ln, 1, 1).isin(  # noqa: E731
        *GOPHER_BULLET_CHARS
    )
    is_ellipsis = lambda ln: (  # noqa: E731
        ln.endswith(GOPHER_ELLIPSIS_SUFFIXES[0])
        | ln.endswith(GOPHER_ELLIPSIS_SUFFIXES[1])
    )
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, is_bullet))
    n_ellipsis = F.size(F.filter(lines, is_ellipsis))
    flags = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_lines.alias("n_lines"),
        (10 * n_bullet <= 9 * n_lines).alias("ok_bullet_lines"),
        (10 * n_ellipsis <= 3 * n_lines).alias("ok_ellipsis_lines"),
    )
    return flags.withColumn(
        "kept", F.col("ok_bullet_lines") & F.col("ok_ellipsis_lines")
    )


# --------------------------------------------------------------------------
# C4 cleaning rules (round 12)
# --------------------------------------------------------------------------

#: C4 cleaning constants (Raffel et al. 2020, §2.2 — the public C4
#: ruleset). A line is admitted only if it ends in terminal punctuation
#: (the double quote is C4's closing-quote case), carries at least five
#: words, and does not mention "javascript"; a page survives only with at
#: least three sentences and with neither "lorem ipsum" nor a curly brace
#: anywhere in the raw text.
#:
#: NOTE on the 5/3 constants (r12 advice): the paper's §2.2 PROSE says
#: lines need "at least 3 words" and pages "at least 5 sentences", but
#: the RELEASED C4 implementation (TensorFlow-Datasets ``c4_utils``:
#: ``_MIN_WORDS_PER_LINE = 5``, ``_MIN_NUM_SENTENCES = 3``) swaps them.
#: This operator follows the released code — the ruleset that actually
#: produced the public C4 corpus — not the paper prose.
C4_TERMINAL_PUNCT = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_LINE_BAD_TOKEN = "javascript"
C4_DOC_LOREM = "lorem ipsum"
C4_DOC_BRACE = "{"


def c4_quality_flags(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, §2.2) as engine-portable
    line + document flags — the sibling of ``gopher_quality_flags`` /
    ``gopher_line_flags`` for the other canonical public web-curation
    ruleset.

    Line-level (a line is a non-empty segment of the newline split);
    a line is KEPT iff ALL of:

    - ends in terminal punctuation (``C4_TERMINAL_PUNCT``),
    - has at least ``C4_MIN_LINE_WORDS`` whitespace words,
    - does not contain ``"javascript"`` case-insensitively.

    Document-level; a document is KEPT iff ALL of:

    - the kept text carries at least ``C4_MIN_SENTENCES`` sentence-final
      marks (``[.!?]`` occurrences in the kept lines — the portable
      stand-in for C4's sentence splitter),
    - the RAW text does not contain ``"lorem ipsum"`` (case-insensitive),
    - the RAW text does not contain ``"{"`` (C4's code-page heuristic).

    Emits per document: ``n_lines``, ``n_kept_lines``, per-rule line
    failure counts (``n_fail_punct`` / ``n_fail_short`` / ``n_fail_js``
    — a line may fail several), ``n_sentences``, the three document
    flags, ``kept``, and ``kept_text`` (newline re-join of surviving
    lines — the cleaned page downstream stages consume).

    Scale: one narrow codegen pass over ``text`` (higher-order filters
    + string ops), zero shuffle, zero Python; every rule is exact
    integer/string arithmetic so DuckDB replays it verbatim.
    """
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda ln: F.length(ln) > 0
    )
    wc = lambda ln: F.size(  # noqa: E731
        F.filter(F.split(ln, " "), lambda t: t != F.lit(""))
    )
    ok_punct = lambda ln: F.substring(ln, -1, 1).isin(  # noqa: E731
        *C4_TERMINAL_PUNCT
    )
    ok_short = lambda ln: wc(ln) >= C4_MIN_LINE_WORDS  # noqa: E731
    ok_js = lambda ln: (  # noqa: E731
        F.instr(F.lower(ln), C4_LINE_BAD_TOKEN) == 0
    )
    kept_line = lambda ln: ok_punct(ln) & ok_short(ln) & ok_js(ln)  # noqa: E731

    kept_lines = F.filter(lines, kept_line)
    kept_text = F.array_join(kept_lines, "\n")
    n_sentences = F.length(kept_text) - F.length(
        F.regexp_replace(kept_text, "[.!?]", "")
    )
    raw_low = F.lower(F.col(text_col))
    flags = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.size(lines).alias("n_lines"),
        F.size(kept_lines).alias("n_kept_lines"),
        F.size(F.filter(lines, lambda ln: ~ok_punct(ln))).alias("n_fail_punct"),
        F.size(F.filter(lines, lambda ln: ~ok_short(ln))).alias("n_fail_short"),
        F.size(F.filter(lines, lambda ln: ~ok_js(ln))).alias("n_fail_js"),
        n_sentences.alias("n_sentences"),
        (n_sentences >= C4_MIN_SENTENCES).alias("ok_sentences"),
        (F.instr(raw_low, C4_DOC_LOREM) == 0).alias("ok_lorem"),
        (F.instr(F.col(text_col), C4_DOC_BRACE) == 0).alias("ok_brace"),
        kept_text.alias("kept_text"),
    )
    return flags.withColumn(
        "kept",
        F.col("ok_sentences") & F.col("ok_lorem") & F.col("ok_brace"),
    )


# --------------------------------------------------------------------------
# Flesch reading ease (round 13)
# --------------------------------------------------------------------------

#: Flesch (1948) reading-ease coefficients, the public formula:
#: 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
FLESCH_BASE = 206.835
FLESCH_WPS = 1.015
FLESCH_SPW = 84.6
#: conventional bucket edges: >= 60 "easy", >= 30 "standard", else "difficult"
FLESCH_EASY = 60.0
FLESCH_STANDARD = 30.0


def flesch_reading_ease(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Per-document Flesch reading-ease score with the standard
    relational approximations — the readability rung of the quality
    ladder (length/punct ratios → Gopher/C4 rules → LM perplexity →
    THIS: a classic human-oriented difficulty score used as a curation
    feature):

    - sentences = runs of terminal punctuation ``[.!?]+`` (min 1, so an
      unpunctuated fragment counts as one sentence),
    - syllables per word = vowel-GROUP count ``[aeiouy]+`` on the
      lowercased word, floored at 1 (the standard heuristic; exact
      syllabification needs a dictionary),
    - score = 206.835 − 1.015·(W/S) − 84.6·(Syl/W); empty docs score 0.

    Everything is ``regexp_count``/higher-order-array arithmetic — one
    codegen pass, zero shuffle, and DuckDB replays it verbatim
    (``len(regexp_extract_all(...))``); counts are integers, so the only
    float ops are the two divisions and the final affine combination —
    identical IEEE sequence on both engines."""
    toks = ws_tokens(text_col)
    n_words = F.size(toks)
    n_sents = F.greatest(
        F.lit(1), F.regexp_count(F.col(text_col), F.lit(r"[.!?]+"))
    )
    syl = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.lit(1), F.regexp_count(F.lower(w), F.lit("[aeiouy]+"))
            ),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    score = (
        F.lit(FLESCH_BASE)
        - F.lit(FLESCH_WPS)
        * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(FLESCH_SPW) * (syl.cast("double") / n_words.cast("double"))
    )
    flesch = F.when(n_words == 0, F.lit(0.0)).otherwise(score)
    bucket = (
        F.when(n_words == 0, F.lit("empty"))
        .when(flesch >= FLESCH_EASY, F.lit("easy"))
        .when(flesch >= FLESCH_STANDARD, F.lit("standard"))
        .otherwise(F.lit("difficult"))
    )
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"),
        F.round(flesch, round_dp).alias("flesch"),
        bucket.alias("flesch_bucket"),
    )


# --------------------------------------------------------------------------
# Zipf rank-frequency fit (round 13)
# --------------------------------------------------------------------------

def zipf_fit(
    docs: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    top_n: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """Least-squares fit of log(frequency) vs log(rank) over each
    group's ``top_n`` vocabulary — the Zipf's-law corpus-health ruler:
    natural text fits a slope near −1; template-generated, keyword-
    stuffed, or truncated-vocabulary corpora bend away from it, so the
    slope (and fit r²) is a cheap distribution-level quality feature
    next to entropy and the repetition ratios.

    Distributed shape: one (group, term) count aggregate over the
    corpus, a per-group rank window over it, and the top-``top_n`` rows
    collapse to ONE bounded list per group — the regression's four sums
    run as sequential array folds over that ordered list (identical FP
    op sequence on both engines; DuckDB replays them with list_reduce),
    so the only cross-engine float risk is ln()'s last ulp, absorbed by
    the ``round_dp`` output round like every LM row. Ranks tie-break on
    the term, so the ranking is a total order."""
    from pyspark.sql import Window

    toks = ws_tokens(text_col)
    counts = (
        fan_out(docs, F.col(group_col))
        .select(F.col(group_col).alias("g"), F.explode(toks).alias("term"))
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("g").orderBy(F.desc("cnt"), F.col("term"))
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    lst = F.sort_array(
        F.collect_list(F.struct(F.col("rank"), F.col("cnt")))
    )
    g = ranked.groupBy("g").agg(lst.alias("xs"))

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)

    lx = F.transform(F.col("xs"), lambda s: F.log(s["rank"].cast("double")))
    ly = F.transform(F.col("xs"), lambda s: F.log(s["cnt"].cast("double")))
    lxy = F.zip_with(lx, ly, lambda a, b: a * b)
    lxx = F.transform(lx, lambda a: a * a)
    lyy = F.transform(ly, lambda a: a * a)
    n = F.size(F.col("xs")).cast("double")
    sx, sy, sxy, sxx, syy = fold(lx), fold(ly), fold(lxy), fold(lxx), fold(lyy)
    dnum = n * sxy - sx * sy
    dden = n * sxx - sx * sx
    slope = dnum / dden
    intercept = (sy - slope * sx) / n
    r2 = (dnum * dnum) / (dden * (n * syy - sy * sy))
    # degenerate-group guard (r13 advice): a single-rank group makes
    # dden = 0 → 0/0, which is NaN on Spark doubles but NULL/inf under
    # DuckDB's division semantics — pin the case to explicit NULLs on
    # both engines instead of an engine-dependent value
    ok = F.size(F.col("xs")) >= 2
    null_d = F.lit(None).cast("double")

    def _guard(c: Column) -> Column:
        return F.when(ok, F.round(c, round_dp)).otherwise(null_d)

    return g.select(
        F.col("g").alias(group_col),
        F.size(F.col("xs")).cast("long").alias("n_terms"),
        _guard(slope).alias("zipf_slope"),
        _guard(intercept).alias("zipf_intercept"),
        _guard(r2).alias("zipf_r2"),
    )
