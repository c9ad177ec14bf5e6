"""Text analytics operators (BASELINE.json north star: language-ID, quality
scoring, token counting, document fingerprinting).

Everything is a single-pass column expression over the tokens array — no
explode, no shuffle until the final aggregate — except the positional
fingerprint which needs posexplode (order-sensitive rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    stop_lit = F.array(*[F.lit(w) for w in stopwords])
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
    prof_lit = F.array(*[F.lit(w) for w in profile])
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
    exploded = docs.repartition(F.col(id_col)).select(
        F.col(id_col), F.posexplode(toks).alias("pos", "term")
    )
    contrib = (F.col("pos") + 1).cast("long") * (
        F.lit(31) * F.length("term") + F.ascii(F.substring("term", 1, 1))
    ).cast("long")
    return exploded.groupBy(id_col).agg(F.sum(contrib).alias("fingerprint"))
