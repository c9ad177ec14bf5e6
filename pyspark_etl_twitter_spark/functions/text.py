"""Native text column expressions (SURVEY.md §2.8 F3-F6, §2.9 M1).

The reference funnels every row through one pickled Python UDF
(consumer.py:45-47):

    re.sub(r'[^A-Za-z\\n ]|(http\\S+)|(www.\\S+)', '', x.lower().strip()).split()

That UDF is a Catalyst barrier: it breaks whole-stage codegen, blocks
predicate pushdown past it, and pays a per-row JVM↔Python pickle round-trip
(SURVEY.md §4). This module re-expresses the same semantics as pure column
expressions — `lower`/`regexp_replace`/`split`/`filter` — so the whole text
pipeline stays inside codegen and scales linearly with executors.

Bit-parity notes (the reference's quirks are reproduced on purpose,
SURVEY.md §7.5):

- the unescaped ``.`` in ``www.\\S+`` (matches ``wwwX…``) is kept verbatim;
- ``\\n`` stays in the keep-class of the negated set;
- alternation is leftmost-first in both Python ``re`` and Java regex, so the
  pattern string ports unchanged;
- ``(?U)`` makes Java's ``\\s``/``\\S`` Unicode-aware like Python's
  (Java defaults to ASCII-only classes);
- Python ``str.strip()`` strips *all* Unicode whitespace — Spark ``trim``
  only strips ASCII spaces, so strip is a ``regexp_replace`` here;
- Python ``''.split()`` returns ``[]`` (never null) and drops empty tokens;
  Spark ``split`` keeps a leading ``''`` artifact, so we filter it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.functions.lits import lit_strings
from pyspark_etl_twitter_spark.functions.stopwords import ENGLISH_STOPWORDS

# Verbatim from consumer.py:46 (quirks intentional — see module docstring).
CLEAN_PATTERN = r"[^A-Za-z\n ]|(http\S+)|(www.\S+)"

# Java-regex spellings with Unicode character classes for Python parity.
# (?U): Unicode \s/\S like Python's. (?d) UNIX_LINES: Java's `.` excludes
# all line terminators (CR, NEL, U+2028/U+2029) while Python's `.` excludes
# only \n — UNIX_LINES restricts Java to \n, so the unescaped-dot quirk in
# ``www.\S+`` matches a following \r exactly as Python does (found by
# differential fuzzing: "www\r/x" tokenized differently before this flag).
_JAVA_CLEAN_PATTERN = "(?Ud)" + CLEAN_PATTERN
_STRIP_PATTERN = r"(?U)^\s+|\s+$"
_SPLIT_PATTERN = r"(?U)\s+"


def strip(col: Column | str) -> Column:
    """Python ``str.strip()`` semantics (Unicode whitespace, both ends)."""
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, _STRIP_PATTERN, "")


def clean_text(col: Column | str) -> Column:
    """``re.sub(CLEAN_PATTERN, '', x.lower().strip())`` as one expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(strip(F.lower(c)), _JAVA_CLEAN_PATTERN, "")


def split_whitespace(col: Column | str) -> Column:
    """Python ``str.split()``: split on whitespace runs, no empty tokens.

    ``''.split() == []`` — an empty array, not null, so a downstream
    ``dropna`` never removes blank documents (reference quirk F6).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, _SPLIT_PATTERN), lambda t: t != F.lit(""))


def tokenize(col: Column | str) -> Column:
    """Full reference tokenizer: clean + whitespace split (F3-F6)."""
    return split_whitespace(clean_text(col))


def remove_stopwords(
    tokens: Column | str, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS
) -> Column:
    """StopWordsRemover semantics (M1): drop stop tokens, case-insensitive,
    preserving order *and duplicates* — which rules out ``array_except``
    (it dedups). A higher-order ``filter`` over a literal array keeps the
    expression inside codegen; 181 literals are cheaper than a join at any
    scale (the list is a constant, not data).
    """
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    # array_contains against a constant-folded literal array benches faster
    # than In/InSet inside a HOF lambda (the In→InSet rewrite does not fire
    # under lambda scope), and both stay inside codegen.
    stop_lit = lit_strings(stopwords)
    return F.filter(t, lambda tok: ~F.array_contains(stop_lit, F.lower(tok)))
