"""Native TF-IDF + logistic scoring (SURVEY.md §1.4, §2.9 M2-M5).

The reference scores text with a 5-stage MLlib ``PipelineModel``
(consumer.py:51-53): StopWordsRemover → CountVectorizer → IDF →
StringIndexer → LogisticRegression. Relationally (SURVEY.md §1.4) the fitted
model is just tables — vocabulary(term, idx), idf(idx, weight),
lr(idx, coef), intercept — and the whole inference collapses to

    margin(doc) = Σ_{t ∈ tokens(doc)} tf(doc, t) · idf(t) · coef(t) + b
    prediction  = 1.0 if σ(margin) > 0.5 else 0.0      (σ(m) > 0.5 ⇔ m > 0)

i.e. explode + broadcast-hash-join against a precomputed ``term → weight``
dimension + groupBy-sum. This keeps the entire scoring path inside
whole-stage codegen — no VectorUDT, no Python.

Label polarity (easy to invert, SURVEY.md §7.5): the reference's
StringIndexer labelsArray is ``[['4','0']]`` (Sentiment140), so
**prediction 1.0 = "0" = negative, 0.0 = "4" = positive**.

Scale notes:
- The weight table is a *dimension* (262k rows in the reference model ≈ a few
  MB) — always ``F.broadcast`` it; the token fact side can be 100 TB and the
  join stays shuffle-free.
- ``tf`` is a partial-aggregable count: Catalyst plans map-side combine for
  the groupBy(doc_id, term) so the shuffle carries (doc, term, count), not
  raw tokens.
- The final groupBy(doc_id) shuffles once on doc_id; AQE coalesces the
  post-shuffle partitions at small SF and splits skewed docs at large SF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.fanout import fan_out

from pyspark_etl_twitter_spark.functions.text import remove_stopwords, tokenize

# Reference model intercept: pre_trained_model/stages/
# 4_LogisticRegression_ed84056a763e/data/*.parquet (SURVEY.md §1.4).
INTERCEPT = -0.24585153897212955

# Reference IDF stage: minDocFreq=3 (stages/2_IDF_ea5017f27b57/metadata).
MIN_DOC_FREQ = 3

# The most recent fit_and_score persisted tf relation. Each new call releases
# the previous one, so a session running many fits (registry sweep, bench
# loop) holds at most ONE cached tf at a time instead of leaking one per
# call; `release_cache()` frees the last.
_LAST_TF: list = []


def release_cache() -> None:
    """Unpersist the tf relation cached by the most recent fit_and_score."""
    while _LAST_TF:
        _LAST_TF.pop().unpersist()


def tokens_column(text_col: Column | str, *, reference_clean: bool = False,
                  stop: bool = True) -> Column:
    """Token array for scoring. ``reference_clean=True`` applies the full
    reference regex pipeline (F3-F6); the driver ``documents`` table is
    already lowercase space-separated, where a plain split is semantically
    identical and DuckDB-oracle-expressible."""
    if reference_clean:
        toks = tokenize(text_col)
    else:
        c = F.col(text_col) if isinstance(text_col, str) else text_col
        toks = F.filter(F.split(c, " "), lambda t: t != F.lit(""))
    return remove_stopwords(toks) if stop else toks


def build_weight_table(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    stop: bool = True,
    min_doc_freq: int = MIN_DOC_FREQ,
) -> DataFrame:
    """Fit a deterministic ``(term, idx, df, idf, coef)`` weight dimension
    from a corpus — the relational equivalent of CountVectorizer+IDF+LR
    artifacts (SURVEY.md §1.4). ``idx`` follows CountVectorizer's
    frequencyDesc order (ties broken by term for determinism);
    ``idf = ln((N+1)/(df+1))`` zeroed below ``min_doc_freq`` (M3 semantics);
    ``coef`` is a deterministic mixed-sign function of ``idx`` standing in
    for trained LR coefficients so both Spark and the DuckDB oracle can
    derive the identical table from the data alone.

    idx assignment uses the two-phase distributed rank (operators/
    ranking.py) — identical total order, no single-partition WindowExec,
    so vocabulary construction itself scales past the ≈262k-term
    reference model.
    """
    n_docs = documents.count()
    toks = tokens_column(text_col, stop=stop)
    term_df = (
        documents.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
    )
    from pyspark_etl_twitter_spark.operators.ranking import with_global_rank

    return (
        with_global_rank(
            term_df, [F.col("df").desc(), F.col("term")], rank_col="idx"
        )
        .withColumn(
            "idf",
            F.when(F.col("df") < min_doc_freq, F.lit(0.0)).otherwise(
                F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df").cast("double") + 1.0))
            ),
        )
        .withColumn("coef", ((F.col("idx") % 13) - F.lit(6)).cast("double") / 5.0)
        .select("term", "idx", "df", "idf", "coef")
    )


def score_documents(
    documents: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    intercept: float = INTERCEPT,
    stop: bool = True,
    reference_clean: bool = False,
) -> DataFrame:
    """Score every document: returns (id_col, margin, prediction).

    Plan shape: explode_outer(tokens) → map-side-combined groupBy(doc, term)
    count [tf] → **broadcast left** join weights [M2+M3+M5 folded] →
    groupBy(doc) sum(tf·coalesce(idf·coef, 0)). ``explode_outer`` keeps a
    null-term row for vocab-less/empty docs, so every document reaches the
    final aggregate and no join-back is needed — the whole pipeline is one
    doc-id shuffle end to end (their margin is the bare intercept,
    mirroring MLlib's empty-vector dot product).
    """
    toks = tokens_column(text_col, stop=stop, reference_clean=reference_clean)
    tf = (
        fan_out(documents, F.col(id_col))
        .select(F.col(id_col), F.explode_outer(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.join(F.broadcast(weights), "term", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("tf")
                * F.coalesce(F.col("idf") * F.col("coef"), F.lit(0.0))
            ).alias("dot")
        )
        .select(
            F.col(id_col),
            (F.col("dot") + F.lit(intercept)).alias("margin"),
        )
        .withColumn(
            "prediction",
            F.when(F.col("margin") > 0, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
    )


def fit_and_score(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    intercept: float = INTERCEPT,
    stop: bool = True,
    min_doc_freq: int = MIN_DOC_FREQ,
) -> DataFrame:
    """Fused fit+inference: derive the weight table AND score in one job,
    sharing the exploded (doc, term, tf) relation between the df-count
    aggregation and the scoring join via an explicit persist.

    Without the persist Catalyst recomputes the explode+groupBy branch
    twice (self-referencing plans get no automatic CSE across actions).
    At 100 TB fit and inference are separate jobs with the weight table
    persisted to storage — this fused shape exists for the benchmark/oracle
    path where both run in one query; tf is ~(docs × distinct terms/doc)
    rows of (long, string, long), far smaller than the corpus.

    Shuffle layout: documents are repartitioned by id *before* the explode,
    so (a) the groupBy(id, term) needs no further shuffle (hash partitioning
    on a subset of the grouping keys satisfies the clustering requirement) —
    compact documents are shuffled once and exploded tokens never are — and
    (b) single-file local inputs still fan out across all cores."""
    toks = tokens_column(text_col, stop=stop)
    tf = (
        fan_out(documents, F.col(id_col))
        .select(F.col(id_col), F.explode_outer(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    release_cache()
    _LAST_TF.append(tf)
    # explode_outer guarantees >=1 tf row per document, so the corpus size is
    # derivable from the (about-to-be-cached) tf relation — this both
    # materializes the cache and avoids a second full corpus scan that a
    # separate documents.count() action would cost.
    n_docs = tf.select(F.countDistinct(id_col)).first()[0]
    term_df = (
        tf.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    from pyspark_etl_twitter_spark.operators.ranking import with_global_rank

    weights = (
        with_global_rank(
            term_df, [F.col("df").desc(), F.col("term")], rank_col="idx"
        )
        .withColumn(
            "idf",
            F.when(F.col("df") < min_doc_freq, F.lit(0.0)).otherwise(
                F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df").cast("double") + 1.0))
            ),
        )
        .withColumn("coef", ((F.col("idx") % 13) - F.lit(6)).cast("double") / 5.0)
        .select("term", "idx", "df", "idf", "coef")
    )
    return (
        tf.join(F.broadcast(weights), "term", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("tf")
                * F.coalesce(F.col("idf") * F.col("coef"), F.lit(0.0))
            ).alias("dot")
        )
        .select(
            F.col(id_col),
            (F.col("dot") + F.lit(intercept)).alias("margin"),
        )
        .withColumn(
            "prediction",
            F.when(F.col("margin") > 0, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
    )


def load_mllib_weights(spark, model_path: str):
    """Flatten a fitted MLlib pipeline (the reference's
    ``pre_trained_model/``) into the relational weight dimension of §1.4:
    ``(term, idx, idf, coef)`` + intercept.

    Reads the model's own parquet artifacts directly:
    - vocabulary: stages/1_CountVectorizer_*/data (array<string>, 262,144
      terms, index = CountVectorizer feature index);
    - idf vector: stages/2_IDF_*/data (``idf: vector``);
    - coefficients + intercept: stages/4_LogisticRegression_*/data
      (sparse ``coefficientMatrix``, 120,977 non-zeros,
      intercept −0.24585153897212955).

    Only terms with non-zero coefficient enter the table (zero-coef terms
    contribute nothing to the margin) — the broadcast side shrinks to the
    nnz count. Returns (weights_df, intercept).
    """
    import glob

    import pandas as pd

    stage_dir = {p.split("/")[-1].split("_")[0]: p
                 for p in glob.glob(f"{model_path}/stages/*")}
    vocab = spark.read.parquet(f"{stage_dir['1']}/data").first()["vocabulary"]
    idf = spark.read.parquet(f"{stage_dir['2']}/data").first()["idf"].toArray()
    lr = spark.read.parquet(f"{stage_dir['4']}/data").first()
    coef = lr["coefficientMatrix"].toArray().ravel()
    intercept = float(lr["interceptVector"].toArray()[0])

    pdf = pd.DataFrame(
        {
            "term": vocab,
            "idx": range(len(vocab)),
            "idf": idf[: len(vocab)],
            "coef": coef[: len(vocab)],
        }
    )
    pdf = pdf[pdf["coef"] != 0.0]
    weights = spark.createDataFrame(pdf)
    return weights, intercept


def sentiment_class_counts(scored: DataFrame) -> DataFrame:
    """The reference's headline output shape — predictions per class
    (1.0 = negative "0", 0.0 = positive "4")."""
    return scored.groupBy("prediction").agg(F.count(F.lit(1)).alias("n_docs"))
