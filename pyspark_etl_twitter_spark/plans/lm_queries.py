"""Registry queries for the language-model curation family
(operators/lm.py) with DuckDB oracle twins.

Tokenization in the oracles matches the engine's ws_tokens exactly:
string_split on single spaces, empty tokens dropped (documents.text is
pre-normalized single-space text). Per-doc means are rounded to 6dp on
BOTH sides before any further aggregation, so the group averages hash
identically."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.lm import doc_logprob, vocab_coverage
from pyspark_etl_twitter_spark.session import pin_oracle_confs
from pyspark_etl_twitter_spark.sources.catalog import load_table

PPL_THRESHOLD = 32.0  # p90-ish of the synthetic corpus (median ppl ~30, p99 ~34)
OOV_MIN_COUNT = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_oracle_confs(spark)
    return load_table(spark, sf_dir, "documents")


def lm_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source LM quality: doc count, mean of per-doc mean token
    log-prob, and how many docs exceed the perplexity gate."""
    docs = _docs(spark, sf_dir)
    scored = doc_logprob(docs).join(docs.select("doc_id", "source"), "doc_id")
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("mean_logp"), 6).alias("avg_logp"),
        F.sum(F.when(F.col("ppl") > PPL_THRESHOLD, 1).otherwise(0)).alias("n_high_ppl"),
    )


ORACLE_LM_QUALITY_BY_SOURCE = f"""
WITH tok AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
),
counts AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
scal AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM counts),
model AS (SELECT term, ln((c + 1) / (n + v)) AS logp FROM counts, scal),
per AS (
  SELECT tok.doc_id, count(*) AS nt, sum(logp) AS s
  FROM tok JOIN model USING (term) GROUP BY tok.doc_id
),
alld AS (
  SELECT d.doc_id, d.source,
         round(coalesce(p.s / p.nt, 0.0), 6) AS mean_logp
  FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
)
SELECT source, count(*) AS n_docs,
       round(avg(mean_logp), 6) AS avg_logp,
       CAST(sum(CASE WHEN round(exp(-mean_logp), 4) > {PPL_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high_ppl
FROM alld GROUP BY source
"""


def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary coverage against the ≥{min_count}-occurrence
    corpus vocab: doc count, mean and max per-doc OOV rate."""
    docs = _docs(spark, sf_dir)
    cov = vocab_coverage(docs, min_count=OOV_MIN_COUNT).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return cov.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("oov_rate"), 6).alias("avg_oov_rate"),
        F.round(F.max("oov_rate"), 6).alias("max_oov_rate"),
    )


ORACLE_OOV_RATE_BY_SOURCE = f"""
WITH tok AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
),
vocab AS (
  SELECT term FROM tok GROUP BY term HAVING count(*) >= {OOV_MIN_COUNT}
),
per AS (
  SELECT tok.doc_id, count(*) AS nt,
         sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS noov
  FROM tok LEFT JOIN vocab v ON tok.term = v.term
  GROUP BY tok.doc_id
),
alld AS (
  SELECT d.doc_id, d.source,
         round(coalesce(CAST(p.noov AS DOUBLE) / p.nt, 0.0), 6) AS oov_rate
  FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
)
SELECT source, count(*) AS n_docs,
       round(avg(oov_rate), 6) AS avg_oov_rate,
       round(max(oov_rate), 6) AS max_oov_rate
FROM alld GROUP BY source
"""


def bigram_lm_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source interpolated bigram-LM quality (operators/lm.py
    bigram_doc_logprob, lam=0.7): doc count and mean of per-doc mean
    bigram log-prob."""
    from pyspark_etl_twitter_spark.operators.lm import bigram_doc_logprob

    docs = _docs(spark, sf_dir)
    scored = bigram_doc_logprob(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("mean_logp2"), 6).alias("avg_logp2"),
    )


ORACLE_BIGRAM_LM_QUALITY_BY_SOURCE = """
WITH docsarr AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS arr
  FROM documents
),
bg AS (
  -- parallel unnests align element-wise: zips the two shifted slices
  SELECT doc_id,
         unnest(arr[1:len(arr) - 1]) AS w1,
         unnest(arr[2:len(arr)]) AS w2
  FROM docsarr
  WHERE len(arr) >= 2
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
tok AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
),
counts AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
scal AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM counts),
uni AS (SELECT term, (c + 1) / (n + v) AS pu FROM counts, scal),
scored AS (
  SELECT bg.doc_id,
         ln(0.7 * (CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
            + 0.3 * uni.pu) AS lp
  FROM bg
  JOIN c2 USING (w1, w2)
  JOIN c1 USING (w1)
  JOIN uni ON bg.w2 = uni.term
),
per AS (
  SELECT doc_id, count(*) AS nb, round(sum(lp) / count(*), 6) AS mean_logp2
  FROM scored GROUP BY doc_id
),
alld AS (
  SELECT d.doc_id, d.source, coalesce(p.mean_logp2, 0.0) AS mean_logp2
  FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
)
SELECT source, count(*) AS n_docs, round(avg(mean_logp2), 6) AS avg_logp2
FROM alld GROUP BY source
"""


def pmi_collocations_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by PMI (Church & Hanks 1990) with a
    min-count-5 floor — the token-association signal next to the bigram
    LM: which adjacent pairs co-occur far above their unigram chance.
    Ranked by the ROUNDED score with (w1, w2) tiebreaks; a rank column
    makes the hash order-sensitive."""
    from pyspark.sql import Window

    from pyspark_etl_twitter_spark.operators.lm import pmi_collocations

    docs = _docs(spark, sf_dir)
    top = pmi_collocations(docs, min_count=OOV_MIN_COUNT, k=20)
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("pmi").desc(), "w1", "w2")
        ).cast("int"),
    )


ORACLE_PMI_COLLOCATIONS_TOP = """
WITH tokd AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT t[i + 1] AS w1, t[i + 2] AS w2
  FROM tokd, UNNEST(range(0, greatest(len(t) - 1, 0))) AS u(i)
),
c2 AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY w1, w2),
tok AS (SELECT unnest(t) AS w FROM tokd),
c1 AS (SELECT w, count(*) AS c_w FROM tok GROUP BY w),
tot AS (
  SELECT (SELECT sum(c_w) FROM c1) AS t_tok,
         (SELECT sum(c_xy) FROM c2) AS t_bg
),
scored AS (
  SELECT c2.w1, c2.w2, c2.c_xy,
         round(ln((c2.c_xy::DOUBLE * tot.t_tok * tot.t_tok)
                  / (tot.t_bg::DOUBLE * cx.c_w * cy.c_w)), 6) AS pmi
  FROM c2
  JOIN c1 cx ON cx.w = c2.w1
  JOIN c1 cy ON cy.w = c2.w2
  CROSS JOIN tot
  WHERE c2.c_xy >= 5
)
SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 20
"""


def trigram_lm_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source interpolated trigram-LM quality
    (operators/lm.trigram_doc_logprob, lam=(0.5, 0.3, 0.2)): doc count
    and mean of per-doc mean trigram log-prob — the third rung of the
    LM-curation ladder (unigram → bigram → trigram)."""
    from pyspark_etl_twitter_spark.operators.lm import trigram_doc_logprob

    docs = _docs(spark, sf_dir)
    scored = trigram_doc_logprob(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("mean_logp3"), 6).alias("avg_logp3"),
    )


ORACLE_TRIGRAM_LM_QUALITY_BY_SOURCE = """
WITH docsarr AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS arr
  FROM documents
),
tg AS (
  SELECT doc_id,
         unnest(arr[1:len(arr) - 2]) AS w1,
         unnest(arr[2:len(arr) - 1]) AS w2,
         unnest(arr[3:len(arr)]) AS w3
  FROM docsarr
  WHERE len(arr) >= 3
),
c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg GROUP BY w1, w2, w3),
c2ctx AS (SELECT w1, w2, sum(c3) AS c2ctx FROM c3 GROUP BY w1, w2),
bg AS (
  SELECT unnest(arr[1:len(arr) - 1]) AS a,
         unnest(arr[2:len(arr)]) AS b
  FROM docsarr
  WHERE len(arr) >= 2
),
c2b AS (SELECT a AS w2, b AS w3, count(*) AS c2b FROM bg GROUP BY a, b),
c1b AS (SELECT w2, sum(c2b) AS c1b FROM c2b GROUP BY w2),
tok AS (
  SELECT term
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
),
counts AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
scal AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM counts),
uni AS (SELECT term, (c + 1) / (n + v) AS pu FROM counts, scal),
scored AS (
  SELECT tg.doc_id,
         ln(0.5 * (CAST(c3.c3 AS DOUBLE) / CAST(c2ctx.c2ctx AS DOUBLE))
            + 0.3 * (CAST(c2b.c2b AS DOUBLE) / CAST(c1b.c1b AS DOUBLE))
            + 0.2 * uni.pu) AS lp
  FROM tg
  JOIN c3 USING (w1, w2, w3)
  JOIN c2ctx USING (w1, w2)
  JOIN c2b USING (w2, w3)
  JOIN c1b USING (w2)
  JOIN uni ON tg.w3 = uni.term
),
per AS (
  SELECT doc_id, round(sum(lp) / count(*), 6) AS mean_logp3
  FROM scored GROUP BY doc_id
),
alld AS (
  SELECT d.doc_id, d.source, coalesce(p.mean_logp3, 0.0) AS mean_logp3
  FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
)
SELECT source, count(*) AS n_docs, round(avg(mean_logp3), 6) AS avg_logp3
FROM alld GROUP BY source
"""


def calibrated_ppl_filter_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of cross-source quantile calibration, end to end:
    score every document with the unigram LM, derive each source's q25
    log-prob AND the pooled q25 via ``curation.quantile_map`` (n_q=4),
    then count survivors of the two filter policies side by side —
    ``kept_calibrated`` (each source keeps its own top 75%: mix
    proportions preserved) vs ``kept_pooled`` (one global threshold:
    low-quality sources shrink). The difference between those two
    columns IS the reason the calibration table exists."""
    from pyspark_etl_twitter_spark.operators.curation import quantile_map
    from pyspark_etl_twitter_spark.operators.lm import doc_logprob

    docs = _docs(spark, sf_dir)
    scored = doc_logprob(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    qm = quantile_map(
        scored, "mean_logp", "source", n_q=4, round_dp=6
    ).filter(F.col("q_pct") == 25)
    q25 = qm.select(
        "source",
        F.col("group_value").alias("q25_source"),
        F.col("pooled_value").alias("q25_pooled"),
    )
    return (
        scored.join(F.broadcast(q25), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("mean_logp") >= F.col("q25_source")).cast("long")
            ).alias("kept_calibrated"),
            F.sum(
                (F.col("mean_logp") >= F.col("q25_pooled")).cast("long")
            ).alias("kept_pooled"),
            F.round(F.min("q25_source"), 6).alias("q25_source"),
            F.round(F.min("q25_pooled"), 6).alias("q25_pooled"),
        )
    )


ORACLE_CALIBRATED_PPL_FILTER_BY_SOURCE = """
WITH tok AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
),
counts AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
scal AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM counts),
model AS (SELECT term, ln((c + 1) / (n + v)) AS logp FROM counts, scal),
per AS (
  SELECT tok.doc_id, count(*) AS nt, sum(logp) AS s
  FROM tok JOIN model USING (term) GROUP BY tok.doc_id
),
alld AS (
  SELECT d.doc_id, d.source,
         round(coalesce(p.s / p.nt, 0.0), 6) AS mean_logp
  FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
),
cnts AS (SELECT source, mean_logp AS v, count(*) AS c FROM alld GROUP BY 1, 2),
cum AS (
  SELECT source, v,
         sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY source) AS tot
  FROM cnts
),
qg AS (
  SELECT source, min(CASE WHEN cum * 4 >= tot * 1 THEN v END) AS q25_source
  FROM cum GROUP BY source
),
pc AS (SELECT v, sum(c) AS c FROM cnts GROUP BY v),
pcum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS tot FROM pc),
qp AS (SELECT min(CASE WHEN cum * 4 >= tot * 1 THEN v END) AS q25_pooled FROM pcum)
SELECT a.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN a.mean_logp >= qg.q25_source THEN 1 ELSE 0 END) AS BIGINT) AS kept_calibrated,
       CAST(sum(CASE WHEN a.mean_logp >= qp.q25_pooled THEN 1 ELSE 0 END) AS BIGINT) AS kept_pooled,
       round(min(qg.q25_source), 6) AS q25_source,
       round(min(qp.q25_pooled), 6) AS q25_pooled
FROM alld a JOIN qg USING (source) CROSS JOIN qp
GROUP BY a.source
"""
