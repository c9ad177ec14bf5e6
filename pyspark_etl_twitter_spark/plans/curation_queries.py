"""Curation-operator queries with DuckDB oracle twins: decontamination,
PII pseudonymization, deterministic epoch shuffle, corpus n-gram profile,
and length histogram (engine-added surface, SURVEY.md §2.12).

The oracles lean on DuckDB list comprehensions for word n-grams
(``list_transform(range(...), i -> array_to_string(t[i:i+n-1], ' '))``)
which mirror the engine's ``shingle_array`` exactly, and on the md5/sha256
hex parity between Spark and DuckDB for the shuffle/pseudonym keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators import curation as C
from pyspark_etl_twitter_spark.operators.timeseries import (
    resample_ffill,
    rolling_range_mean,
)
from pyspark_etl_twitter_spark.session import pin_oracle_confs
from pyspark_etl_twitter_spark.sources.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_oracle_confs(spark)
    return load_table(spark, sf_dir, name)


# Shared oracle fragment: tokenized documents → distinct word n-grams.
def _grams_cte(n: int) -> str:
    return f"""
tokd AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
             range(1, greatest(len(t) - {n} + 2, 1)),
             i -> array_to_string(t[i:i+{n - 1}], ' ')))) AS g
  FROM tokd
)"""


# --------------------------------------------------------------------------
# Decontamination: flag training docs sharing any 4-gram with the eval set
# (stand-in eval set: doc_id % 97 == 0, a deterministic ~1% slice)
# --------------------------------------------------------------------------

EVAL_MOD = 97
DECON_N = 4


def decontaminate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    flagged = C.contamination_overlap(train, eval_docs, n=DECON_N)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("contaminated"), 1)).alias("n_contaminated"),
        F.max("n_shared").alias("max_shared"),
    )


ORACLE_DECONTAMINATE_COUNTS = f"""
WITH {_grams_cte(DECON_N)},
eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0),
hits AS (
  SELECT gr.doc_id, count(*) AS n_shared
  FROM grams gr JOIN eval_grams USING (g)
  WHERE gr.doc_id % {EVAL_MOD} <> 0
  GROUP BY gr.doc_id
),
train AS (SELECT doc_id, source FROM documents WHERE doc_id % {EVAL_MOD} <> 0)
SELECT source,
       count(*) AS n_docs,
       count(CASE WHEN coalesce(n_shared, 0) > 0 THEN 1 END) AS n_contaminated,
       max(coalesce(n_shared, 0)) AS max_shared
FROM train LEFT JOIN hits USING (doc_id)
GROUP BY source
"""


# --------------------------------------------------------------------------
# PII: pseudonymize key, redact identifiers, generalize quasi-identifiers
# --------------------------------------------------------------------------


def pii_pseudonymize_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        C.pseudonymize("c_custkey", namespace="cust").alias("pseudo_id"),
        F.regexp_replace("c_name", C.DIGIT_RUN, "<ID>").alias("name_redacted"),
        C.generalize_band("c_acctbal", width=1000.0).alias("acctbal_band"),
        F.col("c_mktsegment").alias("segment"),
    )


ORACLE_PII_PSEUDONYMIZE_CUSTOMERS = """
SELECT sha256('cust:' || CAST(c_custkey AS VARCHAR)) AS pseudo_id,
       regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS name_redacted,
       floor(c_acctbal / 1000.0) * 1000.0 AS acctbal_band,
       c_mktsegment AS segment
FROM customer
"""


# --------------------------------------------------------------------------
# Deterministic epoch shuffle: first 100 positions of the seed-42 epoch
# --------------------------------------------------------------------------

SHUFFLE_SEED = 42


def epoch_shuffle_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    shuffled = C.epoch_shuffle(docs, seed=SHUFFLE_SEED)
    return shuffled.filter(F.col("pos") < 100).select("pos", "doc_id")


ORACLE_EPOCH_SHUFFLE_HEAD = f"""
SELECT pos, doc_id FROM (
  SELECT doc_id,
         row_number() OVER (
             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}')
         ) - 1 AS pos
  FROM documents
) WHERE pos < 100
"""


# --------------------------------------------------------------------------
# Corpus bigram profile (boilerplate / collocation discovery)
# --------------------------------------------------------------------------


def bigram_profile_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return C.ngram_profile(docs, n=2, k=50)


ORACLE_BIGRAM_PROFILE_TOP = """
WITH tokd AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
grams AS (
  SELECT unnest(list_transform(
             range(1, greatest(len(t) - 2 + 2, 1)),
             i -> array_to_string(t[i:i+1], ' '))) AS gram
  FROM tokd
)
SELECT gram, count(*) AS n_occurrences
FROM grams GROUP BY gram
ORDER BY n_occurrences DESC, gram
LIMIT 50
"""


# --------------------------------------------------------------------------
# Entity resolution: blocked fuzzy name matching over part names
# --------------------------------------------------------------------------


def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return C.fuzzy_name_pairs(part, name_col="p_name", max_dist=4)


ORACLE_FUZZY_PART_NAME_PAIRS = """
WITH names AS (
  SELECT DISTINCT p_name AS name,
         regexp_extract(p_name, '[a-z]+$') AS blk
  FROM part
)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS dist
FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 4
"""


# --------------------------------------------------------------------------
# Time-series resample + forward fill over the events stream
# --------------------------------------------------------------------------


def resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    # exact fixed-point average (micro-units): round(avg, 6) over 2-dp
    # values and a 2^a·5^b bucket size is a true decimal halfway point
    # where engines legitimately differ — DESIGN.md §5
    return resample_ffill(events, step="1 hour", trunc_unit="hour", exact_dp=(2, 6))


ORACLE_RESAMPLE_FFILL_HOURLY = """
WITH bounds AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM events GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
),
actual AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST((sum(CAST(round(value * 100) AS BIGINT)) * 10000) // count(1)
              AS BIGINT) AS avg0
  FROM events GROUP BY 1, 2
)
SELECT s.event_type, s.bucket,
       last_value(a.avg0 IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS avg_value_u6,
       a.avg0 IS NULL AS is_gap
FROM spine s
LEFT JOIN actual a ON s.event_type = a.event_type AND s.bucket = a.bucket
"""


# --------------------------------------------------------------------------
# Rolling time-range window (RANGE frame, trailing 1 hour per event type)
# --------------------------------------------------------------------------


def rolling_1h_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour rolling average per event: a RANGE frame over
    microsecond epoch (micros on BOTH engines — a seconds-granularity
    frame would include different rows than DuckDB's interval frame).
    The average is exact fixed-point (micro-unit BIGINT integer division)
    for the same halfway-rounding reason as resample_ffill_hourly.
    One shuffle on event_type; the frame scan is a per-partition
    running-window pass."""
    events = _t(spark, sf_dir, "events")
    return rolling_range_mean(events).select(
        "event_id", "event_type", "rolling_avg_u6", "n_win"
    )


ORACLE_ROLLING_1H_EVENT_STATS = """
SELECT event_id, event_type,
       CAST((sum(CAST(round(value * 100) AS BIGINT)) OVER w * 10000)
            // (count(1) OVER w) AS BIGINT) AS rolling_avg_u6,
       count(1) OVER w AS n_win
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Corpus length histogram
# --------------------------------------------------------------------------


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return C.length_histogram(docs, bin_width=64)


ORACLE_DOC_LENGTH_HISTOGRAM = """
SELECT CAST(floor(n_chars / 64) * 64 AS BIGINT) AS bin_lo,
       count(*) AS n_docs,
       round(avg(len(list_filter(string_split(text, ' '), t -> t <> ''))), 6)
           AS avg_tokens
FROM documents
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Weight-proportional sampling (operators/curation.weighted_bernoulli_sample)
# --------------------------------------------------------------------------

WSAMPLE_SEED = "wsample-v1"
WSAMPLE_DENOM = 1000


def weighted_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sample (p = n_chars/1000, capped at 1): the
    token-weighted mix a training pipeline draws so long documents
    contribute proportionally. Exact-integer inclusion (md5 u32 vs
    bigint threshold) → row-local filter, no shuffle before the summary
    aggregate, identical row set on any engine."""
    from pyspark_etl_twitter_spark.operators.curation import (
        weighted_bernoulli_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    sample = weighted_bernoulli_sample(
        docs, weight_col="n_chars", denom=WSAMPLE_DENOM, seed=WSAMPLE_SEED
    )
    return sample.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sampled_chars"),
    )


ORACLE_WEIGHTED_SAMPLE_BY_LENGTH = f"""
SELECT source, count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sampled_chars
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{WSAMPLE_SEED}'), 1, 8)) AS BIGINT)
      < (CAST(n_chars AS BIGINT) * 4294967296) // {WSAMPLE_DENOM}
GROUP BY source
"""


def resample_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid with linear interpolation across gaps
    (operators/timeseries.resample_interpolate); trailing gaps forward-
    fill. One group exchange: spine join + both frame windows share the
    partitioning."""
    from pyspark_etl_twitter_spark.operators.timeseries import (
        resample_interpolate,
    )

    events = _t(spark, sf_dir, "events")
    return resample_interpolate(events)


ORACLE_RESAMPLE_INTERPOLATE_HOURLY = """
WITH bounds AS (
  SELECT event_type,
         date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM events GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
),
actual AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         (sum(CAST(round(value * 100) AS BIGINT)) * 10000) // count(1) AS avg_u6
  FROM events GROUP BY 1, 2
),
j AS (
  SELECT s.event_type, s.bucket, a.avg_u6,
         last_value(a.avg_u6 IGNORE NULLS) OVER wb AS vp6,
         last_value(CASE WHEN a.avg_u6 IS NOT NULL THEN s.bucket END IGNORE NULLS)
           OVER wb AS tp,
         first_value(a.avg_u6 IGNORE NULLS) OVER wf AS vn6,
         first_value(CASE WHEN a.avg_u6 IS NOT NULL THEN s.bucket END IGNORE NULLS)
           OVER wf AS tn
  FROM spine s
  LEFT JOIN actual a ON s.event_type = a.event_type AND s.bucket = a.bucket
  WINDOW wb AS (PARTITION BY s.event_type ORDER BY s.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY s.event_type ORDER BY s.bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket,
       round(CASE WHEN avg_u6 IS NOT NULL THEN CAST(vp6 AS DOUBLE) / 1000000.0
                  WHEN vn6 IS NULL THEN CAST(vp6 AS DOUBLE) / 1000000.0
                  ELSE (CAST(vp6 AS DOUBLE) / 1000000.0)
                       + ((CAST(vn6 AS DOUBLE) / 1000000.0)
                          - (CAST(vp6 AS DOUBLE) / 1000000.0))
                         * ((CAST(floor(epoch(bucket)) AS DOUBLE)
                             - CAST(floor(epoch(tp)) AS DOUBLE))
                            / (CAST(floor(epoch(tn)) AS DOUBLE)
                               - CAST(floor(epoch(tp)) AS DOUBLE)))
             END, 6) AS value_interp,
       avg_u6 IS NULL AS is_gap
FROM j
"""


# --------------------------------------------------------------------------
# Round 4: fuzzy (Jaccard) decontamination, budgeted selection,
# temperature mixing
# --------------------------------------------------------------------------

FUZZY_N = 3
FUZZY_TAU = 0.2


def fuzzy_decontaminate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source counts of training docs whose MAX shingle-Jaccard
    against any eval doc clears FUZZY_TAU — catches near-paraphrased eval
    leakage the exact shared-gram count underweights. Eval side broadcast;
    corpus never shuffles (operators/curation.jaccard_contamination)."""
    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    scored = C.jaccard_contamination(train, eval_docs, shingle_n=FUZZY_N)
    joined = train.join(scored, "doc_id", "left").withColumn(
        "max_jaccard", F.coalesce("max_jaccard", F.lit(0.0))
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("max_jaccard") >= FUZZY_TAU, 1)).alias("n_fuzzy_hits"),
        F.round(F.max("max_jaccard"), 6).alias("max_jaccard"),
    )


ORACLE_FUZZY_DECONTAMINATE_COUNTS = f"""
WITH {_grams_cte(FUZZY_N)},
doc_sizes AS (SELECT doc_id, count(*) AS asz FROM grams GROUP BY doc_id),
eval_grams AS (
  SELECT doc_id AS eid, g FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
eval_sizes AS (SELECT eid, count(*) AS bsz FROM eval_grams GROUP BY eid),
inter AS (
  SELECT gr.doc_id, eg.eid, count(*) AS n_inter
  FROM grams gr JOIN eval_grams eg USING (g)
  WHERE gr.doc_id % {EVAL_MOD} <> 0
  GROUP BY 1, 2
),
best AS (
  SELECT i.doc_id,
         max(round(CAST(n_inter AS DOUBLE)
                   / CAST(ds.asz + es.bsz - n_inter AS DOUBLE), 6)) AS mj
  FROM inter i
  JOIN doc_sizes ds ON ds.doc_id = i.doc_id
  JOIN eval_sizes es ON es.eid = i.eid
  GROUP BY 1
),
train AS (SELECT doc_id, source FROM documents WHERE doc_id % {EVAL_MOD} <> 0)
SELECT source,
       count(*) AS n_docs,
       count(CASE WHEN coalesce(mj, 0) >= {FUZZY_TAU} THEN 1 END) AS n_fuzzy_hits,
       round(max(coalesce(mj, 0)), 6) AS max_jaccard
FROM train LEFT JOIN best USING (doc_id)
GROUP BY source
"""


CONT_TAU = 0.04


def containment_decontaminate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source counts of training docs whose MAX eval-side n-gram
    CONTAINMENT (inter / |eval shingle set| — the GPT-3/PaLM "dirty
    document" definition) clears CONT_TAU: the asymmetric leak the
    Jaccard twin dilutes away when a long doc embeds a short eval item
    whole. Same broadcast-probe scan as the fuzzy row
    (operators/curation.containment_contamination)."""
    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    scored = C.containment_contamination(train, eval_docs, shingle_n=FUZZY_N)
    joined = train.join(scored, "doc_id", "left").withColumn(
        "max_containment", F.coalesce("max_containment", F.lit(0.0))
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("max_containment") >= CONT_TAU, 1)).alias(
            "n_containment_hits"
        ),
        F.round(F.max("max_containment"), 6).alias("max_containment"),
    )


ORACLE_CONTAINMENT_DECONTAMINATE_COUNTS = f"""
WITH {_grams_cte(FUZZY_N)},
eval_grams AS (
  SELECT doc_id AS eid, g FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
eval_sizes AS (SELECT eid, count(*) AS bsz FROM eval_grams GROUP BY eid),
inter AS (
  SELECT gr.doc_id, eg.eid, count(*) AS n_inter
  FROM grams gr JOIN eval_grams eg USING (g)
  WHERE gr.doc_id % {EVAL_MOD} <> 0
  GROUP BY 1, 2
),
best AS (
  SELECT i.doc_id,
         max(round(CAST(n_inter AS DOUBLE) / CAST(es.bsz AS DOUBLE), 6)) AS mc
  FROM inter i
  JOIN eval_sizes es ON es.eid = i.eid
  GROUP BY 1
),
train AS (SELECT doc_id, source FROM documents WHERE doc_id % {EVAL_MOD} <> 0)
SELECT source,
       count(*) AS n_docs,
       count(CASE WHEN coalesce(mc, 0) >= {CONT_TAU} THEN 1 END)
         AS n_containment_hits,
       round(max(coalesce(mc, 0)), 6) AS max_containment
FROM train LEFT JOIN best USING (doc_id)
GROUP BY source
"""


BUDGET_CHARS = 40_000


def budget_selection_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source char-budget selection (largest-first): how much of each
    source survives a 40k-char budget — the mix-shaping step before
    packing. Window cumsum partitioned by source (parallel across
    sources; see operators/curation.select_within_budget for the
    too-large-group escape)."""
    docs = _t(spark, sf_dir, "documents")
    kept = C.select_within_budget(docs, budget=BUDGET_CHARS)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.min("n_chars").alias("smallest_kept"),
    )


ORACLE_BUDGET_SELECTION_BY_SOURCE = f"""
WITH running AS (
  SELECT source, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
           PARTITION BY source
           ORDER BY n_chars DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM documents
)
SELECT source,
       count(*) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars,
       min(n_chars) AS smallest_kept
FROM running
WHERE prev < {BUDGET_CHARS}
GROUP BY source
"""


TMIX_SCALE = 25
TMIX_SEED = "tmix-v1"


def temperature_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """√-temperature mixture sampling summary: per-source kept counts
    under p = min(1, scale/√n) — engine-portable determinism argument in
    operators/curation.temperature_mix_sample."""
    docs = _t(spark, sf_dir, "documents")
    kept = C.temperature_mix_sample(docs, scale=TMIX_SCALE, seed=TMIX_SEED)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sampled_chars"),
    )


ORACLE_TEMPERATURE_MIX_COUNTS = f"""
WITH thr AS (
  SELECT source,
         CAST(least(4294967296.0,
                    floor(4294967296.0 * {TMIX_SCALE}.0 / sqrt(count(*))))
              AS BIGINT) AS t
  FROM documents GROUP BY source
)
SELECT d.source,
       count(*) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS sampled_chars
FROM documents d JOIN thr USING (source)
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{TMIX_SEED}'), 1, 8)) AS BIGINT) < t
GROUP BY d.source
"""


def source_vocab_overlap_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-overlapping source pairs by vocabulary Jaccard (corpus-mix
    diagnostic; operators/curation.source_vocab_overlap). Shuffle bounded
    by groups × vocabulary, intersection via equi-join on term."""
    docs = _t(spark, sf_dir, "documents")
    return (
        C.source_vocab_overlap(docs)
        .orderBy(F.desc("vocab_jaccard"), "ga", "gb")
        .limit(25)
    )


ORACLE_SOURCE_VOCAB_OVERLAP_TOP = """
WITH terms AS (
  SELECT DISTINCT source AS g, t.term
  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents) t
  WHERE t.term <> ''
),
sizes AS (SELECT g, count(*) AS sz FROM terms GROUP BY g),
inter AS (
  SELECT a.g AS ga, b.g AS gb, count(*) AS n_inter
  FROM terms a JOIN terms b ON a.term = b.term AND a.g < b.g
  GROUP BY 1, 2
)
SELECT ga, gb, n_inter,
       round(CAST(n_inter AS DOUBLE)
             / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 6) AS vocab_jaccard
FROM inter
JOIN sizes sa ON sa.g = ga
JOIN sizes sb ON sb.g = gb
ORDER BY vocab_jaccard DESC, ga, gb
LIMIT 25
"""


# --------------------------------------------------------------------------
# Bloom-filter decontamination (round 10): same eval split as
# decontaminate_counts, probed through a constant-size md5-portable Bloom
# bitmap, with the exact pass run alongside so the false-positive cost of
# the constant-size trade is a measured column, not a claim.
# --------------------------------------------------------------------------

BLOOM_K = 4
BLOOM_M = 1 << 20


def bloom_decontaminate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    train = docs.filter(F.col("doc_id") % EVAL_MOD != 0)
    exact = C.contamination_overlap(train, eval_docs, n=DECON_N).select(
        "doc_id", "source", "contaminated"
    )
    bloom = C.bloom_contamination(
        train, eval_docs, n=DECON_N, k_hashes=BLOOM_K, m_bits=BLOOM_M
    ).select("doc_id", "n_bloom_hits")
    return (
        exact.join(bloom, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("n_bloom_hits") > 0, 1)).alias("n_bloom_flagged"),
            F.count(F.when(F.col("contaminated"), 1)).alias("n_exact_flagged"),
            F.count(
                F.when((F.col("n_bloom_hits") > 0) & ~F.col("contaminated"), 1)
            ).alias("n_false_pos"),
        )
    )


ORACLE_BLOOM_DECONTAMINATE_COUNTS = f"""
WITH {_grams_cte(DECON_N)},
eval_pos AS (
  SELECT DISTINCT
         ('0x' || substr(md5('b' || j || ':' || g), 1, 8))::BIGINT % {BLOOM_M} AS p
  FROM grams, range(0, {BLOOM_K}) r(j)
  WHERE doc_id % {EVAL_MOD} = 0
),
probe AS (
  SELECT doc_id, g,
         ('0x' || substr(md5('b' || j || ':' || g), 1, 8))::BIGINT % {BLOOM_M} AS p
  FROM grams, range(0, {BLOOM_K}) r(j)
  WHERE doc_id % {EVAL_MOD} <> 0
),
bloom_doc AS (
  SELECT doc_id, count(*) AS n_bloom_hits FROM (
    SELECT pr.doc_id, pr.g
    FROM probe pr LEFT JOIN eval_pos ep ON pr.p = ep.p
    GROUP BY pr.doc_id, pr.g
    HAVING count(ep.p) = {BLOOM_K}
  ) GROUP BY doc_id
),
eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0),
hits AS (
  SELECT gr.doc_id, count(*) AS n_shared
  FROM grams gr JOIN eval_grams USING (g)
  WHERE gr.doc_id % {EVAL_MOD} <> 0
  GROUP BY gr.doc_id
),
train AS (SELECT doc_id, source FROM documents WHERE doc_id % {EVAL_MOD} <> 0)
SELECT source,
       count(*) AS n_docs,
       count(CASE WHEN coalesce(b.n_bloom_hits, 0) > 0 THEN 1 END) AS n_bloom_flagged,
       count(CASE WHEN coalesce(h.n_shared, 0) > 0 THEN 1 END) AS n_exact_flagged,
       count(CASE WHEN coalesce(b.n_bloom_hits, 0) > 0
                   AND coalesce(h.n_shared, 0) = 0 THEN 1 END) AS n_false_pos
FROM train
LEFT JOIN bloom_doc b USING (doc_id)
LEFT JOIN hits h USING (doc_id)
GROUP BY source
"""


# --------------------------------------------------------------------------
# DSIR importance weighting (round 11) — hashed n-gram domain matching
# (Xie et al. 2023; operators/importance.py). Target domain stand-in:
# source 'src0'; raw pool: every other source.
# --------------------------------------------------------------------------

DSIR_B = 1024
DSIR_ALPHA = 1.0
DSIR_TARGET = "src0"
DSIR_N_SELECT = 100
DSIR_DP = 4


def dsir_weights_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source profile of DSIR log importance weights (how much more
    src0-like each source's documents are than the raw pool average):
    n_docs, avg and max log weight. The whole pipeline — md5 bucket
    hashing, Laplace-smoothed bucket distributions, per-doc log-ratio
    sums — replays exactly in DuckDB."""
    from pyspark_etl_twitter_spark.operators.importance import dsir_log_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == DSIR_TARGET)
    raw = docs.filter(F.col("source") != DSIR_TARGET)
    w = dsir_log_weights(raw, target, n_buckets=DSIR_B, alpha=DSIR_ALPHA)
    return (
        raw.select("doc_id", "source")
        .join(w, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("log_w"), DSIR_DP).alias("avg_logw"),
            F.round(F.max("log_w"), DSIR_DP).alias("max_logw"),
        )
    )


def dsir_selected_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy DSIR selection: the 100 highest-weighted raw documents
    (rounded-weight rank, id tiebreak), counted per source — the
    selection a domain-matching curation step would feed to training."""
    from pyspark_etl_twitter_spark.operators.importance import dsir_select_topk

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == DSIR_TARGET)
    raw = docs.filter(F.col("source") != DSIR_TARGET)
    sel = dsir_select_topk(
        raw,
        target,
        DSIR_N_SELECT,
        n_buckets=DSIR_B,
        alpha=DSIR_ALPHA,
        round_dp=DSIR_DP,
    )
    return (
        sel.join(raw.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_selected"))
    )


def _dsir_ctes() -> str:
    """Shared oracle chain: occurrence-level unigram+bigram features →
    md5 buckets → smoothed target/raw distributions → per-bucket dlog →
    per-doc log weights (docs with no grams score 0)."""
    return f"""
tokd AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
),
feats AS (
  SELECT doc_id, source,
         unnest(list_concat(
             t,
             list_transform(range(1, greatest(len(t), 1)),
                            i -> array_to_string(t[i:i+1], ' ')))) AS g
  FROM tokd
),
fb AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % {DSIR_B} AS bucket
  FROM feats
),
gt AS (SELECT bucket FROM fb WHERE source = '{DSIR_TARGET}'),
gr AS (SELECT doc_id, bucket FROM fb WHERE source <> '{DSIR_TARGET}'),
ct AS (SELECT bucket, count(*) AS c FROM gt GROUP BY bucket),
cr AS (SELECT bucket, count(*) AS c FROM gr GROUP BY bucket),
tots AS (SELECT (SELECT count(*) FROM gt) AS nt, (SELECT count(*) FROM gr) AS nr),
w AS (
  SELECT b.bucket,
         ln((coalesce(ct.c, 0) + {DSIR_ALPHA}) / (t.nt + {DSIR_ALPHA} * {DSIR_B}))
       - ln((coalesce(cr.c, 0) + {DSIR_ALPHA}) / (t.nr + {DSIR_ALPHA} * {DSIR_B}))
           AS dlog
  FROM (SELECT unnest(range(0, {DSIR_B})) AS bucket) b
  CROSS JOIN tots t
  LEFT JOIN ct USING (bucket)
  LEFT JOIN cr USING (bucket)
),
score AS (
  SELECT d.doc_id, d.source, coalesce(sum(w.dlog), 0.0) AS log_w
  FROM (SELECT doc_id, source FROM documents WHERE source <> '{DSIR_TARGET}') d
  LEFT JOIN gr ON gr.doc_id = d.doc_id
  LEFT JOIN w ON w.bucket = gr.bucket
  GROUP BY d.doc_id, d.source
)"""


ORACLE_DSIR_WEIGHTS_BY_SOURCE = f"""
WITH {_dsir_ctes()}
SELECT source, count(*) AS n_docs,
       round(avg(log_w), {DSIR_DP}) AS avg_logw,
       round(max(log_w), {DSIR_DP}) AS max_logw
FROM score GROUP BY source
"""


ORACLE_DSIR_SELECTED_COUNTS = f"""
WITH {_dsir_ctes()},
sel AS (
  SELECT source FROM score
  ORDER BY round(log_w, {DSIR_DP}) DESC, doc_id
  LIMIT {DSIR_N_SELECT}
)
SELECT source, count(*) AS n_selected FROM sel GROUP BY source
"""


DSIR_SEED = 17


def dsir_gumbel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k DSIR resampling (the paper's weighted
    sample-without-replacement) with the engine's portable seeded
    md5-u32 noise — per-source counts of the 100 sampled documents.
    Deterministic per seed, replayable, fully oracle-verifiable."""
    from pyspark_etl_twitter_spark.operators.importance import dsir_gumbel_sample

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == DSIR_TARGET)
    raw = docs.filter(F.col("source") != DSIR_TARGET)
    sel = dsir_gumbel_sample(
        raw,
        target,
        DSIR_N_SELECT,
        n_buckets=DSIR_B,
        alpha=DSIR_ALPHA,
        seed=DSIR_SEED,
        round_dp=DSIR_DP,
    )
    return (
        sel.join(raw.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


ORACLE_DSIR_GUMBEL_COUNTS = f"""
WITH {_dsir_ctes()},
sel AS (
  SELECT source FROM (
    SELECT source, doc_id,
           round(log_w + (- ln(- ln(
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{DSIR_SEED}'), 1, 8))::BIGINT + 0.5)
               / 4294967296.0))), {DSIR_DP}) AS k
    FROM score
  ) ORDER BY k DESC, doc_id LIMIT {DSIR_N_SELECT}
)
SELECT source, count(*) AS n_sampled FROM sel GROUP BY source
"""


def quantile_norm_price_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile-normalization map: per order status, the
    inverse-ECDF deciles of order price vs the pooled deciles and the
    shift between them — the calibration table that makes a score
    threshold tuned on one source meaningful on another
    (operators/curation.quantile_map; exact integer threshold tests,
    everything after one hash agg runs on the value-domain-bounded
    relation)."""
    orders = _t(spark, sf_dir, "orders")
    return C.quantile_map(
        orders, "o_totalprice", "o_orderstatus", n_q=10, round_dp=0
    )


ORACLE_QUANTILE_NORM_PRICE_MAP = """
WITH counts AS (
  SELECT o_orderstatus AS g, round(o_totalprice, 0) AS v, count(*) AS c
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2
),
qs AS (SELECT unnest(range(1, 10)) AS i),
cumg AS (
  SELECT g, v,
         sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY g) AS tot
  FROM counts
),
qg AS (
  SELECT g, i * 10 AS q_pct,
         min(CASE WHEN cum * 10 >= tot * i THEN v END) AS group_value
  FROM cumg CROSS JOIN qs GROUP BY g, i
),
cnt0 AS (SELECT v, sum(c) AS c FROM counts GROUP BY v),
cump AS (
  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS tot
  FROM cnt0
),
qp AS (
  SELECT i * 10 AS q_pct,
         min(CASE WHEN cum * 10 >= tot * i THEN v END) AS pooled_value
  FROM cump CROSS JOIN qs GROUP BY i
)
SELECT qg.g AS o_orderstatus, CAST(qg.q_pct AS INTEGER) AS q_pct,
       qg.group_value, qp.pooled_value,
       round(qg.group_value - qp.pooled_value, 2) AS shift
FROM qg JOIN qp USING (q_pct)
"""
