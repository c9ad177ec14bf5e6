"""Training-data pipeline operators: token-budget packing and stratified
sampling (BASELINE.json north star — what a 100 TB pretraining-data job
actually runs after dedup/quality filtering).

``pack_documents``: assign documents to fixed-token-budget shards by
running-sum bucketing in a deterministic order — the distributed version of
greedy sequence packing. The global form is one single-partition window
pass (kept as the exact SQL-oracle twin and the n_salts=1 reference);
``pack_documents_salted`` is the scale path — per-range partitioned
cumsums with deterministic shard-id offsets, no single-task window.

``stratified_sample``: per-stratum Bernoulli sampling with a fixed seed —
deterministic but RNG-specific, so property-tested rather than
oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.textstats import token_count


def pack_documents(
    docs: DataFrame,
    *,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, shard_id): greedy sequential packing — shard k
    holds the maximal run of docs whose running token total stays within
    (k·budget, (k+1)·budget]. Docs longer than the budget occupy their own
    shard(s) boundary-aligned, like sequence packing with truncation-free
    greedy fill."""
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    n_tok = token_count(text_col)
    return (
        docs.select(F.col(id_col), n_tok.alias("n_tokens"))
        .withColumn("prev_cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("shard_id", F.floor(F.col("prev_cum") / budget).cast("long"))
        .select(id_col, "n_tokens", "shard_id")
    )


ORACLE_PACK_DOCUMENTS = """
SELECT doc_id, n_tokens,
       CAST(floor(CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS DOUBLE) / {budget}) AS BIGINT) AS shard_id
FROM (SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  AS INTEGER) AS n_tokens
      FROM documents)
"""


def pack_documents_salted(
    docs: DataFrame,
    *,
    budget: int = 2048,
    n_salts: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scale path for ``pack_documents``: the global single-partition cumsum
    window is replaced by ``n_salts`` independent *partitioned* cumsums over
    contiguous doc-id ranges, with deterministic shard-id offsets stitching
    the per-range packings into one global shard numbering.

    Semantics: identical greedy packing to the global form *within* each
    range; each range starts a fresh shard (so up to ``n_salts - 1`` shards
    are slightly under-filled at range boundaries — the price of
    parallelism, bounded and deterministic). ``n_salts=1`` reproduces
    ``pack_documents`` exactly (property-tested).

    Plan shape: one scalar max(doc_id) aggregate (broadcast) → window
    PARTITIONED BY salt (each partition ≈ corpus/n_salts — no single-task
    window) → tiny per-salt shard-count aggregate (n_salts rows; its offset
    cumsum runs on a bounded dimension) → broadcast join back. At 100 TB set
    ``n_salts`` to a small multiple of the executor-core count."""
    n_tok = token_count(text_col)
    base = docs.select(F.col(id_col), n_tok.alias("n_tokens"))
    bounds = base.agg(F.max(id_col).alias("_max_id"))
    # contiguous range per salt: salt = doc_id div ceil((max_id+1)/n_salts)
    ranged = base.join(F.broadcast(bounds)).withColumn(
        "_salt",
        F.floor(
            F.col(id_col)
            / F.ceil((F.col("_max_id") + 1) / F.lit(n_salts)).cast("double")
        ).cast("long"),
    )
    w_in = (
        Window.partitionBy("_salt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shards = ranged.withColumn(
        "prev_cum", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    ).withColumn("shard_within", F.floor(F.col("prev_cum") / budget).cast("long"))
    per_salt = shards.groupBy("_salt").agg(
        (F.max("shard_within") + 1).alias("_n_shards")
    )
    w_off = Window.orderBy("_salt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_salt.withColumn(
        "_off", F.coalesce(F.sum("_n_shards").over(w_off), F.lit(0))
    ).select("_salt", "_off")
    return (
        shards.join(F.broadcast(offsets), "_salt")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (F.col("shard_within") + F.col("_off")).cast("long").alias("shard_id"),
        )
    )


ORACLE_PACK_DOCUMENTS_SALTED = """
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS INTEGER) AS n_tokens
  FROM documents),
mx AS (SELECT max(doc_id) AS max_id FROM base),
ranged AS (
  SELECT doc_id, n_tokens,
         CAST(floor(doc_id / CAST(ceil(CAST((SELECT max_id FROM mx) + 1
                                            AS DOUBLE) / {n_salts})
                                  AS DOUBLE))
              AS BIGINT) AS salt
  FROM base),
shards AS (
  SELECT doc_id, n_tokens, salt,
         CAST(floor(CAST(coalesce(sum(n_tokens) OVER (PARTITION BY salt
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS DOUBLE) / {budget}) AS BIGINT) AS shard_within
  FROM ranged),
offs AS (
  SELECT salt,
         coalesce(sum(n_shards) OVER (ORDER BY salt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off
  FROM (SELECT salt, max(shard_within) + 1 AS n_shards
        FROM shards GROUP BY salt))
SELECT s.doc_id, s.n_tokens,
       CAST(s.shard_within + o.off AS BIGINT) AS shard_id
FROM shards s JOIN offs o ON s.salt = o.salt
"""


def stratified_sample(
    docs: DataFrame,
    *,
    strata_col: str = "lang",
    fractions: dict[str, float] | None = None,
    default_fraction: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (``sampleBy``): the standard rebalancing
    step for over-represented sources/languages in a training mix. Spark
    evaluates it as a per-row filter — no shuffle, no collect."""
    if fractions is None:
        keys = [r[0] for r in docs.select(strata_col).distinct().collect()]
        fractions = {k: default_fraction for k in keys}
    return docs.sampleBy(strata_col, fractions, seed)


MIX_PRIME = 2654435761  # Knuth multiplicative-hash constant: decorrelates
# the mod class from arithmetic id patterns (id % k strides)
MIX_RESOLUTION = 10_000


def training_mix(
    docs: DataFrame,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    strata_col: str = "source",
    default_rate: float = 0.0,
    resolution: int = MIX_RESOLUTION,
) -> DataFrame:
    """Deterministic per-source downsampling for training-mix construction:
    keep a document iff ``(id · PRIME) mod resolution < rate · resolution``.

    The ``sampleBy`` twin above is the statistical tool; this one is the
    *reproducible* tool — selection is a pure function of the id, so the
    mix is identical across engines, runs, partitionings, and retries
    (exactly-once composition with downstream incremental jobs), and it is
    expressible in ANSI SQL for oracle verification. Evaluates as a per-row
    filter: no shuffle, no sort, trivially pushdown-friendly."""
    slot = F.pmod(F.col(id_col).cast("long") * F.lit(MIX_PRIME), F.lit(resolution))
    branches = None
    for src, rate in rates.items():
        thr = F.lit(int(rate * resolution))
        cond = (F.col(strata_col) == src) & (slot < thr)
        branches = cond if branches is None else (branches | cond)
    default_cond = (~F.col(strata_col).isin(list(rates))) & (
        slot < F.lit(int(default_rate * resolution))
    )
    keep = default_cond if branches is None else (branches | default_cond)
    return docs.filter(keep)
