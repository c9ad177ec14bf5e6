"""Training-data pipeline operators: token-budget packing and stratified
sampling (BASELINE.json north star — what a 100 TB pretraining-data job
actually runs after dedup/quality filtering).

``pack_documents``: assign documents to fixed-token-budget shards by
running-sum bucketing in a deterministic order — the distributed version of
greedy sequence packing. One window pass; at scale, partition the cumsum by
a coarse salt (e.g. source) and offset shard ids per salt to avoid the
single-partition global window (the global variant here matches the SQL
oracle exactly).

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
