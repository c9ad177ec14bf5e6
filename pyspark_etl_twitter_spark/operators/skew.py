"""Skew mitigation utilities (SURVEY.md §4; the 100 TB hot-key toolkit).

AQE's skew-join splitting handles most cases automatically
(`spark.sql.adaptive.skewJoin.enabled`, on in the session factory); these
operators are the *explicit* forms for the cases AQE cannot fix:

- ``salted_aggregate``: a hot grouping key overwhelms one reducer. Split
  each key into ``n_salts`` sub-keys (random salt per row), partially
  aggregate (key, salt), then finally aggregate key — two small shuffles
  instead of one skewed one. Works because the aggregates used are
  reassociable (sum/count/min/max).
- ``salted_broadcast_left``: broadcast is the first resort for skewed
  joins (no shuffle at all); when the dim side is too big to broadcast,
  replicate it ``n_salts`` times with an explicit salt column and salt the
  fact side randomly — each hot key fans out across ``n_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    *,
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """groupBy(key).agg(...) with two-phase salting. ``aggs`` maps output
    column → 'sum:col' | 'count:*' | 'min:col' | 'max:col' (reassociable
    aggregates only — avg must be expressed as sum+count by the caller)."""
    salted = df.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))

    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        op, _, col = spec.partition(":")
        p = f"_p_{out}"
        if op == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-reassociable aggregate spec {spec!r}")

    return (
        salted.groupBy(key, "_salt")
        .agg(*partial_exprs)
        .groupBy(key)
        .agg(*final_exprs)
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    seed: int = 42,
    how: str = "left",
) -> DataFrame:
    """fact ⋈ dim on ``key`` with the dim side replicated per salt and the
    fact side salted randomly — a shuffle join where every hot fact key
    spreads across ``n_salts`` reducers. Row multiplicity of matched keys is
    preserved (each fact row matches exactly its own salt replica); with the
    default ``how='left'`` fact rows whose key is absent from dim also
    survive (dim columns null), matching plain left-join semantics. Pass
    ``how='inner'`` to drop them."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    fact_salted = fact.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    return fact_salted.join(dim_rep, [key, "_salt"], how).drop("_salt")
