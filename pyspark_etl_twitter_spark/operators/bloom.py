"""Bloom-filter join pruning — the explicit form of Spark's runtime
row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`,
whose BloomFilterAggregate expression is not exposed to PySpark).

Shape: hash every dim key into ``n_hashes`` positions in an ``n_bits``
space and keep the DISTINCT set positions as a 1-column table — that
table IS the bloom filter, stored relationally instead of as a bitmap.
Broadcast it and left-semi-join the fact on each of its hash positions:
a fact row survives only if ALL its positions are set (exactly bloom
membership, false positives possible, false negatives impossible). The
real equi-join afterwards removes the false positives, so results are
EXACT — the bloom stage only cuts the fact rows entering the shuffle.

When this wins at 100 TB: dim is too big to broadcast as ROWS (so the
join itself must shuffle both sides) but its POSITION table is tiny —
positions ≤ min(n_bits, |dim|·n_hashes) longs regardless of dim row
width. A 100M-row dim with 500-byte rows is a 50 GB broadcast as rows
but ≤ 256 MB as a 2^31-bit position set — and the fact side often
shrinks 10-100× before shuffling. FP rate ≈ (1 − e^(−kn/m))^k for k
hashes, m bits, n keys; size m ≥ 16n for ~3% at k=2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_bits: int, n_hashes: int, seed: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def bloom_positions(
    dim: DataFrame,
    key: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 2,
    seed: int = 0,
) -> DataFrame:
    """The filter itself: distinct hash positions of dim keys (column
    ``_bloom_pos``). One explode + distinct — shuffle carries longs."""
    return dim.select(
        F.explode(F.array(*_positions(F.col(key), n_bits, n_hashes, seed))).alias(
            "_bloom_pos"
        )
    ).distinct()


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 2,
    seed: int = 0,
) -> DataFrame:
    """Fact rows whose key passes the dim bloom filter (superset of the
    true matches). One broadcast left-semi join per hash function."""
    positions = F.broadcast(
        bloom_positions(dim, dim_key or fact_key, n_bits=n_bits, n_hashes=n_hashes, seed=seed)
    )
    out = fact
    for pos in _positions(F.col(fact_key), n_bits, n_hashes, seed):
        out = out.join(positions, pos == F.col("_bloom_pos"), "left_semi")
    return out


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 2,
    seed: int = 0,
) -> DataFrame:
    """Exact inner equi-join with the fact side bloom-pruned before the
    shuffle. Equivalent to ``fact.join(dim, on)`` row-for-row; the bloom
    stage only reduces shuffled volume."""
    dk = dim_key or fact_key
    pre = bloom_prefilter(
        fact, dim, fact_key, dk, n_bits=n_bits, n_hashes=n_hashes, seed=seed
    )
    cond = F.col(fact_key) == F.col(dk) if dk != fact_key else fact_key
    return pre.join(dim, cond)
