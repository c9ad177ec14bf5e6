"""Mergeable frequency sketches (engine-added; SURVEY.md §2.4 approximate
tier next to HLL++/t-digest, which Spark ships natively — this is the
custom-sketch shape the built-ins lack: point-queryable frequency
estimates over unbounded key domains in fixed memory).

Count-Min Sketch: a depth×width counter matrix; item i increments one
counter per row (hash_d(i) mod width); the estimate is the MIN across
rows. Guarantees: estimate ≥ true count (never undercounts), and with
width w, depth d, estimate ≤ true + e·N with probability 1−(1/2)^d where
e ≈ 2.718/w (the classic Cormode–Muthukrishnan bound under pairwise-
independent hashing; xxhash64-seeded rows approximate it in practice —
property-tested below rather than assumed).

Distributed shape: build = one narrow projection exploding d (row, bucket)
pairs per record, then a single hash aggregate on (row, bucket) — at most
d·w output rows REGARDLESS of input size, all map-side combinable. The
sketch is a tiny DataFrame, trivially mergeable across corpora by summing
matching cells (union + re-aggregate) — the property that makes it work
on a 1000-executor cluster: partial sketches combine without rescanning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, row: int, width: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(row)), F.lit(width))


def cms_build(
    df: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt) with depth·width rows max."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    return pairs.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME width/depth: cell-wise sum.
    Exactly equivalent to building one sketch over the concatenated
    inputs — the distributive property that lets partial sketches from
    independent corpus shards combine without rescanning anything."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for every row of ``items``: min over the
    d probed cells (missing cell → 0). The sketch side is d·w rows —
    always broadcast; the probe is d narrow lookups per item."""
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(col, "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
