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


# --------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007): md5-derived registers make
# the sketch itself engine-portable — unlike approx_count_distinct (HLL++
# with engine-specific hashing/bias tables, rows-only by design), every
# stage here replays in ANSI SQL, so the DISTINCT-COUNT SKETCH is a full
# driver oracle (`approx_distinct_portable`). Spark's built-in stays the
# production default; this is its verifiable twin, same precedent as the
# md5 MinHash/SimHash portable twins.
# --------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """HLL register relation: bucket = first ``p`` bits of md5(value),
    rho = leading-zero count of the next 32 bits + 1, register =
    max(rho) per (group, bucket). One narrow projection + one hash agg;
    ≤ groups·2^p output rows regardless of input size, map-side
    combinable, and mergeable across corpora by union + re-max (the
    sketch property that matters on 1000 executors)."""
    if p != 8:
        raise ValueError("p=8 (256 registers) is the portable contract")
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    w = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    # rho over a 32-bit suffix: 32 - floor(log2(w)) for w > 0 (exact for
    # integer w: log2 of a power of two is exact, and intermediate values
    # floor correctly), else 33
    rho = (
        F.when(w == 0, F.lit(33))
        .otherwise(F.lit(32) - F.floor(F.log2(w)))
        .cast("int")
    )
    gcols = list(group_cols or [])
    return (
        df.select(*gcols, bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_estimate(
    regs: DataFrame,
    *,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """Distinct-count estimate from a register relation: raw HLL
    harmonic mean with empty registers contributing 2⁰, linear-counting
    correction below 2.5m when empty registers exist (the 32-bit
    large-range correction is irrelevant at these cardinalities).
    Returns (group..., hll_distinct)."""
    m = float(2**p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gcols = list(group_cols or [])
    agg = regs.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("_s"),
    )
    v = F.lit(m) - F.col("_n")  # empty registers
    raw = F.lit(alpha * m * m) / (F.col("_s") + v)
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(raw)
    return agg.select(*gcols, F.round(est, 4).alias("hll_distinct"))


# --------------------------------------------------------------------------
# PORTABLE Count-Min Sketch twin (round 12): the xxhash64 ``cms_build`` /
# ``cms_estimate`` above stay the production default (JVM hash, fastest),
# but their row hashes are not ANSI-SQL-expressible, so that family is
# rows-only for the driver. These md5-derived twins replay verbatim in
# DuckDB — the same twin precedent as ``approx_distinct_portable`` for
# HLL and the md5 MinHash/SimHash family — making the FREQUENCY sketch
# tier hash-verifiable end to end. Same mergeability contract: sum
# matching (group, row, bucket) cells.
# --------------------------------------------------------------------------

#: portable CMS dimensions: depth 4 rows × width 1024 buckets. Error
#: bound: est - true <= e/width · N with prob 1 - e^-depth ≈ 0.98.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_bucket(value: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row ``row``'s bucket for ``value``: md5-u32 of "row:value" mod
    width — independent-enough hash rows from one digest family, and
    byte-identical in DuckDB."""
    h = F.md5(F.concat_ws(":", F.lit(str(row)), value.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width
    ).alias("bucket")


def cms_portable_build(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Counter relation (group..., row, bucket, cnt): each input row adds
    its weight (default 1) to one bucket per hash row. One union of
    ``CMS_DEPTH`` narrow projections + one hash agg; output is at most
    groups · depth · width rows regardless of input size, map-side
    combinable. Merge sketches by unioning relations and re-summing on
    (group, row, bucket)."""
    gcols = list(group_cols or [])
    w = F.col(weight_col) if weight_col else F.lit(1)
    parts = [
        df.select(
            *gcols,
            F.lit(r).alias("row"),
            _cms_bucket(F.col(value_col), r, width),
            w.alias("_w"),
        )
        for r in range(depth)
    ]
    from functools import reduce

    stacked = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        stacked.groupBy(*gcols, "row", "bucket")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_portable_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    *,
    group_cols: list[str] | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for ``items``: est = min over hash rows of the
    row's bucket counter (missing counters are 0). The items relation is
    exploded to its depth probes and joined on (group, row, bucket) —
    a broadcast-able probe when items are a candidate list, which is the
    intended use (CMS answers point queries, it does not enumerate).
    Returns (group..., item, cms_est) with the one-sided guarantee
    cms_est >= true count."""
    gcols = list(group_cols or [])
    probes = None
    for r in range(depth):
        p = items.select(
            *gcols,
            F.col(item_col).alias("item"),
            F.lit(r).alias("row"),
            _cms_bucket(F.col(item_col), r, width),
        )
        probes = p if probes is None else probes.unionByName(p)
    joined = probes.join(sketch, gcols + ["row", "bucket"], "left").select(
        *gcols, "item", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy(*gcols, "item").agg(
        F.min("cnt").cast("long").alias("cms_est")
    )


# --------------------------------------------------------------------------
# Portable KMV (bottom-k) sketch (round 12): k-minimum-values over the
# md5-u32 hash of DISTINCT values (Bar-Yossef et al. 2002). One sketch,
# two estimators: distinct count ((k-1)/h_k normalized) and a uniform
# random sample of the distinct-value DOMAIN (order statistics give
# domain quantiles). Mergeable by union + re-bottom-k — completes the
# portable sketch family: HLL (distinct), CMS (frequency), KMV
# (distinct + domain sample).
# --------------------------------------------------------------------------

#: 2^32 — the md5-u32 hash-space size the KMV estimator normalizes by
KMV_SPACE = float(1 << 32)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Bottom-``k`` relation (group..., rnk, h, value): the k smallest
    md5-u32 hashes over DISTINCT values. Pass integer- or string-typed
    columns (the md5 idiom's standing string-render contract — float
    rendering differs across engines; hash cents, not dollars).

    Distributed shape: one hash agg collapses the corpus to its distinct
    values, then a rank window ordered by (h, value) over that
    value-domain-bounded relation keeps the bottom k — ≤ groups·k output
    rows. Merge sketches by unioning relations and re-ranking (bottom-k
    of a union of bottom-ks equals bottom-k of the union — order
    statistics compose)."""
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    distinct = df.select(*gcols, F.col(value_col).alias("value")).distinct()
    h = F.conv(
        F.substring(F.md5(F.col("value").cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = (
        Window.partitionBy(*gcols).orderBy("h", "value")
        if gcols
        else Window.orderBy("h", "value")
    )
    return (
        distinct.select(*gcols, "value", h.alias("h"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def kmv_estimate(
    sketch: DataFrame,
    *,
    k: int = 256,
    group_cols: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.5,),
    round_dp: int = 4,
) -> DataFrame:
    """Estimators from a KMV relation: ``kmv_distinct`` = (k-1)·2³²/h_k
    when the sketch is full (k rows), else the exact sample size (the
    sketch SAW every distinct value); ``q_<pct>`` = the sample order
    statistic at ceil(q·n) in VALUE order — a quantile of the distinct
    DOMAIN (KMV samples distinct values uniformly; it is frequency-blind
    by construction)."""
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    wv = (
        Window.partitionBy(*gcols).orderBy("value")
        if gcols
        else Window.orderBy("value")
    )
    ranked = sketch.select(
        *gcols,
        "value",
        "h",
        F.row_number().over(wv).alias("_vr"),
        F.count(F.lit(1)).over(
            Window.partitionBy(*gcols) if gcols else Window.partitionBy()
        ).alias("_n"),
        F.max("h").over(
            Window.partitionBy(*gcols) if gcols else Window.partitionBy()
        ).alias("_hk"),
    )
    est = F.when(
        F.col("_n") >= k,
        F.round(F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("_hk"), round_dp),
    ).otherwise(F.col("_n").cast("double"))
    aggs = [F.min(est).alias("kmv_distinct")]
    for q in quantiles:
        pos = F.ceil(F.lit(q) * F.col("_n")).cast("int")
        aggs.append(
            F.min(F.when(F.col("_vr") == F.greatest(pos, F.lit(1)), F.col("value"))).alias(
                f"q_{int(q * 100)}"
            )
        )
    return ranked.groupBy(*gcols).agg(*aggs)
