"""Round-6 zipfian-source scaling evidence for the DEDUP/ANN families
(r5 verdict ask #8).

The r5 skew run covered windows/funnel/ngram; this one plants the
realistic worst case for MinHash-LSH bucket skew and the star guard:
ONE source owns ~20% of all documents and its documents share heavy
boilerplate (a fixed 30-token preamble prepended to each), so a large
fraction of the hot source's min-hash band hashes collide. Measured at
×1/×10/×50 replication of the sf corpus:

- ``near_dup_pairs_minhash`` (banded LSH, star guard ON at the default
  threshold 64) end-to-end time + emitted pair count,
- star-guard hit statistics computed from the same band explosion the
  join uses: oversized-bucket count, max bucket population, star edges
  emitted vs the naive Σ sz·(sz-1)/2 pairs those buckets would have
  exploded into (the avoided quadratic),
- ``duplicate_clusters`` (connected components) over the guarded pairs,
- the semantic (embedding) near-dup pipeline under the analogous skew:
  ~20% of vectors pulled toward one centroid (0.7·base + 0.3·self —
  high mutual similarity, one hot LSH bucket, mostly sub-threshold so
  the cost lands on the quadratic within-bucket VERIFY, not on true-pair
  output) → ``embedding_near_dup_pairs`` + ``duplicate_clusters``.

Results table: DESIGN.md §21 (committed round 7, ×1/×10/×50 at sf0.1).

Usage: python tools/scale_evidence_r6.py [sf_dir] [max_mult]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tools.scale_evidence_r4 import replicate, timed

BOILERPLATE = (
    "subscribe to our newsletter for the latest updates and offers "
    "terms and conditions apply all rights reserved copyright notice "
    "click here to unsubscribe from this mailing list thank you"
)
HOT_FRACTION_MOD = 5  # 1/5 of docs -> the hot source


def zipfian_docs(docs):
    """~20% of docs (by stable row hash) move to source 'hot' AND get the
    shared boilerplate preamble — the template-spam shape."""
    is_hot = F.pmod(F.xxhash64(F.col("doc_id")), HOT_FRACTION_MOD) == 0
    return docs.withColumn(
        "source", F.when(is_hot, F.lit("hot")).otherwise(F.col("source"))
    ).withColumn(
        "text",
        F.when(is_hot, F.concat(F.lit(BOILERPLATE + " "), F.col("text"))).otherwise(
            F.col("text")
        ),
    )


def star_guard_stats(docs, *, threshold=64, num_hashes=32, bands=8, shingle_n=3):
    """Bucket statistics over the SAME band explosion the candidate join
    uses: (oversized buckets, max bucket size, star edges emitted,
    naive pairs avoided)."""
    from pyspark_etl_twitter_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(
        docs, num_hashes=num_hashes, shingle_n=shingle_n
    )
    rows = num_hashes // bands
    band_hashes = F.array(
        *[
            F.xxhash64(*[F.col(f"h{j * rows + r}") for r in range(rows)])
            for j in range(bands)
        ]
    )
    buckets = (
        sigs.select(F.posexplode(band_hashes).alias("band_id", "band_hash"))
        .groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") > 1)
    )
    agg = buckets.agg(
        F.sum(F.when(F.col("sz") > threshold, 1).otherwise(0)).alias("oversized"),
        F.max("sz").alias("max_sz"),
        F.sum(F.when(F.col("sz") > threshold, F.col("sz") - 1)).alias("star_edges"),
        F.sum(
            F.when(F.col("sz") > threshold, F.col("sz") * (F.col("sz") - 1) / 2)
        ).alias("naive_pairs"),
    ).first()
    return agg


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    mults = [m for m in (1, 10, 50, 100) if m <= max_mult]
    spark = get_session(app_name="scale_evidence_r6")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark_etl_twitter_spark.operators.dedup import (
        duplicate_clusters,
        near_dup_pairs_minhash,
    )
    from pyspark_etl_twitter_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    docs0 = load_table(spark, sf_dir, "documents")
    emb0 = load_table(spark, sf_dir, "embeddings")

    for n in mults:
        # persist(), not localCheckpoint(): unpersist() on a localCheckpoint
        # result does NOT release the checkpoint blocks, so the ×50 blocks
        # would accumulate across multipliers in one session (ADVICE r6).
        # The count() below materializes the cache before timing starts.
        docs = zipfian_docs(replicate(docs0, n, ["doc_id"]).drop("_rep")).persist()
        total = docs.count()
        hot = docs.filter("source = 'hot'").count()
        print(f"-- documents x{n}: {total} rows, hot source {hot} ({hot/total:.0%})")

        st = star_guard_stats(docs)
        print(
            f"   star guard: {st.oversized} oversized buckets, max bucket "
            f"{st.max_sz}, star edges {st.star_edges or 0} vs naive pairs "
            f"{int(st.naive_pairs or 0)} avoided"
        )
        # Time the checkpoint itself — localCheckpoint is EAGER, so wrapping
        # only a noop-write of the already-materialized result (the r6 bug)
        # reported ~0.1 s regardless of multiplier.
        t0 = time.perf_counter()
        pairs = near_dup_pairs_minhash(docs).localCheckpoint()
        n_pairs = pairs.count()
        print(
            f"minhash_pairs       x{n}: {time.perf_counter() - t0:.2f} s",
            flush=True,
        )
        print(f"   emitted candidate pairs: {n_pairs}")
        timed(
            f"minhash_cc          x{n}",
            lambda p=pairs: duplicate_clusters(p, a_col="doc_a", b_col="doc_b"),
        )
        docs.unpersist(blocking=True)

        # semantic skew: 20% of vectors pulled toward one centroid at 0.7
        # (high mutual similarity, ONE hot LSH bucket, sub-threshold —
        # the cost lands on the quadratic within-bucket verify), plus a
        # 1-in-50 sub-cluster pulled at 0.9 (super-threshold, so the CC
        # stage has a real giant component to contract)
        is_hot = F.pmod(F.xxhash64(F.col("vec_id")), HOT_FRACTION_MOD) == 0
        strength = F.when(
            F.pmod(F.col("vec_id"), F.lit(50)) == 0, F.lit(0.9)
        ).otherwise(F.lit(0.7))
        base = emb0.orderBy("vec_id").first().embedding
        base_lit = F.array(*[F.lit(float(x)) for x in base])
        emb = (
            replicate(emb0, n, ["vec_id"])
            .drop("_rep")
            .withColumn("_s", strength)
            .withColumn(
                "embedding",
                F.when(
                    is_hot,
                    F.zip_with(
                        base_lit,
                        F.col("embedding"),
                        lambda b, x: F.col("_s") * b + (1.0 - F.col("_s")) * x,
                    ),
                ).otherwise(F.col("embedding")),
            )
            .drop("_s")
            .persist()
        )
        emb.count()  # materialize the cache before timing
        t0 = time.perf_counter()
        spairs = embedding_near_dup_pairs(
            emb, threshold=0.95, n_planes=None
        ).localCheckpoint()
        n_spairs = spairs.count()
        print(
            f"semantic_pairs      x{n}: {time.perf_counter() - t0:.2f} s",
            flush=True,
        )
        print(f"   semantic pairs: {n_spairs}")
        timed(
            f"semantic_cc         x{n}",
            lambda p=spairs: duplicate_clusters(p, a_col="vec_a", b_col="vec_b"),
        )
        emb.unpersist(blocking=True)


if __name__ == "__main__":
    main()
