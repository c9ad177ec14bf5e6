"""Round-10 scaling evidence for the two new dedup operators.

1. ``segment_dedup`` under BOILERPLATE SKEW — the operator's worst and
   most realistic case: every document in a hot ~20% slice carries the
   same 3 leading segments (template spam), so three segment keys own
   ~20% of the exploded relation. The keep-first aggregate must collapse
   those map-side (partial_min) or the three reducers owning the hot
   keys become stragglers. Measured: end-to-end time at ×1/×10/×50/×100
   replication of sf0.1 documents, plus the survivor count (the planted
   boilerplate must survive exactly once per distinct segment).

2. ``semdedup_drop_ids`` with the k knob scaling ALONGSIDE the corpus —
   the paper's contract: within-cluster pair work is Σ sz·(sz-1)/2, so
   growing N at fixed k inflates clusters and the pair scan
   quadratically, while scaling k with N holds E[cluster size] and the
   per-cluster scan flat. Replicas are DISPLACED along dim 0 (each
   replica its own region of space) so scaled-k centroids genuinely
   partition the grown corpus. Measured per multiplier: the naive pair
   count implied by the fixed-k=8 cluster histogram (analytic — at ×100
   it is ~10^12 pairs and cannot be timed), the scaled-k pair count,
   and the WALL TIME of the scaled-k run (the design that scales).

Results table: DESIGN.md §22 (round-10 additions).

Usage: python tools/scale_evidence_r10.py [sf_dir] [max_mult]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.clustering import kmeans_fit_portable
from pyspark_etl_twitter_spark.operators.dedup import (
    segment_dedup,
    semdedup_drop_ids,
)
from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tools.scale_evidence_r4 import replicate, timed

BOILERPLATE = (
    "subscribe to our newsletter today "
    "all rights reserved copyright notice "
    "click here to unsubscribe now"
)  # 15 tokens -> exactly 3 five-token segments
HOT_FRACTION_MOD = 5


def boilerplated_docs(docs):
    is_hot = F.pmod(F.xxhash64(F.col("doc_id")), HOT_FRACTION_MOD) == 0
    return docs.withColumn(
        "text",
        F.when(
            is_hot, F.concat(F.lit(BOILERPLATE + " "), F.col("text"))
        ).otherwise(F.col("text")),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    mults = [m for m in (1, 10, 50, 100) if m <= max_mult]
    spark = get_session(app_name="scale_evidence_r10")

    docs = boilerplated_docs(load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")
    # fit once on the x1 corpus; reuse at every multiplier (the cost
    # envelope under test is the pair join, not the fit)
    base_cents = kmeans_fit_portable(emb, 8, iters=3)

    for mult in mults:
        d = replicate(docs, mult, ["doc_id"]) if mult > 1 else docs
        n_docs = d.count()
        print(f"-- x{mult}: {n_docs} docs --", flush=True)
        timed(
            f"segment_dedup x{mult}",
            lambda d=d: segment_dedup(d, seg_tokens=5),
        )
        kept = (
            segment_dedup(d, seg_tokens=5)
            .agg(F.sum("n_kept").alias("k"), F.sum("n_segments").alias("t"))
            .first()
        )
        print(
            f"  segments kept {kept.k}/{kept.t} "
            f"({100.0 * kept.k / kept.t:.1f}%)",
            flush=True,
        )

    from pyspark_etl_twitter_spark.operators.clustering import (
        kmeans_assign,
        kmeans_assign_join,
    )

    def naive_pairs(e, cents):
        # same k-switch as semdedup_drop_ids: literal fold under ~100
        # centroids, broadcast relation above
        assign = kmeans_assign_join if len(cents) > 64 else kmeans_assign
        hist = assign(e, cents).groupBy("cluster").count()
        return hist.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
        ).first()["p"]

    # semdedup sweep capped at x50: the dense argmin assignment is
    # O(N·k·dim), so scaling k WITH N makes assignment itself quadratic
    # overall — the measured envelope below shows exactly that, and the
    # conclusion (DESIGN.md §22) is that corpus-scale SemDeDup must ride
    # a PRUNED assignment (the engine's trained-IVF path: broadcast
    # centroid table + nprobe pruning), not a wider dense argmin.
    for mult in [m for m in mults if m <= 50]:
        if mult > 1:
            e = replicate(emb, mult, ["vec_id"])
            # displace each replica 10 units along dim 0: replicas occupy
            # disjoint regions, so per-replica centroid copies partition
            # the grown corpus the way a real larger-k fit would
            e = e.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == 0, x.cast("double") + 10.0 * F.col("_rep")
                    ).otherwise(x.cast("double")),
                ),
            )
        else:
            e = emb.withColumn(
                "embedding",
                F.transform("embedding", lambda x: x.cast("double")),
            )
        n_vec = e.count()
        scaled = [
            [c[0] + 10.0 * r] + list(c[1:])
            for r in range(mult)
            for c in base_cents
        ]
        fixed_p = naive_pairs(e, base_cents)
        scaled_p = naive_pairs(e, scaled)
        print(
            f"-- x{mult}: {n_vec} vectors; pair scan fixed k=8: "
            f"{fixed_p:.3g}, scaled k={8 * mult}: {scaled_p:.3g} --",
            flush=True,
        )
        timed(
            f"semdedup x{mult} scaled k={8 * mult}",
            lambda e=e, s=scaled: semdedup_drop_ids(e, s, threshold=0.30),
        )
        if mult == 1:
            timed(
                "semdedup x1 fixed k=8 (baseline anchor)",
                lambda e=e: semdedup_drop_ids(e, base_cents, threshold=0.30),
            )


if __name__ == "__main__":
    main()
