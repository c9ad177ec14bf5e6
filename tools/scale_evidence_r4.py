"""Round-4 scaling evidence (VERDICT.md r3 ask #9): the three heaviest
pipelines at 1/10/50/100× replicated sf0.1 volume (DESIGN.md §14).

Two replication modes, chosen per operator for honesty:

- **Exact replication** (minhash, BM25): ids offset per replica, content
  byte-identical. For MinHash this is the ADVERSARIAL case — every doc
  becomes a 100-member exact-dup swarm, so naive banded LSH would emit
  O(swarm²) pairs per bucket; the star-guard (operators/dedup.py) is what
  keeps growth linear, and this harness measures exactly that.
- **Perturbed replication** (semantic dedup): each replica's embeddings
  get a per-replica CYCLIC SHIFT of the dimension axis. A common
  permutation preserves every intra-replica cosine exactly (the replica
  is a faithful copy of the original corpus's pair structure) while
  cross-replica cosines decorrelate — so true-pair density per unit
  volume stays constant, the shape of a genuinely larger corpus. (An
  additive offset would be wrong twice over: it injects a shared
  component that inflates ALL pairwise cosines — measured: it floods the
  pair graph and triples the 1× time — and exact replication would
  instead measure quadratic swarm verification, which a real 100 TB
  pipeline removes with sha-fingerprint dedup FIRST.)

Usage: python tools/scale_evidence_r4.py [sf_dir] [max_mult]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table


def replicate(df, n, id_cols):
    reps = df.sparkSession.range(n).select(F.col("id").alias("_rep"))
    out = df.crossJoin(F.broadcast(reps))
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.col("_rep") * 100_000_000)
    return out


def timed(label, thunk):
    start = time.perf_counter()
    result = thunk()
    if hasattr(result, "write"):
        result.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.perf_counter() - start:.2f} s", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    mults = [m for m in (1, 10, 50, 100) if m <= max_mult]
    spark = get_session(app_name="scale_evidence_r4")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark_etl_twitter_spark.operators.dedup import (
        duplicate_clusters,
        near_dup_pairs_minhash,
    )
    from pyspark_etl_twitter_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from pyspark_etl_twitter_spark.operators.textstats import bm25_scores
    from pyspark_etl_twitter_spark.plans.advanced_queries import (
        SEMANTIC_PLANES,
        SEMANTIC_SEED,
        SEMANTIC_TAU,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # -- MinHash near-dup: exact replication = adversarial swarm corpus --
    for n in mults:
        d_n = replicate(docs, n, ["doc_id"]).drop("_rep").localCheckpoint()
        rows = d_n.count()
        timed(
            f"minhash_near_dup  docs x{n} ({rows} rows, swarm mode)",
            lambda d=d_n: near_dup_pairs_minhash(d),
        )
        d_n.unpersist()

    # -- BM25: exact replication (scoring is per-doc, swarms irrelevant) --
    for n in mults:
        d_n = replicate(docs, n, ["doc_id"]).drop("_rep").localCheckpoint()
        rows = d_n.count()
        timed(
            f"bm25_scores       docs x{n} ({rows} rows)",
            lambda d=d_n: bm25_scores(d, ["join", "hash", "scan"]),
        )
        d_n.unpersist()

    # -- Semantic dedup e2e: perturbed replication (constant dup density) --
    for n in mults:
        dim = len(emb.select("embedding").first()[0])
        shift = (F.col("_rep") % dim).cast("int")
        e_n = (
            replicate(emb, n, ["vec_id"])
            .withColumn(
                "embedding",
                F.when(shift == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice(F.col("embedding"), shift + 1, F.lit(dim) - shift),
                        F.slice(F.col("embedding"), F.lit(1), shift),
                    )
                ),
            )
            .drop("_rep")
            .localCheckpoint()
        )
        rows = e_n.count()

        def sem_e2e(e=e_n):
            pairs = embedding_near_dup_pairs(
                e,
                threshold=SEMANTIC_TAU,
                n_planes=None,  # size buckets to the corpus (count action)
                seed=SEMANTIC_SEED,
            )
            return duplicate_clusters(pairs, a_col="vec_a", b_col="vec_b")

        timed(f"semantic_dedup_e2e emb x{n} ({rows} vecs, perturbed)", sem_e2e)
        e_n.unpersist()


if __name__ == "__main__":
    main()
