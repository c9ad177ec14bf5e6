"""Round-13 scaling evidence: incremental MinHash dedup probe cost.

Claim under test (operators/dedup.build_minhash_index /
minhash_index_append): per-batch work is bounded by the BATCH and its
collisions, never the corpus — at 100 TB you cannot re-sign the corpus
per arriving batch, and the probe must not degrade linearly as the
signed corpus grows.

Method: the sf0.1 %10-subset corpus (doc_id %20 != 0 half) is
replicated ×m with replica-unique tokens (every token prefixed with the
replica id, so replicas can never near-dup each other or the batch —
the r12 span-envelope technique), the signature store is built once per
multiplier, and the SAME fixed batch (%20 == 0 half of the ×1 base) is
appended. Reported: build wall (grows with corpus — expected, amortized)
and append wall (the recurring cost — must grow sublinearly, driven by
band-file IO, not corpus size). Survivor COUNT must be identical at
every multiplier: the batch collides only with the ×1 base copy.

Usage: python tools/scale_evidence_r13.py [sf_dir] [max_mult]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    mults = [m for m in (1, 10, 50) if m <= max_mult]
    spark = get_session(app_name="scale_evidence_r13")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark_etl_twitter_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_append,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    corpus = docs.filter(F.col("doc_id") % 20 != 0).select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    n_batch = batch.count()

    import tempfile

    root = Path(tempfile.mkdtemp(prefix="mh_scale_"))
    for m in mults:
        reps = spark.range(m).select(F.col("id").alias("_rep"))
        corpus_m = (
            corpus.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("_rep") * 100_000_000).alias(
                    "doc_id"
                ),
                F.when(F.col("_rep") == 0, F.col("text"))
                .otherwise(
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda t: F.concat(
                                F.lit("r"),
                                F.col("_rep").cast("string"),
                                F.lit("_"),
                                t,
                            ),
                        ),
                        " ",
                    )
                )
                .alias("text"),
            )
        )
        path = str(root / f"idx_x{m}")
        t0 = time.perf_counter()
        build_minhash_index(corpus_m, path)
        t_build = time.perf_counter() - t0
        n_bands = spark.read.parquet(f"{path}/bands").count()
        t0 = time.perf_counter()
        surv = minhash_index_append(spark, path, batch)
        n_surv = surv.count()
        t_append = time.perf_counter() - t0
        print(
            f"x{m}: corpus_bands={n_bands} build={t_build:.2f}s "
            f"append={t_append:.2f}s batch={n_batch} survivors={n_surv}",
            flush=True,
        )


if __name__ == "__main__":
    main()
