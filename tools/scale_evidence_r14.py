"""Round-14 scaling evidence: CDC chunk dedup + containment decontamination.

Claims under test:

1. ``operators/dedup.cdc_chunk_dedup`` — per-doc work is O(tokens ×
   window) with zero shuffle until the two bounded keep-first
   aggregates, so wall grows ~linearly with corpus size and NEVER
   super-linearly (the pre-fix posexplode form was O(n²·window) md5 per
   doc — the InferFiltersFromGenerate trap in DESIGN.md — and would
   blow up here, not scale). Replicas carry replica-unique tokens —
   prefixed tokens hash to different gear values, so each replica
   chunks DIFFERENTLY (content-defined = content-dependent; a ×m total
   is not the invariant) but can never collide across copies: the BASE
   copy's (Σ n_chunks, Σ n_kept) must be bit-identical at every
   multiplier.

2. ``operators/curation.containment_contamination`` — the eval side is
   a constant broadcast; the corpus makes one narrow pass, so wall is
   ~linear in corpus size while the RESULT stays constant (replica
   tokens are prefixed and can never share a shingle with the ×1 eval
   slice — only the base copy scores).

Usage: python tools/scale_evidence_r14.py [sf_dir] [max_mult]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table


def _replicate(docs, m):
    """×m corpus with replica-unique tokens (every token prefixed with
    the replica id) and replica-unique doc ids — the r12/r13 envelope
    technique: replicas can never dedup or share grams across copies."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("_rep")
    base = docs.select("doc_id", "text", reps)
    return base.select(
        (F.col("doc_id") * m + F.col("_rep")).alias("doc_id"),
        F.when(F.col("_rep") == 0, F.col("text"))
        .otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(
                        F.lit("r"), F.col("_rep").cast("string"), F.lit("_"), t
                    ),
                ),
            )
        )
        .alias("text"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    mults = [m for m in (1, 10, 50) if m <= max_mult]
    spark = get_session(app_name="scale_evidence_r14")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark_etl_twitter_spark.operators.curation import (
        containment_contamination,
    )
    from pyspark_etl_twitter_spark.operators.dedup import cdc_chunk_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    n_eval = eval_docs.count()
    print(f"base docs={docs.count()} eval={n_eval} (sf_dir={sf_dir})")

    print("\n-- cdc_chunk_dedup: wall ~linear, base copy isolated --")
    base_tot = None
    for m in mults:
        corpus = _replicate(docs, m).localCheckpoint()
        t0 = time.time()
        out = cdc_chunk_dedup(corpus, window=4, divisor=8)
        # rep 0 keeps text unchanged under ids doc_id*m: its totals must
        # be bit-identical at every multiplier (replica chunks carry
        # prefixed tokens and can never win a keep-first against it)
        row = out.agg(
            F.sum("n_chunks").alias("c"),
            F.sum("n_kept").alias("k"),
            F.sum(F.when(F.col("doc_id") % m == 0, F.col("n_chunks"))).alias(
                "c0"
            ),
            F.sum(F.when(F.col("doc_id") % m == 0, F.col("n_kept"))).alias(
                "k0"
            ),
        ).collect()[0]
        wall = time.time() - t0
        ok = True
        if m == 1:
            base_tot = (row.c0, row.k0)
        else:
            ok = (row.c0, row.k0) == base_tot
        print(
            f"  x{m:<3} wall={wall:7.2f}s chunks={row.c} kept={row.k} "
            f"base_copy_invariant={'OK' if ok else 'MISMATCH'}"
        )
        corpus.unpersist()

    print("\n-- containment_contamination: wall ~linear, result constant --")
    base_sig = None
    for m in mults:
        corpus = _replicate(docs, m).localCheckpoint()
        t0 = time.time()
        scored = containment_contamination(corpus, eval_docs, shingle_n=3)
        row = scored.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("max_containment"), 6).alias("s"),
        ).collect()[0]
        wall = time.time() - t0
        ok = True
        if m == 1:
            base_sig = (row.n, row.s)
        else:
            # the ×1 base copy keeps its ids (rep 0 → doc_id*m), so the
            # scored SET is the same docs under relabeled ids: count and
            # score mass must be identical at every multiplier
            ok = (row.n, row.s) == base_sig
        print(
            f"  x{m:<3} wall={wall:7.2f}s scored_docs={row.n} "
            f"score_mass={row.s} invariant={'OK' if ok else 'MISMATCH'}"
        )
        corpus.unpersist()


if __name__ == "__main__":
    main()
