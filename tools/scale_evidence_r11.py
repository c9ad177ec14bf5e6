"""Round-11 scaling evidence: the coarse-quantizer assignment rung
(VERDICT r10 ask #2).

The r10 ×50 SemDeDup run (tools/scale_evidence_r10.py, DESIGN.md §22)
measured 467 s at mult=50 / k=400 and showed the wall is DOMINATED by
dense assignment: O(N·k·dim) is O(N²·dim) under the paper's k∝N rule.
This harness re-runs the identical displaced-replica corpus and scaled
centroid set with ``coarse_probe`` engaged (two-level assignment:
argmin over ⌈√k⌉ super-centroids, refine within the probed groups —
O(N·√k·dim)) and reports, per multiplier:

- wall time of the dense single-level path (the r10 number, re-measured
  on this machine so the comparison is same-state);
- wall time of the two-level path at n_probe 1 and 2;
- drop-set agreement between the paths (|symmetric diff| / |exact|) —
  the displaced-replica corpus is strongly clustered, so the coarse
  cells recover the replica structure and agreement should be ~1.

Results table: DESIGN.md §"Round-11 coarse-quantizer rung".

A second section measures the COSINE twin
(``ivf_assignments(coarse_probe=)``) at ×50/k=400 on a cyclic-shift
replicated corpus (the r4 perturbed mode — preserves intra-replica
cosine structure) with per-replica-shifted trained centroids: wall
276.7 → 32.3 s (8.6×) measured 2026-08-15, but n_probe=1 list
agreement is only 0.26 (0.41 at p=2) — 400 near-uniform directions on
a 64-dim sphere are the coarse quantizer's intrinsic hard case (no
directional clustering to exploit), vs the L2 path's 100% drop-set
agreement on its spatially-clustered corpus. The honest contract for
cosine/IVF builds is therefore END-TO-END probe recall of the
two-level-built index vs the exactly-assigned index (measured in
DESIGN.md §"Round-11 coarse-quantizer rung"), not raw list agreement.

Usage: python tools/scale_evidence_r11.py [sf_dir] [max_mult] [--ivf]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.clustering import kmeans_fit_portable
from pyspark_etl_twitter_spark.operators.dedup import semdedup_drop_ids
from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tools.scale_evidence_r4 import replicate


def ivf_section(spark, sf_dir, mult=50, dim=64):
    """Cosine twin at k=8·mult on the cyclic-shift corpus: wall times of
    single-level vs coarse_probe 1/2, plus list agreement."""
    from pyspark_etl_twitter_spark.operators.similarity import ivf_assignments

    emb = load_table(spark, sf_dir, "embeddings")
    e = replicate(emb, mult, ["vec_id"])
    shift = (F.col("_rep") % dim).cast("int")
    e = (
        e.withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.element_at(
                    "embedding", ((i + shift) % dim) + 1
                ).cast("double"),
            ),
        )
        .select("vec_id", "embedding")
        .persist()
    )
    print(f"-- ivf x{mult}: {e.count()} vectors --", flush=True)
    base_cents = kmeans_fit_portable(emb, 8, iters=2)
    cents = [
        [float(c[(j + (r % dim)) % dim]) for j in range(dim)]
        for r in range(mult)
        for c in base_cents
    ]
    single = None
    for label, kw in [
        ("single", {}),
        ("two_level p=1", {"coarse_probe": 1}),
        ("two_level p=2", {"coarse_probe": 2}),
    ]:
        start = time.perf_counter()
        a, _ = ivf_assignments(e, n_lists=len(cents), centroid_vectors=cents, **kw)
        a.write.format("noop").mode("overwrite").save()
        print(f"  {label}: {time.perf_counter() - start:.1f} s", flush=True)
        if label == "single":
            single = a.select("vec_id", F.col("list_id").alias("a")).persist()
            single.count()
        else:
            j = (
                single.join(a.select("vec_id", F.col("list_id").alias("b")), "vec_id")
                .agg(
                    F.count("*").alias("n"),
                    F.sum((F.col("a") == F.col("b")).cast("int")).alias("m"),
                )
                .first()
            )
            print(f"  {label} list agreement: {j.m}/{j.n} = {j.m / j.n:.4f}", flush=True)


def dsir_section(spark, sf_dir, mults):
    """DSIR cost envelope: every stage is a narrow gram stream + a B-row
    broadcast, so wall must scale ~linearly in corpus bytes. Replication
    is exact (ids offset) — the distributions change (replicated raw
    grams), which is fine: the envelope under test is the pipeline cost,
    not the weights."""
    from pyspark_etl_twitter_spark.operators.importance import dsir_log_weights

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    for mult in mults:
        raw = docs.filter(F.col("source") != "src0")
        if mult > 1:
            raw = replicate(raw, mult, ["doc_id"])
        n = raw.count()
        start = time.perf_counter()
        dsir_log_weights(raw, target).write.format("noop").mode(
            "overwrite"
        ).save()
        print(
            f"-- dsir x{mult}: {n} raw docs, {time.perf_counter() - start:.1f} s",
            flush=True,
        )


def pq_section(spark, sf_dir, mults):
    """PQ cost envelope: encode is a zero-exchange codegen map, the ADC
    scan is a generator + window, so wall must scale ~linearly in corpus
    rows at fixed (m, ksub, n_queries). Replication is exact with offset
    ids; codebooks/queries come from replica 0 (vec_id < 16 unchanged),
    so every multiplier quantizes against the SAME codebook — the
    comparison isolates scan cost."""
    from pyspark_etl_twitter_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
        pq_encode_pandas,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    for mult in mults:
        e = replicate(emb, mult, ["vec_id"]) if mult > 1 else emb
        n = e.count()
        books = pq_codebooks(e)
        start = time.perf_counter()
        pq_encode(e, books).write.format("noop").mode("overwrite").save()
        enc = time.perf_counter() - start
        start = time.perf_counter()
        pq_encode_pandas(e, books).write.format("noop").mode(
            "overwrite"
        ).save()
        enc_pd = time.perf_counter() - start
        start = time.perf_counter()
        pq_adc_topk(e).write.format("noop").mode("overwrite").save()
        adc = time.perf_counter() - start
        print(
            f"-- pq x{mult}: {n} vectors, encode {enc:.2f} s "
            f"(arrow twin {enc_pd:.2f} s), adc_topk {adc:.2f} s",
            flush=True,
        )



def lr_section(spark, sf_dir, mults):
    """Quality-classifier GD cost envelope: per iteration the margin
    pass is a partial-agg groupBy(doc) and the gradient pass a
    partial-agg groupBy(bucket) — both linear scans with bounded
    reduce sides, so wall must scale ~linearly in corpus rows."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.classifier import lr_train_portable

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_y", (F.col("source") == "src0").cast("double")
    )
    for mult in mults:
        d = replicate(docs, mult, ["doc_id"]) if mult > 1 else docs
        n = d.count()
        start = time.perf_counter()
        w = lr_train_portable(d, dim=64, iters=3, lr=0.1)
        print(
            f"-- lr x{mult}: {n} docs, 3 iters in "
            f"{time.perf_counter() - start:.1f} s, |w|_inf="
            f"{max(abs(x) for x in w):.4f}",
            flush=True,
        )



def pr_mmr_section(spark, sf_dir, mults):
    """PageRank + MMR cost envelopes. PageRank: per iteration one edge
    equi-join + one node partial-agg — linear in edges. MMR: the
    relevance scan dominates (everything after it is bounded by
    construction) — linear in corpus rows."""
    from pyspark_etl_twitter_spark.operators.graph import (
        pagerank_portable,
        supplier_edges,
    )
    from pyspark_etl_twitter_spark.operators.similarity import mmr_topk

    li = load_table(spark, sf_dir, "lineitem")
    emb = load_table(spark, sf_dir, "embeddings")
    for mult in mults:
        e = (
            replicate(
                li.select("l_orderkey", "l_suppkey"), mult,
                ["l_orderkey", "l_suppkey"],
            )
            if mult > 1
            else li
        )
        edges = supplier_edges(e)
        n = edges.count()
        start = time.perf_counter()
        pagerank_portable(edges).write.format("noop").mode(
            "overwrite"
        ).save()
        pr_wall = time.perf_counter() - start
        v = replicate(emb, mult, ["vec_id"]) if mult > 1 else emb
        nv = v.count()
        start = time.perf_counter()
        mmr_topk(v).write.format("noop").mode("overwrite").save()
        mmr_wall = time.perf_counter() - start
        print(
            f"-- x{mult}: pagerank {n} edges {pr_wall:.1f} s; "
            f"mmr {nv} vectors {mmr_wall:.1f} s",
            flush=True,
        )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    args = [a for a in sys.argv[2:] if not a.startswith("--")]
    max_mult = int(args[0]) if args else 50
    mults = [m for m in (1, 10, 50) if m <= max_mult]
    spark = get_session(app_name="scale_evidence_r11")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if "--ivf" in sys.argv:
        ivf_section(spark, sf_dir, mult=max_mult)
        return
    if "--dsir" in sys.argv:
        dsir_section(spark, sf_dir, mults)
        return
    if "--pq" in sys.argv:
        pq_section(spark, sf_dir, [m for m in (1, 10, 100) if m <= max_mult])
        return
    if "--lr" in sys.argv:
        lr_section(spark, sf_dir, [m for m in (1, 10, 50) if m <= max_mult])
        return
    if "--prmmr" in sys.argv:
        pr_mmr_section(
            spark, sf_dir, [m for m in (1, 10, 50) if m <= max_mult]
        )
        return

    emb = load_table(spark, sf_dir, "embeddings")
    base_cents = kmeans_fit_portable(emb, 8, iters=3)

    for mult in mults:
        if mult > 1:
            e = replicate(emb, mult, ["vec_id"])
            # same displacement as r10: replicas occupy disjoint regions
            # so per-replica centroid copies genuinely partition the
            # grown corpus (scaled-k structure)
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
        k = len(scaled)
        print(f"-- x{mult}: {n_vec} vectors, k={k} --", flush=True)

        runs = {}
        for label, kwargs in [
            ("dense", {}),
            ("two_level p=1", {"coarse_probe": 1}),
            ("two_level p=2", {"coarse_probe": 2}),
        ]:
            start = time.perf_counter()
            drops = semdedup_drop_ids(e, scaled, threshold=0.30, **kwargs)
            ids = set(r[0] for r in drops.collect())
            wall = time.perf_counter() - start
            runs[label] = (wall, ids)
            print(f"  {label}: {wall:.2f} s, {len(ids)} dropped", flush=True)
        exact = runs["dense"][1]
        for label in ("two_level p=1", "two_level p=2"):
            ids = runs[label][1]
            sym = len(exact ^ ids)
            denom = max(1, len(exact))
            print(
                f"  {label} drop-set agreement: sym-diff {sym} "
                f"({100.0 * (1 - sym / denom):.2f}% of exact)",
                flush=True,
            )


if __name__ == "__main__":
    main()

