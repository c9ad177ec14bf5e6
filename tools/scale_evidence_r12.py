"""Round-12 scaling evidence (VERDICT r11 asks #3/#4).

Section 1 — PageRank lineage cuts (`--pagerank`): `pagerank_portable`
now localCheckpoints the N-row rank relation every `checkpoint_every`
iterations. This section measures wall at iters 3/10/20 with the cuts
on the sf0.1 supplier graph, re-measures iters=10 with cuts disabled
(checkpoint_every > iters — the counterfactual whose plan tree grows
linearly in iters), and pins value equality between the two (ranks are
rounded to the 9dp grid every round, so checkpoint placement must be
value-neutral).

Section 2 — IVF two-level auto-switch (`--ivfauto`): `build_ivf_index`
defaults to the two-level rung at n_lists >= 80. On the ×50 cyclic-shift
corpus (100k vectors, k=400, first-k seeding — the build default), this
measures the exact-assignment build wall vs the auto build wall, then
the END-TO-END probe recall@5 (100 queries vs exact brute-force cosine)
of both indexes at n_probe 16 and 40. The contract from the r11
frontier (DESIGN.md §"Cosine (IVF) two-level assignment"): the auto
build at n_probe=40 must beat the exact build at n_probe=16 — the
recall is bought back with probes while the build is ~6× cheaper.

Usage: python tools/scale_evidence_r12.py [sf_dir] [--pagerank|--ivfauto]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tools.scale_evidence_r4 import replicate


def pagerank_section(spark, sf_dir):
    from pyspark_etl_twitter_spark.operators.graph import (
        pagerank_portable,
        supplier_edges,
    )

    li = load_table(spark, sf_dir, "lineitem")
    edges = supplier_edges(li.select("l_orderkey", "l_suppkey")).persist()
    n = edges.count()
    print(f"-- pagerank envelope: {n} edges --", flush=True)
    for iters in (3, 10, 20):
        start = time.perf_counter()
        pagerank_portable(edges, iters=iters).write.format("noop").mode(
            "overwrite"
        ).save()
        print(
            f"  iters={iters} (cuts every 4): "
            f"{time.perf_counter() - start:.1f} s",
            flush=True,
        )
    start = time.perf_counter()
    nocut = pagerank_portable(edges, iters=10, checkpoint_every=10**9)
    nocut_rows = {(r.node, r.pagerank) for r in nocut.collect()}
    print(
        f"  iters=10 (NO cuts): {time.perf_counter() - start:.1f} s",
        flush=True,
    )
    cut_rows = {
        (r.node, r.pagerank)
        for r in pagerank_portable(edges, iters=10).collect()
    }
    assert cut_rows == nocut_rows, "checkpoint placement changed values!"
    print(f"  value equality (cuts vs no cuts, iters=10): OK ({len(cut_rows)} nodes)", flush=True)


def _recall_at_5(probed, exact_sets):
    got: dict[int, set] = {}
    for r in probed.collect():
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    return sum(
        len(got.get(q, set()) & exact_sets[q]) / len(exact_sets[q])
        for q in exact_sets
    ) / len(exact_sets)


def ivf_auto_section(spark, sf_dir, mult=50, dim=64, k_lists=400):
    import shutil
    import tempfile

    from pyspark_etl_twitter_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_probe_indexed,
    )

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
    print(f"-- ivf auto x{mult}: {e.count()} vectors, k={k_lists} --", flush=True)
    exact_sets: dict[int, set] = {}
    for r in cosine_topk(e, n_queries=100, k=5).collect():
        exact_sets.setdefault(r.q_id, set()).add(r.neighbor_id)
    base = Path(tempfile.gettempdir()) / "spark_graft_r12_ivfauto"
    shutil.rmtree(base, ignore_errors=True)
    walls = {}
    for label, kw in [("exact", {"coarse_probe": None}), ("auto", {})]:
        path = str(base / label)
        start = time.perf_counter()
        build_ivf_index(e, path, n_lists=k_lists, **kw)
        walls[label] = time.perf_counter() - start
        print(f"  build[{label}]: {walls[label]:.1f} s", flush=True)
        for n_probe in (16, 40):
            rec = _recall_at_5(
                ivf_probe_indexed(
                    spark, path, n_queries=100, k=5, n_probe=n_probe
                ),
                exact_sets,
            )
            print(
                f"    recall@5[{label}, n_probe={n_probe}]: {rec:.3f}",
                flush=True,
            )
    print(
        f"  build speedup exact/auto: {walls['exact'] / walls['auto']:.1f}×",
        flush=True,
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="scale_evidence_r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    if "--pagerank" in sys.argv:
        pagerank_section(spark, sf_dir)
        return
    if "--ivfauto" in sys.argv:
        ivf_auto_section(spark, sf_dir)
        return
    if "--spans" in sys.argv:
        spans_section(spark, sf_dir)
        return
    if "--kcore" in sys.argv:
        kcore_section(spark, sf_dir)
        return
    if "--negatives" in sys.argv:
        negatives_section(spark, sf_dir)
        return
    pagerank_section(spark, sf_dir)
    ivf_auto_section(spark, sf_dir)
    spans_section(spark, sf_dir)
    kcore_section(spark, sf_dir)
    negatives_section(spark, sf_dir)




def spans_section(spark, sf_dir, mults=(1, 10, 50)):
    """Span-removal + portable-CMS scale envelope (round-12 session 2).

    Corpus replicated ×m with REPLICA-UNIQUE body tokens (every token
    suffixed with its replica id — cross-replica body grams must NOT
    collide, otherwise the whole corpus is one duplicate) and the SAME
    12-token boilerplate header planted by md5 mark on the ORIGINAL doc
    id, so every replica plants identically: the removal totals must
    scale exactly ×m (identical per-replica drop sets — the correctness
    half of the envelope) while the wall tracks the gram-stream size
    (the linearity half). The CMS build rides the same stream: its
    output stays 4×1024 cells at every multiplier."""
    from pyspark_etl_twitter_spark.operators.dedup import (
        remove_duplicated_spans,
    )
    from pyspark_etl_twitter_spark.operators.sketches import (
        cms_portable_build,
    )
    from pyspark_etl_twitter_spark.operators.textstats import ws_tokens

    hdr = "copyright notice all rights reserved this text is provided as is"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_removed = None
    for m in mults:
        d = replicate(docs, m, ["doc_id"])
        body = F.concat_ws(
            " ",
            F.transform(
                ws_tokens("text"),
                lambda t: F.concat(t, F.lit("_"), F.col("_rep").cast("string")),
            ),
        )
        mark = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.pmod(F.col("doc_id"), F.lit(100_000_000)).cast(
                                "string"
                            ),
                            F.lit("hdr"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
        )
        planted = d.select(
            "doc_id",
            F.concat_ws(
                " ",
                F.when(mark % 4 == 0, F.lit(hdr)).otherwise(F.lit("")),
                body,
            ).alias("text"),
        )
        start = time.time()
        agg = (
            remove_duplicated_spans(planted, n=8)
            .agg(
                F.sum("tokens_removed").alias("rm"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        wall = time.time() - start
        if m == mults[0]:
            base_removed = agg.rm / m
        exact = "EXACT" if agg.rm == base_removed * m else "MISMATCH"
        print(
            f"span_removal x{m}: {wall:.1f} s, docs={agg.n}, "
            f"tokens_removed={agg.rm} ({exact} x{m} of base)",
            flush=True,
        )

        tok = planted.select(F.explode(ws_tokens("text")).alias("token"))
        start = time.time()
        cells = cms_portable_build(tok, "token").count()
        print(
            f"cms_build x{m}: {time.time() - start:.1f} s, cells={cells}",
            flush=True,
        )




def kcore_section(spark, sf_dir, mults=(1, 10, 50)):
    """k-core scale envelope: edges replicated ×m as m DISJOINT copies
    of the sparsified+planted supplier graph (node ids shifted per
    replica), so the fixpoint structure is preserved and the core must
    be exactly m planted cliques — correctness AND wall tracked
    together. Per round the work is one degree agg + two semi joins on
    the (shrinking) edge set; rounds are fixed, so wall should scale
    ~linearly in edges."""
    from pyspark_etl_twitter_spark.operators.graph import (
        kcore_nodes,
        supplier_edges,
    )

    li = load_table(spark, sf_dir, "lineitem")
    e = supplier_edges(li)
    mark = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("u").cast("string"),
                    F.col("v").cast("string"),
                    F.lit("e"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    sparse = e.filter(
        (mark % 10 < 1) | ((F.col("u") % 7 == 0) & (F.col("v") % 7 == 0))
    ).localCheckpoint()
    base = None
    for m in mults:
        em = replicate(sparse, m, ["u", "v"])
        start = time.time()
        n = kcore_nodes(em, 12, rounds=6).count()
        wall = time.time() - start
        if m == mults[0]:
            base = n
        tag = "EXACT" if n == base * m else "MISMATCH"
        print(
            f"kcore x{m}: {wall:.1f} s, core_nodes={n} ({tag} x{m} of base)",
            flush=True,
        )


def negatives_section(spark, sf_dir, mults=(1, 10, 50)):
    """Contrastive-mining envelope: seeded_negatives over ×m replicated
    anchor sets — the draw generator is embarrassingly row-local, so
    wall should be near-flat until the semi-structural stages (dedup
    agg + per-anchor rank window) dominate; row count must be exactly
    linear (k rows per anchor on this corpus: pad absorbs collisions)."""
    from pyspark_etl_twitter_spark.operators.similarity import (
        seeded_negatives,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    base = None
    for m in mults:
        ids = replicate(emb, m, ["vec_id"])
        start = time.time()
        n = seeded_negatives(ids, k=4).count()
        wall = time.time() - start
        if m == mults[0]:
            base = n
        tag = "EXACT" if n == base * m else f"{n} vs {base * m}"
        print(
            f"seeded_negatives x{m}: {wall:.1f} s, rows={n} ({tag})",
            flush=True,
        )


if __name__ == "__main__":
    main()
