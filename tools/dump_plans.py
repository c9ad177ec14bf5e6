"""Dump formatted physical plans of representative queries to PLANS.md —
inspectable evidence for the pushdown/broadcast/codegen/shuffle claims in
DESIGN.md without running anything.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark_etl_twitter_spark.plans.registry import QUERIES  # noqa: E402
from pyspark_etl_twitter_spark.session import get_session  # noqa: E402

SHOWCASE = [
    ("pricing_summary", "filter+projection pushdown, partial/final hash agg"),
    ("revenue_by_nation", "broadcast dims, shuffle joins on fact keys"),
    ("sentiment_classes", "explode_outer TF, one doc-id shuffle, broadcast weights"),
    ("asof_purchase_click", "as-of as single-pass window (no join)"),
    ("global_top_orders", "TakeOrderedAndProject, no global sort"),
    ("range_join_price_bands", "BroadcastNestedLoopJoin for tiny-dim theta join"),
    ("dedup_minhash_pairs", "shingle explode, min-agg signatures, band bucket join"),
    ("knn_brute_cosine", "broadcast query block, HOF vector math, per-query window"),
    ("bucketed_join_revenue", "zero-exchange sort-merge join over bucketed scans"),
    ("pack_documents_salted_2048", "partitioned cumsum, no single-partition window"),
    ("repetition_stats", "pre-partitioned explodes, map-side-combined counts"),
    ("dedup_incremental", "sha-key anti-join, bodies never shuffled"),
    ("decontaminate_counts", "broadcast eval n-gram probe, corpus never shuffles"),
    ("epoch_shuffle_head", "bucketed global index, no single-partition window"),
    ("rolling_1h_event_stats", "one RANGE-frame window node, exprs share the spec"),
    ("fuzzy_part_name_pairs", "blocked levenshtein equi-join over distinct vocab"),
    ("resample_ffill_hourly", "spine explode + per-group forward-fill window"),
    ("hash_split_counts", "row-local md5 bucket split, one tiny aggregate"),
    ("outlier_events_by_type", "median/MAD stats broadcast back, fact never shuffles"),
    ("unpivot_lineitem_measures", "native unpivot: Expand node, single scan"),
    ("percentile_window_customers", "two window specs share one hash exchange"),
    ("semantic_near_dup_pairs", "portable-plane LSH bucket equi-join + cosine verify"),
    # round-3 additions
    ("funnel_view_click_purchase", "chained conditional window mins: one events exchange per funnel"),
    ("binned_range_join_bands", "interval containment as bin equi-join (no nested loop)"),
    ("bm25_search_topk", "hits-only explode, broadcast scalars, TakeOrdered top-k"),
    ("bigram_lm_quality_by_source", "zip_with pair explode, broadcast model tables"),
    ("semantic_prune_by_centroid", "broadcast centroid table, corpus never shuffles"),
    ("tpch_q6_forecast_revenue", "all predicates pushed, single-row global agg"),
    ("resample_interpolate_hourly", "both frame windows share one group exchange"),
    ("weighted_sample_by_length", "row-local exact-integer inclusion filter"),
    # round-4 additions
    ("tpch_q2_min_cost_supplier", "derived partsupp (no shuffle), decorrelated min-agg, broadcast dims"),
    ("tpch_q20_excess_stock", "correlated agg → grouped join, left-semi suppkey carry"),
    ("fuzzy_decontaminate_counts", "broadcast eval shingles, max-Jaccard on matches only"),
    ("budget_selection_by_source", "per-source window cumsum, parallel across sources"),
    ("temperature_mix_counts", "tiny per-source rate broadcast, row-local md5 filter"),
    # round-5 additions
    ("script_profile_by_source", "narrow regexp length-diff fractions, one hash agg"),
    ("hashed_embedding_profile", "md5 feature-hash explode, map-side-combined (id, bucket) agg"),
    ("text_embedding_near_dup", "embed -> dense map assembly -> plane buckets -> cosine verify, all codegen"),
    ("sessionize_events_chunked", "(user, day)-chunked windows + piece-merge: no giant window partition"),
    ("running_revenue_chunked", "chunk-local cumsum + per-chunk offset join in integer cents"),
    ("bigram_profile_top", "gated fan-out: no corpus exchange on wide input, gram agg map-side combines"),
    # round-7 additions
    ("dedup_minhash_portable_pairs", "md5 signatures, string band keys, star-guard window over the band shuffle"),
    ("kmeans_cluster_sizes", "portable fixed-iteration fit: broadcast-literal argmin, posexplode re-center"),
    ("knn_ann_lsh", "OR-table posexplode, broadcast multi-probe queries, narrow dedup before rank"),
    ("knn_ivf", "broadcast centroid dim, probe top-n lists, list equi-join verify"),
    # round-10 additions
    ("dedup_segments_rebuild", "segment keep-first: partial_min struct agg (no window, no join-back), position-sorted reassembly"),
    ("semdedup_cluster_summary", "k-means cells, within-cluster residual-cosine SMJ, norms precomputed per row"),
    # round-11 additions
    ("dsir_weights_by_source", "md5 gram buckets, broadcast B-row dlog table, partial-agg per-doc sums"),
    ("gopher_rules_by_source", "published ruleset as exact-integer column pass: zero joins, one agg exchange"),
    ("semdedup_ivf_summary", "pruned per-list pair scan over the persisted hive-partitioned index"),
    # round-12 additions
    ("knn_ivfpq_indexed", "partition-pruned codes-only scan, BroadcastHashJoin probe, LUT fold"),
    ("bpe_encoded_fixed_merges", "BPE encode as a codegen replace chain: zero exchanges before the agg"),
    ("gopher_line_rules_by_source", "planted multi-line reshape + line rules, all codegen, one agg exchange"),
    # round-12 session-2 additions
    ("dedup_span_removal_by_source", "gram-fingerprint count agg (never pairs), flagged-start join-back, HOF rebuild"),
    ("c4_rules_by_source", "C4 line+doc rules as one codegen pass over the planted reshape"),
    ("cms_heavy_hitters", "depth-stacked md5 buckets, map-side-combined cells, bounded rank window"),
    ("ks_drift_order_prices", "corpus -> distinct-value relation in one shuffle, ECDF window on the bounded frontier"),
    ("kmv_profile_prices", "distinct collapse, bottom-k rank over the value domain, estimators ride along"),
    ("knn_rp_topk", "literal-matrix JL projection in codegen, reduced-space broadcast-query scan"),
    # round-13 additions
    ("dedup_incremental_minhash", "band-probe semi-join against the persisted signature store, verify colliding candidates only"),
    ("ann_recall_planted", "five ANN rungs + exact over the portable planted-blob relation in one union scoreboard"),
    ("cusum_hourly_by_type", "exact cents-division means, per-group array fold, q6-floor outputs (no engine-discretionary rounding)"),
    ("benford_order_prices", "integer-cents leading-digit agg, zero-filled digit frame, order-free max-deviation"),
    ("readability_by_source", "regexp word/sentence/syllable counting in one codegen pass, one agg exchange"),
    ("leakage_safe_split_counts", "near-dup-cluster-keyed md5 split: LSH pairs -> connected components -> row-local buckets"),
    ("dedup_minhash_maintenance", "persisted store lifecycle: build -> prefiltered append-probe -> CC rebuild, all from stored relations"),
    ("dedup_cdc_rebuild", "content-defined chunking: codegen rolling-hash boundaries, map-side-combined keep-first, doc-bounded reassembly"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="dump_plans", master="local[8]", shuffle_partitions=8)
    out = ["# PLANS — formatted physical plans of showcase queries",
           "",
           f"Generated by tools/dump_plans.py at {sf_dir}. See DESIGN.md §3 for",
           "the shuffle-discipline rules these plans demonstrate.", ""]
    # Build-vs-probe walls (r12 verdict ask #3): the persisted-index
    # HEADLINE rows time build + append + probe in ONE row for driver
    # hashing; at 100 TB the build amortizes and only the probe (or the
    # per-batch append) recurs. Surface the split here so a reader of the
    # probe plans below sees the recurring wall, not the fused row total.
    import json

    try:
        detail = json.loads(Path("BENCH_DETAIL.json").read_text())
    except (OSError, ValueError):
        detail = {}
    split = detail.get("build_probe_split", {})
    if split:
        out += [
            "## Build vs probe walls (sf0.1, BENCH_DETAIL.json build_probe_split)",
            "",
            "Fused lifecycle rows amortize their build at scale; the recurring",
            "per-query / per-batch cost is the probe wall:",
            "",
        ]
        for k, v in sorted(split.items()):
            out.append(
                f"- `{k}`: build {v['build_sec']} s (once per corpus), "
                f"probe {v['probe_sec']} s (recurring)"
            )
        out.append("")
    gw = detail.get("global_windows", {})
    if gw.get("spec_twin"):
        out += [
            "Deliberate bounded-frontier global windows (spec twins — their",
            "window input is a value-domain relation, not the corpus): "
            + ", ".join(f"`{k}`" for k in sorted(gw["spec_twin"]))
            + ". Any other row planning an unpartitioned window fails the",
            "bench audit (`global_windows.unexpected`).",
            "",
        ]
    import contextlib
    import io

    for name, why in SHOWCASE:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*{why}*", "", "```", buf.getvalue().strip(), "```", ""]
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
