"""Registry ordering + completeness contract.

The driver's correctness gate checks the first 50 registry keys, so the
dict order is load-bearing. Standing rule (r5 verdict ask #4): EVERY
window slot is oracle-backed — rows-only queries live in the tail.
Round-7 rule (r6 verdict ask #2): the window is the 48 never-driver-
checked oracles plus the round's 2 new oracle-backed queries; the 4
deferred never-checked variants are pinned to rotate in round 8.
"""

from pyspark_etl_twitter_spark.plans.registry import ORACLES, QUERIES

DRIVER_WINDOW = 50

# the round-7 window: every slot first-time-or-new, all oracle-backed
MUST_BE_IN_WINDOW = {
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_latency_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_variety",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_customers",
    "graph_degree_histogram",
    "graph_triangles_per_node",
    "bloom_join_urgent_revenue",
    "cohort_retention_weekly",
    "session_conversion_rate",
    "asof_forward_next_click",
    "null_safe_join_segments",
    "salted_join_brand_revenue",
    "customers_above_nation_avg",
    "outlier_events_by_type",
    "unpivot_lineitem_measures",
    "percentile_window_customers",
    "stats_aggregates_lineitem",
    "minmax_by_orders",
    "resample_interpolate_hourly",
    "top_terms_per_doc",
    "training_mix_counts",
    "dedup_keep_canonical",
    "vocab_head",
    "encoded_docs",
    "chunk_documents_64",
    "curation_pipeline_counts",
    "epoch_shuffle_head",
    "doc_length_histogram",
    "fuzzy_part_name_pairs",
    "bigram_lm_quality_by_source",
    "semantic_near_dup_pairs",
    "semantic_dedup_survivors",
    "embedding_centroids_by_label",
    "semantic_prune_by_centroid",
    "dedup_minhash_portable_pairs",
    "kmeans_cluster_sizes",
}

# deferred never-driver-checked oracles — MUST enter the round-8 window
# (pinning them here keeps the rotation promise auditable)
ROUND8_ROTATION_QUEUE = {
    "dedup_simhash_portable",  # new in r7, after the window froze
    "dedup_simhash_portable_pairs",  # new in r7, after the window froze
    "dedup_clusters_simhash_portable",  # new in r7, after the window froze
    "dedup_clusters_minhash_portable",  # new in r7, after the window froze
    "knn_ann_lsh",  # oracle added r7; prior driver rows were rows-only
    "knn_ann_lsh_high_recall",  # new in r7: the named preset, oracle-backed
    "knn_ivf",      # oracle added r7; prior driver rows were rows-only
    "knn_ivf_trained",  # new in r7: trained-quantizer IVF, fully verified
    "chunk_documents_overlap_64",
    "asof_nearest_click",
    "bigram_profile_top",
    "source_vocab_overlap_top",
}

# the only queries allowed to lack a SQL oracle (approximate / hash-seeded
# semantics not expressible in ANSI SQL — driver records rows-only). All
# must sit PAST the driver window so they never displace a verifiable row.
ROWS_ONLY_BY_DESIGN = {
    "approx_summary",
    "dedup_minhash_pairs",
    "dedup_simhash_fingerprints",
    "dedup_clusters_minhash",
    # kmeans_cluster_sizes, knn_ann_lsh and knn_ivf left this set in
    # round 7: the fixed-iteration portable fit, the literal-hyperplane/
    # xor-mask LSH oracle, and the first-k-centroid IVF oracle made them
    # DuckDB-expressible despite being "approximate" — the approximation
    # is deterministic, so the oracle replays it exactly.
}


def test_priority_queries_inside_driver_window():
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    assert MUST_BE_IN_WINDOW == window  # exact: all 50 slots accounted for


def test_window_is_fully_oracle_backed():
    window = list(QUERIES)[:DRIVER_WINDOW]
    assert all(k in ORACLES for k in window)


def test_round8_queue_is_oracle_backed_and_out_of_window():
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    assert ROUND8_ROTATION_QUEUE <= set(ORACLES)
    assert not (ROUND8_ROTATION_QUEUE & window)


def test_rows_only_sit_past_the_window():
    window = set(list(QUERIES)[:DRIVER_WINDOW])
    assert not (ROWS_ONLY_BY_DESIGN & window)


def test_rows_only_set_is_exact():
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY_BY_DESIGN


def test_oracles_are_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
