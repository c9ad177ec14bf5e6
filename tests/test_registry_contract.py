"""Registry ordering + completeness contract.

The driver's correctness gate checks the first 50 registry keys, so the
dict order is load-bearing. Rotation is declarative since round 9:
``registry.ROUND13_WINDOW`` is reordered to the front of ``QUERIES`` at
import time and these tests pin its composition.

Round-13 rule (r12 verdict ask #1): the window is the 6 new-in-r13 rows
plus ALL nine remaining r8 rows plus the 35 alphabetically-first r9 rows
— max staleness after r13 is r9 on exactly the thirteen alphabetical-tail
r9 rows (pricing_summary through weekly_revenue_wow), which rotate first
in r14. Four slots are rows-only by design this round (the r9 precedent:
they take slots for the crash/row-drift refresh; their portable twins
are hash-verified).
"""

import pytest

from pyspark_etl_twitter_spark.plans.registry import (
    ORACLES,
    QUERIES,
    ROUND13_WINDOW,
)

DRIVER_WINDOW = 50

# the only queries allowed to lack a SQL oracle (approximate / hash-seeded
# semantics not expressible in ANSI SQL — driver records rows-only). Each
# has a fully-SQL-verified portable twin that IS hash-checked.
ROWS_ONLY_BY_DESIGN = {
    "approx_summary",
    "dedup_minhash_pairs",
    "dedup_simhash_fingerprints",
    "dedup_clusters_minhash",
    # r10: full-corpus SemDeDup under the BLAS pair kernel — NumPy
    # pairwise summation is not provably bit-equal to a SQL fold, so the
    # driver records rows; the fold twin semdedup_cluster_summary IS
    # hash-checked and pytest pins kernel==fold on the same corpus
    "semdedup_fast_summary",
    # r11: BPE train+encode — the iterative merge loop (argmax + fuse
    # per round) has no tractable recursive-CTE form; equality vs a
    # brute-force trainer over the expanded corpus is pinned in
    # tests/test_encoding.py
    "bpe_tokens_by_source",
    # kmeans_cluster_sizes, knn_ann_lsh and knn_ivf left this set in
    # round 7: the fixed-iteration portable fit, the literal-hyperplane/
    # xor-mask LSH oracle, and the first-k-centroid IVF oracle made them
    # DuckDB-expressible despite being "approximate" — the approximation
    # is deterministic, so the oracle replays it exactly.
}


def test_window_is_the_declared_rotation():
    assert list(QUERIES)[:DRIVER_WINDOW] == ROUND13_WINDOW
    assert len(set(ROUND13_WINDOW)) == DRIVER_WINDOW


def test_window_composition_r13():
    """46 of 50 slots oracle-backed; the other 4 are exactly the
    rows-only r9 stale rows taking their scheduled refresh (the r9
    precedent — the driver records rows; their md5 portable twins are
    hash-verified). The 2 new rows lead the window and carry FULL
    oracles."""
    window = list(QUERIES)[:DRIVER_WINDOW]
    assert set(window) & ROWS_ONLY_BY_DESIGN == {
        "approx_summary",
        "dedup_clusters_minhash",
        "dedup_minhash_pairs",
        "dedup_simhash_fingerprints",
    }
    assert all(k in ORACLES for k in window if k not in ROWS_ONLY_BY_DESIGN)
    assert window[:6] == [
        "dedup_incremental_minhash",
        "ann_recall_planted",
        "cusum_hourly_by_type",
        "benford_order_prices",
        "readability_by_source",
        "leakage_safe_split_counts",
    ]


def test_rows_only_is_exactly_the_sanctioned_set():
    no_oracle = {k for k in QUERIES if k not in ORACLES}
    assert no_oracle == ROWS_ONLY_BY_DESIGN


def test_oracles_all_have_query_entries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.slow
def test_window_outputs_are_driver_hashable(spark):
    """No ORACLE-BACKED window query may emit an array/map/struct column:
    the driver's value-hash casts columns to string and Spark vs DuckDB
    render complex types differently (r7: encoded_docs went red on
    array<int> rendering). Also EXECUTES each window query at sf0.001
    (noop write — full plan runs, nothing materializes on the driver):
    schema inspection alone only builds the lazy plan, so runtime
    failures (bad cast at execution, Arrow batch errors in mapInPandas
    paths) would otherwise first surface in the driver's gate (r9
    ADVICE: the old docstring claimed a smoke-run it didn't do)."""
    from tests.conftest import SF_TINY

    for name in list(QUERIES)[:DRIVER_WINDOW]:
        df = QUERIES[name](spark, SF_TINY)
        if name in ORACLES:
            for f in df.schema.fields:
                assert f.dataType.typeName() not in ("array", "map", "struct"), (
                    f"{name}.{f.name} is {f.dataType.simpleString()} — the "
                    f"driver hash-compare cannot render complex types "
                    f"consistently; serialize to string in the query"
                )
        df.write.format("noop").mode("overwrite").save()
