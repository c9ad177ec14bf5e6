"""Registry ordering + completeness contract.

The driver's correctness gate checks the first 50 registry keys, so the
dict order is load-bearing. Rotation is declarative since round 9:
``registry.ROUND9_WINDOW`` is reordered to the front of ``QUERIES`` at
import time and these tests pin its composition.

Round-9 rule (r8 verdict asks #3/#7): slots 1-4 are the four
rows-only-by-design queries — their newest driver rows dated to r05, and
rows-only checks still catch crashes/row-count drift in the xxhash64
fast paths and sketch aggregates (the r5-era "window is 100%
oracle-backed" rule is deliberately relaxed for exactly these four).
Slots 5-50 are the 46 stalest oracle-backed greens from the cumulative
CORRECTNESS_r0*.json book (1×r3, 8×r4, 5×r5, 32×r6), so after r9 no
registry query's newest driver row is older than r6.
"""

import pytest

from pyspark_etl_twitter_spark.plans.registry import (
    ORACLES,
    QUERIES,
    ROUND9_WINDOW,
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
    # kmeans_cluster_sizes, knn_ann_lsh and knn_ivf left this set in
    # round 7: the fixed-iteration portable fit, the literal-hyperplane/
    # xor-mask LSH oracle, and the first-k-centroid IVF oracle made them
    # DuckDB-expressible despite being "approximate" — the approximation
    # is deterministic, so the oracle replays it exactly.
}


def test_window_is_the_declared_rotation():
    assert list(QUERIES)[:DRIVER_WINDOW] == ROUND9_WINDOW
    assert len(set(ROUND9_WINDOW)) == DRIVER_WINDOW


def test_window_composition_r9():
    """4 rows-only refresh slots (stale since r05) + 46 oracle-backed."""
    window = list(QUERIES)[:DRIVER_WINDOW]
    assert set(window[:4]) == ROWS_ONLY_BY_DESIGN
    assert all(k in ORACLES for k in window[4:])


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
    array<int> rendering). The four rows-only slots are exempt — the
    driver only row-counts them. Runs each window query at sf0.001 and
    inspects the schema, so it also smoke-runs the whole window."""
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
