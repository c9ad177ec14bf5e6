"""Registry ordering + completeness contract.

The driver's correctness gate checks the first 50 registry keys, so the
dict order is load-bearing. Rotation is declarative since round 9:
``registry.ROUND15_WINDOW`` is reordered to the front of ``QUERIES`` at
import time and these tests pin its composition.

Round-15 rule (r14 verdict ask #2): the window is the 19 rows whose
newest driver row is r10 — the staleness-histogram tail, including
semdedup_fast_summary's twice-displaced ROWS-ONLY refresh (the one
sanctioned no-oracle slot this round) — plus the 31 alphabetically-
first oracle-backed r11 rows. Max staleness after r15 is r11 on the 19
remaining r11 rows (bpe_tokens_by_source, the tpch_q13-q22 block and
friends), which rotate first in r16.
"""

import pytest

from pyspark_etl_twitter_spark.plans.registry import (
    ORACLES,
    QUERIES,
    ROUND15_WINDOW,
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
    assert list(QUERIES)[:DRIVER_WINDOW] == ROUND15_WINDOW
    assert len(set(ROUND15_WINDOW)) == DRIVER_WINDOW


def test_window_composition_r15():
    """49 of 50 slots oracle-backed; the ONE sanctioned rows-only slot is
    semdedup_fast_summary — the r10-stale rows-only refresh displaced in
    both r13 and r14, leading the window at last. The other 18 r10-stale
    rows follow it, then the 31 alphabetically-first oracle-backed r11
    rows fill the window."""
    window = list(QUERIES)[:DRIVER_WINDOW]
    assert set(window) & ROWS_ONLY_BY_DESIGN == {"semdedup_fast_summary"}
    assert all(k in ORACLES for k in window if k != "semdedup_fast_summary")
    assert window[0] == "semdedup_fast_summary"


def test_rows_only_is_exactly_the_sanctioned_set():
    no_oracle = {k for k in QUERIES if k not in ORACLES}
    assert no_oracle == ROWS_ONLY_BY_DESIGN


def test_oracles_all_have_query_entries():
    assert set(ORACLES) <= set(QUERIES)


def test_doc_counts_match_live_registry():
    """README.md and COVERAGE.md advertise registry totals; they drifted
    in r14 (216/210 vs the live 219/213 — r14 verdict ask #6). Pin the
    documented numbers to ``len(QUERIES)`` / ``len(ORACLES)`` so any new
    row forces the doc update in the same commit."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    expect = (
        f"{len(QUERIES)} queries, {len(ORACLES)} with DuckDB oracle twins"
    )
    for doc in ("README.md", "COVERAGE.md"):
        text = (root / doc).read_text()
        m = re.search(r"(\d+) queries, (\d+) with DuckDB oracle twins", text)
        assert m, f"{doc} lost its registry-totals line"
        assert m.group(0) == expect, (
            f"{doc} says '{m.group(0)}' but the live registry is "
            f"'{expect}' — update the doc"
        )
    cov = (root / "COVERAGE.md").read_text()
    m = re.search(r"oracle twins, (\d+)\b", cov)
    assert m and int(m.group(1)) == len(QUERIES) - len(ORACLES), (
        "COVERAGE.md rows-only count drifted from the live registry"
    )


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
