"""Graph operators: known-answer fixtures + brute-force parity.

The registry oracle check covers the lineitem-derived graph; these tests
pin the operators on graphs whose answers are computable by hand and by
an all-triples brute force, including skew (star) and tie-degree shapes.
"""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators import graph as G


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in pairs], "u long, v long"
    ).distinct()


def _brute_triangles(pairs):
    es = {(min(u, v), max(u, v)) for u, v in pairs}
    nodes = sorted({n for e in es for n in e})
    return sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def test_triangle_count_k4(spark):
    # complete graph K4: C(4,3) = 4 triangles
    k4 = _edges_df(spark, list(combinations(range(4), 2)))
    assert G.triangle_count(k4).collect()[0].n_triangles == 4


def test_triangle_count_star_has_none(spark):
    # star = worst-case skew, zero triangles; orientation keeps the hub's
    # out-degree 0 (hub has max degree), so wedges are empty too
    star = _edges_df(spark, [(0, i) for i in range(1, 30)])
    assert G.triangle_count(star).collect()[0].n_triangles == 0


def test_triangle_count_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    pairs = {
        (a, b)
        for _ in range(120)
        for a, b in [sorted(rng.sample(range(18), 2))]
    }
    df = _edges_df(spark, pairs)
    assert (
        G.triangle_count(df).collect()[0].n_triangles == _brute_triangles(pairs)
    )


def test_triangles_per_node_triangle_plus_tail(spark):
    # triangle 0-1-2 with a pendant 3: corners get 1 each, pendant absent
    df = _edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    rows = {r.node: r.n_triangles for r in G.triangles_per_node(df).collect()}
    assert rows == {0: 1, 1: 1, 2: 1}


def test_degree_histogram(spark):
    # path 0-1-2-3: degrees 1,2,2,1 → {1: 2, 2: 2}
    df = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    rows = {r.degree: r.n_nodes for r in G.degree_histogram(df).collect()}
    assert rows == {1: 2, 2: 2}


def test_supplier_edges_bounded_fanout_and_dedup(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 11), (2, 10), (2, 11), (3, 12)],
        "l_orderkey long, l_suppkey long",
    )
    rows = {(r.u, r.v) for r in G.supplier_edges(li).collect()}
    # duplicate lineitems and the repeated (10,11) pair across orders
    # collapse to one edge; singleton order 3 contributes nothing
    assert rows == {(10, 11)}


def test_oriented_edges_cap_out_degree(spark):
    # lollipop: K4 on {0..3} plus hub 0 connected to 10 leaves — the
    # hub's high degree must orient K4 edges TOWARD it, not from it
    pairs = list(combinations(range(4), 2)) + [(0, i) for i in range(10, 20)]
    oe = G.oriented_edges(_edges_df(spark, pairs))
    out_deg = {
        r.src: r.n for r in oe.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    # leaves (degree 1) point at the hub; hub (max degree) emits nothing
    assert 0 not in out_deg


def test_pagerank_mass_and_hub_ordering(spark):
    """Σ pagerank ≈ 1 (rounded trajectory → tolerate n·1e-9), and on a
    star graph the hub out-ranks every leaf."""
    from pyspark_etl_twitter_spark.operators.graph import pagerank_portable

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "u long, v long"
    )
    pr = {r["node"]: r["pagerank"] for r in pagerank_portable(star).collect()}
    assert abs(sum(pr.values()) - 1.0) < 9 * 1e-6
    hub = pr.pop(0)
    assert all(hub > v for v in pr.values()), (hub, pr)
    assert len(set(pr.values())) == 1  # leaves symmetric → equal ranks


def test_pagerank_uniform_on_regular_graph(spark):
    """On a cycle (2-regular), PageRank is exactly uniform at every
    iteration — each node's rank must equal 1/N on the rounding grid."""
    from pyspark_etl_twitter_spark.operators.graph import pagerank_portable

    n = 10
    cyc = spark.createDataFrame(
        [(min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)],
        "u long, v long",
    )
    pr = pagerank_portable(cyc).collect()
    assert len(pr) == n
    for r in pr:
        assert abs(r["pagerank"] - 0.1) < 1e-8, r


def test_kcore_planted_clique_and_background_peel(spark):
    """k-core on a hand-planted graph: a 4-clique (k=3 core) plus a
    pendant chain — the peel erases the chain (degrees < 3 cascade) and
    returns exactly the clique with internal degree 3; rounds past the
    fixpoint are no-ops; checkpoint placement is value-neutral."""
    from pyspark_etl_twitter_spark.operators.graph import kcore_nodes

    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6), (6, 7)]
    edges = spark.createDataFrame(clique + chain, "u long, v long")

    got = {
        r.node: r.degree for r in kcore_nodes(edges, 3, rounds=4).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    # extra rounds are no-ops at the fixpoint
    got6 = {
        r.node: r.degree for r in kcore_nodes(edges, 3, rounds=6).collect()
    }
    assert got6 == got

    # checkpoint cadence cannot change values
    got_nc = {
        r.node: r.degree
        for r in kcore_nodes(edges, 3, rounds=4, checkpoint_every=0).collect()
    }
    assert got_nc == got

    # k above the max core -> empty
    assert kcore_nodes(edges, 4, rounds=4).count() == 0
