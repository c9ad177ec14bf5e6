"""Johnson-Lindenstrauss random-projection rung (operators/similarity.py).

Random synthetic embeddings are the ADVERSARIAL case for JL recall —
neighbors are near-ties, so small distortions reorder them (the same
honest-random-data phenomenon documented for the PQ family). The tests
therefore pin (1) exactness of the projection itself, (2) the JL
DISTORTION envelope (the property the lemma actually guarantees, ~c/√d'
on cosine error), and (3) an honest recall floor at the default rung."""

import numpy as np
import pytest


def _X(spark, n=100):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.limit(n).select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_rp_project_is_the_exact_literal_matmul(spark):
    """rp_project on basis vectors returns the projection-matrix columns
    bit-exactly (left-fold over zeros + one product has no rounding)."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.similarity import (
        rp_matrix,
        rp_project,
    )

    dim, od = 6, 3
    planes = rp_matrix(dim, od, seed=123)
    basis = [(i, [1.0 if j == i else 0.0 for j in range(dim)]) for i in range(dim)]
    df = spark.createDataFrame(basis, "i int, v array<double>")
    got = {
        r.i: r.p
        for r in df.select(
            "i", rp_project(F.col("v"), planes).alias("p")
        ).collect()
    }
    for i in range(dim):
        assert got[i] == [planes[r][i] for r in range(od)]


def test_rp_distortion_envelope_and_monotonicity(spark):
    """Mean |cos_reduced - cos_exact| over 100 corpus vectors stays
    under 1.3/sqrt(out_dim) and shrinks as out_dim grows (measured
    0.288 / 0.195 / 0.138 at 8/16/32 — the ~1/sqrt(d') JL scaling)."""
    from pyspark_etl_twitter_spark.operators.similarity import rp_matrix

    X = _X(spark)

    def mean_err(od):
        R = np.array(rp_matrix(64, od, 31))
        Y = X @ R.T

        def cos(M):
            n = np.linalg.norm(M, axis=1, keepdims=True)
            return (M @ M.T) / (n * n.T)

        iu = np.triu_indices(len(X), 1)
        return float(np.abs(cos(X)[iu] - cos(Y)[iu]).mean())

    errs = {od: mean_err(od) for od in (8, 16, 32)}
    for od, e in errs.items():
        assert e <= 1.3 / np.sqrt(od), (od, e)
    assert errs[8] > errs[16] > errs[32]


@pytest.mark.slow
def test_rp_topk_recall_floor_and_oracle_shape(spark):
    """Honest random-data recall floor at the default rung (measured
    0.14 at out_dim=16 on the synthetic corpus — near-tie neighbors are
    JL's worst case; real clustered embeddings fare far better), plus
    the result-shape contract shared with the exact/ANN kNN rows."""
    from pyspark_etl_twitter_spark.operators.similarity import (
        cosine_topk,
        rp_cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rp = rp_cosine_topk(emb, n_queries=10, k=5).collect()
    ex = cosine_topk(emb, n_queries=10, k=5).collect()
    assert len(rp) == 50 and {r.q_id for r in rp} == set(range(10))
    got = {(r.q_id, r.neighbor_id) for r in rp}
    want = {(r.q_id, r.neighbor_id) for r in ex}
    recall = len(got & want) / len(want)
    assert recall >= 0.10, recall


def test_hard_negative_topk_label_filter(spark):
    """Hard negatives: neighbors share no label with their query; ranks
    are per-query dense 1..k over the different-label pool; a planted
    near-duplicate with the SAME label is excluded even though it is the
    global nearest neighbor."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.similarity import (
        hard_negative_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.filter(F.col("vec_id") < 10).collect()}
    out = hard_negative_topk(emb, n_queries=10, k=5).collect()
    assert len(out) == 50
    by_q = {}
    neighbor_labels = {
        r.vec_id: r.label
        for r in emb.select("vec_id", "label").collect()
    }
    for r in out:
        assert r.neg_label != labels[r.q_id]
        assert neighbor_labels[r.neighbor_id] == r.neg_label
        by_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())

    # planted same-label twin: nearest overall but NOT a hard negative
    twin = emb.filter(F.col("vec_id") == 0).select(
        F.lit(999_999).cast("long").alias("vec_id"),
        "embedding",
        "label",
    )
    emb2 = emb.unionByName(twin)
    out2 = hard_negative_topk(emb2, n_queries=1, k=5).collect()
    assert all(r.neighbor_id != 999_999 for r in out2)


def test_seeded_negatives_contract(spark):
    """Seeded negatives: deterministic across runs, no self-hits, no
    duplicate (anchor, neg) pairs, k rows per anchor (pad absorbed all
    collisions on this corpus), draws strictly increasing per anchor."""
    from pyspark_etl_twitter_spark.operators.similarity import (
        seeded_negatives,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(
        (r.anchor_id, r.neg_id, r.draw)
        for r in seeded_negatives(emb, k=4).collect()
    )
    b = sorted(
        (r.anchor_id, r.neg_id, r.draw)
        for r in seeded_negatives(emb, k=4).collect()
    )
    assert a == b and len(a) == 4 * 500
    assert all(anchor != neg for anchor, neg, _ in a)
    assert len({(x, y) for x, y, _ in a}) == len(a)
    # different seed -> different draws somewhere
    c = sorted(
        (r.anchor_id, r.neg_id, r.draw)
        for r in seeded_negatives(emb, k=4, seed=98).collect()
    )
    assert c != a
