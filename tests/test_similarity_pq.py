"""Product-quantization (PQ/ADC) pins: encode vs a NumPy oracle, ADC
ranking vs a NumPy oracle, quality floor vs exact L2 ranking, and the
bounded-collect guards. The end-to-end DuckDB replay is the driver's
``knn_pq_adc`` oracle; these tests pin the pieces independently."""

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.similarity import (
    ann_recall_at_k,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)
from tests.conftest import SF_TINY

M, KSUB = 8, 16


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_TINY}/embeddings.parquet")


def _np_corpus(emb):
    rows = sorted(emb.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def _np_books(mat):
    dsub = mat.shape[1] // M
    # books[s][j] = slice s of vector j — mirror of pq_codebooks
    return np.stack(
        [mat[:KSUB, s * dsub : (s + 1) * dsub] for s in range(M)]
    )  # (M, KSUB, dsub)


def _np_encode(mat, books):
    dsub = mat.shape[1] // M
    codes = np.empty((mat.shape[0], M), dtype=np.int64)
    for s in range(M):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        d = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)  # np argmin ties → lowest j, same rule
    return codes


def test_pq_codebooks_are_first_k_slices(emb):
    ids, mat = _np_corpus(emb)
    books = pq_codebooks(emb, m=M, ksub=KSUB)
    assert np.allclose(np.array(books), _np_books(mat))


def test_pq_encode_matches_numpy_argmin(emb):
    ids, mat = _np_corpus(emb)
    want = _np_encode(mat, _np_books(mat))
    got = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(emb, pq_codebooks(emb, m=M, ksub=KSUB)).collect()
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert list(want[i]) == got[vid], vid


def test_pq_adc_topk_matches_numpy_adc(emb):
    ids, mat = _np_corpus(emb)
    books = _np_books(mat)
    codes = _np_encode(mat, books)
    nq, k = 8, 5
    rows = []
    for qi in range(nq):
        dsub = mat.shape[1] // M
        lut = np.stack(
            [
                ((mat[qi, s * dsub : (s + 1) * dsub][None, :] - books[s]) ** 2).sum(
                    axis=1
                )
                for s in range(M)
            ]
        )  # (M, KSUB)
        adc = lut[np.arange(M)[None, :], codes].sum(axis=1)
        order = [
            (round(adc[i], 6), int(ids[i]))
            for i in range(len(ids))
            if ids[i] != ids[qi]
        ]
        order.sort()
        for rank, (d, nid) in enumerate(order[:k], start=1):
            rows.append((int(ids[qi]), nid, d, rank))
    got = sorted(
        (r.q_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in pq_adc_topk(emb, m=M, ksub=KSUB, n_queries=nq, k=k).collect()
    )
    assert got == sorted(rows)


def test_pq_recall_floor_vs_exact_l2(emb):
    """m=8/ksub=16 on 64-dim RANDOM data measured recall@5 = 0.25 vs the
    exact L2 ranking ADC approximates (docstring figure). Pin a floor of
    0.2 — a broken LUT/encode collapses to ~chance (5/500 = 0.01)."""
    base = emb.select("vec_id", F.col("embedding").alias("e"))
    q = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("e"),
            F.col("qe"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), F.round(d2, 6).alias("d"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d").asc(), F.col("neighbor_id"))
    exact = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    r = ann_recall_at_k(pq_adc_topk(emb), exact, k=5).collect()[0]
    assert r["n_queries"] == 8
    assert r["recall_at_k"] >= 0.2, r["recall_at_k"]


def test_pq_guards(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(emb, m=7)
    with pytest.raises(ValueError, match="< ksub"):
        pq_codebooks(emb.filter(F.col("vec_id") < 4), ksub=16)
    with pytest.raises(ValueError, match="MAX_PANDAS_QUERIES"):
        pq_adc_topk(emb, n_queries=10_001)


def test_pq_plan_has_no_join_and_no_python(emb):
    """The deliberate plan shape: encode + ADC is a narrow generate/project
    pipeline — no join of any kind, no Python, one window exchange."""
    plan = (
        pq_adc_topk(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Join", "CartesianProduct", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad
    assert "Generate" in plan


def test_pq_encode_pandas_equals_codegen(emb):
    """Arrow twin ≡ codegen fold, code for code (same float64 math, same
    lowest-j tie rule; dsub=8 keeps NumPy's summation sequential, so the
    sub-distances are bit-identical)."""
    from pyspark_etl_twitter_spark.operators.similarity import pq_encode_pandas

    books = pq_codebooks(emb, m=M, ksub=KSUB)
    a = {r["vec_id"]: r["codes"] for r in pq_encode(emb, books).collect()}
    b = {r["vec_id"]: r["codes"] for r in pq_encode_pandas(emb, books).collect()}
    assert a == b


def test_ivfpq_matches_numpy_pipeline(emb):
    """Full IVF-PQ replay in NumPy: L2 argmin assignment → residual
    codebooks from the first-16 residuals → residual encode → per-(query,
    probed-list) LUT → ADC rank. Pins the Spark composite end to end
    (the driver's DuckDB oracle is the cross-engine twin of this)."""
    from pyspark_etl_twitter_spark.operators.similarity import ivfpq_topk

    ids, mat = _np_corpus(emb)
    n_lists, m, ksub, n_probe, nq, k = 16, 8, 16, 4, 8, 5
    dsub = mat.shape[1] // m
    cents = mat[:n_lists]
    cd = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (N, L)
    assign = cd.argmin(axis=1)
    res = mat - cents[assign]
    books = np.stack(
        [res[:ksub, s * dsub : (s + 1) * dsub] for s in range(m)]
    )  # (m, ksub, dsub)
    codes = np.empty((mat.shape[0], m), dtype=np.int64)
    for s in range(m):
        sub = res[:, s * dsub : (s + 1) * dsub]
        codes[:, s] = (
            ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        ).argmin(axis=1)
    rows = []
    for qi in range(nq):
        probed = np.argsort(cd[qi], kind="stable")[:n_probe]
        cand = []
        for l in probed:
            qres = mat[qi] - cents[l]
            lut = np.stack(
                [
                    (
                        (qres[s * dsub : (s + 1) * dsub][None, :] - books[s])
                        ** 2
                    ).sum(axis=1)
                    for s in range(m)
                ]
            )
            for i in np.nonzero(assign == l)[0]:
                if ids[i] == ids[qi]:
                    continue
                d = lut[np.arange(m), codes[i]].sum()
                cand.append((round(float(d), 6), int(ids[i])))
        cand.sort()
        for rank, (d, nid) in enumerate(cand[:k], start=1):
            rows.append((int(ids[qi]), nid, d, rank))
    got = sorted(
        (r.q_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in ivfpq_topk(emb).collect()
    )
    assert got == sorted(rows)


def test_ivfpq_plan_shape(emb):
    """Probe set joins as a broadcast EQUI-join on list_id — no nested
    loop, no cartesian, no Python anywhere in the plan."""
    from pyspark_etl_twitter_spark.operators.similarity import ivfpq_topk

    plan = ivfpq_topk(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "BatchEvalPython"):
        assert bad not in plan, bad


def test_ivfpq_recall_floor(emb):
    """Measured recall@5 vs exact L2: 0.15 at sf0.001 (n_probe=4 of 16
    lists prunes 75% of candidates — on RANDOM data true neighbors are
    uniform across lists, so the candidate cut itself bounds recall near
    the probe fraction; flat PQ over the full corpus measures 0.25).
    Floor 0.1 catches a broken residual/LUT (→ ~chance, 0.01)."""
    from pyspark_etl_twitter_spark.operators.similarity import ivfpq_topk

    base = emb.select("vec_id", F.col("embedding").alias("e"))
    q = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("e"),
            F.col("qe"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), F.round(d2, 6).alias("d"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d").asc(), F.col("neighbor_id"))
    exact = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    r = ann_recall_at_k(ivfpq_topk(emb), exact, k=5).collect()[0]
    assert r["recall_at_k"] >= 0.1, r["recall_at_k"]


def test_pq_train_improves_reconstruction(emb):
    """Trained codebooks must beat the first-k seeds on reconstruction
    MSE (measured 0.752 → 0.562 at iters=3), and each Lloyd iteration
    must not make it worse (rounded trajectory → tolerate 1e-9 slack)."""
    from pyspark_etl_twitter_spark.operators.similarity import (
        pq_reconstruction_mse,
        pq_train_codebooks,
    )

    seed_mse = pq_reconstruction_mse(emb, pq_codebooks(emb, m=M, ksub=KSUB))
    prev = seed_mse
    for it in (1, 2, 3):
        mse = pq_reconstruction_mse(
            emb, pq_train_codebooks(emb, m=M, ksub=KSUB, iters=it)
        )
        assert mse <= prev + 1e-9, (it, prev, mse)
        prev = mse
    assert prev < seed_mse * 0.9, (seed_mse, prev)


def test_pq_train_update_is_cluster_mean(emb):
    """One iteration's codebook entries equal the 6dp-rounded per-cluster
    means of the seed assignment, empty clusters carrying their seed —
    replayed in NumPy."""
    from pyspark_etl_twitter_spark.operators.similarity import pq_train_codebooks

    ids, mat = _np_corpus(emb)
    books0 = np.round(_np_books(np.round(mat, 6)), 6)  # engine rounds seeds
    dsub = mat.shape[1] // M
    want = books0.copy()
    for s in range(M):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        d = ((sub[:, None, :] - books0[s][None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(KSUB):
            members = sub[a == j]
            if len(members):
                want[s][j] = np.round(members.mean(axis=0), 6)
    got = np.array(pq_train_codebooks(emb, m=M, ksub=KSUB, iters=1))
    assert np.allclose(got, want, atol=1e-12)


def _r6(x):
    """Spark F.round semantics for doubles: HALF_UP on the shortest
    decimal repr (java BigDecimal.valueOf) — Python round() is banker's
    and diverges on exact .5 boundaries at the target scale."""
    import decimal

    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _np_mmr(ids, mat, nq=8, pool=20, k=5, lam=0.7):
    nrm = np.linalg.norm(mat, axis=1)
    out = []
    for qi in range(nq):
        rel = {}
        for i in range(len(ids)):
            if ids[i] == ids[qi]:
                continue
            rel[int(ids[i])] = _r6(mat[i] @ mat[qi] / (nrm[i] * nrm[qi]))
        cand = sorted(rel, key=lambda c: (-rel[c], c))[:pool]
        idx = {int(ids[i]): i for i in range(len(ids))}
        sim = {
            (a, b): _r6(
                mat[idx[a]] @ mat[idx[b]] / (nrm[idx[a]] * nrm[idx[b]])
            )
            for a in cand
            for b in cand
            if a != b
        }
        sel = [min(cand, key=lambda c: (-rel[c], c))]
        out.append((int(ids[qi]), sel[0], _r6(rel[sel[0]]), 1))
        for rank in range(2, k + 1):
            rest = [c for c in cand if c not in sel]
            score = {
                c: lam * rel[c] - (1 - lam) * max(sim[(c, s)] for s in sel)
                for c in rest
            }
            pick = min(rest, key=lambda c: (-score[c], c))
            sel.append(pick)
            out.append((int(ids[qi]), pick, _r6(score[pick]), rank))
    return sorted(out)


def test_mmr_matches_numpy_greedy(emb):
    """Spark's unrolled greedy ≡ a NumPy replay with the same 6dp
    rounding and (score desc, id) tie rule — the driver's DuckDB oracle
    is the cross-engine twin of this."""
    from pyspark_etl_twitter_spark.operators.similarity import mmr_topk

    ids, mat = _np_corpus(emb)
    got = sorted(
        (r.q_id, r.neighbor_id, r.mmr_score, r.rank)
        for r in mmr_topk(emb).collect()
    )
    assert got == _np_mmr(ids, mat)


def test_mmr_splits_planted_twins(spark):
    """A query with two near-identical top candidates: plain top-k takes
    both back to back; MMR must take one, then something diverse, and
    never place the twin second."""
    from pyspark_etl_twitter_spark.operators.similarity import mmr_topk

    rng = np.random.default_rng(7)
    q = rng.normal(size=8)
    twin_a = q + rng.normal(scale=0.01, size=8)
    twin_b = twin_a + rng.normal(scale=0.001, size=8)  # ~identical to a
    # a moderately-relevant DIVERSE doc: half query direction, half
    # orthogonal noise — rel ≈ 0.7, near-zero sim to the twins' residual
    diverse = 0.5 * q + rng.normal(scale=np.linalg.norm(q) * 0.5, size=8)
    rows = [(0, [float(x) for x in q]), (10, [float(x) for x in twin_a]),
            (11, [float(x) for x in twin_b]),
            (12, [float(x) for x in diverse])]
    for i in range(13, 30):
        rows.append((i, [float(x) for x in rng.normal(size=8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.rank: r.neighbor_id
        for r in mmr_topk(df, n_queries=1, pool=10, k=3, lam=0.5).collect()
    }
    assert got[1] in (10, 11)
    # λ=0.5: the un-picked twin scores ~0.5·rel − 0.5·(sim≈1) ≈ 0 —
    # any positively-relevant diverse doc must outrank it at stage 2
    assert got[2] not in (10, 11), got


def test_sq8_near_lossless_recall(emb):
    """8-bit scalar quantization is near-lossless for ranking: recall@5
    vs exact cosine top-k must be ≥ 0.95 (measured 1.0 at sf0.001)."""
    from pyspark_etl_twitter_spark.operators.similarity import (
        cosine_topk,
        sq8_topk,
    )

    exact = cosine_topk(emb, n_queries=10, k=5)
    r = ann_recall_at_k(sq8_topk(emb), exact, k=5).collect()[0]
    assert r["n_queries"] == 10
    assert r["recall_at_k"] >= 0.95, r["recall_at_k"]


def test_sq8_codes_and_constant_dims(spark):
    """Codes stay in [0, 255]; min maps to 0, max to 255; a CONSTANT
    dimension (hi == lo) encodes 0 and dequantizes back to exactly lo."""
    from pyspark_etl_twitter_spark.operators.similarity import (
        sq8_encode,
        sq8_params,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 7.5]), (1, [1.0, 7.5]), (2, [0.25, 7.5])],
        "vec_id long, embedding array<float>",
    )
    lo, hi = sq8_params(df)
    assert lo == [0.0, 7.5] and hi == [1.0, 7.5]
    got = {r["vec_id"]: r["codes"] for r in sq8_encode(df, lo, hi).collect()}
    assert got[0] == [0, 0] and got[1] == [255, 0]
    assert got[2][0] == 64  # round(0.25*255) HALF_UP
    step = (hi[0] - lo[0]) / 255.0
    assert abs((got[2][0] * step + lo[0]) - 0.25) < 1e-2


def test_ivfpq_indexed_probe_equals_one_shot(spark, tmp_path):
    """build_ivfpq_index + ivfpq_probe_indexed must be value-identical
    to one-shot ivfpq_topk on the same corpus: the model (first-k
    centroids + frozen residual codebooks) round-trips meta parquet as
    exact doubles, codes as exact ints, and both paths share the
    _ivfpq_probe_plan arithmetic. Also pins the on-disk layout: codes
    are hive-partitioned by list_id (the probe-pruning contract)."""
    from pyspark_etl_twitter_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_probe_indexed,
        ivfpq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path)
    one_shot = sorted(
        (r.q_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in ivfpq_topk(emb).collect()
    )
    indexed = sorted(
        (r.q_id, r.neighbor_id, r.adc_dist, r.rank)
        for r in ivfpq_probe_indexed(spark, path).collect()
    )
    assert indexed == one_shot
    parts = {p.name for p in (tmp_path / "ivfpq" / "codes").iterdir()}
    assert any(p.startswith("list_id=") for p in parts)
