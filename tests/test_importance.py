"""DSIR importance weighting (operators/importance.py): target-like
documents must outscore off-domain ones, weights are
partitioning-invariant under the rounding contract, and degenerate
inputs (no grams) score the neutral 0."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.importance import (
    dsir_log_weights,
    dsir_select_topk,
)


def _corpus(spark):
    target = spark.createDataFrame(
        [
            Row(doc_id=1000 + i, text="quantum flux manifold tensor spectral theorem")
            for i in range(10)
        ]
    )
    raw = spark.createDataFrame(
        [
            # on-domain: shares the target's vocabulary
            Row(doc_id=0, text="quantum tensor spectral manifold"),
            Row(doc_id=1, text="flux manifold quantum theorem"),
            # off-domain: disjoint vocabulary
            Row(doc_id=2, text="cheap pills buy now click here"),
            Row(doc_id=3, text="celebrity gossip shocking photos"),
            # empty: no grams -> neutral weight
            Row(doc_id=4, text=""),
        ]
    )
    return raw, target


def test_dsir_ranks_on_domain_docs_above_off_domain(spark):
    raw, target = _corpus(spark)
    w = {r.doc_id: r.log_w for r in dsir_log_weights(raw, target).collect()}
    assert set(w) == {0, 1, 2, 3, 4}
    assert min(w[0], w[1]) > max(w[2], w[3])
    assert w[4] == 0.0


def test_dsir_select_topk_is_deterministic_and_ranked(spark):
    raw, target = _corpus(spark)
    sel = dsir_select_topk(raw, target, 2).collect()
    assert [r.doc_id for r in sorted(sel, key=lambda r: r.rank)] in (
        [0, 1],
        [1, 0],
    )
    # ranks are 1..k and weights non-increasing in rank
    by_rank = sorted(sel, key=lambda r: r.rank)
    assert [r.rank for r in by_rank] == [1, 2]
    assert by_rank[0].log_w >= by_rank[1].log_w


def test_dsir_weights_partitioning_invariant(spark):
    """The per-doc sums are doubles, so raw values may differ in the
    last bit across partitionings — the ROUNDED weights (the selection
    contract) must not."""
    raw, target = _corpus(spark)
    a = {
        r.doc_id: round(r.log_w, 4)
        for r in dsir_log_weights(raw.repartition(7), target).collect()
    }
    b = {
        r.doc_id: round(r.log_w, 4)
        for r in dsir_log_weights(raw.coalesce(1), target).collect()
    }
    assert a == b


def test_dsir_weight_table_is_broadcast_and_no_python_udf(spark):
    """Plan contract: the dlog table joins the gram stream as a
    BROADCAST hash join (B rows, never shuffled against the corpus) and
    nothing falls back to a row-wise Python UDF."""
    raw, target = _corpus(spark)
    plan = (
        dsir_log_weights(raw, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_gumbel_sample_seeded_replayable_and_weighted(spark):
    """Gumbel resampling: same seed = same sample; different seeds can
    differ; high-weight docs appear in (nearly) every seed's sample when
    k covers them — and the empty doc competes on noise alone."""
    from pyspark_etl_twitter_spark.operators.importance import dsir_gumbel_sample

    raw, target = _corpus(spark)
    a = sorted(r.doc_id for r in dsir_gumbel_sample(raw, target, 3, seed=17).collect())
    b = sorted(r.doc_id for r in dsir_gumbel_sample(raw, target, 3, seed=17).collect())
    assert a == b
    # with k=3 of 5 and the on-domain docs far above the rest, both
    # on-domain docs survive the noise at any seed we pin
    assert {0, 1} <= set(a)
    # seed-sensitivity needs COMPETING weights: among equal-weight docs
    # the Gumbel key alone decides, so different seeds draw different
    # subsets (in the corpus above the weight gaps dominate any noise —
    # every seed returns the same set, which is itself correct behavior)
    eq = spark.createDataFrame(
        [Row(doc_id=i, text="same text every doc") for i in range(30)]
    )
    tgt = spark.createDataFrame([Row(doc_id=100, text="same text every doc")])
    draws = {
        s: tuple(
            sorted(r.doc_id for r in dsir_gumbel_sample(eq, tgt, 5, seed=s).collect())
        )
        for s in (17, 18, 19, 20)
    }
    assert len(set(draws.values())) > 1  # the seed actually matters


def test_streaming_dsir_score_equals_batch(spark, tmp_path):
    """Streamed DSIR scoring against a frozen dlog table: the streamed
    per-doc weights equal the batch ``dsir_score_with`` on the same
    documents, and replaying the source dir under the checkpoint is a
    no-op (offsets committed, no duplicate score rows)."""
    import json

    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.importance import (
        dsir_bucket_dlog,
        dsir_score_with,
    )
    from pyspark_etl_twitter_spark.sources.catalog import load_table
    from pyspark_etl_twitter_spark.streaming.incremental import (
        streaming_dsir_score,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    target = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    dlog = dsir_bucket_dlog(raw, target)

    incoming = raw.filter(F.col("doc_id") < 40).select("doc_id", "text")
    n_incoming = incoming.count()
    src = tmp_path / "incoming"
    src.mkdir()
    lines = [
        json.dumps({"doc_id": r.doc_id, "text": r.text, "lang": "en",
                    "source": "sX", "n_chars": len(r.text)})
        for r in incoming.collect()
    ]
    (src / "batch0.json").write_text("\n".join(lines[:20]))
    (src / "batch1.json").write_text("\n".join(lines[20:]))

    out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    streaming_dsir_score(spark, str(src), dlog, out, ckpt)
    streamed = {
        r.doc_id: round(r.log_w, 4) for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.doc_id: round(r.log_w, 4)
        for r in dsir_score_with(incoming, dlog).collect()
    }
    assert streamed == batch and len(streamed) == n_incoming

    # replay is a no-op under the checkpoint
    streaming_dsir_score(spark, str(src), dlog, out, ckpt)
    assert spark.read.parquet(out).count() == n_incoming
