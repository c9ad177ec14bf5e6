"""Token-budget packing + stratified sampling tests."""

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.packing import (
    pack_documents,
    pack_documents_salted,
    stratified_sample,
)
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


def test_pack_documents_respects_budget(spark):
    docs = load_table(spark, SF_TINY, "documents")
    packed = pack_documents(docs, budget=500).collect()
    assert len(packed) == docs.count()
    # shard ids are contiguous from 0
    shards = sorted({r.shard_id for r in packed})
    assert shards == list(range(len(shards)))
    # each shard's token total stays within budget + one overhanging doc
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard_id, []).append(r)
    for sid, rows in by_shard.items():
        total = sum(r.n_tokens for r in rows)
        overhang = max(r.n_tokens for r in rows)
        assert total <= 500 + overhang
    # packing is greedy in doc_id order: doc order maps to nondecreasing shards
    ordered = sorted(packed, key=lambda r: r.doc_id)
    assert all(a.shard_id <= b.shard_id for a, b in zip(ordered, ordered[1:]))


def test_pack_salted_budget_invariants(spark):
    docs = load_table(spark, SF_TINY, "documents")
    packed = pack_documents_salted(docs, budget=500, n_salts=8).collect()
    plain = {(r.doc_id, r.n_tokens) for r in pack_documents(docs, budget=500).collect()}
    # same multiset of (doc, token-count); only shard assignment differs
    assert {(r.doc_id, r.n_tokens) for r in packed} == plain
    shards = sorted({r.shard_id for r in packed})
    assert shards == list(range(len(shards)))  # contiguous global ids
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard_id, []).append(r)
    for rows in by_shard.values():
        total = sum(r.n_tokens for r in rows)
        overhang = max(r.n_tokens for r in rows)
        assert total <= 500 + overhang
    # greedy within the global (salt, doc_id) order → nondecreasing shards
    ordered = sorted(packed, key=lambda r: r.doc_id)
    assert all(a.shard_id <= b.shard_id for a, b in zip(ordered, ordered[1:]))


def test_pack_salted_single_salt_equals_global(spark):
    docs = load_table(spark, SF_TINY, "documents")
    salted = pack_documents_salted(docs, budget=500, n_salts=1)
    plain = pack_documents(docs, budget=500)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_pack_salted_window_is_partitioned(spark):
    """The scale-path cumsum must never plan a single-partition global
    window over the corpus: its window spec partitions by the salt."""
    docs = load_table(spark, SF_TINY, "documents")
    plan = pack_documents_salted(docs, budget=500, n_salts=8)._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_salt" in plan


def test_stratified_sample_rebalances(spark):
    docs = load_table(spark, SF_TINY, "documents")
    fractions = {"es": 0.5, "zh": 0.1}
    got = stratified_sample(docs, strata_col="lang", fractions=fractions, seed=7)
    counts = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(fractions)  # unlisted strata dropped
    for lang, frac in fractions.items():
        got_frac = counts.get(lang, 0) / totals[lang]
        assert abs(got_frac - frac) < 0.2  # Bernoulli, loose bound at n~100
    # deterministic under a fixed seed
    again = stratified_sample(docs, strata_col="lang", fractions=fractions, seed=7)
    assert sorted(r.doc_id for r in got.collect()) == sorted(r.doc_id for r in again.collect())


def test_training_mix_deterministic_and_rate_accurate(spark):
    from pyspark_etl_twitter_spark.operators.packing import training_mix

    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(10_000)], "doc_id long, source string"
    )
    rates = {"s0": 1.0, "s1": 0.2}
    a = sorted(r.doc_id for r in training_mix(docs, rates).collect())
    b = sorted(
        r.doc_id
        for r in training_mix(docs.repartition(17), rates).collect()
    )
    assert a == b  # pure function of id: partitioning-invariant
    n0 = sum(1 for i in a if i % 2 == 0)
    n1 = len(a) - n0
    assert n0 == 5000  # rate 1.0 keeps everything
    assert abs(n1 / 5000 - 0.2) < 0.02  # multiplicative hash ~uniform


def test_training_mix_default_rate_zero_drops_unlisted(spark):
    from pyspark_etl_twitter_spark.operators.packing import training_mix

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string"
    )
    kept = training_mix(docs, {"a": 1.0}).collect()
    assert [r.source for r in kept] == ["a"]
