"""Tests for the round-2 advanced operators: hash split, robust
outliers, unpivot, distribution windows, semantic near-dup."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.curation import hash_split
from pyspark_etl_twitter_spark.operators.quality_checks import robust_outliers
from pyspark_etl_twitter_spark.operators.similarity import (
    embedding_near_dup_pairs,
)
from pyspark_etl_twitter_spark.plans.registry import QUERIES

SF_TINY = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- hash_split


def test_hash_split_total_and_disjoint(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 10_000
    assert set(counts) == {"train", "val", "test"}
    # 98/1/1 within loose tolerance on 10k uniform hashes
    assert counts["train"] > 9_500
    assert 20 < counts["val"] < 250
    assert 20 < counts["test"] < 250


def test_hash_split_stable_under_growth(spark):
    """An id's split never changes when the corpus grows — the property
    that prevents val/test leakage under incremental ingestion."""
    small = hash_split(spark.range(1_000).withColumnRenamed("id", "doc_id"), "doc_id")
    big = hash_split(spark.range(50_000).withColumnRenamed("id", "doc_id"), "doc_id")
    joined = small.alias("s").join(big.alias("b"), "doc_id").filter(
        F.col("s.split") != F.col("b.split")
    )
    assert joined.count() == 0


def test_hash_split_seed_changes_assignment(spark):
    df = spark.range(5_000).withColumnRenamed("id", "doc_id")
    a = hash_split(df, "doc_id", seed="split-v1")
    b = hash_split(df, "doc_id", seed="split-v2")
    moved = (
        a.alias("a")
        .join(b.alias("b"), "doc_id")
        .filter(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert moved > 0  # different seeds give an independent assignment


# ------------------------------------------------------------ robust_outliers


def test_robust_outliers_planted(spark):
    rows = [Row(g="a", v=float(x)) for x in range(100)] + [
        Row(g="a", v=1e6),
        Row(g="b", v=5.0),
        Row(g="b", v=5.0),
        Row(g="b", v=5.0),
    ]
    out = robust_outliers(spark.createDataFrame(rows), "v", ["g"], k=3.0)
    flagged = [r["v"] for r in out.filter("is_outlier").collect()]
    assert flagged == [1e6]
    # constant group: MAD = 0, nothing flagged
    assert out.filter("g = 'b' and is_outlier").count() == 0


def test_robust_outliers_no_fact_shuffle(spark):
    """The fact side must reach both joins without a hash exchange —
    group stats are broadcast back."""
    rows = [Row(g=str(i % 4), v=float(i)) for i in range(1000)]
    out = robust_outliers(spark.createDataFrame(rows), "v", ["g"], k=3.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------- semantic near-dup


def test_semantic_near_dup_catches_planted_duplicate(spark):
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    first = emb.select("embedding").first()[0]
    near = [float(x) + 1e-4 for x in first]
    planted = spark.createDataFrame(
        [Row(vec_id=999_999, embedding=near, label=0)], schema=emb.schema
    )
    pairs = embedding_near_dup_pairs(
        emb.unionByName(planted), threshold=0.99, n_planes=4, seed=7
    ).collect()
    found = {(r["vec_a"], r["vec_b"]) for r in pairs}
    base_id = emb.select("vec_id").first()[0]
    assert (base_id, 999_999) in found


def test_semantic_near_dup_subset_of_exact(spark):
    """Bucketed pairs are a subset of exact all-pairs at the same
    threshold (LSH only prunes, never invents)."""
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    bucketed = embedding_near_dup_pairs(emb, threshold=0.3, n_planes=4, seed=7)
    got = {(r["vec_a"], r["vec_b"]) for r in bucketed.collect()}
    from pyspark_etl_twitter_spark.operators.similarity import dot, l2_norm

    base = emb.select(
        "vec_id", F.col("embedding").alias("e"), l2_norm(F.col("embedding")).alias("n")
    )
    a, b = base.alias("a"), base.alias("b")
    exact = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (dot(F.col("a.e"), F.col("b.e")) / (F.col("a.n") * F.col("b.n"))).alias("c"),
        )
        .filter(F.round("c", 6) >= 0.3)
    )
    allpairs = {(r["vec_a"], r["vec_b"]) for r in exact.collect()}
    assert got <= allpairs
    assert len(got) > 0


# ----------------------------------------------------------- registry plans


def test_unpivot_uses_expand_node(spark):
    plan = (
        QUERIES["unpivot_lineitem_measures"](spark, SF_TINY)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan  # native unpivot, not a union of scans
    assert plan.count("FileScan") == 1


def test_percentile_window_single_exchange(spark):
    plan = (
        QUERIES["percentile_window_customers"](spark, SF_TINY)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows and the count share the same c_nationkey partitioning:
    # exactly one hash exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_semantic_dedup_transitive_collapse(spark):
    """A~B and B~C (without an A~C edge necessarily) collapse into one
    cluster; survivors = corpus minus non-canonical members."""
    import numpy as np

    from pyspark_etl_twitter_spark.operators.dedup import duplicate_clusters

    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    first = np.array(emb.select("embedding").first()[0], dtype=float)
    rows = [
        Row(vec_id=10_000_001, embedding=[float(x) for x in first * 1.0001], label=0),
        Row(vec_id=10_000_002, embedding=[float(x) for x in first * 1.0002], label=0),
    ]
    planted = spark.createDataFrame(rows, schema=emb.schema)
    corpus = emb.unionByName(planted)
    pairs = embedding_near_dup_pairs(corpus, threshold=0.999, n_planes=4, seed=7)
    clusters = duplicate_clusters(pairs, a_col="vec_a", b_col="vec_b")
    base_id = emb.select("vec_id").first()[0]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in clusters.filter(
            F.col("doc_id").isin(base_id, 10_000_001, 10_000_002)
        ).collect()
    }
    # all three label to the min id of the group
    assert got == {
        base_id: base_id,
        10_000_001: base_id,
        10_000_002: base_id,
    }


def test_near_dup_auto_planes(spark):
    """n_planes=None sizes buckets to the corpus: ceil(log2(N/target))."""
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")  # 500 vecs
    auto = embedding_near_dup_pairs(
        emb, threshold=0.3, n_planes=None, target_bucket_size=64
    )
    explicit = embedding_near_dup_pairs(emb, threshold=0.3, n_planes=3, seed=7)
    # ceil(log2(500/64)) = 3 → identical plan → identical pairs
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_sessionize_chunked_equals_plain(spark):
    """The skew-proof chunked sessionizer must be byte-identical to the
    plain one — including session numbering — for chunk sizes down to the
    gap itself, on real data and on a synthetic boundary-straddling user."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.plans.relational import (
        sessionize,
        sessionize_chunked,
    )
    from pyspark_etl_twitter_spark.sources.catalog import load_table

    ev = load_table(spark, SF_TINY, "events")
    want = sorted(map(tuple, sessionize(ev).collect()))
    for chunk_s in (86_400, 7_200, 1_800):
        got = sorted(map(tuple, sessionize_chunked(ev, chunk_s=chunk_s).collect()))
        assert got == want, chunk_s

    # synthetic: one user with events every 10 min for 3 days (one long
    # session spanning many chunks) plus a gap-separated second session
    rows = [(i, i // 200, "view", 0.0) for i in range(600)]
    base = spark.createDataFrame(rows, "event_id long, _d long, event_type string, value double")
    ev2 = base.select(
        "event_id",
        F.lit(7).alias("user_id"),
        "event_type",
        "value",
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(
            mins=F.col("event_id") * 10 + F.when(F.col("event_id") >= 500, 600).otherwise(0)
        )).alias("ts"),
    ).drop("_d")
    a = sorted(map(tuple, sessionize(ev2).collect()))
    b = sorted(map(tuple, sessionize_chunked(ev2, chunk_s=3_600).collect()))
    assert a == b
    assert len(a) == 2  # the +10h jump at event 500 splits exactly once


def test_cumulative_sum_chunked_equals_plain_window(spark):
    """The skew-proof chunked running sum must equal the single-window
    form exactly (integer cents make regrouping associative)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.timeseries import (
        cumulative_sum_chunked,
    )
    from pyspark_etl_twitter_spark.sources.catalog import load_table

    li = load_table(spark, SF_TINY, "lineitem")
    cents = F.expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"
    )
    order = [
        "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
    ]
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        map(
            tuple,
            li.select(
                "l_suppkey", "l_orderkey", "l_linenumber",
                F.sum(cents).over(w).alias("running_cents"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            cumulative_sum_chunked(
                li,
                partition_col="l_suppkey",
                order_cols=order,
                value_cents_expr=cents,
                chunk_expr=F.trunc("l_shipdate", "month"),
            )
            .select("l_suppkey", "l_orderkey", "l_linenumber", "running_cents")
            .collect(),
        )
    )
    assert got == want
