"""Count-Min Sketch properties: never undercounts, bounded overcount,
merge ≡ build-on-union, fixed output size."""

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _tokens(spark):
    from pyspark_etl_twitter_spark.operators.textstats import ws_tokens
    from pyspark_etl_twitter_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return docs.select(F.explode(ws_tokens("text")).alias("term"))


def test_cms_never_undercounts_and_bounds_overcount(spark):
    toks = _tokens(spark).localCheckpoint()
    n_total = toks.count()
    truth = {r.term: r.c for r in toks.groupBy("term").agg(F.count("*").alias("c")).collect()}
    width, depth = 2048, 4
    sketch = cms_build(toks, "term", width=width, depth=depth)
    assert sketch.count() <= width * depth
    items = spark.createDataFrame([(t,) for t in list(truth)[:200]], ["term"])
    est = {
        r.term: r.est_count
        for r in cms_estimate(sketch, items, "term", width=width, depth=depth).collect()
    }
    eps_n = 2.718 / width * n_total
    for t, e in est.items():
        assert e >= truth[t], f"undercount for {t}"
        assert e <= truth[t] + 4 * eps_n, f"overcount beyond bound for {t}"


def test_cms_merge_equals_build_on_union(spark):
    toks = _tokens(spark)
    half_a = toks.filter(F.length("term") <= 5)
    half_b = toks.filter(F.length("term") > 5)
    merged = cms_merge(
        cms_build(half_a, "term", width=512, depth=3),
        cms_build(half_b, "term", width=512, depth=3),
    )
    direct = cms_build(toks, "term", width=512, depth=3)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_cms_heavy_hitter_dominates(spark):
    rows = [("hot",)] * 5000 + [(f"cold{i}",) for i in range(1000)]
    df = spark.createDataFrame(rows, ["term"])
    sketch = cms_build(df, "term", width=1024, depth=4)
    items = spark.createDataFrame([("hot",), ("cold7",), ("absent",)], ["term"])
    est = {
        r.term: r.est_count
        for r in cms_estimate(sketch, items, "term", width=1024, depth=4).collect()
    }
    assert est["hot"] >= 5000
    assert est["cold7"] >= 1
    assert est["hot"] > 100 * est["cold7"]
    # absent items may collide but must stay far below the heavy hitter
    assert est["absent"] < 100


def test_native_hll_sketch_lifecycle_persist_and_merge(spark, tmp_path):
    """The 100 TB sketch-table pattern with Spark's NATIVE HLL: per-shard
    hll_sketch_agg binaries persisted to parquet, later merged with
    hll_union_agg — distinct counts over arbitrary shard unions without
    rescanning raw data. Estimate must stay within HLL's ~2% band."""
    from pyspark_etl_twitter_spark.sources.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    shards = str(tmp_path / "hll_shards")
    (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .write.parquet(shards)
    )
    merged_est = (
        spark.read.parquet(shards)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("nd"))
        .first()
        .nd
    )
    truth = li.select("l_partkey").distinct().count()
    assert abs(merged_est - truth) / truth < 0.05


def test_streaming_incremental_cms_equals_batch_build(spark, tmp_path):
    """Streaming sketch maintenance: a foreachBatch loop that cms_builds
    each micro-batch and MERGES it into a persisted sketch table yields
    the cell-identical sketch of a one-shot batch build — the mergeability
    property carried through the real streaming lifecycle (replay source →
    foreachBatch → persisted state), so a 100 TB deployment can keep
    sketches current per-batch without rescans."""
    from pyspark_etl_twitter_spark.sources.catalog import load_table
    from pyspark_etl_twitter_spark.streaming.pipeline import (
        replay_to_json,
        stream_documents,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    replay = str(tmp_path / "replay")
    replay_to_json(docs, replay, n_files=4, order_col="doc_id")

    sketch_dir = str(tmp_path / "sketch")

    def update_sketch(batch_df, epoch_id):
        import os

        delta = cms_build(batch_df, "source", width=64, depth=4)
        if os.path.exists(sketch_dir):
            merged = cms_merge(spark.read.parquet(sketch_dir), delta)
        else:
            merged = delta
        # write-then-swap: localCheckpoint breaks the read-own-input cycle
        merged.localCheckpoint().write.mode("overwrite").parquet(sketch_dir)

    q = (
        stream_documents(spark, replay, max_files_per_trigger=1)
        .writeStream.foreachBatch(update_sketch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.row, r.bucket): r.cnt
        for r in spark.read.parquet(sketch_dir).collect()
    }
    want = {
        (r.row, r.bucket): r.cnt
        for r in cms_build(docs, "source", width=64, depth=4).collect()
    }
    assert got == want


def test_hll_portable_accuracy_and_merge(spark):
    """Portable HLL at p=8 (σ ≈ 1.04/√256 = 6.5%): estimate within 20%
    of the exact distinct count across three magnitudes, and the
    register relation merges across corpus halves by union + re-max to
    EXACTLY the whole-corpus sketch (the mergeability that matters on a
    real cluster)."""
    from pyspark_etl_twitter_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    for n in (50, 1_000, 20_000):
        df = spark.range(n).select(F.col("id").alias("v"))
        est = hll_estimate(hll_registers(df, "v")).first()["hll_distinct"]
        assert abs(est / n - 1.0) < 0.20, (n, est)
    df = spark.range(5_000).select(F.col("id").alias("v"))
    whole = hll_registers(df, "v")
    halves = hll_registers(df.filter("v % 2 = 0"), "v").unionByName(
        hll_registers(df.filter("v % 2 = 1"), "v")
    )
    merged = halves.groupBy("bucket").agg(
        F.max("register").alias("register")
    )
    a = sorted((r["bucket"], r["register"]) for r in whole.collect())
    b = sorted((r["bucket"], r["register"]) for r in merged.collect())
    assert a == b


def test_hll_duplicates_are_free(spark):
    """Duplicating every value must not change the sketch at all."""
    from pyspark_etl_twitter_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(2_000).select(F.col("id").alias("v"))
    dup = df.unionAll(df).unionAll(df)
    e1 = hll_estimate(hll_registers(df, "v")).first()["hll_distinct"]
    e3 = hll_estimate(hll_registers(dup, "v")).first()["hll_distinct"]
    assert e1 == e3


def test_cms_portable_point_estimates_and_overestimate(spark):
    """Portable-twin CMS invariants: with a roomy sketch the estimate is exact; with a
    deliberately tiny width, collisions only ever INFLATE (one-sided
    est >= true, never under); weighted builds count weights."""
    from pyspark_etl_twitter_spark.operators.sketches import (
        cms_portable_build,
        cms_portable_lookup,
    )

    rows = [(f"k{i % 7}",) for i in range(70)] + [("hot",)] * 30
    df = spark.createDataFrame(rows, "v string")
    items = df.select("v").distinct()

    exact = {r.v: 10 for r in items.collect()}
    exact["hot"] = 30

    sketch = cms_portable_build(df, "v")
    got = {
        r.item: r.cms_est for r in cms_portable_lookup(sketch, items, "v").collect()
    }
    assert got == exact  # 8 keys in 4x1024 -> collision-free, exact

    tiny = cms_portable_build(df, "v", depth=2, width=3)
    got_tiny = {
        r.item: r.cms_est
        for r in cms_portable_lookup(tiny, items, "v", depth=2, width=3).collect()
    }
    assert all(got_tiny[k] >= exact[k] for k in exact)  # one-sided
    assert sum(got_tiny.values()) > sum(exact.values())  # 8 keys in 3 buckets MUST collide

    wdf = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "v string, w int")
    ws = cms_portable_build(wdf, "v", weight_col="w")
    west = {
        r.item: r.cms_est
        for r in cms_portable_lookup(ws, wdf.select("v").distinct(), "v").collect()
    }
    assert west == {"a": 12, "b": 1}


def test_cms_portable_shard_merge_equals_global_build(spark):
    """The property that matters on 1000 executors: per-shard sketches
    merged by (row, bucket) SUM are bit-identical to the one-pass global
    sketch."""
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.sketches import (
        cms_portable_build,
    )

    df = spark.range(1000).select(
        (F.col("id") % 37).cast("string").alias("v"),
        (F.col("id") % 2).alias("shard"),
    )
    global_sk = {
        (r.row, r.bucket): r.cnt for r in cms_portable_build(df, "v").collect()
    }
    shard_sk = (
        cms_portable_build(df, "v", group_cols=["shard"])
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    merged = {(r.row, r.bucket): r.cnt for r in shard_sk.collect()}
    assert merged == global_sk


def test_kmv_sketch_merge_and_estimators(spark):
    """KMV invariants: bottom-k of a union of per-shard bottom-ks equals
    bottom-k of the union (order statistics compose); when distinct < k
    the sketch is the exact distinct set and kmv_distinct reports it
    exactly; the domain-median order statistic lands on the true sample
    median; distinct estimates land within the ~1/sqrt(k) band."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.range(10_000).select((F.col("id") % 4000).alias("v"))

    # shard-merge == global: re-rank the union of two shard sketches
    a = kmv_sketch(df.filter(F.col("id") % 2 == 0), "v", k=64)
    b = kmv_sketch(df.filter(F.col("id") % 2 == 1), "v", k=64)
    merged = (
        a.unionByName(b)
        .select("value", "h")
        .distinct()
        .withColumn("rnk", F.row_number().over(Window.orderBy("h", "value")))
        .filter(F.col("rnk") <= 64)
    )
    direct = kmv_sketch(df, "v", k=64)
    assert {(r.value, r.h, r.rnk) for r in merged.collect()} == {
        (r.value, r.h, r.rnk) for r in direct.collect()
    }

    # sub-k population: sketch IS the distinct set, estimate exact
    small = spark.range(40).select((F.col("id") % 10).alias("v"))
    est = kmv_estimate(kmv_sketch(small, "v", k=64), k=64).collect()[0]
    assert est.kmv_distinct == 10.0
    # domain 0..9 -> median order statistic at ceil(.5*10)=5 -> value 4
    assert est.q_50 == 4

    # full sketch: estimate within the ~1/sqrt(k) relative-error band
    est2 = kmv_estimate(kmv_sketch(df, "v", k=256), k=256).collect()[0]
    assert abs(est2.kmv_distinct - 4000) / 4000 < 4 / (256 ** 0.5)


def test_cms_portable_property_vs_python_md5_oracle(spark):
    """Property test vs a direct hashlib-md5 Python oracle: for random
    value multisets and tiny sketch shapes, every cell of the portable
    CMS and every point estimate match the independent reimplementation
    exactly (same md5("row:value") bucketing)."""
    import hashlib
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark_etl_twitter_spark.operators.sketches import (
        cms_portable_build,
        cms_portable_lookup,
    )

    vals = st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=30
    )

    def bucket(row, v, width):
        h = hashlib.md5(f"{row}:{v}".encode()).hexdigest()
        return int(h[:8], 16) % width

    @given(vs=vals, depth=st.integers(2, 3), width=st.integers(2, 8))
    @settings(
        max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
    )
    def run(vs, depth, width):
        df = spark.createDataFrame([(str(v),) for v in vs], "v string")
        cells = {
            (r.row, r.bucket): r.cnt
            for r in cms_portable_build(
                df, "v", depth=depth, width=width
            ).collect()
        }
        want_cells = Counter()
        for v in vs:
            for r in range(depth):
                want_cells[(r, bucket(r, v, width))] += 1
        assert cells == dict(want_cells)

        items = df.distinct()
        est = {
            r.item: r.cms_est
            for r in cms_portable_lookup(
                cms_portable_build(df, "v", depth=depth, width=width),
                items,
                "v",
                depth=depth,
                width=width,
            ).collect()
        }
        for v in set(vs):
            want = min(
                want_cells[(r, bucket(r, str(v), width))] for r in range(depth)
            )
            assert est[str(v)] == want

    run()
