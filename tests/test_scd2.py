"""CDC compaction + SCD2 merge tests on hand-built fixtures."""

import datetime as dt

from pyspark.sql import Row

from pyspark_etl_twitter_spark.operators.scd2 import scd2_apply, upsert_latest


def _ts(day):
    return dt.datetime(2024, 1, day)


def test_upsert_latest(spark):
    log = spark.createDataFrame(
        [
            Row(k=1, v="a", version=1),
            Row(k=1, v="b", version=3),
            Row(k=1, v="c", version=2),
            Row(k=2, v="x", version=1),
        ]
    )
    got = {(r.k, r.v) for r in upsert_latest(log, key="k", version_col="version").collect()}
    assert got == {(1, "b"), (2, "x")}


def test_scd2_apply(spark):
    dim = spark.createDataFrame(
        [
            # key 1: one closed version + one current
            Row(k=1, attr="old1", effective_from=_ts(1), effective_to=_ts(5), is_current=False),
            Row(k=1, attr="cur1", effective_from=_ts(5), effective_to=None, is_current=True),
            # key 2: current only, not updated this batch
            Row(k=2, attr="cur2", effective_from=_ts(3), effective_to=None, is_current=True),
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(k=1, attr="new1a", update_ts=_ts(8)),
            Row(k=1, attr="new1b", update_ts=_ts(9)),  # latest wins
            Row(k=3, attr="new3", update_ts=_ts(9)),   # brand-new key
        ]
    )
    out = scd2_apply(dim, updates, key="k").collect()
    rows = {(r.k, r.attr): (r.effective_from, r.effective_to, r.is_current) for r in out}

    assert len(out) == 5
    # untouched key 2 intact
    assert rows[(2, "cur2")] == (_ts(3), None, True)
    # key 1 history intact, old current closed at the update ts
    assert rows[(1, "old1")] == (_ts(1), _ts(5), False)
    assert rows[(1, "cur1")] == (_ts(5), _ts(9), False)
    # latest update becomes the new current version
    assert rows[(1, "new1b")] == (_ts(9), None, True)
    assert (1, "new1a") not in rows
    # new key inserts as current
    assert rows[(3, "new3")] == (_ts(9), None, True)


def test_scd2_apply_is_idempotent_on_reapply(spark):
    """Re-applying the same batch must not duplicate history rows beyond
    closing the (now already latest) version at its own timestamp."""
    dim = spark.createDataFrame(
        [Row(k=1, attr="cur", effective_from=_ts(1), effective_to=None, is_current=True)],
        schema="k long, attr string, effective_from timestamp, "
        "effective_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame([Row(k=1, attr="new", update_ts=_ts(2))])
    once = scd2_apply(dim, updates, key="k")
    twice = scd2_apply(once, updates, key="k")
    finals = [r for r in twice.collect() if r.is_current]
    assert len(finals) == 1 and finals[0].attr == "new"


def test_snapshot_diff_classification(spark):
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.scd2 import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_shift_detected(spark):
    """NULL moving between columns, or NULL vs empty string, must classify
    as 'changed' — concat_ws alone would silently hash them identically."""
    from pyspark_etl_twitter_spark.operators.scd2 import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, None, "x"), (3, "", None)],
        "k long, s string, v string",
    )
    new = spark.createDataFrame(
        [(1, None, "a"), (2, None, "x"), (3, None, None)],
        "k long, s string, v string",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert got == {1: "changed", 2: "unchanged", 3: "changed"}


# -- round 4: snapshot-isolated MERGE (Delta-sink twin) -------------------


def test_merge_upsert_snapshot_lifecycle(spark, tmp_path):
    from pyspark_etl_twitter_spark.operators.scd2 import (
        merge_upsert_snapshot,
        read_snapshot_table,
    )

    path = str(tmp_path / "tbl")
    import os

    os.makedirs(path, exist_ok=True)
    v0 = merge_upsert_snapshot(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        key="k",
    )
    assert v0 == 0
    # update key 2, insert key 3
    v1 = merge_upsert_snapshot(
        spark,
        path,
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
        key="k",
    )
    assert v1 == 1
    got = {r.k: r.v for r in read_snapshot_table(spark, path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # prior snapshot is immutable and still readable (time travel)
    old = {r.k: r.v for r in spark.read.parquet(f"{path}/v=0").collect()}
    assert old == {1: "a", 2: "b"}


def test_merge_upsert_epoch_replay_is_noop(spark, tmp_path):
    from pyspark_etl_twitter_spark.operators.scd2 import (
        foreach_batch_merge,
        merge_upsert_snapshot,
        read_snapshot_table,
    )

    path = str(tmp_path / "tbl")
    import os

    os.makedirs(path, exist_ok=True)
    batch = spark.createDataFrame([(1, "a")], "k long, v string")
    write = foreach_batch_merge(path, key="k")
    write(batch, 7)
    write(batch, 7)  # crash-replay of the SAME epoch
    assert read_snapshot_table(spark, path).count() == 1
    # a NEW epoch with the same rows still applies (only replays dedupe)
    v = merge_upsert_snapshot(spark, path, batch, key="k", epoch_id=8)
    assert v == 1


def test_merge_upsert_recovers_from_orphan_snapshot(spark, tmp_path):
    """Crash between snapshot write and pointer swap leaves an orphan
    v=N+1 dir; the replay must overwrite it and converge, not wedge."""
    from pyspark_etl_twitter_spark.operators.scd2 import (
        merge_upsert_snapshot,
        read_snapshot_table,
    )
    import os

    path = str(tmp_path / "tbl")
    os.makedirs(path, exist_ok=True)
    merge_upsert_snapshot(
        spark, path, spark.createDataFrame([(1, "a")], "k long, v string"), key="k"
    )
    # simulate the crash: v=1 written, pointer never moved
    spark.createDataFrame([(9, "orphan")], "k long, v string").write.parquet(
        f"{path}/v=1"
    )
    v = merge_upsert_snapshot(
        spark, path, spark.createDataFrame([(2, "b")], "k long, v string"), key="k"
    )
    assert v == 1
    got = {r.k: r.v for r in read_snapshot_table(spark, path).collect()}
    assert got == {1: "a", 2: "b"}  # orphan content fully replaced


def test_merge_upsert_rejects_conflicting_duplicate_keys(spark, tmp_path):
    from pyspark_etl_twitter_spark.operators.scd2 import merge_upsert_snapshot
    import os
    import pytest as _pytest

    path = str(tmp_path / "tbl")
    os.makedirs(path, exist_ok=True)
    # exact duplicate rows collapse silently
    v = merge_upsert_snapshot(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (1, "a")], "k long, v string"),
        key="k",
    )
    assert v == 0
    # conflicting rows for one key raise
    with _pytest.raises(ValueError, match="conflicting"):
        merge_upsert_snapshot(
            spark,
            path,
            spark.createDataFrame([(2, "x"), (2, "y")], "k long, v string"),
            key="k",
        )


def test_snapshot_table_rejects_remote_uri_paths(spark):
    """os.path-based pointer ops silently see hdfs://-style paths as
    empty; the table must refuse them loudly instead of resetting to v=0."""
    import pytest

    from pyspark_etl_twitter_spark.operators.scd2 import (
        merge_upsert_snapshot,
        read_snapshot_table,
    )

    df = spark.range(3).withColumnRenamed("id", "k")
    for bad in ("hdfs://nn/warehouse/t", "s3a://bucket/t"):
        with pytest.raises(ValueError, match="local-filesystem-only"):
            merge_upsert_snapshot(spark, bad, df, key="k")
        with pytest.raises(ValueError, match="local-filesystem-only"):
            read_snapshot_table(spark, bad)


def test_vacuum_snapshots_retention(spark, tmp_path):
    """Vacuum deletes only versions past the retention horizon; the
    current version and above-pointer orphans survive; reads keep
    working; vacuumed time travel fails loudly (missing path)."""
    import os

    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.scd2 import (
        merge_upsert_snapshot,
        read_snapshot_table,
        vacuum_snapshots,
    )

    path = str(tmp_path / "tbl")
    os.makedirs(path)
    for ver in range(4):  # v=0..3
        df = spark.range(5).select(
            F.col("id").alias("k"), F.lit(ver).alias("val")
        )
        merge_upsert_snapshot(spark, path, df, key="k")
    # plant an above-pointer orphan (crash between write and swap)
    os.makedirs(os.path.join(path, "v=9"))

    removed = vacuum_snapshots(spark, path, keep_last=2)
    assert removed == [0, 1]
    dirs = {d for d in os.listdir(path) if d.startswith("v=")}
    assert dirs == {"v=2", "v=3", "v=9"}
    assert read_snapshot_table(spark, path).agg(F.max("val")).first()[0] == 3
