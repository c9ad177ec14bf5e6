"""Wire-format and sink round-trip tests (SURVEY.md §2.1-§2.2)."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_etl_twitter_spark.sources.catalog import load_table
from pyspark_etl_twitter_spark.sources.sinks import (
    delta_available,
    foreach_batch_delta,
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)
from pyspark_etl_twitter_spark.sources.wire import (
    decode_wire,
    encode_wire,
    with_processing_time,
)
from tests.conftest import SF_TINY


def test_wire_roundtrip(spark):
    texts = ["hello, world", "no commas here", "a,b,c,d", ""]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    wired = df.select(encode_wire("text").alias("value"))
    decoded = wired.select(decode_wire("value").alias("v")).select("v.message")
    got = [r.message for r in decoded.collect()]
    # producer strips commas before wrapping (producer.py:40)
    assert got == [t.replace(",", "") for t in texts]


def test_wire_encode_is_reference_json(spark):
    df = spark.createDataFrame([Row(text="hi, there")])
    raw = df.select(encode_wire("text").alias("value")).first().value
    assert json.loads(bytes(raw).decode("utf-8")) == {"message": "hi there"}


def test_decode_malformed_gives_null_struct(spark):
    df = spark.createDataFrame([Row(value=b"not json at all"), Row(value=b'{"message": "ok"}')])
    out = df.select(decode_wire("value").alias("v")).collect()
    assert out[0].v is None or out[0].v.message is None  # P2 validity probe
    assert out[1].v.message == "ok"


def test_processing_time_format(spark):
    df = with_processing_time(spark.createDataFrame([Row(x=1)]))
    val = df.first().created_at
    import re

    assert re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", val)


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmp_path):
    docs = load_table(spark, SF_TINY, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_parquet(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    plan = back.filter(F.col("lang") == "de")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan  # partition pruning active


def test_json_csv_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("lang", T.StringType())]
    )
    df = load_table(spark, SF_TINY, "documents").select("doc_id", "lang")
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    write_json(df, jdir)
    write_csv(df, cdir)
    assert read_json(spark, jdir, schema).count() == 500
    got = read_csv(spark, cdir, schema)
    assert got.count() == 500
    assert got.schema == schema  # explicit schema, no inference


def test_delta_sink_is_gated(spark):
    assert not delta_available()
    with pytest.raises(NotImplementedError):
        foreach_batch_delta(None, "/tmp/x", "/tmp/y")


def test_orc_round_trip_partitioned_with_pushdown(spark, tmp_path):
    """ORC sink/scan (r7): round-trips exactly, hive partitioning prunes,
    and predicate pushdown reaches the ORC scan node (same contract the
    parquet paths are held to)."""
    from pyspark_etl_twitter_spark.sources.sinks import read_orc, write_orc

    df = spark.range(1000).selectExpr(
        "id", "id % 7 AS grp", "CAST(id * 1.5 AS double) AS val",
        "concat('row-', id) AS name"
    )
    path = str(tmp_path / "orc_tbl")
    write_orc(df, path, partition_by=["grp"])
    back = read_orc(spark, path)
    assert back.count() == 1000
    assert sorted(back.columns) == sorted(df.columns)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in back.select(*df.columns).collect())
    assert a == b
    # partition pruning: a grp filter returns the right slice
    pruned = back.filter("grp = 3")
    assert pruned.count() == df.filter("grp = 3").count()
    # non-partition predicate reaches the scan as a pushed filter
    pushed = back.filter("id < 50").select("id")
    explained2 = pushed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in explained2 and "id" in explained2.split("PushedFilters: [", 1)[1][:80]
    assert pushed.count() == 50


def test_avro_is_gated(spark, tmp_path):
    """spark-avro is an external module absent from pip PySpark in this
    container: the wrappers must fail with the documented actionable error,
    not an opaque ClassNotFoundException mid-write. (If a future
    environment ships the module, the gate flips and a real round-trip
    runs instead.)"""
    import pytest as _pytest

    from pyspark_etl_twitter_spark.sources.sinks import (
        _datasource_resolves,
        avro_available,
        read_avro,
        write_avro,
    )

    # probe-machinery sanity (r7 advice): the old probe passed a SparkConf
    # where lookupDataSource takes a SQLConf, so even 'parquet' failed and
    # the gate was a constant False. Guard: parquet MUST resolve, and a
    # bogus short name must not.
    assert _datasource_resolves(spark, "parquet")
    assert not _datasource_resolves(spark, "no_such_datasource_xyz")

    df = spark.range(10).selectExpr("id", "concat('r', id) AS name")
    path = str(tmp_path / "avro_tbl")
    if avro_available(spark):  # pragma: no cover - not this container
        write_avro(df, path)
        back = read_avro(spark, path)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in df.collect()
        )
    else:
        with _pytest.raises(NotImplementedError, match="spark-avro"):
            write_avro(df, path)
        with _pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, path)


def test_table_disk_bytes_gates_broadcast_hints(tmp_path):
    """table_disk_bytes drives size-GATED broadcast hints (r9 ADVICE on
    revenue_by_nation): local tables report their real parquet footprint,
    remote schemes and missing paths report None so callers leave the
    hint OFF exactly where a wrong forced broadcast is most expensive."""
    from pyspark_etl_twitter_spark.sources.catalog import table_disk_bytes

    sz = table_disk_bytes("/root/testdata/sf0.001", "supplier")
    assert sz is not None and 0 < sz < (64 << 20)  # tiny at bench SFs
    assert table_disk_bytes("s3a://bucket/prefix", "supplier") is None
    assert table_disk_bytes("hdfs://nn/warehouse", "lineitem") is None
    assert table_disk_bytes(str(tmp_path / "missing"), "supplier") is None
    # directory layouts (multi-file parquet) sum their files
    d = tmp_path / "part.parquet"
    d.mkdir()
    (d / "a.bin").write_bytes(b"x" * 100)
    (d / "b.bin").write_bytes(b"y" * 50)
    assert table_disk_bytes(str(tmp_path), "part") == 150
