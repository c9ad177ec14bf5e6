"""Batch parquet catalog over the driver testdata star schema (TESTDATA.md).

The reference's only batch scan is the model-artifact parquet read behind
``PipelineModel.load`` (consumer.py:51); this module is its engine-native
generalization (SURVEY.md §2.1 S8/S9): plain ``spark.read.parquet`` relations
that Catalyst can push filters into and prune columns from.

Scale notes: parquet scans here are the 100 TB entry point. Everything
downstream must keep predicates and projections *above* these relations
declarative so they reach the scan (``PushedFilters`` / ``ReadSchema`` in
``explain("formatted")``). No ``.cache()`` by default — at 100 TB caching the
fact table is a mistake; dimension tables are broadcast at join sites instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_disk_bytes(sf_dir: str, name: str) -> int | None:
    """Best-effort on-disk parquet footprint of a table, for size-GATED
    broadcast hints on dimensions that scale with SF (supplier, part):
    hint while the table is provably small, fall back to planner/AQE
    sizing past the cap. Plan-build-time and deterministic for a given
    dataset — the same dataset yields the same plan on every run, so
    bench fingerprints stay stable. Local filesystems only: remote
    schemes (hdfs://, s3a://…) return None, and callers must leave the
    hint off — exactly the environments where a wrong forced broadcast
    is most expensive."""
    p = table_path(sf_dir, name)
    if p.startswith("file:"):
        p = p[len("file:"):]
    elif "://" in p:
        return None
    if os.path.isfile(p):
        return os.path.getsize(p)
    if os.path.isdir(p):
        total = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total
    return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (read as
        # bigint via nanosAsLong, since Spark has no nanosecond timestamp) and
        # TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Branch on the dtype that
        # actually loaded instead of assuming one layout, so schema drift in
        # the testdata can't break every downstream events query again.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # legacy nanos layout: truncate to micros (identical to DuckDB's
            # nanos→micros truncation on the same file).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type != "timestamp":
            # TIMESTAMP_NTZ (or any other flavor) → session-TZ timestamp; the
            # session TZ is pinned to UTC so the wall-clock value is preserved
            # and matches DuckDB's naive read of the same file.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view (for the SQL-API query paths)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
