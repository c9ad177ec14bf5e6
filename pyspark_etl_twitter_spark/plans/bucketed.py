"""Bucketed co-located join as a registry-visible query.

The 100 TB answer to repeated fact⋈fact joins on the same key is to pay the
shuffle ONCE at write time: ``bucketBy(k, key)`` both sides, then every
subsequent join on that key is a zero-exchange sort-merge join over
co-located buckets. The capability is plan-asserted in
tests/test_skew_and_bucketing.py; this module exposes it as a driver-checked
query so the correctness gate sees the bucketed path produce the same
answer as the DuckDB oracle.

Reference parity note: the reference pipeline (consumer.py) re-reads and
re-joins per micro-batch; bucketing is the engine-added batch analogue of
keeping both sides pre-partitioned. Engine-added surface, no reference twin.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import pin_oracle_confs
from pyspark_etl_twitter_spark.sources.catalog import load_table

_N_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")


def _ensure_bucketed(spark: SparkSession, sf_dir: str, table: str, df_key: str) -> str:
    """Write ``table`` bucketed+sorted on ``df_key`` as an external table
    under a scratch dir (explicit path → independent of the session's
    warehouse location). Re-created per (session, sf_dir): the write is the
    one-time shuffle that all later joins on the key amortize away."""
    name = f"bkt_{table}_{_tag(sf_dir)}"
    if spark.catalog.tableExists(name):
        return name
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_buckets_{os.getpid()}", name
    )
    df = load_table(spark, sf_dir, table)
    if df_key not in df.columns:  # normalize the join key name across sides
        src = {"lineitem": "l_orderkey", "orders": "o_orderkey"}[table]
        df = df.withColumnRenamed(src, df_key)
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(_N_BUCKETS, df_key)
        .sortBy(df_key)
        .saveAsTable(name)
    )
    return name


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority via a bucketed, zero-exchange sort-merge
    join of lineitem⋈orders on orderkey.

    Plan shape (asserted in tests/test_bucketed_query.py): both scans report
    ``Bucketed: true``; no ``Exchange hashpartitioning`` appears between scan
    and join — with 8 buckets per side the join runs as 8 independent,
    pre-sorted streams. The MERGE hint pins sort-merge so the plan exercised
    here is the one a 1000-executor fact⋈fact join would use (at test scale
    the planner would otherwise broadcast). The groupBy after the join is a
    partial-agg shuffle of 5 priority rows per task."""
    pin_oracle_confs(spark)
    t_li = _ensure_bucketed(spark, sf_dir, "lineitem", "o_orderkey")
    t_ord = _ensure_bucketed(spark, sf_dir, "orders", "o_orderkey")
    li = spark.table(t_li).hint("merge")
    orders = spark.table(t_ord)
    return (
        li.join(orders, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_BUCKETED_JOIN_REVENUE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""
