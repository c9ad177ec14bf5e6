"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine implementation lives in ``pyspark_etl_twitter_spark/``; the query
registry is ``pyspark_etl_twitter_spark.plans.registry``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.2): the reference's streaming sentiment
    pipeline re-expressed as batch relational algebra — tokenize →
    stop-filter → TF → broadcast-join the TF-IDF·LR weight dimension →
    per-doc margin → threshold → class counts, over sf0.001 documents."""
    from pyspark_etl_twitter_spark.plans.text_queries import sentiment_classes

    return sentiment_classes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pyspark_etl_twitter_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys absent here (minhash/simhash/ANN) are
    non-SQL-expressible by design → rows-only checks."""
    from pyspark_etl_twitter_spark.plans.registry import ORACLES

    return dict(ORACLES)
