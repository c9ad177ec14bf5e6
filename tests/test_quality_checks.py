"""Data-quality report + observe() metric tests."""

from pyspark.sql import Row

from pyspark_etl_twitter_spark.operators.quality_checks import (
    data_quality_report,
    observed_pipeline,
)
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


def test_quality_report_counts_violations(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v=5.0),
            Row(k=1, v=50.0),   # dup key + out of range
            Row(k=2, v=None),   # null v
            Row(k=3, v=-1.0),   # out of range
        ]
    )
    r = data_quality_report(
        df, not_null=["v"], unique=["k"], ranges={"v": (0.0, 10.0)}
    ).first()
    assert r.n_rows == 4
    assert r.null_v == 1
    assert r.dup_k == 1
    assert r.oob_v == 2  # nulls don't count as out-of-band


def test_observe_rides_along(spark):
    docs = load_table(spark, SF_TINY, "documents")
    observed, obs = observed_pipeline(docs.select("doc_id", "text"))
    n = observed.count()  # the only action — metrics accumulate during it
    assert obs.get["n_rows"] == n == 500
    assert obs.get["null_doc_id"] == 0
