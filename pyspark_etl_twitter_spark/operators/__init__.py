from pyspark_etl_twitter_spark.operators.sentiment import (
    INTERCEPT,
    build_weight_table,
    score_documents,
)

__all__ = ["INTERCEPT", "build_weight_table", "score_documents"]
