from pyspark_etl_twitter_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
