from pyspark_etl_twitter_spark.functions.text import (
    CLEAN_PATTERN,
    clean_text,
    remove_stopwords,
    split_whitespace,
    tokenize,
)

__all__ = [
    "CLEAN_PATTERN",
    "clean_text",
    "remove_stopwords",
    "split_whitespace",
    "tokenize",
]
