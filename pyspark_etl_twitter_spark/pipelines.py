"""End-to-end pipeline equivalents of the reference programs.

``consumer_pipeline`` reproduces the reference consumer's exact operator
chain (consumer.py:39-55) over any relation with a Kafka-shaped binary
``value`` column — batch or streaming:

    selectExpr cast (P1) → from_json validity probe (P2) → cleaned_data
    (P3, native) → dropna (P4) → score (M1-M5, native) → select(message,
    prediction) (P5)

Chain quirks preserved: the parsed ``value`` struct is never consumed
downstream (the reference's implicit validity probe — Catalyst prunes it
just as it does for the reference); ``dropna`` sits after tokenization and
therefore only drops null messages (empty strings tokenize to ``[]``, not
null, so they survive — F6 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.functions.text import tokenize
from pyspark_etl_twitter_spark.operators.sentiment import INTERCEPT, score_documents
from pyspark_etl_twitter_spark.sources.wire import decode_wire


def consumer_pipeline(
    kafka_shaped: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "offset",
    intercept: float = INTERCEPT,
) -> DataFrame:
    """(value binary, id_col, ...) → (message, prediction), the reference's
    final shape (consumer.py:55). ``weights`` is any (term, idf, coef)
    dimension — corpus-fit (build_weight_table) or the reference's own
    fitted model (load_mllib_weights).

    ``id_col`` must be a stable unique row key — for a Kafka source that is
    the record offset (per partition), which is exactly what exactly-once
    replay is keyed on at scale. (Deliberately NOT
    ``monotonically_increasing_id``: the plan references the input twice
    and synthetic ids are not stable across branch recomputation.)"""
    df = (
        kafka_shaped.selectExpr(f"{id_col} as _row_id", "CAST(value AS STRING) as message")
        .withColumn("value", decode_wire(F.col("message")))  # P2 probe, pruned
        .withColumn("cleaned_data", tokenize(F.col("message")))
        .dropna(subset=["message"])
    )
    scored = score_documents(
        df,
        weights,
        id_col="_row_id",
        text_col="message",
        intercept=intercept,
        stop=True,
        reference_clean=True,
    )
    return df.join(scored, "_row_id").select("message", "prediction")
