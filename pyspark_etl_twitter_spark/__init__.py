"""pyspark_etl_twitter_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL
(Wazzabeee/pyspark-etl-twitter, surveyed in SURVEY.md) as an idiomatic
Spark-SQL operator library:

- ``functions/``  — pure column expressions (text cleaning/tokenizing with
  bit-parity to the reference's Python UDF at consumer.py:45-47, embedding
  math, stable hashing). Zero Python UDFs on the hot path: everything stays
  inside Catalyst / whole-stage codegen.
- ``operators/`` — composed DataFrame operators (native TF-IDF + logistic
  scoring replacing the MLlib pipeline, dedup family, similarity search,
  text analytics, relational helpers).
- ``sources/``   — batch + streaming source/sink adapters (parquet testdata
  catalog, file-replay stand-in for the reference's Kafka source at
  consumer.py:31-38, checkpointed sinks with the reference's foreachBatch
  defects fixed).
- ``plans/``     — the query library exposed through ``__spark_entry__``:
  each query has a DuckDB oracle-SQL twin where SQL-expressible.
- ``streaming/`` — Structured Streaming pipelines (watermarks, windows,
  sessionization, streaming dedup) over the ``events`` table.

Design stance (SURVEY.md §7): declare logical plans with the DataFrame/SQL
API and let Catalyst + AQE pick physical strategies; broadcast small
dimensions explicitly; keep Python out of the row path except Arrow-batched
pandas UDFs for vector math.
"""

from pyspark_etl_twitter_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
