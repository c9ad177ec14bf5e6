"""Round-3 scaling evidence: replicate the sf0.1 tables in memory and
time the round-3 operators at 10-100x volume (DESIGN.md §14).

Replication keeps value distributions and key skew intact while
multiplying volume: ids are offset per replica so uniqueness-dependent
operators (funnel users, BM25 doc ids) behave as a genuinely larger
corpus. Usage: python tools/scale_evidence_r3.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table


def replicate(df, n, id_cols):
    reps = df.sparkSession.range(n).select(F.col("id").alias("_rep"))
    out = df.crossJoin(F.broadcast(reps))
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.col("_rep") * 100_000_000)
    return out.drop("_rep")


def timed(label, df):
    start = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.perf_counter() - start:.2f} s", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="scale_evidence_r3")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark_etl_twitter_spark.operators.curation import (
        weighted_bernoulli_sample,
    )
    from pyspark_etl_twitter_spark.operators.funnel import (
        cohort_retention,
        funnel_reach,
    )
    from pyspark_etl_twitter_spark.operators.lm import bigram_doc_logprob
    from pyspark_etl_twitter_spark.operators.rangejoin import binned_interval_join
    from pyspark_etl_twitter_spark.operators.textstats import bm25_scores

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")

    for n in (1, 10, 50):
        ev_n = replicate(ev, n, ["event_id", "user_id"]).localCheckpoint()
        rows = ev_n.count()
        timed(f"funnel_reach      events x{n} ({rows} rows)",
              funnel_reach(ev_n, ["view", "click", "purchase"]))
        timed(f"cohort_retention  events x{n} ({rows} rows)",
              cohort_retention(ev_n))
        ev_n.unpersist()

    for n in (1, 10, 50):
        d_n = replicate(docs, n, ["doc_id"]).localCheckpoint()
        rows = d_n.count()
        timed(f"bigram_logprob    docs x{n} ({rows} rows)",
              bigram_doc_logprob(d_n))
        timed(f"bm25_scores       docs x{n} ({rows} rows)",
              bm25_scores(d_n, ["join", "hash", "scan"]))
        timed(f"weighted_sample   docs x{n} ({rows} rows)",
              weighted_bernoulli_sample(d_n, weight_col="n_chars", denom=1000))
        d_n.unpersist()

    bands = spark.range(1200).select(
        F.concat(F.lit("iv"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("band"),
        (F.col("id") * 500.0).cast("double").alias("lo"),
        (F.col("id") * 500.0 + 1500.0).cast("double").alias("hi"),
    )
    for n in (1, 10, 50):
        o_n = replicate(orders, n, ["o_orderkey"]).localCheckpoint()
        rows = o_n.count()
        joined = binned_interval_join(
            o_n.select("o_orderkey", "o_totalprice"), bands,
            value_col="o_totalprice", bin_width=1500.0,
        )
        timed(f"binned_range_join orders x{n} ({rows} rows)",
              joined.groupBy("band").count())
        o_n.unpersist()


if __name__ == "__main__":
    main()
