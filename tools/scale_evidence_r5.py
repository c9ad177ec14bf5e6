"""Round-5 skewed-key scaling evidence (r4 verdict ask #5/#8).

Prior rounds' 100x runs replicate UNIFORMLY; real corpora are zipfian.
This harness replicates events/lineitem with a planted hot key — ONE
user/supplier owns ~20% of all rows — and measures the window/funnel
operators that partition by that key, plain vs chunked fallback:

- sessionize (window by user)      vs sessionize_chunked (user, day)
- rolling_range_mean (by type)     vs rolling_range_mean_chunked
- funnel_reach (windows by user)   — measured; per-user state is 3
  timestamps, so the skew cost is the hot partition's sort
- running revenue (window by supplier) — measured plain
- ngram_profile + source_vocab_overlap — the two corpus-x-vocabulary
  shapes that had no scaling rows yet (ask #8), post fan-out fix

AQE's skew handling splits JOINS, not window partitions — that is
exactly why the chunked twins exist (plans/relational.sessionize_chunked,
operators/timeseries.rolling_range_mean_chunked). Results land in
DESIGN.md §19.

Usage: python tools/scale_evidence_r5.py [sf_dir] [max_mult]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tools.scale_evidence_r4 import replicate, timed

HOT_FRACTION_MOD = 5  # 1/5 of rows -> the hot key (~20%)


def zipfianize(df, key_col: str, unique_col: str):
    """Remap ~20% of rows (deterministically, by row hash) to key 0 —
    the planted zipfian head. The remaining 80% keep their replicated
    (already offset) keys, preserving the long tail."""
    return df.withColumn(
        key_col,
        F.when(
            F.pmod(F.xxhash64(F.col(unique_col)), HOT_FRACTION_MOD) == 0, F.lit(0)
        ).otherwise(F.col(key_col)),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    mults = [m for m in (1, 10, 50) if m <= max_mult]
    spark = get_session(app_name="scale_evidence_r5")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark_etl_twitter_spark.operators.curation import (
        ngram_profile,
        source_vocab_overlap,
    )
    from pyspark_etl_twitter_spark.operators.funnel import funnel_reach
    from pyspark_etl_twitter_spark.operators.timeseries import (
        rolling_range_mean,
        rolling_range_mean_chunked,
    )
    from pyspark_etl_twitter_spark.plans.relational import (
        sessionize,
        sessionize_chunked,
    )

    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    def running_rev(li):
        w = (
            Window.partitionBy("l_suppkey")
            .orderBy(
                "l_shipdate",
                "l_orderkey",
                "l_linenumber",
                "l_extendedprice",
                "l_discount",
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return li.select(
            "l_suppkey",
            "l_orderkey",
            F.round(F.sum(rev).over(w), 2).alias("running_rev"),
        )

    for n in mults:
        ev = (
            zipfianize(
                replicate(events, n, ["event_id", "user_id"]).drop("_rep"),
                "user_id",
                "event_id",
            )
            .localCheckpoint()
        )
        rows = ev.count()
        hot = ev.filter("user_id = 0").count()
        print(f"-- events x{n}: {rows} rows, hot user holds {hot} ({hot/rows:.0%})")
        timed(f"sessionize_plain    x{n}", lambda d=ev: sessionize(d))
        timed(f"sessionize_chunked  x{n}", lambda d=ev: sessionize_chunked(d))
        # rolling by event_type is ALWAYS few-huge-groups (3 types); the
        # zipfian events stress it further at volume
        timed(f"rolling_plain       x{n}", lambda d=ev: rolling_range_mean(d))
        timed(
            f"rolling_chunked     x{n}",
            lambda d=ev: rolling_range_mean_chunked(d),
        )
        timed(
            f"funnel_reach        x{n}",
            lambda d=ev: funnel_reach(d, ["view", "click", "purchase"]),
        )
        ev.unpersist()

        li = (
            zipfianize(
                replicate(lineitem, n, ["l_orderkey", "l_suppkey"]).drop("_rep"),
                "l_suppkey",
                "l_orderkey",
            )
            .localCheckpoint()
        )
        timed(f"running_revenue     x{n}", lambda d=li: running_rev(d))
        from pyspark_etl_twitter_spark.operators.timeseries import (
            cumulative_sum_chunked,
        )

        cents = F.expr(
            "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"
        )
        timed(
            f"running_rev_chunked x{n}",
            lambda d=li: cumulative_sum_chunked(
                d,
                partition_col="l_suppkey",
                order_cols=[
                    "l_shipdate",
                    "l_orderkey",
                    "l_linenumber",
                    "l_extendedprice",
                    "l_discount",
                ],
                value_cents_expr=cents,
                chunk_expr=F.trunc("l_shipdate", "month"),
            ).select("l_suppkey", "l_orderkey", "running_cents"),
        )
        li.unpersist()

        d_n = replicate(docs, n, ["doc_id"]).drop("_rep").localCheckpoint()
        timed(f"bigram_profile      x{n}", lambda d=d_n: ngram_profile(d, n=2, k=50))
        timed(
            f"source_vocab_overlap x{n}",
            lambda d=d_n: source_vocab_overlap(d),
        )
        d_n.unpersist()


if __name__ == "__main__":
    main()
