"""Round-4b scaling run: the NEW round-4 operators at replicated volume
(fuzzy decontamination post-recomputation-fix, repeated spans, char
entropy, source overlap, temperature mix). Exact replication with offset
ids; the eval set for decontamination stays FIXED (eval sets don't grow
with the corpus). Usage: python tools/scale_evidence_r4b.py [sf_dir] [max]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.session import get_session
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tools.scale_evidence_r4 import replicate, timed


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    mults = [m for m in (1, 10, 50) if m <= max_mult]
    spark = get_session(app_name="scale_evidence_r4b")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark_etl_twitter_spark.operators.curation import (
        jaccard_contamination,
        source_vocab_overlap,
        temperature_mix_sample,
    )
    from pyspark_etl_twitter_spark.operators.textstats import (
        char_entropy,
        repeated_ngram_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter("doc_id % 97 = 0")  # fixed-size eval set

    for n in mults:
        d_n = replicate(docs, n, ["doc_id"]).drop("_rep").localCheckpoint()
        rows = d_n.count()
        timed(
            f"fuzzy_jaccard_decon docs x{n} ({rows} rows)",
            lambda d=d_n: jaccard_contamination(d, eval_docs, shingle_n=3),
        )
        timed(
            f"repeated_spans      docs x{n} ({rows} rows)",
            lambda d=d_n: repeated_ngram_spans(d, n=8, min_docs=3),
        )
        timed(
            f"char_entropy        docs x{n} ({rows} rows)",
            lambda d=d_n: char_entropy(d),
        )
        timed(
            f"source_overlap      docs x{n} ({rows} rows)",
            lambda d=d_n: source_vocab_overlap(d),
        )
        timed(
            f"temperature_mix     docs x{n} ({rows} rows)",
            lambda d=d_n: temperature_mix_sample(d, scale=25),
        )
        d_n.unpersist()


if __name__ == "__main__":
    main()
