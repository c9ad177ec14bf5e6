"""Corpus fan-out repartitioning — AQE-proof and gated variants.

The engine's explode-heavy operators (tokenize → shingle → explode →
aggregate/probe) pre-partition compact document rows by id so that

(a) downstream ``groupBy(id, ...)`` aggregates are satisfied by the id
    clustering and the EXPLODED rows never shuffle (the exchange carries
    document bodies once, instead of token fan-out many times), and
(b) a narrow input (a single local parquet file, a post-filter trickle)
    spreads across all cores before the CPU-heavy explode.

Two hazards, both measured in round 5:

1. **AQE coalescing defeats ``repartition(col)``.** A repartition WITHOUT
   an explicit partition count is eligible for adaptive coalescing; on a
   bench-scale corpus (0.6 MB of documents) AQE merges it to ONE
   partition and the whole explode runs single-core — measured
   ``ngram_profile`` 1.8 s vs 0.68 s at sf0.1 for the identical logical
   plan. ``fan_out`` therefore pins the count to
   ``spark.sql.shuffle.partitions`` (the cluster-tuned width), which AQE
   must respect.
2. **The unconditional form is a 100 TB corpus shuffle.** When the
   downstream aggregate does NOT group by id (``ngram_profile`` groups
   by gram, ``jaccard_contamination`` aggregates only broadcast-probe
   MATCHES), partial aggregation already shrinks the real exchange, and
   repartitioning the raw corpus first moves everything to buy nothing.
   Those sites use ``fan_out_if_narrow``: the exchange happens only when
   the scan is narrower than the cluster (its sole legitimate purpose).

Site audit (why each remaining unconditional ``fan_out`` is justified —
the downstream aggregate/dedup groups by id, so the id exchange REPLACES
a strictly larger exploded-row exchange):

- ``sentiment.py`` score paths      → ``groupBy(id, term)``
- ``dedup.py`` _distinct_terms      → ``dropDuplicates([id, term])``
- ``dedup.py`` simhash_fingerprints → ``groupBy(id, term)`` then ``groupBy(id)``
- ``textstats.py`` fingerprints / repetition / tf-idf / char-entropy /
  repeated-spans                    → ``groupBy(id, ...)``
- ``lm.py`` doc_logprob / oov_rate → ``groupBy(id, ...)`` after
  broadcast model joins (``bigram_pairs`` has NO fan-out: its consumers
  aggregate/join on gram keys, and adjacent-pairs explode work is linear
  in input bytes already bounded per scan split — see its docstring)
- ``encoding.py`` build_vocab       → ``countDistinct(id)`` expands to a
  ``(term, id)`` dedup phase whose clustering the id partitioning
  satisfies partition-locally
- ``encoding.py`` encode_documents  → order re-assembly ``groupBy(id)``

DESIGN.md §18 carries the same table with measurements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _shuffle_width(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def fan_out(df: DataFrame, *keys) -> DataFrame:
    """Repartition by ``keys`` with an EXPLICIT partition count
    (``spark.sql.shuffle.partitions``) so adaptive coalescing cannot
    merge the fan-out back to one partition on small inputs."""
    return df.repartition(_shuffle_width(df), *keys)


def fan_out_if_narrow(df: DataFrame, *keys) -> DataFrame:
    """``fan_out`` only when the input's scan parallelism is below the
    cluster default — for operators whose downstream exchange does not
    benefit from id clustering (see module docstring hazard #2).
    ``df.rdd.getNumPartitions()`` compiles the physical plan (no job):
    a plan-build cost, traded against a corpus-wide shuffle at run."""
    if df.rdd.getNumPartitions() < df.sparkSession.sparkContext.defaultParallelism:
        return fan_out(df, *keys)
    return df
