"""Plan evidence for the r15 MinHash clean-marker fast path.

``minhash_index_append`` localCheckpoints its probe stages, so the
registry row's final explain() hides the stored-side subtree behind RDD
scans. This tool rebuilds the probe FRONT (stored-bands read -> guards ->
band-key semi-join -> star-guard window -> candidate pairs -> signature
prefilter) exactly as the operator plans it, WITHOUT the checkpoints, and
dumps explain("formatted") for both guard modes:

- clean store:  plain parquet reads (the fast path)
- dirty store:  dropDuplicates + left-semi against the texts/ commit ids

Writes plans/r15/minhash_probe_front_{clean,dirty}.txt and prints the
Exchange/Aggregate node counts of each.

Usage: python tools/minhash_probe_plan_r15.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_etl_twitter_spark.operators.dedup import (  # noqa: E402
    _bands_from_sigs,
    _distinct_terms,
    _portable_sigs_from_terms,
    _sig_match_estimate,
    build_minhash_index,
)
from pyspark_etl_twitter_spark.plans.text_queries import (  # noqa: E402
    _PMH_BANDS,
    _PMH_EST_SLACK,
    _PMH_HASHES,
    _PMH_STAR,
    _PMH_THRESHOLD,
)
from pyspark_etl_twitter_spark.session import get_session  # noqa: E402
from pyspark_etl_twitter_spark.sources.catalog import load_table  # noqa: E402


def probe_front(spark, path, new_docs, *, clean: bool):
    """The operator's probe front, checkpoint-free, both guard modes."""
    nh, nb, sh = _PMH_HASHES, _PMH_BANDS, 1
    thr, star, slack = _PMH_THRESHOLD, _PMH_STAR, _PMH_EST_SLACK
    committed_ids = spark.read.parquet(f"{path}/texts").select("doc_id")
    indexed_ids = committed_ids.select(F.col("doc_id").alias("doc_id"))
    new_docs = new_docs.join(indexed_ids, "doc_id", "left_anti")
    new_terms = _distinct_terms(new_docs, "doc_id", "text", sh)
    new_sigs = _portable_sigs_from_terms(new_terms, nh)
    new_bands = _bands_from_sigs(new_sigs, nh, nb)

    def _guard(df, cols):
        if clean:
            return df
        return df.dropDuplicates(cols).join(
            committed_ids, "doc_id", "left_semi"
        )

    stored = _guard(
        spark.read.parquet(f"{path}/bands"), ["doc_id", "band_id", "band_key"]
    )
    keys = new_bands.select("band_id", "band_key").distinct()
    touched = stored.join(keys, ["band_id", "band_key"], "left_semi")
    members = touched.select(
        F.col("doc_id").alias("m_id"), "band_id", "band_key",
        F.lit(False).alias("is_new"),
    ).unionByName(
        new_bands.select(
            F.col("_id").alias("m_id"), "band_id", "band_key",
            F.lit(True).alias("is_new"),
        )
    )
    w = Window.partitionBy("band_id", "band_key")
    st = members.withColumn("_bsz", F.count(F.lit(1)).over(w)).withColumn(
        "_bmin", F.min(F.struct(F.col("m_id"), F.col("is_new"))).over(w)
    )
    small = st.filter(F.col("_bsz") <= star)
    a, b = small.alias("a"), small.alias("b")
    cand_small = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.m_id") < F.col("b.m_id")),
    ).filter(F.col("a.is_new") | F.col("b.is_new")).select(
        F.col("a.m_id").alias("doc_a"), F.col("b.m_id").alias("doc_b")
    )
    cand_star = (
        st.filter((F.col("_bsz") > star) & (F.col("m_id") != F.col("_bmin.m_id")))
        .filter(F.col("is_new") | F.col("_bmin.is_new"))
        .select(F.col("_bmin.m_id").alias("doc_a"), F.col("m_id").alias("doc_b"))
    )
    cand = cand_small.union(cand_star).distinct()
    sig_union = new_sigs.withColumnRenamed("_id", "doc_id").unionByName(
        _guard(spark.read.parquet(f"{path}/sigs"), ["doc_id"])
    )
    sa = sig_union.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(nh)],
    )
    sb = sig_union.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(nh)],
    )
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .filter(_sig_match_estimate(nh) >= F.lit(thr) - F.lit(slack))
        .select("doc_a", "doc_b")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="minhash_probe_plan_r15")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    batch = docs.filter(F.col("doc_id") % 20 == 0)
    path = str(Path(tempfile.gettempdir()) / "spark_graft_idx" / "probe_plan_r15")
    build_minhash_index(
        corpus, path,
        num_hashes=_PMH_HASHES, bands=_PMH_BANDS, shingle_n=1,
        threshold=_PMH_THRESHOLD, star_bucket_threshold=_PMH_STAR,
        est_slack=_PMH_EST_SLACK,
    )
    out = Path(__file__).resolve().parent.parent / "plans" / "r15"
    out.mkdir(parents=True, exist_ok=True)
    for mode in ("clean", "dirty"):
        df = probe_front(spark, path, batch, clean=(mode == "clean"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        (out / f"minhash_probe_front_{mode}.txt").write_text(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        n_agg = len(re.findall(r"\bHashAggregate\b", text))
        n_join = len(re.findall(r"Join", text))
        print(f"{mode}: Exchange={n_ex} HashAggregate={n_agg} Join-nodes={n_join}")


if __name__ == "__main__":
    main()
