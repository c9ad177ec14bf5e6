from pyspark_etl_twitter_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_dedup_groups,
    exact_dedup_summary,
    near_dup_pairs_minhash,
    ngram_jaccard_pairs,
    sha_fingerprints,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)
from pyspark_etl_twitter_spark.operators.packing import (
    pack_documents,
    stratified_sample,
)
from pyspark_etl_twitter_spark.operators.sentiment import (
    INTERCEPT,
    build_weight_table,
    fit_and_score,
    load_mllib_weights,
    score_documents,
    sentiment_class_counts,
)
from pyspark_etl_twitter_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    cosine_topk_pandas,
    embedding_near_dup_pairs,
    ivf_topk,
)
from pyspark_etl_twitter_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)
from pyspark_etl_twitter_spark.operators.textstats import (
    detect_language,
    doc_fingerprints,
    quality_columns,
)

__all__ = [
    "INTERCEPT",
    "ann_lsh_topk",
    "build_weight_table",
    "cosine_topk",
    "cosine_topk_pandas",
    "detect_language",
    "doc_fingerprints",
    "drop_exact_duplicates",
    "embedding_near_dup_pairs",
    "exact_dedup_groups",
    "exact_dedup_summary",
    "fit_and_score",
    "ivf_topk",
    "load_mllib_weights",
    "near_dup_pairs_minhash",
    "ngram_jaccard_pairs",
    "pack_documents",
    "quality_columns",
    "salted_aggregate",
    "salted_broadcast_left",
    "score_documents",
    "sentiment_class_counts",
    "sha_fingerprints",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "stratified_sample",
]
