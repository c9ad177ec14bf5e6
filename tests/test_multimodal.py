"""Multimodal plumbing tests: schema, Arrow batch shape, determinism.
The codec is a deterministic stub (no media libs in container) — these
tests pin the Spark-side contract so a real codec drops in unchanged."""

import numpy as np
import pytest

from pyspark_etl_twitter_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    frame_sample,
    resize_meta,
    synth_media_table,
)
from pyspark_etl_twitter_spark.sources.catalog import load_table
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def media(spark):
    return synth_media_table(load_table(spark, SF_TINY, "documents"))


def test_media_schema(media):
    assert media.schema["payload"].dataType.typeName() == "binary"
    assert media.schema["meta"].dataType.typeName() == "struct"
    assert media.count() == 500


def test_decode_deterministic(media):
    a = {r.media_id: r.decoded for r in decode_media(media).collect()}
    b = {r.media_id: r.decoded for r in decode_media(media).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())


def test_real_codec_rejects_unknown_magic(media):
    # synth_media_table payloads are raw utf-8 text, not BMP/WAV — the
    # real-codec path must fail loudly, not silently fake-decode
    with pytest.raises(Exception, match="unknown media format"):
        decode_media(media, real_codec=True).collect()


def test_extract_features(media):
    rows = extract_features(media).collect()
    assert len(rows) == 500
    for r in rows[:10]:
        assert len(r.feature) == FEATURE_DIM
        assert r.payload_bytes > 0
        assert abs(r.feature_norm - float(np.linalg.norm(r.feature))) < 1e-5


def test_frame_sample_counts(spark, media):
    frames = frame_sample(media, every_ms=1000)
    per = frames.groupBy("media_id").count().collect()
    metas = {r.media_id: r.meta.duration_ms for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in per} == set(metas)
    for r in per:
        assert r["count"] == max(1, metas[r.media_id] // 1000)


def test_resize_preserves_aspect(media):
    rows = resize_meta(media, max_side=256).collect()
    for r in rows:
        assert max(r.dst_width, r.dst_height) <= 256
        if max(r.src_width, r.src_height) <= 256:
            assert (r.dst_width, r.dst_height) == (r.src_width, r.src_height)


def test_phash_identical_payloads_collide_and_band_join_finds_them(spark):
    from pyspark.sql import functions as F

    from pyspark_etl_twitter_spark.operators.multimodal import (
        perceptual_hash,
        phash_near_dup_pairs,
        synth_media_table,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en", "a", 19),
            (2, "the quick brown fox", "en", "a", 19),   # exact dup payload
            (3, "a completely different document body", "en", "a", 36),
            (4, "yet another unrelated text payload here", "en", "a", 39),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    media = synth_media_table(docs)
    hashes = {r.media_id: r.phash for r in perceptual_hash(media).collect()}
    assert hashes[1] == hashes[2]
    assert hashes[1] != hashes[3]

    pairs = {
        (r.media_a, r.media_b, r.hamming)
        for r in phash_near_dup_pairs(media, max_hamming=0).collect()
    }
    assert (1, 2, 0) in pairs
    assert all(a == 1 and b == 2 for a, b, _ in pairs)

    # plan: bucket equi-join, no cartesian, no row-wise Python UDF
    plan = (
        phash_near_dup_pairs(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_synth_real_media_decodes_under_real_codec(spark):
    """synth_real_media_table emits genuine BMP/PNG/JPEG/WAV bytes: the
    real-codec decode path (the one the media bench row times) must
    decode every row to FEATURE_DIM samples with no unknown-magic rows."""
    from pyspark_etl_twitter_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_media,
        synth_real_media_table,
    )
    from pyspark_etl_twitter_spark.sources.catalog import load_table

    docs = load_table(spark, SF_TINY, "documents").limit(40)
    media = synth_real_media_table(docs)
    rows = decode_media(media, real_codec=True).collect()
    assert len(rows) == 40
    assert all(len(r.decoded) == FEATURE_DIM for r in rows)
    kinds = {r.kind for r in rows}
    assert kinds == {"image", "audio"}
    # deterministic: same ids -> same payload bytes -> same samples
    again = decode_media(media, real_codec=True).collect()
    assert {r.media_id: r.decoded for r in rows} == {
        r.media_id: r.decoded for r in again
    }
