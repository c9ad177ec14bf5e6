"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (BASELINE.json north star): media payloads are ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas iterators (``mapInPandas``) — the
one place Python belongs, because pixel math is NumPy's job. The Spark-side
plumbing (schema, partitioning, batch shape) is real and tested. Two codec
paths: the default deterministic fake decoder (payload-hash seeded — works
on ANY bytes, used by the driver-testdata queries), and ``real_codec=True``
which decodes actual BMP/PNG/WAV/baseline-JPEG payloads with the
pure-stdlib codecs in operators/codecs.py + operators/jpeg.py (rounds
4-7; no PIL/libjpeg/librosa in the container, and none needed — PNG is
zlib inflate + the five scanline filters, baseline JPEG is
DHT-canonical Huffman + dequant + float IDCT, all public T.81/RFC
spec; progressive SOF2 JPEG decodes too as of r8). MP3 / arithmetic
JPEG would still need a library — ``decode_to_signal`` rejects unknown
magic bytes with a clear error.

Scale notes: payloads dominate row size — keep them out of shuffles.
Every operator here is a narrow mapInPandas (no shuffle); metadata-only
queries must select around the payload column so parquet column pruning
skips the bytes entirely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synth_media_table(docs: DataFrame, *, kind_cycle: int = 3) -> DataFrame:
    """Deterministic fake media table derived from ``documents`` — payload
    bytes are the utf-8 text; kind/meta derived from doc_id. Stands in for
    a real media lake so the plumbing is exercised on driver testdata."""
    kind = (
        F.when(F.col("doc_id") % kind_cycle == 0, "image")
        .when(F.col("doc_id") % kind_cycle == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("fake/v1").alias("format"),
        ).alias("meta"),
    )


def synth_real_media_table(
    docs: DataFrame,
    *,
    image_side: int = 32,
    wav_samples: int = 2048,
) -> DataFrame:
    """Media table whose payloads are REAL encoded bytes — BMP, PNG,
    baseline JPEG and WAV cycling by doc_id — deterministically generated
    (doc_id-seeded) so the real-codec decode path can be exercised and
    BENCHMARKED on driver testdata without any third-party codec or
    binary fixture in the repo. Encoding runs in the same narrow
    mapInPandas shape as decode: no shuffle, payloads born in-executor."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark_etl_twitter_spark.operators.codecs import (
            encode_bmp,
            encode_png,
            encode_wav,
        )
        from pyspark_etl_twitter_spark.operators.jpeg import encode_jpeg

        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for did in pdf["doc_id"]:
                did = int(did)
                rs = np.random.RandomState(did & 0x7FFFFFFF)
                sel = did % 4
                if sel == 3:
                    samples = (rs.rand(wav_samples) * 2.0 - 1.0).astype(np.float64)
                    payload, kind = encode_wav(samples), "audio"
                else:
                    px = rs.randint(
                        0, 256, (image_side, image_side, 3)
                    ).astype(np.uint8)
                    payload = (encode_bmp, encode_png, encode_jpeg)[sel](px)
                    kind = "image"
                ids.append(did)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(gen, out_schema)


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for a codec: sha256-seeded uniform samples.
    Real decode (PIL/librosa/ffmpeg) is not available in this container."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:4], "big")
    return np.random.RandomState(seed).rand(n).astype(np.float32)


def decode_media(media: DataFrame, *, real_codec: bool = False) -> DataFrame:
    """payload → fixed-size decoded sample vector (mapInPandas, Arrow
    batches). ``real_codec=True`` decodes actual BMP/PNG/WAV bytes with the
    pure-NumPy codecs (operators/codecs.py): images reduce to per-pixel
    luma, audio to mono, both linearly resampled to ``FEATURE_DIM``
    samples. Identical plan either way — only the per-batch Python
    function body differs, which is the point of the stub design."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("decoded", T.ArrayType(T.FloatType())),
        ]
    )
    if real_codec:
        from pyspark_etl_twitter_spark.operators.codecs import decode_to_signal

        decode_one = decode_to_signal
    else:
        decode_one = _fake_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "decoded": [
                        decode_one(p, FEATURE_DIM).tolist() for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(decode, out_schema)


def extract_features(media: DataFrame) -> DataFrame:
    """payload → feature vector + simple stats, one Arrow pass."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
            T.StructField("payload_bytes", T.IntegerType()),
            T.StructField("feature_norm", T.DoubleType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p, FEATURE_DIM) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [f.tolist() for f in feats],
                    "payload_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature_norm": [float(np.linalg.norm(f)) for f in feats],
                }
            )

    return media.mapInPandas(extract, out_schema)


def frame_sample(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """video → one row per sampled frame index (UDTF-style expansion done
    relationally: sequence + explode, no Python)."""
    video = media.filter(F.col("kind") == "video")
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int")
    )
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


def resize_meta(media: DataFrame, *, max_side: int = 256) -> DataFrame:
    """Pure-metadata resize planning (aspect-preserving target dims) —
    stays entirely in Catalyst; the pixel resample would plug into
    decode_media's pandas iterator."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    return media.select(
        "media_id",
        "kind",
        w.alias("src_width"),
        h.alias("src_height"),
        F.round(w * scale).cast("int").alias("dst_width"),
        F.round(h * scale).cast("int").alias("dst_height"),
    )


def perceptual_hash(media: DataFrame, *, real_codec: bool = False) -> DataFrame:
    """64-bit average-hash: decode 64 samples per item (8x8 pixel grid in
    the real-codec analogy), threshold each on the global mean → one bit
    each. Identical payloads hash equal; near-identical decodes differ in
    few bits — Hamming-bucketable like SimHash. One narrow mapInPandas
    from payload to hash; downstream dedup joins carry 8 bytes/item and
    never touch payloads. ``real_codec=True`` computes the REAL aHash on
    BMP payloads (8×8 luma block mean-pool, operators/codecs.py) and the
    64-sample mono signal for WAV — identical Spark plumbing."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    if real_codec:
        from pyspark_etl_twitter_spark.operators.codecs import hash_signal_64

        signal_64 = hash_signal_64
    else:
        signal_64 = lambda p: _fake_decode(p, 64)  # noqa: E731

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                arr = signal_64(p).astype(np.float64)
                bits = arr > arr.mean()
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                # fold into signed int64 (Spark LongType)
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "phash": hashes}
            )

    return media.mapInPandas(hash_batch, out_schema)


def phash_near_dup_pairs(media: DataFrame, *, max_hamming: int = 6) -> DataFrame:
    """Media near-dup candidates: band the 64-bit perceptual hash into 4
    16-bit bands, bucket-join on (band_idx, band_value), verify exact
    Hamming distance via bit_count(xor). Pigeonhole guarantee: ≤3 bit
    flips leave at least one of 4 bands intact, so recall is exact for
    hamming ≤ 3; beyond that (up to max_hamming) candidates are
    best-effort, same structure as SimHash banding (operators/dedup.py).
    Payload bytes never join — 8-byte hashes only."""
    hashed = perceptual_hash(media).select("media_id", "phash")
    bands = hashed.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("phash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", "b.band_idx", "b.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["media_a", "media_b"])
    )
    return cand.filter(F.col("hamming") <= max_hamming)
