"""Pure-NumPy media codecs: BMP (24-bit uncompressed) and WAV (PCM16).

Closes the last environment gate in the multimodal path: the container has
no PIL/librosa/ffmpeg, but these two formats are simple enough to decode
with byte slicing + NumPy alone, so ``decode_media(real_codec=True)``
(operators/multimodal.py) can exercise REAL bytes end-to-end — encoder and
decoder round-trip in tests, and the Spark-side plumbing (mapInPandas,
Arrow batches, schema) is byte-for-byte the path a PIL/librosa decode
would ride.

Formats are implemented from their public specifications:
- BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), 24 bpp BGR,
  rows padded to 4-byte boundaries, bottom-up when height > 0.
- WAV: RIFF container, ``fmt `` chunk (PCM, 16-bit), ``data`` chunk of
  interleaved little-endian int16 frames; unknown chunks are skipped by
  walking the chunk list (word-aligned), as the spec requires.

No Spark imports here — these run inside pandas-iterator workers.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP (24-bit, uncompressed)
# --------------------------------------------------------------------------

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit BMP bytes (bottom-up, padded)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {arr.shape}")
    h, w, _ = arr.shape
    row_len = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    file_header = _BMP_FILE_HEADER.pack(b"BM", offset + len(data), 0, 0, offset)
    info_header = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BMP bytes → (h, w, 3) uint8 RGB array.

    Handles positive (bottom-up) and negative (top-down) heights and the
    4-byte row padding. Compressed or non-24-bpp files are rejected."""
    if len(payload) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError("truncated BMP header")
    magic, _, _, _, offset = _BMP_FILE_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (
        hdr_size,
        w,
        h,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _ncolors,
        _nimportant,
    ) = _BMP_INFO_HEADER.unpack_from(payload, _BMP_FILE_HEADER.size)
    if hdr_size < _BMP_INFO_HEADER.size or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bpp BMP supported (bpp={bpp})")
    # malformed dimensions/offset must surface as the ValueError contract,
    # not an opaque numpy reshape error downstream
    if w <= 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    if offset < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError(f"BMP pixel-data offset {offset} inside header")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    need = offset + row_len * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_len * h, offset=offset)
    rows = rows.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# --------------------------------------------------------------------------
# WAV (RIFF / PCM16)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """float array in [-1, 1] (shape (n,) mono or (n, ch)) → PCM16 WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    ints = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    data = ints.tobytes()
    block_align = 2 * ch
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → (float32 array in [-1, 1] of shape (n, ch),
    sample_rate). Walks the RIFF chunk list, skipping unknown chunks
    (word-aligned), so files with LIST/INFO metadata decode too."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    # bound the chunk walk at the RIFF-declared size: trailing non-chunk
    # bytes after the container (tagger appendages) are outside the RIFF
    # payload and must not be parsed as chunk headers — but a declared
    # size past the actual payload still fails per-chunk below
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    pos, end = 12, min(len(payload), 8 + riff_size)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + clen > end:
            raise ValueError(
                f"truncated {cid!r} chunk (declares {clen} bytes past payload end)"
            )
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    if ch < 1:
        raise ValueError("fmt chunk declares 0 channels")
    ints = np.frombuffer(data, dtype="<i2")
    n = len(ints) // ch
    return (ints[: n * ch].reshape(n, ch).astype(np.float32) / 32768.0), sample_rate


# --------------------------------------------------------------------------
# Dispatch: payload sniffing + fixed-size signal extraction
# --------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str:
    """'bmp' | 'wav' | 'unknown' by magic bytes."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "unknown"


def decode_to_signal(payload: bytes, n: int) -> np.ndarray:
    """Decode real bytes and reduce to an ``n``-sample float32 vector via
    linear resampling: images flatten to per-pixel luma in [0, 1], audio
    mixes channels down to mono in [-1, 1]. Deterministic — the
    real-codec twin of ``multimodal._fake_decode``."""
    kind = sniff_format(payload or b"")
    if kind == "bmp":
        px = decode_bmp(payload).astype(np.float32)
        sig = (px @ np.array([0.299, 0.587, 0.114], dtype=np.float32)).ravel() / 255.0
    elif kind == "wav":
        samples, _rate = decode_wav(payload)
        sig = samples.mean(axis=1)
    else:
        raise ValueError("unknown media format (expected BMP or WAV magic)")
    if len(sig) == 0:
        return np.zeros(n, dtype=np.float32)
    xs = np.linspace(0.0, 1.0, num=n)
    xp = np.linspace(0.0, 1.0, num=len(sig))
    return np.interp(xs, xp, sig).astype(np.float32)


def hash_signal_64(payload: bytes) -> np.ndarray:
    """64-value signal for perceptual hashing of real bytes: images use
    8×8 2-D block mean-pooling of the luma plane (the classic aHash grid
    — spatially aware, unlike a 1-D resample), audio uses the 64-sample
    resampled mono signal."""
    if sniff_format(payload or b"") == "bmp":
        px = decode_bmp(payload).astype(np.float32)
        luma = px @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        h, w = luma.shape
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        out = np.empty(64, dtype=np.float32)
        for i in range(8):
            for j in range(8):
                block = luma[ys[i] : max(ys[i + 1], ys[i] + 1),
                             xs[j] : max(xs[j + 1], xs[j] + 1)]
                out[i * 8 + j] = float(block.mean())
        return out / 255.0
    return decode_to_signal(payload, 64)
