"""Pure-stdlib media codecs: BMP (24-bit), PNG (8-bit, zlib), WAV (PCM16),
plus baseline JPEG via operators/jpeg.py (r7 — DCT/Huffman from the T.81
spec; progressive/arithmetic still rejected loudly).

Closes the environment gate in the multimodal path: the container has
no PIL/librosa/ffmpeg, but these formats are decodable with byte
slicing + NumPy alone, so ``decode_media(real_codec=True)``
(operators/multimodal.py) can exercise REAL bytes end-to-end — encoder and
decoder round-trip in tests, and the Spark-side plumbing (mapInPandas,
Arrow batches, schema) is byte-for-byte the path a PIL/librosa decode
would ride.

Formats are implemented from their public specifications:
- BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), 24 bpp BGR,
  rows padded to 4-byte boundaries, bottom-up when height > 0.
- PNG: 8-byte signature + CRC-checked chunks; IHDR geometry, IDAT zlib
  inflate, the five scanline filters (None/Sub/Up/Average/Paeth); 8-bit
  gray / gray+alpha / RGB / RGBA, non-interlaced (palette and Adam7
  rejected loudly).
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
# PNG (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced)
# --------------------------------------------------------------------------
#
# Implemented from the public PNG specification with the stdlib only:
# 8-byte signature, length+type+data+CRC chunks, IHDR geometry, IDAT
# zlib-inflate, and the five scanline filters (None/Sub/Up/Average/Paeth).
# Palette (color type 3), 16-bit depths, and Adam7 interlace are rejected
# explicitly — they are not needed to exercise real compressed-image bytes
# through the multimodal path, and rejecting loudly beats mis-decoding.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: np.ndarray, *, filter_type: int = 0) -> bytes:
    """uint8 array → PNG bytes. Shapes: (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, (h, w, 4) RGBA. ``filter_type`` applies one scanline
    filter (0-4) to every row — the knob tests use to exercise each
    decoder unfilter path against real deflate streams."""
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (h, w[, 1|2|3|4]) uint8 array, got {arr.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = arr.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    lines = bytearray()
    for y in range(h):
        row = raw[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int16), row[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int16), prev[:-ch]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            filt = row - (left + prev) // 2
        else:
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prev, ul)],
                dtype=np.int16,
            )
            filt = row - pred
        lines.append(filter_type)
        lines += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (h, w) for grayscale, (h, w, ch) for
    2/3/4-channel images. 8-bit depth, color types 0/2/4/6,
    non-interlaced; CRC-checked chunk walk; all five scanline filters."""
    import zlib

    if len(payload) < len(_PNG_SIG) or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + clen > len(payload):
            raise ValueError(f"truncated {ctype!r} chunk")
        data = payload[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + clen
    if ihdr is None or not idat or not seen_iend:
        raise ValueError("missing IHDR/IDAT/IEND chunk")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth={depth})")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type} (palette?)")
    if comp != 0 or filt_method != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    if w == 0 or h == 0:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # keep the module's malformed-input contract: every decoder raises
        # ValueError on corrupt bytes, never a library-specific error
        raise ValueError(f"corrupt IDAT zlib stream: {exc}") from exc
    if len(raw) != (stride + 1) * h:
        raise ValueError("IDAT length does not match IHDR geometry")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int16)
        if ftype == 0:
            row = line
        elif ftype == 2:
            row = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            row = np.empty(stride, dtype=np.int16)
            pv = prev.astype(np.int16)
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                if ftype == 1:
                    row[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    row[i] = (line[i] + (a + int(pv[i])) // 2) & 0xFF
                else:
                    c = int(pv[i - ch]) if i >= ch else 0
                    row[i] = (line[i] + _paeth(int(a), int(pv[i]), c)) & 0xFF
        else:
            raise ValueError(f"invalid PNG scanline filter {ftype}")
        out[y] = row.astype(np.uint8)
        prev = out[y]
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def _png_luma(img: np.ndarray) -> np.ndarray:
    """Luma plane of a decode_png result (alpha ignored, gray passthrough)."""
    if img.ndim == 2:
        return img.astype(np.float32)
    rgb = img[:, :, :3] if img.shape[2] >= 3 else np.repeat(img[:, :, :1], 3, axis=2)
    return rgb.astype(np.float32) @ np.array([0.299, 0.587, 0.114], dtype=np.float32)


# --------------------------------------------------------------------------
# Dispatch: payload sniffing + fixed-size signal extraction
# --------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str:
    """'bmp' | 'png' | 'jpeg' | 'wav' | 'unknown' by magic bytes."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
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
    elif kind == "png":
        sig = _png_luma(decode_png(payload)).ravel() / 255.0
    elif kind == "jpeg":
        from pyspark_etl_twitter_spark.operators.jpeg import decode_jpeg

        px = decode_jpeg(payload).astype(np.float32)
        sig = (px @ np.array([0.299, 0.587, 0.114], dtype=np.float32)).ravel() / 255.0
    elif kind == "wav":
        samples, _rate = decode_wav(payload)
        sig = samples.mean(axis=1)
    else:
        raise ValueError(
            "unknown media format (expected BMP, PNG, JPEG, or WAV magic)"
        )
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
    kind = sniff_format(payload or b"")
    if kind in ("bmp", "png", "jpeg"):
        if kind == "bmp":
            px = decode_bmp(payload).astype(np.float32)
            luma = px @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        elif kind == "jpeg":
            from pyspark_etl_twitter_spark.operators.jpeg import decode_jpeg

            px = decode_jpeg(payload).astype(np.float32)
            luma = px @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        else:
            luma = _png_luma(decode_png(payload))
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
