"""Image payload codecs + perceptual hash (pure numpy + stdlib zlib).

The BASELINE input table carries opaque image ``bytes`` with ``(w, h, fmt)``
metadata. This container has no PIL/libjpeg, so:

- ``raw``  — uncompressed RGB, h*w*3 bytes, row-major. Lossless.
- ``png``  — real PNG (8-bit truecolor), encoded/decoded from scratch with
  stdlib zlib + struct (spec: W3C PNG). Lossless; decoder handles filter
  types 0-4; our encoder emits filter 0 (None) rows — decode covers the full spec.
- ``qjz``  — deterministic lossy codec (channel quantization + zlib; PSNR
  ~47 dB at q=4); kept alongside jpeg because its reconstruction is exactly
  reproducible in SQL, which the phash/density oracles rely on.
- ``jpeg`` — REAL baseline JFIF, encoder + decoder implemented from the
  public spec in :mod:`.jpeg` (pure numpy + stdlib; no libjpeg in this
  container). Quality 98 keeps roundtrip PSNR >= 43 dB on the synthetic
  corpus, clearing the BASELINE ">= 40 dB for lossy" invariant.

The decode path is only ever invoked inside Arrow-batched ``mapInPandas``
stages (never per-row Python UDFs), per the input_hint.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# raw
# ---------------------------------------------------------------------------

def encode_raw(arr: np.ndarray) -> bytes:
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    return arr.tobytes()


def decode_raw(buf: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# png
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    # filter 0 (None) per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(buf: bytes) -> np.ndarray:
    assert buf[:8] == _PNG_SIG, "not a PNG"
    off = 8
    idat = []
    w = h = bit_depth = color_type = None
    while off < len(buf):
        (length,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4 : off + 8]
        data = buf[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", data)
            assert bit_depth == 8 and color_type == 2 and interlace == 0, (
                "decoder supports 8-bit truecolor non-interlaced only"
            )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = 3
    for r in range(h):
        f = filters[r]
        cur = data[r].copy()
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[r] = cur
        elif f == 1:  # Sub
            for c in range(stride):
                left = out[r, c - bpp] if c >= bpp else 0
                out[r, c] = (cur[c] + left) & 0xFF
        elif f == 2:  # Up
            out[r] = (cur + prev) & 0xFF
        elif f == 3:  # Average
            for c in range(stride):
                left = out[r, c - bpp] if c >= bpp else 0
                out[r, c] = (cur[c] + ((left + prev[c]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for c in range(stride):
                a = out[r, c - bpp] if c >= bpp else 0
                b = prev[c]
                cc = prev[c - bpp] if c >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                out[r, c] = (cur[c] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# qjz — deterministic lossy codec (SQL-replayable reconstruction)
# ---------------------------------------------------------------------------

QJZ_Q = 4  # quantization step -> PSNR ~ 20*log10(255 / (Q/sqrt(12))) ~ 47 dB


def encode_qjz(arr: np.ndarray, q: int = QJZ_Q) -> bytes:
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    quant = (arr.astype(np.uint16) // q).astype(np.uint8)
    return b"QJZ1" + struct.pack("<HHB", w, h, q) + zlib.compress(quant.tobytes(), 6)


def decode_qjz(buf: bytes) -> np.ndarray:
    assert buf[:4] == b"QJZ1", "not qjz"
    w, h, q = struct.unpack_from("<HHB", buf, 4)
    quant = np.frombuffer(zlib.decompress(buf[9:]), dtype=np.uint8).reshape(h, w, 3)
    return np.clip(quant.astype(np.uint16) * q + q // 2, 0, 255).astype(np.uint8)


JPEG_QUALITY = 98  # min roundtrip PSNR 43.6 dB over the synthetic corpus
# (the >= 40 dB lossy invariant with margin; q97 dips to 39.9 on the
# noisiest images)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Real baseline JFIF decode — pure numpy + stdlib (no libjpeg in this
    container), implemented from the public spec in :mod:`.jpeg`. Baseline
    SOF0, 8-bit, 4:4:4/grayscale; see jpeg.py for the documented scope."""
    from .jpeg import decode_jpeg as _dec

    return _dec(buf)


def encode_jpeg(arr: np.ndarray, quality: int = JPEG_QUALITY) -> bytes:
    from .jpeg import encode_jpeg as _enc

    return _enc(arr, quality)


_CODECS = {
    "png": decode_png,
    "qjz": decode_qjz,
    "jpeg": decode_jpeg,
}


def decode_image(buf: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """bytes -> (h, w, 3) uint8. Dispatch on the fmt metadata column."""
    if fmt == "raw":
        return decode_raw(buf, w, h)
    return _CODECS[fmt](bytes(buf))


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(arr)
    if fmt == "png":
        return encode_png(arr)
    if fmt == "qjz":
        return encode_qjz(arr)
    if fmt == "jpeg":
        return encode_jpeg(arr)
    raise ValueError(fmt)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


# ---------------------------------------------------------------------------
# perceptual hash (block-mean aHash, 64-bit, integer-exact)
# ---------------------------------------------------------------------------


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: 8x8 gray block means vs the global pixel mean
    (block-mean aHash). Chosen over DCT-sign pHash because synthetic/
    low-texture images have near-zero AC coefficients whose signs are
    numerical noise; block-mean thresholding stays stable under lossy
    quantization (the PSNR>=40dB regime).

    INTEGER-EXACT by construction: gray = 299R + 587G + 114B (x1000 fixed
    point), pixel (r, c) belongs to block (r*8//h, c*8//w), and bit b is set
    iff blocksum_b * n_pixels > graysum_total * blockarea_b — pure int64
    comparisons with no float rounding anywhere. That makes the hash
    reproducible bit-for-bit by ANY engine (the DuckDB oracle recomputes it
    from regenerated pixels) and independent of summation order. Bit i
    (row-major, i = block_row*8 + block_col) of the signed int64 result.
    """
    h, w = arr.shape[:2]
    g = (
        299 * arr[..., 0].astype(np.int64)
        + 587 * arr[..., 1].astype(np.int64)
        + 114 * arr[..., 2].astype(np.int64)
    )
    rb = (np.arange(h, dtype=np.int64) * 8) // h
    cb = (np.arange(w, dtype=np.int64) * 8) // w
    sums = np.zeros((8, 8), dtype=np.int64)
    np.add.at(sums, (rb[:, None], cb[None, :]), g)
    counts = np.zeros((8, 8), dtype=np.int64)
    np.add.at(counts, (rb[:, None], cb[None, :]), 1)
    total = int(g.sum())
    n = h * w
    bits = (sums * n > total * counts).astype(np.uint64).flatten()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        val |= b << np.uint64(i)
    return int(val.astype(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
