"""Audio/video payload plumbing (multimodal binary columns, task addendum).

The task treats audio/video exactly like images: opaque ``binary`` columns
with typed metadata, processed only inside Arrow-batched stages. This
container has no audio/video codec libraries, so — per the task contract —
the COMPRESSED-codec decode steps are clearly-marked stubs
(:func:`decode_audio` fmt='mp3', :func:`decode_video_frame` fmt='h264'
raise NotImplementedError), while everything the engine actually exercises
is real:

- ``pcm16``: raw 16-bit little-endian mono PCM — real encode/decode.
- ``adpcm``: REAL compressed audio — from-scratch IMA ADPCM (3.95:1 over
  pcm16; step/index tables from the public IMA 1992 recommended practice,
  identical to IETF RFC 3551's DVI4 payload) in fixed-size INDEPENDENT
  blocks, so (a) any sample range decodes by block offset without touching
  the rest of the payload and (b) encode/decode vectorize with numpy ACROSS
  blocks — the inner sequential recurrence runs once per within-block
  position over all blocks at once, not per sample.
- ``vraw``:  a tiny raw-video container (header + w*h*3 RGB frames) whose
  frames are SEEKABLE — frame k decodes by offset without touching the rest
  of the payload, which is the access pattern a frame-sampling pipeline
  needs at scale.
- ``mjpeg``: REAL compressed video — per-frame baseline JPEG from the
  from-scratch ITU T.81 codec (``functions/jpeg.py``) behind a frame-offset
  index, so offset-seek frame sampling holds for an actually-compressed
  format (PSNR >= 40 dB per frame at the default quality).
- deterministic synthesizers (audio tone mixes, moving-gradient video) that
  are pure functions of the row id, mirroring sources/images.py.
"""

from __future__ import annotations

import struct

import numpy as np

from ..sources.images import _u01

AUDIO_SR = 16_000


def synth_audio(i: int, sr: int = AUDIO_SR, seconds: float = 1.0) -> np.ndarray:
    """Deterministic int16 mono tone mix for row ``i`` (fundamental +
    2 harmonics + seeded phase), pure function of the id."""
    ids = np.array([i], dtype=np.int64)
    f0 = 80.0 + _u01(ids, 30)[0] * 700.0
    a1 = 0.3 + _u01(ids, 31)[0] * 0.4
    a2 = 0.1 + _u01(ids, 32)[0] * 0.2
    ph = _u01(ids, 33)[0] * 2 * np.pi
    t = np.arange(int(sr * seconds)) / sr
    x = (
        0.5 * np.sin(2 * np.pi * f0 * t + ph)
        + a1 * np.sin(2 * np.pi * 2 * f0 * t)
        + a2 * np.sin(2 * np.pi * 3 * f0 * t)
    )
    return np.clip(x / (0.5 + a1 + a2) * 32767.0, -32768, 32767).astype(np.int16)


def encode_pcm16(samples: np.ndarray) -> bytes:
    assert samples.dtype == np.int16 and samples.ndim == 1
    return samples.astype("<i2").tobytes()


def decode_audio(buf: bytes, fmt: str) -> np.ndarray:
    """bytes -> int16 sample array. 'pcm16' (raw) and 'adpcm' (REAL
    compressed, in-repo IMA codec) are real; entropy-coded psychoacoustic
    codecs are STUBBED (no libmp3lame/ffmpeg in this container) — the
    Spark-side plumbing is identical either way, so a real deployment swaps
    only this dispatch."""
    if fmt == "pcm16":
        return np.frombuffer(buf, dtype="<i2")
    if fmt == "adpcm":
        return decode_adpcm(buf)
    if fmt in ("mp3", "aac", "opus"):
        raise NotImplementedError(
            f"{fmt} decode requires an audio codec library, absent from this "
            f"environment; fmt='adpcm' is the REAL in-repo compressed "
            f"alternative (IMA ADPCM, 3.95:1, block-seekable), fmt='pcm16' "
            f"the raw one"
        )
    raise ValueError(fmt)


# IMA ADPCM step-size and index-adaptation tables — public-spec constants
# (IMA "Recommended Practices for Enhancing Digital Audio Compatibility in
# Multimedia Systems" rev 3.00, 1992; reproduced in IETF RFC 3551 §4.5.1).
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

_ADPCM_MAGIC = b"ADP1"
ADPCM_BLOCK = 505  # odd: 1 header sample + 252 packed nibble bytes


def _ima_reconstruct(pred, index, code):
    """Shared encoder/decoder state update (vectorized over blocks):
    (predictor, index, 4-bit code) -> (new predictor, new index)."""
    step = _IMA_STEPS[index]
    diffq = (
        (step >> 3)
        + np.where(code & 4, step, 0)
        + np.where(code & 2, step >> 1, 0)
        + np.where(code & 1, step >> 2, 0)
    )
    pred = np.clip(
        np.where(code & 8, pred - diffq, pred + diffq), -32768, 32767
    )
    index = np.clip(index + _IMA_INDEX[code & 7], 0, 88)
    return pred, index


def encode_adpcm(samples: np.ndarray, block_samples: int = ADPCM_BLOCK) -> bytes:
    """int16 mono -> IMA ADPCM in INDEPENDENT fixed blocks.

    Container: magic(4) | n_samples u32 | block_samples u16 | per block a
    4-byte header (first sample i16, initial step index u8, pad) + packed
    4-bit codes for the remaining block_samples-1 samples (low nibble
    first). Each block's initial state lives in its own header — no state
    crosses blocks — so blocks decode independently (seek + parallelism)
    and the whole encode runs vectorized across blocks: the only Python
    loop is over the block_samples within-block positions.
    """
    assert samples.dtype == np.int16 and samples.ndim == 1
    assert block_samples % 2 == 1 and 3 <= block_samples <= 65535
    n = len(samples)
    nb = max(1, -(-n // block_samples))
    x = np.empty(nb * block_samples, dtype=np.int32)
    x[:n] = samples
    x[n:] = samples[-1] if n else 0
    x = x.reshape(nb, block_samples)

    pred = x[:, 0].copy()
    # initial step index per block: nearest step to the first delta
    # (adaptation then takes over; stored in the header so decode matches)
    d0 = np.abs(x[:, 1] - x[:, 0]) if block_samples > 1 else np.zeros(nb, np.int32)
    index = np.clip(np.searchsorted(_IMA_STEPS, d0), 0, 88).astype(np.int32)

    header = np.zeros((nb, 4), dtype=np.uint8)
    header[:, 0:2] = (
        pred.astype("<i2").view(np.uint8).reshape(nb, 2)
    )
    header[:, 2] = index.astype(np.uint8)

    codes = np.zeros((nb, block_samples - 1), dtype=np.uint8)
    for t in range(1, block_samples):
        step = _IMA_STEPS[index]
        diff = x[:, t] - pred
        code = np.where(diff < 0, 8, 0).astype(np.int32)
        mag = np.abs(diff)
        temp = step.copy()
        for bit in (4, 2, 1):
            ge = mag >= temp
            code |= np.where(ge, bit, 0)
            mag -= np.where(ge, temp, 0)
            temp >>= 1
        pred, index = _ima_reconstruct(pred, index, code)
        codes[:, t - 1] = code
    packed = codes[:, 0::2] | (codes[:, 1::2] << 4)
    blocks = np.concatenate([header, packed], axis=1)
    return (
        _ADPCM_MAGIC
        + struct.pack("<IH", n, block_samples)
        + blocks.tobytes()
    )


def adpcm_meta(buf: bytes) -> tuple[int, int]:
    """(n_samples, block_samples) from the header alone."""
    assert bytes(buf[:4]) == _ADPCM_MAGIC, "not adpcm"
    return struct.unpack_from("<IH", buf, 4)


def _decode_adpcm_blocks(buf: bytes, b0: int, b1: int, block_samples: int):
    """Decode blocks [b0, b1) only — reads exactly those blocks' bytes."""
    bsz = 4 + (block_samples - 1) // 2
    nb = b1 - b0
    raw = np.frombuffer(
        buf, dtype=np.uint8, count=nb * bsz, offset=10 + b0 * bsz
    ).reshape(nb, bsz)
    pred = raw[:, 0:2].reshape(-1).view("<i2").astype(np.int32)
    index = np.clip(raw[:, 2].astype(np.int32), 0, 88)
    packed = raw[:, 4:]
    codes = np.empty((nb, block_samples - 1), dtype=np.int32)
    codes[:, 0::2] = packed & 0x0F
    codes[:, 1::2] = packed >> 4
    out = np.empty((nb, block_samples), dtype=np.int32)
    out[:, 0] = pred
    for t in range(1, block_samples):
        pred, index = _ima_reconstruct(pred, index, codes[:, t - 1])
        out[:, t] = pred
    return out


def decode_adpcm(buf: bytes) -> np.ndarray:
    """Full decode -> int16 samples (vectorized across blocks)."""
    n, bs = adpcm_meta(buf)
    nb = max(1, -(-n // bs))
    return _decode_adpcm_blocks(buf, 0, nb, bs).reshape(-1)[:n].astype(np.int16)


def decode_audio_range(buf: bytes, s0: int, s1: int, fmt: str) -> np.ndarray:
    """Decode ONLY samples [s0, s1) — the audio analog of
    :func:`decode_video_frame`'s offset seek. For 'pcm16' a pure byte
    slice; for 'adpcm' only the covering blocks are decoded (no other
    block's bytes are read — the property that makes windowed audio
    feature extraction affordable when the audio column dominates the
    table bytes)."""
    if not 0 <= s0 <= s1:
        raise IndexError((s0, s1))
    if fmt == "pcm16":
        return np.frombuffer(buf, dtype="<i2", count=s1 - s0, offset=2 * s0)
    if fmt == "adpcm":
        n, bs = adpcm_meta(buf)
        if s1 > n:
            raise IndexError(f"range ({s0}, {s1}) of {n}")
        if s0 == s1:
            return np.empty(0, dtype=np.int16)
        b0, b1 = s0 // bs, -(-s1 // bs)
        dec = _decode_adpcm_blocks(buf, b0, b1, bs).reshape(-1)
        return dec[s0 - b0 * bs : s1 - b0 * bs].astype(np.int16)
    raise ValueError(fmt)


_VRAW_MAGIC = b"VRW1"


def encode_vraw(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 -> seekable raw-video container."""
    assert frames.dtype == np.uint8 and frames.ndim == 4 and frames.shape[3] == 3
    n, h, w = frames.shape[:3]
    return _VRAW_MAGIC + struct.pack("<HHH", n, w, h) + frames.tobytes()


def vraw_meta(buf: bytes) -> tuple[int, int, int]:
    """(n_frames, w, h) from the header alone."""
    assert bytes(buf[:4]) == _VRAW_MAGIC, "not vraw"
    return struct.unpack_from("<HHH", buf, 4)


def decode_video_frame(buf: bytes, k: int, fmt: str = "vraw") -> np.ndarray:
    """Decode ONLY frame ``k`` -> (h, w, 3) uint8. For 'vraw' this is a pure
    offset slice; for 'mjpeg' the header index locates frame k's JPEG stream
    and ONLY that stream is entropy-decoded (no other frame's bytes are
    parsed — the property frame-sampling relies on at scale, now holding
    for a real compressed format). Inter-frame codecs are STUBBED."""
    if fmt == "vraw":
        n, w, h = vraw_meta(buf)
        if not 0 <= k < n:
            raise IndexError(f"frame {k} of {n}")
        fsz = w * h * 3
        off = 10 + k * fsz
        return np.frombuffer(buf, dtype=np.uint8, count=fsz, offset=off).reshape(
            h, w, 3
        )
    if fmt == "mjpeg":
        from .jpeg import decode_jpeg

        n, _w, _h = mjpeg_meta(buf)
        if not 0 <= k < n:
            raise IndexError(f"frame {k} of {n}")
        base = 10 + 8 * (n + 1)
        o0, o1 = struct.unpack_from("<QQ", buf, 10 + 8 * k)
        return decode_jpeg(bytes(buf[base + o0 : base + o1]))
    if fmt in ("h264", "vp9", "av1"):
        raise NotImplementedError(
            f"{fmt} inter-frame decode requires a video codec library, absent "
            f"from this environment; fmt='mjpeg' is the REAL in-repo "
            f"compressed alternative (per-frame ITU T.81 JPEG + seekable "
            f"frame index, functions/jpeg.py), fmt='vraw' the raw one"
        )
    raise ValueError(fmt)


_MJPG_MAGIC = b"MJP1"


def encode_mjpeg(frames: np.ndarray, quality: int = 92) -> bytes:
    """(n, h, w, 3) uint8 -> REAL compressed, seekable video container:
    per-frame baseline JPEG (the from-scratch ITU T.81 codec in
    ``functions/jpeg.py``) behind a frame-offset index in the header —
    the Motion-JPEG layout. Frame k decodes by offset without parsing any
    other frame's bitstream, so the frame-sampling access pattern of
    :func:`operators.media.video_frame_sample` holds for a genuinely
    compressed format, not just raw frames.

    Layout: magic(4) | n,w,h (<HHH) | (n+1) u64 offsets relative to the end
    of the index | concatenated JPEG streams. offsets[n] is the total data
    length, so frame k's stream is data[off[k]:off[k+1]].
    """
    from .jpeg import encode_jpeg

    assert frames.dtype == np.uint8 and frames.ndim == 4 and frames.shape[3] == 3
    n, h, w = frames.shape[:3]
    streams = [encode_jpeg(frames[k], quality=quality) for k in range(n)]
    offs = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum([len(s) for s in streams], out=offs[1:])
    return (
        _MJPG_MAGIC
        + struct.pack("<HHH", n, w, h)
        + offs.astype("<u8").tobytes()
        + b"".join(streams)
    )


def mjpeg_meta(buf: bytes) -> tuple[int, int, int]:
    """(n_frames, w, h) from the header alone."""
    assert bytes(buf[:4]) == _MJPG_MAGIC, "not mjpeg"
    return struct.unpack_from("<HHH", buf, 4)


def synth_video(i: int, n_frames: int = 16, w: int = 24, h: int = 16) -> np.ndarray:
    """Deterministic moving-gradient clip for row ``i``: per-frame phase
    shift seeded by the id; (n, h, w, 3) uint8."""
    ids = np.array([i], dtype=np.int64)
    speed = 1.0 + _u01(ids, 40)[0] * 6.0
    ph = _u01(ids, 41)[0] * 2 * np.pi
    t = np.arange(n_frames)[:, None, None]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 127.5 + 100.0 * np.sin(
        2 * np.pi * (xx[None] / w + speed * t / n_frames) + ph
    )
    frames = np.stack(
        [
            base,
            np.broadcast_to(255.0 * xx / max(w - 1, 1), base.shape),
            np.broadcast_to(255.0 * yy / max(h - 1, 1), base.shape),
        ],
        axis=3,
    )
    return np.clip(frames, 0, 255).astype(np.uint8)


def audio_frame_features(
    samples: np.ndarray, frame: int = 512, hop: int = 256
) -> tuple[np.ndarray, np.ndarray]:
    """(rms, zcr) per analysis window — vectorized numpy over a strided
    window view (real feature extraction, the per-row compute of the
    audio-features operator)."""
    x = samples.astype(np.float64) / 32768.0
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    win = x[idx]
    rms = np.sqrt((win * win).mean(axis=1))
    zcr = (np.diff(np.signbit(win), axis=1) != 0).mean(axis=1)
    return rms, zcr
