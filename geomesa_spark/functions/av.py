"""Audio/video payload plumbing (multimodal binary columns, task addendum).

The task treats audio/video exactly like images: opaque ``binary`` columns
with typed metadata, processed only inside Arrow-batched stages. This
container has no audio/video codec libraries, so — per the task contract —
the COMPRESSED-codec decode steps are clearly-marked stubs
(:func:`decode_audio` fmt='mp3', :func:`decode_video_frame` fmt='h264'
raise NotImplementedError), while everything the engine actually exercises
is real:

- ``pcm16``: raw 16-bit little-endian mono PCM — real encode/decode.
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
    """bytes -> int16 sample array. 'pcm16' is real; compressed codecs are
    STUBBED (no libmp3lame/ffmpeg in this container) — the Spark-side
    plumbing is identical either way, so a real deployment swaps only this
    dispatch."""
    if fmt == "pcm16":
        return np.frombuffer(buf, dtype="<i2")
    if fmt in ("mp3", "aac", "opus"):
        raise NotImplementedError(
            f"{fmt} decode requires an audio codec library, absent from this "
            f"environment; use fmt='pcm16' (real raw codec) in tests/benches"
        )
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
