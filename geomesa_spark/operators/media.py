"""Audio/video table operators (multimodal pipeline, task addendum).

Same execution contract as the image operators: payloads are opaque binary
columns that are only ever read inside ONE Arrow-batched ``mapInPandas``
stage, which emits compact feature/frame rows — the bytes never cross a
shuffle. Generators are deterministic functions of the row id (distributed
via spark.range + mapInPandas, like sources/images.py), so any partition is
regenerable and tests need no external media files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import av

AUDIO_SCHEMA = "audio_id string, bytes binary, fmt string, sr int, n_samples int"
VIDEO_SCHEMA = "video_id string, bytes binary, fmt string, n_frames int, w int, h int"


def audio_df(
    spark, n: int, partitions: int | None = None, fmt: str = "pcm16"
) -> DataFrame:
    """Deterministic audio table: (audio_id, bytes, fmt, sr, n_samples).
    fmt='pcm16' (raw) or 'adpcm' (real IMA compression in independent
    seekable blocks — functions/av.encode_adpcm)."""
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    enc = {"pcm16": av.encode_pcm16, "adpcm": av.encode_adpcm}[fmt]

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                x = av.synth_audio(int(i))
                rows.append(
                    (f"aud{int(i):08d}", enc(x), fmt,
                     av.AUDIO_SR, len(x))
                )
            out = pd.DataFrame(
                rows, columns=["audio_id", "bytes", "fmt", "sr", "n_samples"]
            )
            out["sr"] = out["sr"].astype("int32")
            out["n_samples"] = out["n_samples"].astype("int32")
            yield out

    return rng.mapInPandas(gen, schema=AUDIO_SCHEMA)


def video_df(
    spark,
    n: int,
    n_frames: int = 16,
    partitions: int | None = None,
    fmt: str = "vraw",
) -> DataFrame:
    """Deterministic video table: (video_id, bytes, fmt, n_frames, w, h).
    fmt='vraw' (raw seekable) or 'mjpeg' (real per-frame JPEG compression
    behind a frame-offset index — functions/av.encode_mjpeg)."""
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    enc = {"vraw": av.encode_vraw, "mjpeg": av.encode_mjpeg}[fmt]

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                frames = av.synth_video(int(i), n_frames=n_frames)
                rows.append(
                    (f"vid{int(i):08d}", enc(frames), fmt,
                     frames.shape[0], frames.shape[2], frames.shape[1])
                )
            out = pd.DataFrame(
                rows, columns=["video_id", "bytes", "fmt", "n_frames", "w", "h"]
            )
            for c in ("n_frames", "w", "h"):
                out[c] = out[c].astype("int32")
            yield out

    return rng.mapInPandas(gen, schema=VIDEO_SCHEMA)


def audio_features(
    audio: DataFrame, frame: int = 512, hop: int = 256
) -> DataFrame:
    """-> (audio_id, frame_idx, rms, zcr): windowed RMS energy and
    zero-crossing rate per analysis frame (decode + vectorized features in
    one Arrow stage; only small feature rows leave Python)."""
    needed = audio.select("audio_id", "bytes", "fmt")

    def feats(batches):
        for pdf in batches:
            ids, fidx, rms_all, zcr_all = [], [], [], []
            for row in pdf.itertuples(index=False):
                x = av.decode_audio(row.bytes, row.fmt)
                rms, zcr = av.audio_frame_features(x, frame=frame, hop=hop)
                ids.extend([row.audio_id] * len(rms))
                fidx.append(np.arange(len(rms), dtype=np.int32))
                rms_all.append(rms)
                zcr_all.append(zcr)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "audio_id": ids,
                    "frame_idx": np.concatenate(fidx),
                    "rms": np.concatenate(rms_all),
                    "zcr": np.concatenate(zcr_all),
                }
            )

    return needed.mapInPandas(
        feats, schema="audio_id string, frame_idx int, rms double, zcr double"
    )


def audio_clip_features(
    audio: DataFrame, t0: float, t1: float, frame: int = 512, hop: int = 256
) -> DataFrame:
    """-> (audio_id, frame_idx, rms, zcr) for the time window [t0, t1)
    seconds only, decoded by SAMPLE-RANGE SEEK (functions/av.
    decode_audio_range): for 'adpcm' only the blocks covering the window
    are decoded, for 'pcm16' only those bytes are sliced — payload bytes
    outside the window are never parsed, the access pattern that keeps
    clip-level feature extraction affordable when the audio column is the
    bulk of the table."""
    needed = audio.select("audio_id", "bytes", "fmt", "sr", "n_samples")

    def feats(batches):
        for pdf in batches:
            ids, fidx, rms_all, zcr_all = [], [], [], []
            for row in pdf.itertuples(index=False):
                s0 = min(int(t0 * row.sr), int(row.n_samples))
                s1 = min(int(t1 * row.sr), int(row.n_samples))
                if s1 <= s0:
                    continue
                x = av.decode_audio_range(row.bytes, s0, s1, row.fmt)
                rms, zcr = av.audio_frame_features(x, frame=frame, hop=hop)
                ids.extend([row.audio_id] * len(rms))
                fidx.append(np.arange(len(rms), dtype=np.int32))
                rms_all.append(rms)
                zcr_all.append(zcr)
            if not ids:
                continue
            yield pd.DataFrame(
                {
                    "audio_id": ids,
                    "frame_idx": np.concatenate(fidx),
                    "rms": np.concatenate(rms_all),
                    "zcr": np.concatenate(zcr_all),
                }
            )

    return needed.mapInPandas(
        feats, schema="audio_id string, frame_idx int, rms double, zcr double"
    )


def video_frame_sample(video: DataFrame, every_k: int = 4) -> DataFrame:
    """-> (video_id, frame_idx, w, h, frame_bytes, gray_mean): every k-th
    frame, decoded by OFFSET from the seekable container — unsampled frames'
    bytes are never touched, which is what keeps frame sampling affordable
    when the video column is the bulk of 100 TB."""
    needed = video.select("video_id", "bytes", "fmt", "n_frames", "w", "h")
    k = int(every_k)

    def sample(batches):
        for pdf in batches:
            vids, fidx, ws, hs, fbytes, gmean = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                for fi in range(0, int(row.n_frames), k):
                    arr = av.decode_video_frame(row.bytes, fi, row.fmt)
                    vids.append(row.video_id)
                    fidx.append(fi)
                    ws.append(row.w)
                    hs.append(row.h)
                    fbytes.append(arr.tobytes())
                    gmean.append(
                        float(
                            (
                                299 * arr[..., 0].astype(np.int64)
                                + 587 * arr[..., 1].astype(np.int64)
                                + 114 * arr[..., 2].astype(np.int64)
                            ).mean()
                        )
                        / 1000.0
                    )
            if not vids:
                continue
            yield pd.DataFrame(
                {
                    "video_id": vids,
                    "frame_idx": np.array(fidx, dtype=np.int32),
                    "w": np.array(ws, dtype=np.int32),
                    "h": np.array(hs, dtype=np.int32),
                    "frame_bytes": fbytes,
                    "gray_mean": gmean,
                }
            )

    return needed.mapInPandas(
        sample,
        schema=(
            "video_id string, frame_idx int, w int, h int, "
            "frame_bytes binary, gray_mean double"
        ),
    )
