"""Audio/video multimodal plumbing tests (functions/av.py, operators/media.py):
real raw codecs + feature/frame operators, with the compressed-codec decode
steps clearly stubbed per the task contract."""

from __future__ import annotations

import numpy as np
import pytest

from geomesa_spark.functions import av


def test_pcm16_roundtrip_deterministic():
    x = av.synth_audio(7)
    assert x.dtype == np.int16 and len(x) == av.AUDIO_SR
    buf = av.encode_pcm16(x)
    assert len(buf) == 2 * len(x)
    back = av.decode_audio(buf, "pcm16")
    assert (back == x).all()
    assert (av.synth_audio(7) == x).all()  # deterministic
    assert not (av.synth_audio(8) == x).all()


def test_compressed_codecs_are_loud_stubs():
    with pytest.raises(NotImplementedError):
        av.decode_audio(b"\x00" * 16, "mp3")
    with pytest.raises(NotImplementedError):
        av.decode_video_frame(b"\x00" * 16, 0, "h264")


def test_vraw_frame_seek():
    frames = av.synth_video(3, n_frames=10, w=12, h=8)
    buf = av.encode_vraw(frames)
    n, w, h = av.vraw_meta(buf)
    assert (n, w, h) == (10, 12, 8)
    for k in (0, 4, 9):
        assert (av.decode_video_frame(buf, k) == frames[k]).all()
    with pytest.raises(IndexError):
        av.decode_video_frame(buf, 10)


def test_audio_frame_features_math():
    # constant-amplitude sine: RMS ~ A/sqrt(2), ZCR ~ 2f/sr
    sr = av.AUDIO_SR
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 200 * t) * 32767).astype(np.int16)
    rms, zcr = av.audio_frame_features(x, frame=1024, hop=1024)
    assert np.allclose(rms, 0.5 / np.sqrt(2), atol=0.01)
    assert np.allclose(zcr, 2 * 200 / sr, atol=0.005)


def test_audio_features_operator(spark):
    from geomesa_spark.operators.media import audio_df, audio_features

    df = audio_df(spark, 6)
    out = audio_features(df, frame=512, hop=256).toPandas()
    assert set(out.columns) == {"audio_id", "frame_idx", "rms", "zcr"}
    n_frames = 1 + (av.AUDIO_SR - 512) // 256
    assert (out.groupby("audio_id").size() == n_frames).all()
    # parity: operator values == direct numpy on the same synth audio
    a0 = out[out.audio_id == "aud00000000"].sort_values("frame_idx")
    rms, zcr = av.audio_frame_features(av.synth_audio(0), frame=512, hop=256)
    assert np.allclose(a0["rms"].to_numpy(), rms)
    assert np.allclose(a0["zcr"].to_numpy(), zcr)


def test_video_frame_sample_operator(spark):
    from geomesa_spark.operators.media import video_df, video_frame_sample

    df = video_df(spark, 5, n_frames=16)
    out = video_frame_sample(df, every_k=4).toPandas()
    assert sorted(out["frame_idx"].unique()) == [0, 4, 8, 12]
    assert (out.groupby("video_id").size() == 4).all()
    # sampled frame bytes decode back to the synthesized frame exactly
    r = out[(out.video_id == "vid00000002") & (out.frame_idx == 8)].iloc[0]
    want = av.synth_video(2, n_frames=16)[8]
    got = np.frombuffer(bytes(r.frame_bytes), dtype=np.uint8).reshape(
        r.h, r.w, 3
    )
    assert (got == want).all()
    g = (
        299 * want[..., 0].astype(np.int64)
        + 587 * want[..., 1].astype(np.int64)
        + 114 * want[..., 2].astype(np.int64)
    ).mean() / 1000.0
    assert r.gray_mean == pytest.approx(g)


def test_adpcm_roundtrip_snr_and_ratio():
    """Real compressed audio: the from-scratch IMA codec must actually
    compress (~3.95:1) and reconstruct tone mixes at >= 24 dB SNR (IMA
    ADPCM's expected range on full-band material), deterministically."""
    for i in (0, 1, 5):
        x = av.synth_audio(i)
        buf = av.encode_adpcm(x)
        assert len(buf) < 2 * len(x) / 3.5  # actually compressed
        y = av.decode_audio(buf, "adpcm")
        assert y.dtype == np.int16 and len(y) == len(x)
        err = y.astype(np.float64) - x.astype(np.float64)
        snr = 10 * np.log10(
            (x.astype(np.float64) ** 2).mean() / (err**2).mean()
        )
        assert snr >= 24.0, snr
    assert av.encode_adpcm(x) == buf  # deterministic
    # ragged lengths survive the block padding
    for n in (1, 2, 504, 505, 506, 1011):
        xs = av.synth_audio(3)[:n]
        assert len(av.decode_adpcm(av.encode_adpcm(xs))) == n


def test_adpcm_range_seek_is_block_independent():
    """decode_audio_range must (a) equal the same slice of the full decode
    and (b) read ONLY the covering blocks — corrupting every byte of every
    other block cannot change the output. That independence is what makes
    the format seekable and the decode parallel."""
    x = av.synth_audio(11)
    buf = av.encode_adpcm(x)
    full = av.decode_adpcm(buf)
    n, bs = av.adpcm_meta(buf)
    s0, s1 = 1234, 9876
    sl = av.decode_audio_range(buf, s0, s1, "adpcm")
    assert np.array_equal(sl, full[s0:s1])
    bsz = 4 + (bs - 1) // 2
    b0, b1 = s0 // bs, -(-s1 // bs)
    mut = bytearray(buf)
    for b in range(-(-n // bs)):
        if not b0 <= b < b1:
            mut[10 + b * bsz : 10 + (b + 1) * bsz] = b"\xff" * bsz
    assert np.array_equal(
        av.decode_audio_range(bytes(mut), s0, s1, "adpcm"), sl
    )
    # pcm16 range seek: pure byte slice
    praw = av.encode_pcm16(x)
    assert np.array_equal(
        av.decode_audio_range(praw, 100, 200, "pcm16"), x[100:200]
    )
    with pytest.raises(IndexError):
        av.decode_audio_range(buf, 0, n + 1, "adpcm")


def test_audio_features_over_adpcm(spark):
    """The feature operator's decode dispatch holds for the real compressed
    format: same frame grid as pcm16, feature values within the codec's
    quantization tolerance of the raw-audio features."""
    from geomesa_spark.operators.media import audio_df, audio_features

    out = (
        audio_features(audio_df(spark, 4, fmt="adpcm"), frame=512, hop=256)
        .toPandas()
    )
    n_frames = 1 + (av.AUDIO_SR - 512) // 256
    assert (out.groupby("audio_id").size() == n_frames).all()
    a0 = out[out.audio_id == "aud00000000"].sort_values("frame_idx")
    rms, zcr = av.audio_frame_features(av.synth_audio(0), frame=512, hop=256)
    assert np.allclose(a0["rms"].to_numpy(), rms, atol=0.02)
    assert np.allclose(a0["zcr"].to_numpy(), zcr, atol=0.05)


def test_audio_clip_features_range_decode(spark):
    """Clip-window features decode only the window: values equal the same
    features computed on the directly-sliced synth audio, for both the raw
    and the compressed format."""
    from geomesa_spark.operators.media import audio_clip_features, audio_df

    t0, t1 = 0.25, 0.5
    s0, s1 = int(t0 * av.AUDIO_SR), int(t1 * av.AUDIO_SR)
    for fmt, atol in (("pcm16", 1e-12), ("adpcm", 0.02)):
        out = (
            audio_clip_features(audio_df(spark, 3, fmt=fmt), t0, t1)
            .toPandas()
        )
        a1 = out[out.audio_id == "aud00000001"].sort_values("frame_idx")
        rms, zcr = av.audio_frame_features(av.synth_audio(1)[s0:s1])
        assert len(a1) == len(rms)
        assert np.allclose(a1["rms"].to_numpy(), rms, atol=atol)


def test_mjpeg_roundtrip_and_offset_seek():
    """Real compressed video: per-frame JPEG behind a frame index. Frame k
    decoded by offset must equal the full-decode of that frame (same
    bitstream) at PSNR >= 40 dB vs the source, and the index must address
    every frame exactly (variable-length streams, unlike vraw)."""
    from geomesa_spark.functions.image import psnr

    frames = av.synth_video(7, n_frames=10, w=24, h=16)
    buf = av.encode_mjpeg(frames)
    n, w, h = av.mjpeg_meta(buf)
    assert (n, w, h) == (10, 24, 16)
    assert len(buf) < frames.nbytes  # actually compressed
    for k in (0, 3, 9):
        got = av.decode_video_frame(buf, k, "mjpeg")
        assert got.shape == frames[k].shape
        assert psnr(frames[k], got) >= 40.0
    with pytest.raises(IndexError):
        av.decode_video_frame(buf, 10, "mjpeg")


def test_video_frame_sample_over_mjpeg(spark):
    """The frame-sampling operator's offset-decode contract holds for the
    real compressed format: same sampled frame grid as vraw, each sampled
    frame within JPEG tolerance of the synthesized source."""
    from geomesa_spark.functions.image import psnr
    from geomesa_spark.operators.media import video_df, video_frame_sample

    df = video_df(spark, 4, n_frames=12, fmt="mjpeg")
    out = video_frame_sample(df, every_k=4).toPandas()
    assert sorted(out["frame_idx"].unique()) == [0, 4, 8]
    assert (out.groupby("video_id").size() == 3).all()
    r = out[(out.video_id == "vid00000001") & (out.frame_idx == 4)].iloc[0]
    want = av.synth_video(1, n_frames=12)[4]
    got = np.frombuffer(bytes(r.frame_bytes), dtype=np.uint8).reshape(r.h, r.w, 3)
    assert psnr(want, got) >= 40.0
