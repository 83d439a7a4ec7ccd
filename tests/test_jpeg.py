"""Baseline JPEG codec tests (functions/jpeg.py) — the round-3 completion of
the input_hint surface (fmt='jpeg' with the PSNR >= 40 dB lossy invariant
that rounds 1-2 carried via the qjz stand-in)."""

from __future__ import annotations

import numpy as np
import pytest

from geomesa_spark.functions.image import decode_image, encode_image, psnr
from geomesa_spark.functions.jpeg import decode_jpeg, encode_jpeg
from geomesa_spark.sources.images import FMTS_ALL, generate_batch, pixels_of


def test_roundtrip_psnr_over_corpus():
    """Quality-98 roundtrip clears the >= 40 dB invariant on the synthetic
    corpus (its block-noise content is near-worst-case for DCT coding)."""
    worst = min(
        psnr(pixels_of(i), decode_jpeg(encode_jpeg(pixels_of(i), 98)))
        for i in range(60)
    )
    assert worst >= 40.0, worst


@pytest.mark.parametrize("shape", [(8, 8), (9, 13), (17, 31), (64, 64), (1, 1)])
def test_roundtrip_odd_sizes(shape):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(arr, 95))
    assert dec.shape == arr.shape
    assert dec.dtype == np.uint8
    # pure uniform noise is pathological content; still bounded error
    assert psnr(arr, dec) >= 30.0


def test_container_is_real_jfif():
    """Emitted bytes are a standard JFIF container: SOI, APP0/JFIF, two DQT,
    SOF0, four DHT, SOS, EOI — readable by any compliant decoder."""
    buf = encode_jpeg(pixels_of(3), 92)
    assert buf[:2] == b"\xFF\xD8" and buf[-2:] == b"\xFF\xD9"
    assert buf[2:4] == b"\xFF\xE0" and buf[6:11] == b"JFIF\x00"
    assert buf.count(b"\xFF\xDB") >= 2   # DQT
    assert b"\xFF\xC0" in buf            # SOF0 (baseline)
    assert buf.count(b"\xFF\xC4") >= 4   # DHT
    assert b"\xFF\xDA" in buf            # SOS


def test_deterministic_encode():
    a = pixels_of(11)
    assert encode_jpeg(a, 92) == encode_jpeg(a, 92)


def test_quality_monotone():
    a = pixels_of(21)
    p_lo = psnr(a, decode_jpeg(encode_jpeg(a, 50)))
    p_hi = psnr(a, decode_jpeg(encode_jpeg(a, 98)))
    assert p_hi > p_lo
    assert len(encode_jpeg(a, 50)) < len(encode_jpeg(a, 98))


def test_flat_and_extreme_blocks():
    flat = np.full((16, 24, 3), 128, dtype=np.uint8)
    assert psnr(flat, decode_jpeg(encode_jpeg(flat, 92))) > 45
    # checkerboard at quality 100 exercises the +/-1023 coefficient clamp
    yy, xx = np.mgrid[0:16, 0:16]
    checker = (255 * ((yy + xx) % 2)).astype(np.uint8)
    arr = np.stack([checker] * 3, axis=2)
    dec = decode_jpeg(encode_jpeg(arr, 100))
    assert dec.shape == arr.shape


def test_dispatch_through_image_module():
    """encode_image/decode_image route fmt='jpeg' to the real codec (the
    round-2 stub raised NotImplementedError here)."""
    a = pixels_of(6)
    buf = encode_image(a, "jpeg")
    dec = decode_image(buf, "jpeg", a.shape[1], a.shape[0])
    assert psnr(a, dec) >= 40.0


def test_generator_emits_real_jfif_for_jpeg_fmt():
    pdf = generate_batch(np.arange(12), fmts=FMTS_ALL)
    jp = pdf[pdf["fmt"] == "jpeg"]
    assert len(jp) == 3
    for r in jp.itertuples(index=False):
        assert bytes(r.bytes[:2]) == b"\xFF\xD8"
        dec = decode_image(r.bytes, "jpeg", r.w, r.h)
        assert dec.shape == (r.h, r.w, 3)


def test_tile_assignment_parity_raw_vs_jpeg(spark):
    """Spark-side plumbing: tile assignment over a jpeg-fmt table produces
    the SAME tile sets as the lossless raw table of the identical images
    (tile membership depends on (lon, lat, w, h), not pixel values), and
    per-tile weights within the lossy error bound."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.raster import tile_assignments
    from geomesa_spark.sources.images import images_df

    raw = images_df(spark, 40, fmts=["raw"])
    jpg = images_df(spark, 40, fmts=["jpeg"])
    t_raw = (
        tile_assignments(raw, res=12, pixel_pitch_deg=1e-4)
        .groupBy("image_id", "tile_cell")
        .agg(F.sum("weight").alias("w"))
        .toPandas()
    )
    t_jpg = (
        tile_assignments(jpg, res=12, pixel_pitch_deg=1e-4)
        .groupBy("image_id", "tile_cell")
        .agg(F.sum("weight").alias("w"))
        .toPandas()
    )
    key = ["image_id", "tile_cell"]
    a = t_raw.sort_values(key).reset_index(drop=True)
    b = t_jpg.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and (a[key].values == b[key].values).all()
    # block-mean weights move by < 2% under the 43 dB quality-98 regime
    rel = np.abs(a["w"].to_numpy() - b["w"].to_numpy()) / np.maximum(
        a["w"].to_numpy(), 1.0
    )
    assert rel.max() < 0.02, rel.max()
