"""The DuckDB oracle generators must replay images.py bit-for-bit.

These tests pin the contract that makes the img_* catalog oracles exact:
metadata (w, h, fmt) integer-identical, lon/lat within libm-ulp with NO
discrete boundary flips on the driver's fixed id range, and pixels + phash
identical for a sample.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from geomesa_spark.functions.image import phash64
from geomesa_spark.oracle_sql import (
    images_meta_cte,
    images_pixel_gray_ctes,
    phash_bits_cte,
    u01_sql,
)
from geomesa_spark.sources import images as src


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_metadata_parity(con):
    n = 20_000
    sql = "WITH " + images_meta_cte(n) + " SELECT id, w, h, fmt, lon, lat FROM imgs ORDER BY id"
    df = con.execute(sql).fetchdf()
    ids = np.arange(n, dtype=np.int64)
    batch_small = src.generate_batch(np.arange(64))
    assert (df["w"].to_numpy()[:64] == batch_small["w"].to_numpy()).all()
    assert (df["h"].to_numpy()[:64] == batch_small["h"].to_numpy()).all()
    assert (df["fmt"].to_numpy()[:64] == batch_small["fmt"].to_numpy()).all()
    lon, lat = src.lonlat_of(ids)
    assert np.abs(df["lon"].to_numpy() - lon).max() < 1e-12
    assert np.abs(df["lat"].to_numpy() - lat).max() < 1e-12


def test_u01_parity(con):
    n, salt = 50_000, 7
    sql = (
        f"SELECT {u01_sql('id', salt)} FROM (SELECT unnest(range(0, {n})) AS id)"
    )
    got = np.array([r[0] for r in con.execute(sql).fetchall()])
    exp = src._u01(np.arange(n, dtype=np.int64), salt)
    assert (got == exp).all()  # bit-identical (integer-derived dyadics)


def test_pixels_and_phash_parity(con):
    """Full pixel + integer-aHash replay for a sample of driver images."""
    n = 64
    sql = f"""WITH {images_pixel_gray_ctes(n)},{phash_bits_cte()},
ph AS (SELECT id, CAST(sum(bv * (CAST(1 AS HUGEINT) << CAST(bi AS INTEGER))) AS HUGEINT) AS hv
       FROM bits GROUP BY 1)
SELECT id, hv FROM ph ORDER BY id"""
    rows = con.execute(sql).fetchall()
    assert len(rows) == n
    for i, hv in rows:
        exp = phash64(src.pixels_of(i)) & 0xFFFFFFFFFFFFFFFF
        assert int(hv) == exp, f"phash mismatch for image {i}"


def test_phash_integer_exact_definition():
    """phash64 must be a pure function of integer pixel content (no float
    summation-order dependence): permuting the accumulation order of an
    equivalent reimplementation yields the same hash."""
    arr = src.pixels_of(3)
    h, w = arr.shape[:2]
    g = (
        299 * arr[..., 0].astype(np.int64)
        + 587 * arr[..., 1].astype(np.int64)
        + 114 * arr[..., 2].astype(np.int64)
    )
    rb = (np.arange(h) * 8) // h
    cb = (np.arange(w) * 8) // w
    total, n = int(g.sum()), h * w
    val = 0
    for k in range(8):
        for l in range(8):
            m = (rb[:, None] == k) & (cb[None, :] == l)
            s, a = int(g[m].sum()), int(m.sum())
            if s * n > total * a:
                val |= 1 << (k * 8 + l)
    exp = phash64(arr) & 0xFFFFFFFFFFFFFFFF
    assert val == exp
