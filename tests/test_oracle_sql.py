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


SCRUB_CASES = [
    "plain words only",
    "multi   space\t and\nnewline   runs",
    "see https://ex.org/d/42?u=7&x=1 trailing",
    "mail bob.smith+tag@ex-9.co.uk now",
    "email inside url https://ex.org/?mail=a@b.com tail",
    "two https://a.b/1 urls http://c.d/2 and x@y.io",
    "",
    "vertical\x0btab and form\x0cfeed ws",
    "url https://a.b/x\x0bboundary case",
]


def test_scrub_exprs_cross_engine_parity(con, spark):
    """scrub_exprs must produce CHARACTER-identical clean text and counts in
    Spark (Java regex, doubled backslashes) and DuckDB (RE2, canonical) —
    the escaping difference is exactly what _re_escape encodes."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geomesa_spark.functions.text import scrub_exprs, token_count_expr

    pdf = pd.DataFrame({"t": SCRUB_CASES})
    sdf = spark.createDataFrame(pdf)
    se = scrub_exprs("t", "spark")
    got_s = sdf.select(
        F.expr(se["clean"]).alias("clean"),
        F.expr(se["n_urls"]).alias("n_urls"),
        F.expr(se["n_emails"]).alias("n_emails"),
        F.expr(token_count_expr("t", "spark")).alias("n_tok"),
    ).toPandas()

    de = scrub_exprs("t", "duckdb")
    con.register("scrub_in", pdf)
    got_d = con.execute(
        f"SELECT {de['clean']} AS clean, {de['n_urls']} AS n_urls,"
        f" {de['n_emails']} AS n_emails,"
        f" {token_count_expr('t', 'duckdb')} AS n_tok FROM scrub_in"
    ).fetchdf()

    assert list(got_s.clean) == list(got_d.clean)
    assert list(got_s.n_urls) == list(got_d.n_urls)
    assert list(got_s.n_emails) == list(got_d.n_emails)
    assert list(got_s.n_tok) == list(got_d.n_tok)
    # the interesting cases actually fire
    assert got_s.n_urls.sum() >= 4 and got_s.n_emails.sum() >= 3
    assert "<URL>" in got_s.clean[2] and "<EMAIL>" in got_s.clean[3]
    assert "  " not in got_s.clean[1]


def test_quantile_interpolation_parity(con):
    """Spark's exact percentile and DuckDB's quantile_cont both implement
    the type-7 (numpy linear) definition — pin DuckDB against numpy here
    (Spark vs DuckDB is pinned end-to-end by the stats_quantiles oracle)."""
    rng = np.random.default_rng(12)
    vals = np.round(rng.gamma(2.0, 30.0, size=997), 2)
    con.register("qvals", __import__("pandas").DataFrame({"v": vals}))
    for p in (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
        d = con.execute(f"SELECT quantile_cont(v, {p}) FROM qvals").fetchone()[0]
        assert abs(d - np.percentile(vals, p * 100)) < 1e-9
