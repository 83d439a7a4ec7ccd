"""Proximity join, lookup join, convex hull: parity vs brute-force oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.core.geometry import from_wkt, haversine_m
from geomesa_spark.operators.hull import convex_hull, convex_hull_np
from geomesa_spark.operators.proximity import lookup_join, proximity_join

SITES = {
    "a": (2.35, 48.85),
    "b": (-74.0, 40.7),
    "c": (139.7, 35.7),
}
RADIUS = 250_000.0  # meters


@pytest.fixture(scope="module")
def pts_pdf():
    rng = np.random.default_rng(7)
    n = 4000
    # half clustered near the sites, half uniform
    centers = np.array(list(SITES.values()))
    pick = rng.integers(0, len(centers), n)
    lon = np.where(
        rng.random(n) < 0.5,
        centers[pick, 0] + rng.normal(0, 2.0, n),
        rng.uniform(-180, 180, n),
    )
    lat = np.where(
        rng.random(n) < 0.5,
        centers[pick, 1] + rng.normal(0, 2.0, n),
        rng.uniform(-85, 85, n),
    )
    return pd.DataFrame({"pid": np.arange(n), "lon": lon, "lat": np.clip(lat, -90, 90)})


def test_proximity_join_parity(spark, pts_pdf):
    df = spark.createDataFrame(pts_pdf)
    got = (
        proximity_join(df, SITES, RADIUS)
        .select("pid", "site_id")
        .toPandas()
        .sort_values(["pid", "site_id"])
        .reset_index(drop=True)
    )
    rows = []
    for sid, (slon, slat) in SITES.items():
        d = haversine_m(pts_pdf["lon"], pts_pdf["lat"], slon, slat)
        for pid in pts_pdf["pid"].to_numpy()[d <= RADIUS]:
            rows.append((pid, sid))
    want = (
        pd.DataFrame(rows, columns=["pid", "site_id"])
        .sort_values(["pid", "site_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["pid"].to_numpy() == want["pid"].to_numpy()).all()
    assert (got["site_id"].to_numpy() == want["site_id"].to_numpy()).all()


def test_proximity_dist_exact(spark, pts_pdf):
    df = spark.createDataFrame(pts_pdf.head(500))
    got = proximity_join(df, SITES, RADIUS).select("pid", "site_id", "dist_m").toPandas()
    for r in got.itertuples(index=False):
        slon, slat = SITES[r.site_id]
        want = float(
            haversine_m(
                pts_pdf.loc[pts_pdf.pid == r.pid, "lon"].iloc[0],
                pts_pdf.loc[pts_pdf.pid == r.pid, "lat"].iloc[0],
                slon,
                slat,
            )
        )
        assert abs(r.dist_m - want) < 1.0  # same formula, different float path


def test_lookup_join_small_keyset(spark):
    prim = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3, 2], "v": list("abcd")}))
    sec = spark.createDataFrame(
        pd.DataFrame({"k2": [1, 2, 5], "attr": ["x", "y", "z"]})
    )
    out = lookup_join(prim, sec, "k", "k2").select("k", "v", "attr").toPandas()
    assert len(out) == 3  # k=1 once, k=2 twice; k=3 unmatched
    assert set(out["attr"]) == {"x", "y"}


def test_lookup_join_above_limit_falls_back(spark):
    prim = spark.range(0, 1000).withColumnRenamed("id", "k")
    sec = spark.range(0, 500).select(F.col("id").alias("k2"), (F.col("id") * 2).alias("w"))
    out = lookup_join(prim, sec, "k", "k2", key_limit=128)
    assert out.count() == 500


def test_convex_hull_np_square():
    x = np.array([0.0, 1, 1, 0, 0.5])
    y = np.array([0.0, 0, 1, 1, 0.5])
    h = convex_hull_np(x, y)
    assert len(h) == 4
    assert set(map(tuple, h)) == {(0, 0), (1, 0), (1, 1), (0, 1)}


def test_convex_hull_global(spark, pts_pdf):
    df = spark.createDataFrame(pts_pdf)
    wkt = convex_hull(df).collect()[0].hull_wkt
    hull = from_wkt(wkt)
    # every input point inside the hull's bbox; hull vertices are data points
    x0, y0, x1, y1 = hull.bounds()
    # WKT carries 10 significant digits -> ~1e-7 degree tolerance
    assert x0 <= pts_pdf["lon"].min() + 1e-6 and x1 >= pts_pdf["lon"].max() - 1e-6
    # parity with single-shot numpy hull (vertex sets equal)
    h = convex_hull_np(pts_pdf["lon"].to_numpy(), pts_pdf["lat"].to_numpy())
    got = np.asarray(hull.coords[0][:-1], dtype=np.float64)
    assert len(got) == len(h)
    got_sorted = got[np.lexsort((got[:, 1], got[:, 0]))]
    h_sorted = h[np.lexsort((h[:, 1], h[:, 0]))]
    np.testing.assert_allclose(got_sorted, h_sorted, atol=1e-6)


def test_convex_hull_grouped(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 3,
            "lon": [0.0, 1, 1, 0, 10, 11, 10],
            "lat": [0.0, 0, 1, 1, 10, 10, 11],
        }
    )
    out = convex_hull(spark.createDataFrame(pdf), by="g").toPandas()
    assert len(out) == 2
    wk = dict(zip(out["g"], out["hull_wkt"]))
    assert "POLYGON" in wk["a"] and "POLYGON" in wk["b"]


def test_proximity_high_latitude_no_drops(spark):
    """The cell-cover prefilter must be conservative at high latitude: at
    lat 75-80 with 500-600 km radii a center-latitude cos() under-covers the
    true geodesic disc by 18-30% (buffer_point_deg now uses the worst-case
    latitude in the buffered band). Parity vs exact haversine."""
    rng = np.random.default_rng(11)
    n = 3000
    sites = {"svalbard": (15.0, 78.0), "reykjavik": (-21.9, 64.1)}
    radius = 600_000.0
    # sample densely around the sites so the disc boundary is well probed
    centers = np.array(list(sites.values()))
    pick = rng.integers(0, len(centers), n)
    lon = centers[pick, 0] + rng.uniform(-40, 40, n)
    lat = np.clip(centers[pick, 1] + rng.uniform(-8, 8, n), -90, 90)
    pdf = pd.DataFrame({"pid": np.arange(n), "lon": lon, "lat": lat})

    out = proximity_join(spark.createDataFrame(pdf), sites, radius)
    got = {(int(r.pid), r.site_id) for r in out.select("pid", "site_id").collect()}

    expect = set()
    for sid, (slon, slat) in sites.items():
        d = haversine_m(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), slon, slat)
        expect |= {(int(p), sid) for p in pdf.loc[d <= radius, "pid"]}
    missing = expect - got
    assert not missing, f"prefilter dropped {len(missing)} in-radius rows"
    assert got == expect


def test_convex_hull_vertices_matches_wkt(spark):
    """Vertices output == the polygon ring of the WKT output (corners only,
    collinear mid-edge points excluded)."""
    from geomesa_spark.operators.hull import convex_hull_vertices

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 200 + ["b"] * 200,
            "lon": np.concatenate([rng.uniform(0, 10, 200), rng.uniform(20, 30, 200)]),
            "lat": rng.uniform(-5, 5, 400),
        }
    )
    # add exact collinear mid-edge points to group a's hull: corners (0,0),
    # (10,0) replaced by a straight bottom edge with a midpoint on it
    extra = pd.DataFrame(
        {"g": ["a"] * 3, "lon": [0.0, 5.0, 10.0], "lat": [-10.0, -10.0, -10.0]}
    )
    pdf = pd.concat([pdf, extra], ignore_index=True)
    out = convex_hull_vertices(spark.createDataFrame(pdf), by="g").toPandas()
    a = out[out.g == "a"]
    got = {(r.lon, r.lat) for r in a.itertuples(index=False)}
    assert (0.0, -10.0) in got and (10.0, -10.0) in got
    assert (5.0, -10.0) not in got  # collinear mid-edge point is not a corner
    exp = convex_hull_np(
        pdf[pdf.g == "a"]["lon"].to_numpy(), pdf[pdf.g == "a"]["lat"].to_numpy()
    )
    assert got == {(x, y) for x, y in exp}
