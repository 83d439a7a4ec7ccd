"""Geometry kernel tests, incl. the golden DE-9IM fixture copied from the
reference's SparkSQLSpatialRelationshipsTest.scala:50-140 (same WKTs, same
expected truth values)."""

import numpy as np
import pytest

from geomesa_spark.core import geometry as G

# --- golden fixture (WKTs from SparkSQLSpatialRelationshipsTest.scala) -------
BOX_REF = "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"

POINTS = {
    "int": "POINT(5 5)",        # interior
    "edge": "POINT(0 5)",       # on edge
    "corner": "POINT(0 0)",     # on corner
    "ext": "POINT(-5 0)",       # exterior
}

BOXES = {
    "int": "POLYGON((1 1, 1 2, 2 2, 2 1, 1 1))",           # fully interior
    "intEdge": "POLYGON((0 1, 0 2, 1 2, 1 1, 0 1))",       # interior, shares edge
    "overlap": "POLYGON((-1 1, -1 2, 1 2, 1 1, -1 1))",    # straddles the edge
    "extEdge": "POLYGON((-1 1, -1 2, 0 2, 0 1, -1 1))",    # exterior, shares edge
    "ext": "POLYGON((-2 1, -2 2, -1 2, -1 1, -2 1))",      # fully exterior
    "corner": "POLYGON((-1 -1, -1 0, 0 0, 0 -1, -1 -1))",  # touches at corner
}


def rel(pred, a_wkt, b_wkt):
    return G.relate(G.from_wkt(a_wkt), G.from_wkt(b_wkt), pred)


class TestContains:
    def test_points(self):
        assert rel("contains", BOX_REF, POINTS["int"]) is True
        assert rel("contains", BOX_REF, POINTS["edge"]) is False
        assert rel("contains", BOX_REF, POINTS["corner"]) is False
        assert rel("contains", BOX_REF, POINTS["ext"]) is False

    def test_boxes(self):
        assert rel("contains", BOX_REF, BOXES["int"]) is True
        assert rel("contains", BOX_REF, BOXES["intEdge"]) is True
        assert rel("contains", BOX_REF, BOXES["overlap"]) is False
        assert rel("contains", BOX_REF, BOXES["extEdge"]) is False
        assert rel("contains", BOX_REF, BOXES["ext"]) is False
        assert rel("contains", BOX_REF, BOXES["corner"]) is False


class TestCovers:
    def test_points(self):
        assert rel("covers", BOX_REF, POINTS["int"]) is True
        assert rel("covers", BOX_REF, POINTS["edge"]) is True
        assert rel("covers", BOX_REF, POINTS["corner"]) is True
        assert rel("covers", BOX_REF, POINTS["ext"]) is False

    def test_boxes(self):
        assert rel("covers", BOX_REF, BOXES["int"]) is True
        assert rel("covers", BOX_REF, BOXES["intEdge"]) is True
        assert rel("covers", BOX_REF, BOXES["overlap"]) is False
        assert rel("covers", BOX_REF, BOXES["extEdge"]) is False
        assert rel("covers", BOX_REF, BOXES["ext"]) is False
        assert rel("covers", BOX_REF, BOXES["corner"]) is False


class TestWithinIntersectsDisjoint:
    def test_within(self):
        assert rel("within", POINTS["int"], BOX_REF) is True
        assert rel("within", POINTS["edge"], BOX_REF) is False
        assert rel("within", BOXES["int"], BOX_REF) is True
        assert rel("within", BOXES["overlap"], BOX_REF) is False

    def test_intersects(self):
        for k in ("int", "edge", "corner"):
            assert rel("intersects", BOX_REF, POINTS[k]) is True
        assert rel("intersects", BOX_REF, POINTS["ext"]) is False
        for k in ("int", "intEdge", "overlap", "extEdge", "corner"):
            assert rel("intersects", BOX_REF, BOXES[k]) is True
        assert rel("intersects", BOX_REF, BOXES["ext"]) is False

    def test_disjoint(self):
        assert rel("disjoint", BOX_REF, POINTS["ext"]) is True
        assert rel("disjoint", BOX_REF, BOXES["ext"]) is True
        assert rel("disjoint", BOX_REF, BOXES["corner"]) is False


class TestTouchesOverlapsCrossesEquals:
    def test_touches(self):
        assert rel("touches", BOX_REF, POINTS["edge"]) is True
        assert rel("touches", BOX_REF, POINTS["corner"]) is True
        assert rel("touches", BOX_REF, POINTS["int"]) is False
        assert rel("touches", BOX_REF, BOXES["extEdge"]) is True
        assert rel("touches", BOX_REF, BOXES["corner"]) is True
        assert rel("touches", BOX_REF, BOXES["overlap"]) is False
        assert rel("touches", BOX_REF, BOXES["intEdge"]) is False

    def test_overlaps(self):
        assert rel("overlaps", BOX_REF, BOXES["overlap"]) is True
        assert rel("overlaps", BOX_REF, BOXES["int"]) is False      # contained
        assert rel("overlaps", BOX_REF, BOXES["ext"]) is False
        assert rel("overlaps", BOX_REF, BOXES["extEdge"]) is False  # touches only

    def test_crosses(self):
        # line crossing the box
        assert rel("crosses", "LINESTRING(-5 5, 15 5)", BOX_REF) is True
        # line fully inside: within, not crosses
        assert rel("crosses", "LINESTRING(1 1, 2 2)", BOX_REF) is False
        # line touching the edge only
        assert rel("crosses", "LINESTRING(-5 0, 0 0)", BOX_REF) is False
        # line/line proper cross
        assert rel("crosses", "LINESTRING(0 -1, 0 1)", "LINESTRING(-1 0, 1 0)") is True
        # collinear overlap is not a cross
        assert rel("crosses", "LINESTRING(0 0, 2 0)", "LINESTRING(1 0, 3 0)") is False

    def test_equals(self):
        assert rel("equals", BOX_REF, "POLYGON((10 0, 0 0, 0 10, 10 10, 10 0))") is True
        assert rel("equals", BOX_REF, BOXES["int"]) is False
        assert rel("equals", "POINT(1 2)", "POINT(1 2)") is True


# --- WKT / WKB round trips ----------------------------------------------------

WKTS = [
    "POINT (1.5 -2.25)",
    "LINESTRING (0 0, 1 1, 2 0)",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOINT (1 2, 3 4)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
]


@pytest.mark.parametrize("wkt", WKTS)
def test_wkt_roundtrip(wkt):
    g = G.from_wkt(wkt)
    g2 = G.from_wkt(G.to_wkt(g))
    assert g == g2


@pytest.mark.parametrize("wkt", WKTS)
def test_wkb_roundtrip(wkt):
    g = G.from_wkt(wkt)
    assert G.from_wkb(G.to_wkb(g)) == g


def test_pip_vectorized_with_hole():
    g = G.from_wkt(WKTS[3])  # box with hole
    edges = G.polygon_edges(g)
    lon = np.array([5.0, 3.0, -1.0, 0.0])
    lat = np.array([5.0, 3.0, 5.0, 0.0])
    res = G.points_in_polygon(lon, lat, edges, include_boundary=True)
    assert list(res) == [True, False, False, True]
    res_open = G.points_in_polygon(lon, lat, edges, include_boundary=False)
    assert list(res_open) == [True, False, False, False]


def test_pip_matches_winding_oracle():
    """Independent check: even-odd ray cast vs a winding-number oracle."""
    rng = np.random.default_rng(7)
    poly = G.from_wkt("POLYGON((-5 -5, 5 -2, 8 7, -3 6, -5 -5))")
    edges = G.polygon_edges(poly)
    lon = rng.uniform(-10, 12, 5000)
    lat = rng.uniform(-10, 10, 5000)
    got = G.points_in_polygon(lon, lat, edges, include_boundary=True)

    # winding number oracle (separate algorithm)
    ring = np.asarray(poly.coords[0], dtype=np.float64)
    wn = np.zeros(lon.shape[0])
    for i in range(ring.shape[0] - 1):
        x0, y0 = ring[i]
        x1, y1 = ring[i + 1]
        side = (x1 - x0) * (lat - y0) - (y1 - y0) * (lon - x0)
        up = (y0 <= lat) & (y1 > lat) & (side > 0)
        dn = (y0 > lat) & (y1 <= lat) & (side < 0)
        wn += up.astype(int) - dn.astype(int)
    expect = wn != 0
    assert (got == expect).mean() > 0.999  # boundary-epsilon cases only


def test_haversine_known_values():
    # equator degree ~ 111.19 km for R=6371008.8
    d = G.haversine_m(0.0, 0.0, 1.0, 0.0)
    assert abs(d - 111195.0) < 100
    # symmetric, zero at same point
    assert G.haversine_m(10, 20, 10, 20) == 0.0
    assert abs(G.haversine_m(1, 2, 3, 4) - G.haversine_m(3, 4, 1, 2)) < 1e-9


def test_buffer_point():
    g = G.buffer_point_deg(10.0, 45.0, 10_000.0)
    assert g.kind == "Polygon"
    lon0, lat0, lon1, lat1 = g.bounds()
    # ~0.09 deg lat radius; lon radius larger at 45N
    assert 0.08 < (lat1 - lat0) / 2 < 0.1
    assert (lon1 - lon0) > (lat1 - lat0)


def test_rect_relation():
    poly = G.from_wkt("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert G.rect_relation(poly, 2, 2, 3, 3) == "contained"
    assert G.rect_relation(poly, -5, -5, -1, -1) == "disjoint"
    assert G.rect_relation(poly, -1, -1, 1, 1) == "overlapping"
    assert G.rect_relation(poly, -5, -5, 15, 15) == "overlapping"  # rect ⊃ poly
