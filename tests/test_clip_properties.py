"""Property-based tests (hypothesis) for the polygon overlay / antimeridian
kernel in core/clip.py — area-conservation invariants over randomized inputs,
mirroring the reference test strategy of randomized-with-fixed-seed geometry
suites (SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from geomesa_spark.core.clip import polygon_overlay, split_antimeridian
from geomesa_spark.core.geometry import Geometry, box
from geomesa_spark.functions.st_funcs import geom_area


def _boxes():
    coord = st.floats(-80.0, 80.0, allow_nan=False, allow_infinity=False)
    side = st.floats(0.5, 40.0, allow_nan=False, allow_infinity=False)
    return st.tuples(coord, coord, side, side).map(
        lambda t: box(
            round(t[0], 3), round(t[1], 3),
            round(t[0] + t[2], 3), round(t[1] + t[3], 3),
        )
    )


@settings(max_examples=80, deadline=None)
@given(_boxes(), _boxes())
def test_overlay_partitions_area(a, b):
    """area(A∩B) + area(A∖B) == area(A) for random axis boxes, and the
    intersection matches the rectangle closed form."""
    inter = polygon_overlay(a, b, "int")
    diff = polygon_overlay(a, b, "diff")
    ai = geom_area(inter) if inter is not None else 0.0
    ad = geom_area(diff) if diff is not None else 0.0
    assert ai + ad == pytest.approx(geom_area(a), rel=1e-9, abs=1e-9)
    ax0, ay0, ax1, ay1 = a.bounds()
    bx0, by0, bx1, by1 = b.bounds()
    ow = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    oh = max(0.0, min(ay1, by1) - max(ay0, by0))
    assert ai == pytest.approx(ow * oh, rel=1e-9, abs=1e-9)


@settings(max_examples=60, deadline=None)
@given(
    st.floats(100.0, 250.0),
    st.floats(-60.0, 50.0),
    st.floats(5.0, 120.0),
    st.floats(2.0, 25.0),
)
def test_antimeridian_split_preserves_area(x0, y0, w, h):
    """Splitting any (possibly dateline-spanning, possibly out-of-range)
    box at ±180 preserves its area, and every output vertex is in range."""
    g = box(round(x0, 3), round(y0, 3), round(x0 + w, 3), round(y0 + h, 3))
    out = split_antimeridian(g)
    assert geom_area(out) == pytest.approx(geom_area(g), rel=1e-9, abs=1e-9)
    for part in out.parts():
        ring = np.asarray(part.coords[0])
        assert (ring[:, 0] >= -180.0 - 1e-9).all()
        assert (ring[:, 0] <= 180.0 + 1e-9).all()


@settings(max_examples=40, deadline=None)
@given(
    st.floats(120.0, 220.0),
    st.floats(-40.0, 30.0),
    st.floats(20.0, 100.0),
    st.floats(8.0, 20.0),
)
def test_antimeridian_split_preserves_holes(x0, y0, w, h):
    """A centered hole survives the split with its area removed on whichever
    side(s) it lands."""
    x0, y0 = round(x0, 3), round(y0, 3)
    x1, y1 = round(x0 + w, 3), round(y0 + h, 3)
    hx0, hy0 = round(x0 + w / 4, 3), round(y0 + h / 4, 3)
    hx1, hy1 = round(x0 + 3 * w / 4, 3), round(y0 + 3 * h / 4, 3)
    shell = ((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))
    hole = ((hx0, hy0), (hx1, hy0), (hx1, hy1), (hx0, hy1), (hx0, hy0))
    g = Geometry("Polygon", (shell, hole))
    out = split_antimeridian(g)
    want = (x1 - x0) * (y1 - y0) - (hx1 - hx0) * (hy1 - hy0)
    assert geom_area(out) == pytest.approx(want, rel=1e-9, abs=1e-9)
