"""S2-style cell codec invariants (core/s2.py; S2SFC.scala:17-63 analog).

Bit-level parity with Google's library is untestable here (no s2 dep), so
these pin the published construction's own invariants, mirroring the
reference's curve test style (S2SFCTest / Z3Test round-trip + cover checks).
"""

from __future__ import annotations

import numpy as np
import pytest

from geomesa_spark.core import s2


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(1)
    return rng.uniform(-180, 180, 5000), rng.uniform(-89.9, 89.9, 5000)


def test_leaf_round_trip(pts):
    lon, lat = pts
    leaf = s2.encode(lon, lat)
    assert (s2.level_of(leaf) == 30).all()
    clon, clat = s2.cell_center_lonlat(leaf)
    dlon = np.abs((clon - lon + 180) % 360 - 180) * np.cos(np.radians(lat))
    assert dlon.max() < 1e-6 and np.abs(clat - lat).max() < 1e-6


def test_parent_containment_and_levels(pts):
    lon, lat = pts
    leaf = s2.encode(lon, lat)
    for level in (0, 5, 12, 29):
        p = s2.parent(leaf, level)
        assert (s2.level_of(p) == level).all()
        assert all(s2.contains(int(a), b) for a, b in zip(p[:200], leaf[:200]))
        # encoding directly at the level gives the same cell
        direct = s2.encode(lon, lat, level)
        np.testing.assert_array_equal(direct, p)


def test_children_partition_parent():
    c = int(s2.encode(np.array([2.3]), np.array([48.8]), 12)[0])
    ch = s2.children(c)
    assert (s2.level_of(ch) == 13).all()
    assert all(s2.contains(c, x) for x in ch)
    lsb = c & -c
    spans = sorted((int(x - (x & -x)), int(x + (x & -x))) for x in ch)
    assert spans[0][0] == c - lsb and spans[-1][1] == c + lsb
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 == b0  # disjoint and gap-free


def test_hilbert_adjacency():
    """Consecutive curve positions are edge-adjacent (i, j) cells — the
    locality property that makes range scans contiguous."""
    for face in range(6):
        pos = np.arange(500_000, 502_000, dtype=np.int64)
        i, j = s2._pos_to_ij(np.full_like(pos, face), pos)
        d = np.abs(np.diff(i)) + np.abs(np.diff(j))
        assert (d == 1).all()


def test_area_balance():
    """The quadratic projection keeps cell areas within ~1.4x of each other
    (vs ~5x for raw gnomonic) — sphere-uniform points spread evenly."""
    rng = np.random.default_rng(3)
    n = 200_000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lon = rng.uniform(-180, 180, n)
    cells = s2.encode(lon, lat, 2)
    _, counts = np.unique(cells, return_counts=True)
    assert len(counts) == 6 * 16
    assert counts.max() / counts.min() < 1.6


def test_all_faces_reachable():
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    faces = (s2.encode(lon, lat).astype(np.uint64) >> np.uint64(61)).astype(int)
    assert sorted(faces) == [0, 1, 2, 3, 4, 5]
