"""S2-style spherical cell codec (from scratch, numpy — no google-s2).

Alternative cell scheme promised by SURVEY §1.3, mirroring the reference's
``geomesa-z3/.../curve/S2SFC.scala:17-63`` (which wraps Google S2). Built
from the published S2 construction (s2geometry.io docs):

- unit-sphere point -> cube face (largest |axis|) + (u, v) gnomonic coords,
- the quadratic u->s transform (0.5*sqrt(1+3u) branch) that equalises cell
  areas,
- 30-bit (i, j) face coordinates threaded onto a face-local Hilbert curve
  (swap/invert orientation automaton), packed as
  ``face(3 bits) | curve position(60 bits) | lsb sentinel`` exactly like the
  S2CellId layout (level = position of the lowest set bit).

Bit-level equality with Google's library cannot be validated in this
sandbox (no s2 dependency), so tests pin the construction's own invariants:
round-trips, hierarchical containment, Hilbert adjacency (consecutive leaf
positions are edge-adjacent cells), area balance, and level arithmetic.
The engine's production join curve remains Z2 (cells.py) — as in the
reference, where S2 is the alternative and Z-curves the default.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1

_SWAP = 1
_INVERT = 2

# Hilbert sub-cell orderings (canonical S2 tables): for each orientation,
# traversal position -> (i, j) quadrant, and the orientation adjustment.
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap | invert
    ],
    dtype=np.int64,
)
_POS_TO_ORIENTATION = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p


def _xyz_of(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cos_lat = np.cos(lat)
    return np.cos(lon) * cos_lat, np.sin(lon) * cos_lat, np.sin(lat)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    # per-face (u, v) per the S2 face coordinate frames
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )
    return face, u, v


def _uv_to_st(u):
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # both where-branches are evaluated
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s):
    n = np.int64(1) << np.int64(MAX_LEVEL)
    return np.clip(np.floor(np.asarray(s) * n).astype(np.int64), 0, n - 1)


def _ij_to_pos(face, i, j):
    """Face-local Hilbert position of leaf (i, j) — 60-bit, vectorized."""
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    pos = np.zeros_like(i)
    orient = (np.asarray(face, dtype=np.int64) & _SWAP).copy()
    for k in range(MAX_LEVEL - 1, -1, -1):
        ib = (i >> k) & 1
        jb = (j >> k) & 1
        ij = (ib << 1) | jb
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << 2) | p
        orient = orient ^ _POS_TO_ORIENTATION[p]
    return pos


def _pos_to_ij(face, pos):
    """Inverse of :func:`_ij_to_pos`."""
    pos = np.asarray(pos, dtype=np.int64)
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    orient = (np.asarray(face, dtype=np.int64) & _SWAP) * np.ones_like(pos)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ _POS_TO_ORIENTATION[p]
    return i, j


def encode(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """(lon, lat) degrees -> S2-style cell id at ``level``. Vectorized."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be 0..{MAX_LEVEL}")
    x, y, z = _xyz_of(lon, lat)
    face, u, v = _face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = _ij_to_pos(face, i, j)
    # assemble in uint64 (face 4/5 set the sign bit of the int64 view)
    leaf = (
        (face.astype(np.uint64) << np.uint64(_POS_BITS))
        | (pos.astype(np.uint64) << np.uint64(1))
        | np.uint64(1)
    ).astype(np.int64)
    return parent(leaf, level)


def level_of(cell) -> np.ndarray:
    """Cell level from the lsb sentinel position."""
    c = np.asarray(cell, dtype=np.int64)
    lsb = c & -c
    return (MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2)).astype(
        np.int64
    )


def parent(cell, level: int) -> np.ndarray:
    """Ancestor at ``level`` (must be <= the cell's level)."""
    c = np.asarray(cell, dtype=np.int64)
    new_lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (c & -new_lsb) | new_lsb


def children(cell: int) -> np.ndarray:
    """The 4 children one level down (curve-ordered)."""
    c = np.int64(cell)
    lsb = c & -c
    if lsb == 1:
        raise ValueError("leaf cell has no children")
    step = lsb >> np.int64(2)
    return np.array(
        [(c - lsb + step) + 2 * step * k for k in range(4)], dtype=np.int64
    )


def contains(cell: int, other) -> np.ndarray:
    """Does ``cell`` contain ``other`` (hierarchically)?

    Range arithmetic in uint64 (as encode/cell_center_lonlat do): for face
    4/5 cells the sign bit is set and signed int64 subtraction overflows
    (RuntimeWarning + wraparound reliance). A cell's descendants occupy
    [c - lsb + 1, c + lsb - 1], which never crosses a face boundary, so the
    unsigned comparison agrees with curve order."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    o = np.asarray(other, dtype=np.int64).view(np.uint64)
    one = np.uint64(1)
    return (o >= c - lsb + one) & (o <= c + lsb - one)


def cell_center_lonlat(cell) -> tuple[np.ndarray, np.ndarray]:
    """Center (lon, lat) degrees of cells (any level) — inverts _face_uv."""
    c = np.asarray(cell, dtype=np.int64)
    face = (c.astype(np.uint64) >> np.uint64(_POS_BITS)).astype(np.int64)
    pos = (
        (c.astype(np.uint64) & ((np.uint64(1) << np.uint64(_POS_BITS)) - np.uint64(1)))
        >> np.uint64(1)
    ).astype(np.int64)
    lsb = c & -c
    # center leaf: set the bit below the sentinel (middle of the subtree)
    pos_center = pos | (lsb >> np.int64(1))
    i, j = _pos_to_ij(face, pos_center)
    n = float(1 << MAX_LEVEL)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    ones = np.ones_like(u)
    # xyz frames inverting _face_uv's (u, v) definitions per face
    xyz = [
        (ones, u, v),        # face 0: x=+1, u=y/x, v=z/x
        (-u, ones, v),       # face 1: y=+1, u=-x/y, v=z/y
        (-u, -v, ones),      # face 2: z=+1, u=-x/z, v=-y/z
        (-ones, -v, -u),     # face 3: x=-1, u=z/x, v=y/x (x<0)
        (v, -ones, -u),      # face 4: y=-1, u=z/y, v=-x/y (y<0)
        (v, u, -ones),       # face 5: z=-1, u=-y/z, v=-x/z (z<0)
    ]
    X = np.select([face == f for f in range(6)], [xyz[f][0] for f in range(6)])
    Y = np.select([face == f for f in range(6)], [xyz[f][1] for f in range(6)])
    Z = np.select([face == f for f in range(6)], [xyz[f][2] for f in range(6)])
    norm = np.sqrt(X * X + Y * Y + Z * Z)
    lon = np.degrees(np.arctan2(Y, X))
    lat = np.degrees(np.arcsin(np.clip(Z / norm, -1.0, 1.0)))
    return lon, lat


# ---------------------------------------------------------------------------
# Cell -> lon/lat bounds + geometry covers (the S2 analog of
# cells.cell_bounds / cells.cover_geometry, enabling scheme="s2" joins)
# ---------------------------------------------------------------------------

def _cell_uv_rect(cell: int) -> tuple[int, float, float, float, float]:
    """(face, u0, u1, v0, v1): the exact gnomonic-plane rectangle whose
    normalized image IS the cell's region on the sphere."""
    c = np.int64(cell)
    face = int(np.uint64(c) >> np.uint64(_POS_BITS))
    lsb = int(c & -c)
    level = int(level_of(np.array([c]))[0])
    size = 1 << (MAX_LEVEL - level)
    pos_center = int((np.uint64(c) & ((np.uint64(1) << np.uint64(_POS_BITS)) - np.uint64(1))) >> np.uint64(1)) | (lsb >> 1)
    i, j = _pos_to_ij(np.array([face]), np.array([pos_center]))
    i0 = int(i[0]) & ~(size - 1)
    j0 = int(j[0]) & ~(size - 1)
    n = float(1 << MAX_LEVEL)
    u0, u1 = sorted(float(_st_to_uv(s)) for s in (i0 / n, (i0 + size) / n))
    v0, v1 = sorted(float(_st_to_uv(s)) for s in (j0 / n, (j0 + size) / n))
    return face, u0, u1, v0, v1


def _lon_interval_boxes(a0: float, a1: float, lat0: float, lat1: float):
    """One or two (lon0, lat0, lon1, lat1) boxes for the lon arc from a0 to
    a1 taken the SHORT way (arc width < 180 deg, true for any single-face
    patch), split at the antimeridian when the short way crosses it."""
    lo, hi = min(a0, a1), max(a0, a1)
    if hi - lo <= 180.0:
        return [(lo, lat0, hi, lat1)]
    return [(hi, lat0, 180.0, lat1), (-180.0, lat0, lo, lat1)]


def cell_bounds_lonlat(cell: int) -> list[tuple[float, float, float, float]]:
    """EXACT lon/lat bounding box(es) of a cell — 1 box, or 2 when the cell
    crosses the antimeridian, or a full-lon band when it contains a pole.
    The cell is the normalized image of a face-plane rectangle, so extremes
    are computed analytically from the face frame (no sampling, no slack):

    - equatorial faces (0,1,3,4): z is one gnomonic coordinate (zv), so
      tan(lat) = zv / sqrt(1 + ov^2) — monotone in zv, unimodal in |ov|;
      lon depends ONLY on the other coordinate (monotone).
    - polar faces (2,5): z = +-1, tan(|lat|) = 1 / sqrt(u^2+v^2) — extremes
      at the rectangle's nearest/farthest points from the face center; lon
      extremes at corners (convexity), full circle when the rectangle
      contains the face center (the pole).
    """
    face, u0, u1, v0, v1 = _cell_uv_rect(cell)

    def min_abs(a, b):
        return 0.0 if a <= 0.0 <= b else min(abs(a), abs(b))

    def max_abs(a, b):
        return max(abs(a), abs(b))

    if face in (2, 5):
        # xy frame seen from the pole: face 2 -> (x, y) = (-u, -v) [north],
        # face 5 -> (x, y) = (v, u) [south]
        if face == 2:
            x0, x1, y0, y1 = -u1, -u0, -v1, -v0
        else:
            x0, x1, y0, y1 = v0, v1, u0, u1
        rmin2 = min_abs(x0, x1) ** 2 + min_abs(y0, y1) ** 2
        rmax2 = max_abs(x0, x1) ** 2 + max_abs(y0, y1) ** 2
        lat_far = np.degrees(np.arctan(1.0 / np.sqrt(rmax2))) if rmax2 > 0 else 90.0
        if face == 5:
            lat_far = -lat_far
        if rmin2 == 0.0:  # contains the pole
            pole = 90.0 if face == 2 else -90.0
            la0, la1 = sorted((lat_far, pole))
            return [(-180.0, la0, 180.0, la1)]
        lat_near = np.degrees(np.arctan(1.0 / np.sqrt(rmin2)))
        if face == 5:
            lat_near = -lat_near
        la0, la1 = sorted((float(lat_far), float(lat_near)))
        cx = np.array([x0, x1, x1, x0])
        cy = np.array([y0, y0, y1, y1])
        ang = np.degrees(np.arctan2(cy, cx))
        if x0 < 0.0 and y0 <= 0.0 <= y1:  # crosses the -x axis: lon wraps
            shifted = np.where(ang < 0, ang + 360.0, ang)
            lo, hi = float(shifted.min()), float(shifted.max())
            return [(lo, la0, 180.0, la1), (-180.0, la0, hi - 360.0, la1)]
        return [(float(ang.min()), la0, float(ang.max()), la1)]

    # equatorial faces: (zv, ov) = the (z-driving, other) gnomonic coords
    if face in (0, 1):
        z0, z1, o0, o1 = v0, v1, u0, u1
    else:  # faces 3, 4: z = -u
        z0, z1, o0, o1 = -u1, -u0, v0, v1

    def lat_of(zv, o_abs):
        return float(np.degrees(np.arctan(zv / np.sqrt(1.0 + o_abs * o_abs))))

    lat_hi = lat_of(z1, min_abs(o0, o1) if z1 >= 0 else max_abs(o0, o1))
    lat_lo = lat_of(z0, min_abs(o0, o1) if z0 <= 0 else max_abs(o0, o1))

    if face == 0:
        a0, a1 = np.degrees(np.arctan2([u0, u1], [1.0, 1.0]))
    elif face == 1:
        a0, a1 = np.degrees(np.arctan2([1.0, 1.0], [-u0, -u1]))
    elif face == 3:
        a0, a1 = np.degrees(np.arctan2([-v0, -v1], [-1.0, -1.0]))
    else:  # face 4
        a0, a1 = np.degrees(np.arctan2([-1.0, -1.0], [v0, v1]))
    return _lon_interval_boxes(float(a0), float(a1), lat_lo, lat_hi)


def face_cell(face: int) -> int:
    """The level-0 cell id of a cube face (signed int64 view — faces 4/5
    set the sign bit, like every other id in this module)."""
    u = (np.uint64(face) << np.uint64(_POS_BITS)) | (
        np.uint64(1) << np.uint64(2 * MAX_LEVEL)
    )
    return int(np.array([u], dtype=np.uint64).view(np.int64)[0])


def cover_geometry(geom, level: int, max_cells: int = 2048):
    """Budgeted S2 cell cover of a planar lon/lat geometry — the scheme-"s2"
    analog of ``cells.cover_geometry`` (same Cover container, same BFS +
    budget semantics, reference XZ2SFC.ranges / S2 coverer defaults in
    QueryProperties.scala:31). Classification runs rect_relation against the
    cell's EXACT lon/lat bounding box(es) (supersets of the curved cell), so
    'disjoint' and 'contained' verdicts stay sound; ambiguity degrades to
    'overlapping' (refined exactly row-level)."""
    from .cells import Cover
    from .geometry import rect_relation

    cov = Cover(res=level)
    frontier = [(0, face_cell(f)) for f in range(6)]
    while frontier:
        nxt = []
        for lv, c in frontier:
            rels = [rect_relation(geom, *b) for b in cell_bounds_lonlat(c)]
            if all(r == "disjoint" for r in rels):
                continue
            if all(r == "contained" for r in rels):
                cov.contained.append((lv, c))
            elif lv >= level:
                cov.overlapping.append((lv, c))
            else:
                nxt.append((lv, c))
        if not nxt:
            break
        projected = len(cov.cells) + len(nxt) * 4
        if projected > max_cells:
            cov.overlapping.extend(nxt)
            break
        frontier = [(lv + 1, int(ch)) for lv, c in nxt for ch in children(c)]
    return cov
