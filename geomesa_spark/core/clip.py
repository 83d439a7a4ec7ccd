"""Polygon boolean operations (from scratch, numpy/python — no JTS/shapely).

Implements the geometry-processing surface the reference exposes through
``st_intersection`` / ``st_difference``
(``geomesa-spark-jts/.../udf/SpatialRelationFunctions.scala:55-57``, backed
by JTS overlay) for SIMPLE hole-free polygons, plus half-plane clipping used
by the antimeridian split (``GeometricProcessingFunctions.scala:41-57``).

Algorithms (public):
- Greiner & Hormann 1998 "Efficient clipping of arbitrary polygons" for
  polygon∩polygon and polygon∖polygon — handles concave simple polygons;
  degenerate inputs (shared edges / vertex-on-edge) are perturbation-free
  only when crossings are proper, which the engine's callers guarantee for
  its fixtures; otherwise results fall back to containment cases.
- Sutherland & Hodgman 1974 for clipping against a half-plane (convex clip
  region), used to split dateline-spanning rings.
"""

from __future__ import annotations

import numpy as np

from .geometry import Geometry, points_in_polygon, polygon_edges

_EPS = 1e-12


def _open(coords) -> np.ndarray:
    """Open ring (N,2) from a (possibly closed) coordinate sequence."""
    r = np.asarray(coords, dtype=np.float64)
    if len(r) > 1 and np.allclose(r[0], r[-1]):
        r = r[:-1]
    return r


def _ring(g: Geometry) -> np.ndarray:
    """Open shell ring (N,2), ccw or cw as given, first != last."""
    return _open(g.coords[0])


def _poly(ring: np.ndarray) -> Geometry:
    pts = tuple((float(x), float(y)) for x, y in ring)
    return Geometry("Polygon", (pts + (pts[0],),))


def _inside(pt, g: Geometry, boundary=True) -> bool:
    e = polygon_edges(g)
    return bool(
        points_in_polygon(
            np.array([pt[0]]), np.array([pt[1]]), e, include_boundary=boundary
        )[0]
    )


class _Node:
    __slots__ = ("xy", "inter", "entry", "visited", "nxt", "prv", "link", "t")

    def __init__(self, xy, inter=False, t=0.0):
        self.xy = (float(xy[0]), float(xy[1]))
        self.inter = inter
        self.entry = False
        self.visited = False
        self.nxt = self.prv = self.link = None
        self.t = t


def _build_list(ring: np.ndarray) -> _Node:
    nodes = [_Node(p) for p in ring]
    for i, n in enumerate(nodes):
        n.nxt = nodes[(i + 1) % len(nodes)]
        n.prv = nodes[i - 1]
    return nodes[0]


def _iter_ring(head: _Node):
    n = head
    while True:
        yield n
        n = n.nxt
        if n is head:
            break


def _seg_intersections(a0, a1, b0, b1):
    """Proper intersection of segments; -> (t_a, t_b, point) or None."""
    d1 = (a1[0] - a0[0], a1[1] - a0[1])
    d2 = (b1[0] - b0[0], b1[1] - b0[1])
    den = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(den) < _EPS:
        return None
    ta = ((b0[0] - a0[0]) * d2[1] - (b0[1] - a0[1]) * d2[0]) / den
    tb = ((b0[0] - a0[0]) * d1[1] - (b0[1] - a0[1]) * d1[0]) / den
    if ta < -_EPS or ta > 1 + _EPS or tb < -_EPS or tb > 1 + _EPS:
        return None
    if ta < _EPS or ta > 1 - _EPS or tb < _EPS or tb > 1 - _EPS:
        # endpoint touch — treated as degenerate (no proper crossing)
        return None
    return ta, tb, (a0[0] + ta * d1[0], a0[1] + ta * d1[1])


def _insert_intersections(sub_head: _Node, clip_head: _Node) -> int:
    count = 0
    sub_orig = [n for n in _iter_ring(sub_head) if not n.inter]
    clip_orig = [n for n in _iter_ring(clip_head) if not n.inter]
    for sn in sub_orig:
        s_end = sn.nxt
        while s_end.inter:
            s_end = s_end.nxt
        pending = []
        for cn in clip_orig:
            c_end = cn.nxt
            while c_end.inter:
                c_end = c_end.nxt
            hit = _seg_intersections(sn.xy, s_end.xy, cn.xy, c_end.xy)
            if hit is None:
                continue
            ta, tb, pt = hit
            ns = _Node(pt, inter=True, t=ta)
            nc = _Node(pt, inter=True, t=tb)
            ns.link, nc.link = nc, ns
            pending.append(ns)
            # insert nc into clip edge sorted by tb
            cur = cn
            while cur.nxt.inter and cur.nxt.t < tb:
                cur = cur.nxt
            nc.nxt, nc.prv = cur.nxt, cur
            cur.nxt.prv = nc
            cur.nxt = nc
            count += 1
        # insert subject-side nodes sorted by ta
        for ns in sorted(pending, key=lambda n: n.t):
            cur = sn
            while cur.nxt.inter and cur.nxt.t < ns.t:
                cur = cur.nxt
            ns.nxt, ns.prv = cur.nxt, cur
            cur.nxt.prv = ns
            cur.nxt = ns
    return count


def _mark_entries(head: _Node, other: Geometry, forward_inside: bool) -> None:
    """Alternate entry/exit flags along the ring, seeded by whether the ring
    start lies inside ``other`` (strictly)."""
    inside = _inside(head.xy, other, boundary=False)
    entry = not inside if forward_inside else inside
    for n in _iter_ring(head):
        if n.inter:
            n.entry = entry
            entry = not entry


def _box_of(g: Geometry):
    """(x0, y0, x1, y1) if ``g`` is a single-ring axis-aligned rectangle."""
    if g.kind != "Polygon" or len(g.coords) != 1:
        return None
    r = _ring(g)
    if len(r) != 4:
        return None
    x0, x1 = float(r[:, 0].min()), float(r[:, 0].max())
    y0, y1 = float(r[:, 1].min()), float(r[:, 1].max())
    corners = {(x0, y0), (x0, y1), (x1, y0), (x1, y1)}
    return (x0, y0, x1, y1) if {(float(x), float(y)) for x, y in r} == corners else None


def _box_geom(x0, y0, x1, y1) -> Geometry:
    return _poly(np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)]))


def _box_overlay(a, b, op: str) -> Geometry | None:
    """Closed-form overlay for axis-aligned rectangles — exact for EVERY
    degenerate configuration (shared edges, corner touches) that the generic
    Greiner–Hormann path documents as out of scope. Zero-area results
    (edge/corner touches) return None."""
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    ox0, oy0 = max(ax0, bx0), max(ay0, by0)
    ox1, oy1 = min(ax1, bx1), min(ay1, by1)
    overlap = ox0 < ox1 and oy0 < oy1
    if op == "int":
        return _box_geom(ox0, oy0, ox1, oy1) if overlap else None
    if not overlap:
        return _box_geom(ax0, ay0, ax1, ay1)
    if bx0 <= ax0 and by0 <= ay0 and bx1 >= ax1 and by1 >= ay1:
        return None  # b covers a
    if bx0 > ax0 and by0 > ay0 and bx1 < ax1 and by1 < ay1:
        # strict interior: polygon with a hole (JTS shape parity)
        shell = tuple(_box_geom(ax0, ay0, ax1, ay1).coords[0])
        hole = tuple(_box_geom(bx0, by0, bx1, by1).coords[0])
        return Geometry("Polygon", (shell, hole))
    pieces = []
    if by0 > ay0:
        pieces.append((ax0, ay0, ax1, by0))
    if by1 < ay1:
        pieces.append((ax0, by1, ax1, ay1))
    if bx0 > ax0:
        pieces.append((ax0, oy0, bx0, oy1))
    if bx1 < ax1:
        pieces.append((bx1, oy0, ax1, oy1))
    pieces = [p for p in pieces if p[0] < p[2] and p[1] < p[3]]
    if not pieces:
        return None
    if len(pieces) == 1:
        return _box_geom(*pieces[0])
    return Geometry(
        "MultiPolygon", tuple(_box_geom(*p).coords for p in pieces)
    )


def polygon_overlay(a: Geometry, b: Geometry, op: str) -> Geometry | None:
    """Polygon intersection ('int') or difference ('diff') of simple
    hole-free polygons. Returns Polygon, MultiPolygon, or None for an empty
    result. Axis-aligned rectangle pairs take an exact closed-form path
    (robust to shared edges / corner touches); general degenerate overlays
    (collinear shared edges) resolve through the containment fall-backs."""
    assert op in ("int", "diff")
    ba, bb = _box_of(a), _box_of(b)
    if ba is not None and bb is not None:
        return _box_overlay(ba, bb, op)
    ra, rb = _ring(a), _ring(b)
    sub = _build_list(ra)
    clp = _build_list(rb)
    n_int = _insert_intersections(sub, clp)

    if n_int == 0:
        a_in_b = _inside(ra[0], b) and all(_inside(p, b) for p in ra)
        b_in_a = _inside(rb[0], a) and all(_inside(p, a) for p in rb)
        if op == "int":
            if a_in_b:
                return a
            if b_in_a:
                return b
            return None
        if a_in_b:
            return None
        if b_in_a:
            # subject with the clip as a hole
            shell = tuple((float(x), float(y)) for x, y in ra) + (
                (float(ra[0][0]), float(ra[0][1])),
            )
            hole = tuple((float(x), float(y)) for x, y in rb) + (
                (float(rb[0][0]), float(rb[0][1])),
            )
            return Geometry("Polygon", (shell, hole))
        return a

    # Greiner–Hormann seeding: intersection = both lists normal; difference
    # A∖B inverts the SUBJECT flags (walk A's boundary while outside B)
    _mark_entries(sub, b, forward_inside=(op == "int"))
    _mark_entries(clp, a, forward_inside=True)

    polys = []
    while True:
        start = None
        for n in _iter_ring(sub):
            if n.inter and not n.visited:
                start = n
                break
        if start is None:
            break
        ring = [start.xy]
        cur = start
        while True:
            cur.visited = True
            if cur.link is not None:
                cur.link.visited = True
            node = cur
            if cur.entry:
                while True:
                    node = node.nxt
                    ring.append(node.xy)
                    if node.inter:
                        break
            else:
                while True:
                    node = node.prv
                    ring.append(node.xy)
                    if node.inter:
                        break
            node.visited = True
            cur = node.link
            if cur is start or cur.link is start:
                break
            if cur.visited:
                break
        # dedupe consecutive duplicates and the closing point
        cleaned = [ring[0]]
        for p in ring[1:]:
            if abs(p[0] - cleaned[-1][0]) > _EPS or abs(p[1] - cleaned[-1][1]) > _EPS:
                cleaned.append(p)
        while len(cleaned) > 1 and (
            abs(cleaned[0][0] - cleaned[-1][0]) <= _EPS
            and abs(cleaned[0][1] - cleaned[-1][1]) <= _EPS
        ):
            cleaned.pop()
        if len(cleaned) >= 3:
            polys.append(np.asarray(cleaned))

    if not polys:
        return None
    if len(polys) == 1:
        return _poly(polys[0])
    return Geometry(
        "MultiPolygon",
        tuple(
            (
                tuple((float(x), float(y)) for x, y in r)
                + ((float(r[0][0]), float(r[0][1])),),
            )
            for r in polys
        ),
    )


def halfplane_clip(ring: np.ndarray, axis_x: float, keep_left: bool) -> np.ndarray:
    """Sutherland–Hodgman clip of a ring against the vertical line
    x = axis_x, keeping x <= axis_x (keep_left) or x >= axis_x."""
    out = []
    n = len(ring)
    for i in range(n):
        cur, nxt = ring[i], ring[(i + 1) % n]
        cin = cur[0] <= axis_x if keep_left else cur[0] >= axis_x
        nin = nxt[0] <= axis_x if keep_left else nxt[0] >= axis_x
        if cin:
            out.append(tuple(cur))
        if cin != nin:
            t = (axis_x - cur[0]) / (nxt[0] - cur[0])
            out.append((axis_x, cur[1] + t * (nxt[1] - cur[1])))
    return np.asarray(out) if len(out) >= 3 else np.zeros((0, 2))


def _unwrap(r: np.ndarray) -> np.ndarray:
    """Make a ring continuous: no lon jump > 180 between neighbours."""
    r = r.copy()
    for i in range(1, len(r)):
        while r[i, 0] - r[i - 1, 0] > 180.0:
            r[i, 0] -= 360.0
        while r[i, 0] - r[i - 1, 0] < -180.0:
            r[i, 0] += 360.0
    return r


def _close_ring(r: np.ndarray) -> tuple:
    pts = tuple((float(x), float(y)) for x, y in r)
    return pts + (pts[0],)


def split_antimeridian(g: Geometry) -> Geometry:
    """Split a polygon whose shell genuinely spans the dateline into a
    MultiPolygon with parts on either side (the reference's
    antimeridianSafeGeom semantics). The shell may carry raw longitudes
    outside [-180, 180] (e.g. 170..190); rings already inside the range with
    x-extent <= 180 are returned UNCHANGED (object identity), so interior
    rings (holes) of ordinary polygons are never touched. Holes of shifted
    polygons translate with the shell; holes of genuinely split polygons are
    clipped by the same half-plane and attached to their side's part."""
    if g.kind != "Polygon":
        return g
    raw = np.asarray(g.coords[0], dtype=np.float64)
    xs = raw[:, 0]
    if -180.0 <= xs.min() and xs.max() <= 180.0 and xs.max() - xs.min() <= 180.0:
        return g  # ordinary polygon: nothing to do, holes intact
    r = _unwrap(_ring(g))
    lo, hi = float(r[:, 0].min()), float(r[:, 0].max())
    if hi - lo > 360.0:
        return g  # wraps the globe; not splittable
    # shift so the shell sits in (-180, 540) and test which boundary it crosses
    shift = 0.0
    while lo + shift > 180.0:
        shift -= 360.0
    while hi + shift < -180.0:
        shift += 360.0
    r[:, 0] += shift
    lo += shift
    hi += shift
    # holes: unwrap each, then translate by 360-multiples so it sits inside
    # the (shifted) shell's lon span — a hole is inside the shell, so its
    # correct frame is the one overlapping [lo, hi]
    holes = []
    for h in g.coords[1:]:
        hr = _unwrap(_open(h))
        while float(hr[:, 0].min()) > hi:
            hr[:, 0] -= 360.0
        while float(hr[:, 0].max()) < lo:
            hr[:, 0] += 360.0
        holes.append(hr)

    if hi > 180.0 and lo < 180.0:
        axis, shifts = 180.0, (0.0, -360.0)  # (west-of-axis, east-of-axis)
    elif lo < -180.0 and hi > -180.0:
        axis, shifts = -180.0, (360.0, 0.0)
    else:
        if hi > 180.0 or lo < -180.0:  # entirely out of range: translate all
            extra = -360.0 if hi > 180.0 else 360.0
            r[:, 0] += extra
            for hr in holes:
                hr[:, 0] += extra
        if not holes and shift == 0.0 and (hi <= 180.0 and lo >= -180.0):
            return _poly(r)
        return Geometry(
            "Polygon", (_close_ring(r),) + tuple(_close_ring(h) for h in holes)
        )

    parts = []  # (shell, [holes]) per side
    for keep_left, part_shift in zip((True, False), shifts):
        ps = halfplane_clip(r, axis, keep_left=keep_left)
        if not len(ps):
            continue
        ph = []
        for hr in holes:
            hc = halfplane_clip(hr, axis, keep_left=keep_left)
            if len(hc):
                hc = hc.copy()
                hc[:, 0] += part_shift
                ph.append(hc)
        ps = ps.copy()
        ps[:, 0] += part_shift
        parts.append((ps, ph))
    if len(parts) == 1:
        shell, ph = parts[0]
        return Geometry(
            "Polygon", (_close_ring(shell),) + tuple(_close_ring(h) for h in ph)
        )
    return Geometry(
        "MultiPolygon",
        tuple(
            (_close_ring(shell),) + tuple(_close_ring(h) for h in ph)
            for shell, ph in parts
        ),
    )
