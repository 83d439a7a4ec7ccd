"""Convex hull aggregation — the reference's only UDAF, two-phase.

Reference: ``geomesa-spark-jts/.../udaf/ConvexHull.scala:16-51`` (running
``union().convexHull()`` merge). Spark-first re-expression: the hull of a
union is the hull of the per-partition hulls, so phase 1 reduces each
partition to <= its hull vertices inside a ``mapInPandas`` (Andrew's
monotone chain, pure numpy), and phase 2 computes the exact hull of the
collected candidate points per group. The shuffle carries only hull
vertices — O(partitions * hull_size), never the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core.geometry import Geometry, to_wkt


def convex_hull_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain -> (H, 2) ccw hull vertices (no repeat)."""
    pts = np.unique(np.stack([x, y], axis=1), axis=0)  # sorted lexicographically
    n = len(pts)
    if n <= 2:
        return pts

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def hull_wkt(x: np.ndarray, y: np.ndarray) -> str:
    h = convex_hull_np(np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64))
    if len(h) == 1:
        return to_wkt(Geometry("Point", (float(h[0, 0]), float(h[0, 1]))))
    if len(h) == 2:
        return to_wkt(
            Geometry("LineString", tuple((float(a), float(b)) for a, b in h))
        )
    ring = tuple((float(a), float(b)) for a, b in h) + ((float(h[0, 0]), float(h[0, 1])),)
    return to_wkt(Geometry("Polygon", (ring,)))


def convex_hull(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    by: str | None = None,
) -> DataFrame:
    """-> (group?, hull_wkt): convex hull of all (lon, lat) per group.

    Two-phase: partial hull per partition (map-side reduce, no shuffle of raw
    points), exact hull of candidates per group.
    """
    key = by

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            if key is None:
                h = convex_hull_np(pdf[lon].to_numpy(), pdf[lat].to_numpy())
                yield pd.DataFrame({lon: h[:, 0], lat: h[:, 1]})
            else:
                outs = []
                for g, sub in pdf.groupby(key):
                    h = convex_hull_np(sub[lon].to_numpy(), sub[lat].to_numpy())
                    outs.append(pd.DataFrame({key: g, lon: h[:, 0], lat: h[:, 1]}))
                yield pd.concat(outs, ignore_index=True)

    sel = ([F.col(key)] if key else []) + [
        F.col(lon).cast("double").alias(lon),
        F.col(lat).cast("double").alias(lat),
    ]
    slim = df.select(*sel)
    schema = ", ".join(
        ([f"{key} {dict(df.dtypes)[key]}"] if key else []) + [f"{lon} double", f"{lat} double"]
    )
    candidates = slim.mapInPandas(partial, schema=schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        w = hull_wkt(pdf[lon].to_numpy(), pdf[lat].to_numpy())
        base = {key: [pdf[key].iloc[0]]} if key else {}
        return pd.DataFrame({**base, "hull_wkt": [w]})

    out_schema = (f"{key} {dict(df.dtypes)[key]}, " if key else "") + "hull_wkt string"
    grouped = candidates.groupBy(key) if key else candidates.groupBy(F.lit(1).alias("__g"))
    out = grouped.applyInPandas(
        (lambda k, pdf: final(pdf)) if key else (lambda k, pdf: final(pdf)),
        schema=out_schema if key else "hull_wkt string",
    )
    return out


def convex_hull_vertices(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    by: str | None = None,
) -> DataFrame:
    """-> (group?, lon, lat): the hull's STRICT CORNER vertices as rows.

    Same two-phase plan as :func:`convex_hull` (per-partition partial hulls,
    exact hull of the candidates per group) but emitting the vertex set
    instead of WKT — the oracle-comparable form: a point is a corner iff some
    directed line through it and another point has every remaining point
    strictly to its left or collinear-ahead, which a SQL NOT EXISTS over
    point pairs states exactly (see catalog._oracle_geo_convex_hull).
    Collinear mid-edge points are NOT vertices (monotone chain pops them);
    groups with a single distinct point are dropped (no supporting pair).
    """
    key = by

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            if key is None:
                h = convex_hull_np(pdf[lon].to_numpy(), pdf[lat].to_numpy())
                yield pd.DataFrame({lon: h[:, 0], lat: h[:, 1]})
            else:
                outs = []
                for g, sub in pdf.groupby(key):
                    h = convex_hull_np(sub[lon].to_numpy(), sub[lat].to_numpy())
                    outs.append(pd.DataFrame({key: g, lon: h[:, 0], lat: h[:, 1]}))
                yield pd.concat(outs, ignore_index=True)

    sel = ([F.col(key)] if key else []) + [
        F.col(lon).cast("double").alias(lon),
        F.col(lat).cast("double").alias(lat),
    ]
    schema = ", ".join(
        ([f"{key} {dict(df.dtypes)[key]}"] if key else []) + [f"{lon} double", f"{lat} double"]
    )
    candidates = df.select(*sel).mapInPandas(partial, schema=schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        h = convex_hull_np(pdf[lon].to_numpy(), pdf[lat].to_numpy())
        if len(h) < 2:
            h = h[:0]
        base = {key: pdf[key].iloc[0]} if key else {}
        return pd.DataFrame({**base, lon: h[:, 0], lat: h[:, 1]})

    grouped = candidates.groupBy(key) if key else candidates.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(lambda k, pdf: final(pdf), schema=schema)
