"""Track/trajectory operators (window-function re-expressions).

- ``point2point``: per track id, order by time, connect consecutive points
  into segments (analog of ``geomesa-process/.../analytic/
  Point2PointProcess.scala`` — theirs groups+sorts client-side; ours is a
  lag() window, shuffling once on track id).
- ``track_label``: last point per track (``TrackLabelProcess.scala``) via
  max_by-style row_number.
- ``tube_select``: spatio-temporal corridor join (``tube/TubeBuilder.scala``,
  ``TubeSelectProcess.scala:115-150``): buffer a track into per-time-bin
  tubes, then cell-cover join candidates within the tube segments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..core.geometry import buffer_point_deg


def point2point(
    df: DataFrame,
    track: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """-> one row per consecutive segment: (track, t0, t1, lon0, lat0, lon1,
    lat1, seg_len_deg). Deterministic ordering via (ts, tiebreak)."""
    order_cols = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(track).orderBy(*order_cols)
    return (
        df.select(
            F.col(track).alias("track"),
            F.col(ts).alias("t1"),
            F.col(lon).alias("lon1"),
            F.col(lat).alias("lat1"),
            F.lag(ts).over(w).alias("t0"),
            F.lag(lon).over(w).alias("lon0"),
            F.lag(lat).over(w).alias("lat0"),
        )
        .filter(F.col("t0").isNotNull())
        .withColumn(
            "seg_len_deg",
            F.sqrt(
                F.pow(F.col("lon1") - F.col("lon0"), 2)
                + F.pow(F.col("lat1") - F.col("lat0"), 2)
            ),
        )
    )


def track_label(
    df: DataFrame,
    track: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Last row per track (TrackLabelProcess analog)."""
    order_cols = [F.col(ts).desc()] + (
        [F.col(order_tiebreak).desc()] if order_tiebreak else []
    )
    w = Window.partitionBy(track).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def tube_select(
    points: DataFrame,
    track_pdf: pd.DataFrame,
    buffer_m: float,
    time_bin_s: int = 3600,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
) -> DataFrame:
    """Corridor join: rows of ``points`` within ``buffer_m`` of the track's
    position in the same time bin.

    The track (driver-side, ordered by its ``ts`` epoch-seconds column with
    lon/lat) is binned; each bin becomes a buffered polygon joined via the
    cell-cover spatial join keyed additionally on the time bin — the
    (cell, time_bucket) interval+spatial join of TubeBuilder's gap-filled
    tube features.
    """
    from .spatial_join import spatial_join

    track_pdf = track_pdf.sort_values(ts)
    bins = (track_pdf[ts].to_numpy() // time_bin_s).astype(np.int64)
    polys = {}
    bin_of = {}
    for b in np.unique(bins):
        seg = track_pdf[bins == b]
        clon = float(seg[lon].mean())
        clat = float(seg[lat].mean())
        # buffer sized to cover the bin's extent + the requested radius
        extent_m = 111194.93 * max(
            float(seg[lat].max() - seg[lat].min()),
            float((seg[lon].max() - seg[lon].min())) * np.cos(np.radians(clat)),
        )
        pid = f"bin_{int(b)}"
        polys[pid] = buffer_point_deg(clon, clat, buffer_m + extent_m / 2 + 1.0)
        bin_of[pid] = int(b)

    joined = spatial_join(points, polys, lon=lon, lat=lat)
    # time-bin refinement: row's bin must match the tube segment's bin
    bin_map = F.create_map(
        *[x for pid, b in bin_of.items() for x in (F.lit(pid), F.lit(b))]
    )
    return joined.filter(
        (F.col(ts).cast("long") / time_bin_s).cast("long") == bin_map[F.col("poly_id")]
    )


def route_search(
    points: DataFrame,
    route_pdf: pd.DataFrame,
    buffer_m: float,
    heading: str = "heading",
    heading_tol_deg: float = 45.0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Features along a route whose heading matches the route direction.

    RouteSearchProcess analog (geomesa-process/.../query/RouteSearchProcess.scala):
    buffer the route, find features within it, keep those whose ``heading``
    column is within ``heading_tol_deg`` of the local route bearing.

    ``route_pdf``: ordered (lon, lat) vertices (driver-side polyline). Each
    route segment becomes a buffered corridor polygon carrying its bearing;
    the cell-cover join finds candidates and a native circular-difference
    expression applies the heading predicate (no Python in the row path).
    """
    from .spatial_join import spatial_join

    lons = route_pdf[lon].to_numpy(dtype=np.float64)
    lats = route_pdf[lat].to_numpy(dtype=np.float64)
    if len(lons) < 2:
        raise ValueError("route needs >= 2 vertices")
    polys = {}
    bearing_of = {}
    for i in range(len(lons) - 1):
        mlon, mlat = (lons[i] + lons[i + 1]) / 2, (lats[i] + lats[i + 1]) / 2
        # segment half-length in meters (equirectangular, fine for corridors)
        seg_m = 111194.93 * float(
            np.hypot(
                (lons[i + 1] - lons[i]) * np.cos(np.radians(mlat)),
                lats[i + 1] - lats[i],
            )
        )
        pid = f"seg_{i}"
        polys[pid] = buffer_point_deg(mlon, mlat, buffer_m + seg_m / 2)
        # initial bearing of the segment (degrees clockwise from north)
        y = np.sin(np.radians(lons[i + 1] - lons[i])) * np.cos(np.radians(lats[i + 1]))
        x = np.cos(np.radians(lats[i])) * np.sin(np.radians(lats[i + 1])) - np.sin(
            np.radians(lats[i])
        ) * np.cos(np.radians(lats[i + 1])) * np.cos(np.radians(lons[i + 1] - lons[i]))
        bearing_of[pid] = float(np.degrees(np.arctan2(y, x))) % 360.0

    joined = spatial_join(points, polys, lon=lon, lat=lat)
    bmap = F.create_map(
        *[x for pid, b in bearing_of.items() for x in (F.lit(pid), F.lit(b))]
    )
    # circular angle difference <= tol
    diff = F.abs(F.pmod(F.col(heading) - bmap[F.col("poly_id")] + 180.0, F.lit(360.0)) - 180.0)
    return joined.filter(diff <= heading_tol_deg).withColumnRenamed("poly_id", "route_segment")
