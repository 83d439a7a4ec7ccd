"""k-nearest-neighbor join via expanding cell rings.

From-scratch analog of the reference's KNN process
(``geomesa-process/.../KNearestNeighborSearchProcess.scala``): their client
loop issues an initial window query, doubles the window while fewer than k
hits (``KnnWindow.expand``, :278-300), and terminates when the kth distance is
covered by the searched window. Ours replaces the window with Chebyshev cell
*disks* and runs each round as ONE broadcast join over the (never-shuffled)
point table:

    round i: unresolved queries -> disk(cell, R_i) cells (driver, numpy)
             -> broadcast -> equi-join on point cell -> per-query top-k
             -> resolve if n >= k AND d_k <= guarantee(R_i)

``guarantee(R)`` is a conservative lower bound on the distance to any point
OUTSIDE Chebyshev radius R (latitude band + cos-scaled longitude bound), so a
resolved query provably has its true top-k — the same termination contract as
the reference's hole-punched window, restated for a sphere-aware grid.

Scale notes: the point side is scanned once per round with a broadcast hash
join (no shuffle); rounds only re-visit *unresolved* queries, and the ring
radius doubles, so rounds are O(log(max_radius)). Query count Q is assumed
driver-manageable (<= ~100k), matching the reference's client-side process.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..core import cells

M_PER_DEG = 111194.93  # meters per degree of latitude at EARTH_RADIUS_M

MAX_CLIENT_QUERIES = 100_000  # hard guard on the driver-side query set


def _guarantee_m(radius: int, res: int, qlat: np.ndarray) -> np.ndarray:
    """Distance lower bound to any point outside Chebyshev ``radius`` cells."""
    dlon_deg, dlat_deg = cells.cell_size_deg(res)
    lat_reach = np.abs(qlat) + (radius + 1) * dlat_deg
    cosl = np.cos(np.radians(np.minimum(lat_reach, 90.0)))
    lat_bound = (radius - 1) * dlat_deg * M_PER_DEG
    lon_bound = (radius - 1) * dlon_deg * M_PER_DEG * np.maximum(cosl, 0.0)
    return np.maximum(np.minimum(lat_bound, lon_bound), 0.0)


def _guarantee_planar(radius: int, res: int) -> float:
    dlon_deg, dlat_deg = cells.cell_size_deg(res)
    return max(radius - 1, 0) * min(dlon_deg, dlat_deg)


def knn_join(
    points: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int,
    point_id: str = "image_id",
    lon: str = "lon",
    lat: str = "lat",
    query_id: str = "query_id",
    qlon: str = "lon",
    qlat: str = "lat",
    metric: str = "haversine",
    res: int = 10,
    max_rounds: int = 12,
    exclude_self: bool = False,
) -> DataFrame:
    """Top-k nearest points for each query row. Returns
    (query_id, <point_id>, dist, rnk) with rnk in 1..k, ties broken by id.

    ``queries_pdf`` is a driver-side pandas frame (the reference's KNN is
    likewise a client-driven process over a query feature collection).
    """
    if len(queries_pdf) > MAX_CLIENT_QUERIES:
        raise ValueError(
            f"knn_join is the client-driven process analog (per-round driver "
            f"top-k is bounded by Q*k); got Q={len(queries_pdf)} > "
            f"{MAX_CLIENT_QUERIES}. Use knn_join_table for table-scale Q."
        )
    spark = points.sparkSession
    q = queries_pdf[[query_id, qlon, qlat]].copy()
    q["__qcell"] = cells.encode(q[qlon].to_numpy(), q[qlat].to_numpy(), res)

    from .spatial_join import add_cell_column

    pts = add_cell_column(points, res, lon, lat, out="__cell")
    n_queries_total = len(q)
    if n_queries_total == 0:
        raise ValueError("no queries")
    pts = pts.persist()

    if metric == "haversine":
        dist_expr = (
            f"2 * 6371008.8 * asin(sqrt("
            f"pow(sin(radians(({lat}) - (__qlat)) / 2), 2) + "
            f"cos(radians(__qlat)) * cos(radians({lat})) * "
            f"pow(sin(radians(({lon}) - (__qlon)) / 2), 2)))"
        )
    elif metric == "planar":
        # multiplication form (not pow): +,*,sqrt are IEEE correctly-rounded,
        # so the distance is bit-identical across engines for oracle parity
        dist_expr = (
            f"sqrt((({lon}) - (__qlon)) * (({lon}) - (__qlon)) + "
            f"(({lat}) - (__qlat)) * (({lat}) - (__qlat)))"
        )
    else:
        raise ValueError(metric)

    n = 1 << res
    unresolved = q
    results: list[pd.DataFrame] = []
    radius = 1
    for _ in range(max_rounds):
        if unresolved.empty:
            break
        # expand each unresolved query to its cell disk (numpy, driver-side)
        qx, qy = cells.decode_xy(unresolved["__qcell"].to_numpy())
        rows = []
        covers_world = radius * 2 + 1 >= n
        for i in range(len(unresolved)):
            if covers_world:
                continue
            dxy = np.arange(-radius, radius + 1)
            gx = (qx[i] + dxy) % n
            gy = qy[i] + dxy
            gy = gy[(gy >= 0) & (gy < n)]
            cc = cells.encode_xy(
                np.repeat(gx, len(gy)), np.tile(gy, len(gx))
            )
            rows.append(
                pd.DataFrame(
                    {
                        "__qid": unresolved[query_id].iloc[i],
                        "__qlon": unresolved[qlon].iloc[i],
                        "__qlat": unresolved[qlat].iloc[i],
                        "__jcell": np.unique(cc),
                    }
                )
            )
        if covers_world:
            # brute-force fallback: cross join the remaining queries
            qdf = spark.createDataFrame(
                unresolved[[query_id, qlon, qlat]].rename(
                    columns={query_id: "__qid", qlon: "__qlon", qlat: "__qlat"}
                )
            )
            cand = pts.crossJoin(F.broadcast(qdf))
        else:
            qcells = pd.concat(rows, ignore_index=True)
            qdf = spark.createDataFrame(qcells)
            cand = pts.join(F.broadcast(qdf), pts["__cell"] == qdf["__jcell"], "inner")

        cand = cand.withColumn("__dist", F.expr(dist_expr))
        if exclude_self:
            cand = cand.filter(F.col(point_id) != F.col("__qid"))
        w = Window.partitionBy("__qid").orderBy(F.col("__dist").asc(), F.col(point_id).asc())
        topk = (
            cand.withColumn("__rnk", F.row_number().over(w))
            .filter(F.col("__rnk") <= k)
            .select(
                F.col("__qid").alias(query_id),
                F.col(point_id),
                F.col("__dist").alias("dist"),
                F.col("__rnk").alias("rnk"),
            )
        )
        got = topk.toPandas()

        # resolution test: enough neighbors AND kth distance within guarantee
        if covers_world:
            results.append(got)
            unresolved = unresolved.iloc[0:0]
            break
        counts = got.groupby(query_id)["rnk"].max()
        dk = got.groupby(query_id)["dist"].max()
        if metric == "haversine":
            glist = _guarantee_m(radius, res, unresolved[qlat].to_numpy())
        else:
            glist = np.full(len(unresolved), _guarantee_planar(radius, res))
        gmap = dict(zip(unresolved[query_id], glist))
        ok_ids = [
            qid
            for qid in unresolved[query_id]
            if counts.get(qid, 0) >= k and dk.get(qid, np.inf) <= gmap[qid]
        ]
        if ok_ids:
            results.append(got[got[query_id].isin(ok_ids)])
            unresolved = unresolved[~unresolved[query_id].isin(ok_ids)]
        radius *= 2

    pts.unpersist()
    if unresolved is not None and not unresolved.empty:
        raise RuntimeError(f"kNN did not resolve {len(unresolved)} queries")
    out = pd.concat(results, ignore_index=True)
    qid_type = (
        T.LongType()
        if pd.api.types.is_integer_dtype(queries_pdf[query_id])
        else T.StringType()
    )
    schema = T.StructType(
        [
            T.StructField(query_id, qid_type),
            T.StructField(point_id, points.schema[point_id].dataType),
            T.StructField("dist", T.DoubleType()),
            T.StructField("rnk", T.IntegerType()),
        ]
    )
    out["rnk"] = out["rnk"].astype("int32")
    return spark.createDataFrame(out, schema=schema)
