"""Geometry-to-polygon join for NON-POINT rows (the XZ-ordering analog).

Reference parity: point rows use Z2 (operators.spatial_join); rows carrying
lines/polygons use XZ-ordering — index the geometry's BOUNDING BOX with a
sequence length chosen from its extent (``geomesa-z3/.../curve/
XZ2SFC.scala:54-77``), query-window decomposition with contained/overlapping
cells (:146-252). Here:

    rows (WKB geometry) --mapInArrow--> (row, cell@res_j) keys of the bbox
    polygons --driver cover--> cells expanded/coarsened to the SAME res_j
    equi-join on cell -> dropDuplicates(row, poly)  [multi-cell matches]
    exact DE-9IM refine (relate) on the distinct surviving pairs

One fixed join resolution keeps it a single hash join; the polygon cover's
finer cells collapse to res_j ancestors (marked refine) and coarser cells
expand to res_j children — both directions bounded by the cover budget.
Unlike the point path a (row, polygon) pair CAN match through several cells,
so the dedup the reference leaves as a TODO (RelationUtils.scala:39-53) is
explicit here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..core import cells
from ..core.geometry import Geometry, from_wkb, from_wkt, relate, to_wkb

DEFAULT_JOIN_RES = 8       # 256x256 world grid (~1.4 deg cells)
MAX_CELLS_PER_ROW = 256    # bbox cover cap per row geometry


def _poly_cells_at(prepared_cover_rows, res_j: int) -> pd.DataFrame:
    """Expand/coarsen a prepared polygon cover onto one fixed resolution."""
    out: dict[tuple[int, str], bool] = {}
    for r, c, pid, refine in prepared_cover_rows:
        if r == res_j:
            keys = [int(c)]
        elif r < res_j:
            keys = [int(x) for x in cells.children(c, r, res_j)]
        else:
            keys = [int(cells.parent(np.array([c]), r, res_j)[0])]
            refine = True  # coarsened cell over-covers; must refine
        for k in keys:
            prev = out.get((k, pid))
            out[(k, pid)] = refine if prev is None else (prev and refine)
    rows = [(k, pid, refine) for (k, pid), refine in out.items()]
    return pd.DataFrame(rows, columns=["ccell", "poly_id", "refine"])


def geometry_join(
    rows: DataFrame,
    polygons: dict[str, Geometry | str],
    geom_col: str = "geom",
    row_id: str | None = None,
    predicate: str = "intersects",
    res_j: int = DEFAULT_JOIN_RES,
    max_cells: int = 2048,
) -> DataFrame:
    """Join rows carrying arbitrary WKB geometries to polygons by DE-9IM
    ``predicate`` (row_geom <predicate> polygon). Adds ``poly_id``.

    ``row_id`` names a unique row key (required for dedup); defaults to a
    generated ``__rid`` from a monotonically increasing id.
    """
    from .spatial_join import prepare_polygons

    polys_parsed = {
        pid: (from_wkt(g) if isinstance(g, str) else g) for pid, g in polygons.items()
    }
    prepared = prepare_polygons(polys_parsed, max_cells=max_cells)
    cover_pdf = _poly_cells_at(prepared.cover_rows, res_j)
    spark = rows.sparkSession

    gen_rid = row_id is None
    if gen_rid:
        row_id = "__rid"
        rows = rows.withColumn(row_id, F.monotonically_increasing_id())

    nres = np.int64(1) << np.int64(res_j)

    def bbox_cells(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            rids, ccells = [], []
            for rid, wkb in zip(pdf[row_id], pdf[geom_col]):
                if wkb is None:
                    continue
                g = from_wkb(bytes(wkb))
                x0, y0, x1, y1 = g.bounds()
                cx0, cy0 = cells.xy_of(np.array([x0]), np.array([y0]), res_j)
                cx1, cy1 = cells.xy_of(np.array([x1]), np.array([y1]), res_j)
                xs = np.arange(int(cx0[0]), int(cx1[0]) + 1)
                ys = np.arange(int(cy0[0]), int(cy1[0]) + 1)
                # no cap: dropping cells would silently lose candidate pairs.
                # worst case (a global geometry) emits 4^res_j keys for that
                # row — pick a smaller res_j when rows carry huge geometries.
                cc = cells.encode_xy(
                    np.repeat(xs, len(ys)), np.tile(ys, len(xs))
                )
                rids.extend([rid] * len(cc))
                ccells.append(cc)
            if not rids:
                continue
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame(
                    {row_id: rids, "ccell": np.concatenate(ccells)}
                ),
                preserve_index=False,
            )

    rid_type = dict(rows.dtypes)[row_id]
    keys = rows.select(row_id, geom_col).mapInArrow(
        bbox_cells, schema=f"{row_id} {rid_type}, ccell long"
    )

    cov_df = spark.createDataFrame(cover_pdf)
    cand = (
        keys.join(F.broadcast(cov_df), "ccell")
        .select(row_id, "poly_id")
        .dropDuplicates([row_id, "poly_id"])
    )

    pred = predicate
    edges_wkb = {pid: to_wkb(g) for pid, g in polys_parsed.items()}

    @F.pandas_udf("boolean")
    def refine_udf(wkb: pd.Series, pid: pd.Series) -> pd.Series:
        cache: dict[str, Geometry] = {}
        out = []
        for w, p in zip(wkb, pid):
            if p not in cache:
                cache[p] = from_wkb(edges_wkb[p])
            out.append(bool(relate(from_wkb(bytes(w)), cache[p], pred)))
        return pd.Series(out)

    # XZ is a LOOSE index: a bbox cell inside the polygon does not imply the
    # geometry touches that cell, so the exact predicate always runs (the
    # reference likewise always applies the full filter on XZ scans).
    out = rows.join(cand, row_id).filter(
        refine_udf(F.col(geom_col), F.col("poly_id"))
    )
    return out.drop("__rid") if gen_rid else out
