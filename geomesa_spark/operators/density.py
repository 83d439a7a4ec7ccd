"""Density / heatmap aggregation (DensityScan analog).

Re-creates the semantics of the reference's server-side density iterator
(``geomesa-index-api/.../iterators/DensityScan.scala:34-106``: snap geometries
to a W x H grid over an envelope, sum weights per grid cell) and its grid math
(``geomesa-utils/.../GridSnap.scala:59-80``: ``i = floor((x-min)/extent*W)``
clamped to [0, W-1]).

Spark-first: the snap is two native ``floor`` expressions + ``groupBy.sum`` —
partial aggregation map-side, one shuffle keyed by (tile_x, tile_y), all
whole-stage-codegen. No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F



def grid_snap_exprs(
    lon_col: str,
    lat_col: str,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
) -> tuple[str, str]:
    """Portable SQL (Spark + DuckDB) GridSnap expressions, clamped like
    GridSnap.scala:59-80."""
    x0, y0, x1, y1 = bbox
    tx = (
        f"least(greatest(cast(floor((({lon_col}) - ({x0})) * {width} / ({x1 - x0})) "
        f"as bigint), 0), {width - 1})"
    )
    ty = (
        f"least(greatest(cast(floor((({lat_col}) - ({y0})) * {height} / ({y1 - y0})) "
        f"as bigint), 0), {height - 1})"
    )
    return tx, ty


def density(
    df: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    lon: str = "lon",
    lat: str = "lat",
    weight: str | None = None,
) -> DataFrame:
    """-> (tile_x, tile_y, weight): summed weight per grid cell inside bbox.

    Rows outside the bbox are filtered BEFORE the shuffle (DensityScan injects
    the bbox into the query the same way, DensityProcess hints).
    Weight semantics per DensityScan.scala:159-184: weight column or 1.0.
    """
    x0, y0, x1, y1 = bbox
    tx, ty = grid_snap_exprs(lon, lat, bbox, width, height)
    w_expr = F.col(weight).cast("double") if weight else F.lit(1.0)
    return (
        df.filter(
            (F.col(lon) >= x0) & (F.col(lon) <= x1) & (F.col(lat) >= y0) & (F.col(lat) <= y1)
        )
        .select(
            F.expr(tx).alias("tile_x"),
            F.expr(ty).alias("tile_y"),
            w_expr.alias("__w"),
        )
        .groupBy("tile_x", "tile_y")
        .agg(F.sum("__w").alias("weight"))
    )


def cell_density(df: DataFrame, res: int, lon: str = "lon", lat: str = "lat",
                 weight: str | None = None) -> DataFrame:
    """-> (cell, n, weight): global density keyed by Z2 cell (heatmap tiles at
    a zoom level). Pure native expressions; the cell id is built through the
    STAGED column form (cells.cell_stage_exprs) — the monolithic expression
    duplicates the normalize sub-expression ~32x and costs real analyze/
    codegen time (measured ~2.2s -> ~0.9s on geo_cell_density at sf0.1)."""
    from .spatial_join import add_cell_column

    w_expr = F.col(weight).cast("double") if weight else F.lit(1.0)
    with_cell = add_cell_column(df, res, lon, lat, out="cell")
    return (
        with_cell.select("cell", w_expr.alias("__w"))
        .groupBy("cell")
        .agg(F.count("*").alias("n"), F.sum("__w").alias("weight"))
    )


def tile_pyramid(
    df: DataFrame,
    max_res: int,
    levels: int,
    lon: str = "lon",
    lat: str = "lat",
    weight: str | None = None,
) -> DataFrame:
    """-> (res, cell, n, weight): the density rollup at every zoom level in
    ``[max_res - levels + 1, max_res]`` — the tile-pyramid build every map
    renderer runs over a heatmap layer (the reference serves one DensityScan
    per zoom, re-scanning the table each time; DensityScan.scala:34-106).

    Spark-first shape: the RAW data is aggregated ONCE at the finest
    resolution (map-side partial combine, one shuffle keyed by cell), then
    the pyramid is built from the already-reduced cell frame — each fine
    cell explodes into its ``levels`` (res, ancestor) rows (ancestor = drop
    2 bits per level, ``cells.parent_sql_expr``) and a second aggregate
    sums counts/weights per (res, cell). At 10^12 input rows the second
    shuffle moves only O(distinct fine cells x levels) rows, so adding
    zoom levels never re-reads the table.
    """
    from ..core import cells

    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    if max_res - (levels - 1) < 0:
        raise ValueError(
            f"levels={levels} descends below resolution 0 from max_res={max_res}"
        )
    base = cell_density(df, max_res, lon, lat, weight)
    lv = [
        F.struct(
            F.lit(r).alias("res"),
            F.expr(cells.parent_sql_expr("cell", max_res, r)).alias("pcell"),
        )
        for r in range(max_res - levels + 1, max_res + 1)
    ]
    return (
        base.select(F.explode(F.array(*lv)).alias("lv"), "n", "weight")
        .groupBy(F.col("lv.res").alias("res"), F.col("lv.pcell").alias("cell"))
        .agg(F.sum("n").alias("n"), F.sum("weight").alias("weight"))
    )
