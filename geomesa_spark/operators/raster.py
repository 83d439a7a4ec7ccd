"""Raster -> vector tile assignment (the BASELINE headline image operator).

Semantics re-created from the reference's density/rendering stack:
``DensityScan`` renderers write geometry weights onto a W x H pixel grid
(``DensityScan.scala:287-345``), with snap math from ``GridSnap.scala:59-80``
and weights from ``DensityScan.scala:159-184``. Here the raster is the
*input*: each image's w x h pixel grid is anchored at its (lon, lat), every
pixel maps to the Z2 tile cell under it, and normalized pixel intensity
accumulates as the tile weight.

Execution shape (the part that must survive 100 TB):
- ``bytes`` is only read inside one ``mapInPandas`` stage (Arrow batches);
  the stage emits compact (image_id, tile_cell, weight) rows pre-aggregated
  per image, so the shuffle that follows carries NO image payloads.
- decode is per-format vectorized numpy (png/qjz/raw) from functions.image;
  per-image pixel->cell encode is one vectorized cells.encode call.
- the final groupBy(tile_cell) is a plain partial+final native agg.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core import cells
from ..functions.image import decode_image

GRAY = np.array([0.299, 0.587, 0.114])


def tile_assignments(
    images: DataFrame,
    res: int = 18,
    pixel_pitch_deg: float = 1e-5,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """-> (image_id, tile_cell, weight): per-image per-tile normalized
    intensity sums. ``pixel_pitch_deg`` is the ground size of one pixel; the
    image's pixel (row, col) sits at (lon + col*pitch, lat - row*pitch),
    row-major from the anchor (top-left), mirroring RenderingGrid's
    row/column orientation."""

    needed = images.select("image_id", "bytes", "w", "h", "fmt", lon, lat)

    def assign(batches):
        for pdf in batches:
            ids, cels, wts = [], [], []
            for row in pdf.itertuples(index=False):
                arr = decode_image(row.bytes, row.fmt, row.w, row.h)
                gray = (arr.astype(np.float64) @ GRAY) / 255.0
                h, w = gray.shape
                cols = np.arange(w) * pixel_pitch_deg + getattr(row, lon)
                rows = getattr(row, lat) - np.arange(h) * pixel_pitch_deg
                px_lon = np.broadcast_to(cols[None, :], (h, w)).ravel()
                px_lat = np.broadcast_to(rows[:, None], (h, w)).ravel()
                cell = cells.encode(px_lon, px_lat, res)
                uc, inv = np.unique(cell, return_inverse=True)
                wsum = np.bincount(inv, weights=gray.ravel())
                ids.extend([row.image_id] * len(uc))
                cels.append(uc)
                wts.append(wsum)
            if ids:
                yield pd.DataFrame(
                    {
                        "image_id": ids,
                        "tile_cell": np.concatenate(cels),
                        "weight": np.concatenate(wts),
                    }
                )

    return needed.mapInPandas(
        assign, schema="image_id string, tile_cell long, weight double"
    )


def tile_density(images: DataFrame, res: int = 18, pixel_pitch_deg: float = 1e-5,
                 lon: str = "lon", lat: str = "lat") -> DataFrame:
    """-> (tile_cell, weight, n_images): global tile heatmap — the density
    reduce over all images' tile assignments."""
    ta = tile_assignments(images, res=res, pixel_pitch_deg=pixel_pitch_deg, lon=lon, lat=lat)
    return ta.groupBy("tile_cell").agg(
        F.sum("weight").alias("weight"),
        F.countDistinct("image_id").alias("n_images"),
    )
