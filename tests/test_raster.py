"""Tile-assignment parity: the reduceat block-sum implementation must equal a
brute-force per-pixel oracle (FIXTURES.md invariant f: tile assignments vs
per-row numpy oracle)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.core import cells
from geomesa_spark.functions.image import decode_image
from geomesa_spark.operators.raster import GRAY, tile_assignments
from geomesa_spark.sources.images import generate_batch, images_df


def _oracle(pdf: pd.DataFrame, res: int, pitch: float) -> pd.DataFrame:
    rows = []
    for row in pdf.itertuples(index=False):
        arr = decode_image(row.bytes, row.fmt, row.w, row.h)
        gray = (arr.astype(np.float64) @ GRAY) / 255.0
        h, w = gray.shape
        px_lon = np.broadcast_to(
            (row.lon + np.arange(w) * pitch)[None, :], (h, w)
        ).ravel()
        px_lat = np.broadcast_to(
            (row.lat - np.arange(h) * pitch)[:, None], (h, w)
        ).ravel()
        cell = cells.encode(px_lon, px_lat, res)
        uc, inv = np.unique(cell, return_inverse=True)
        wsum = np.bincount(inv, weights=gray.ravel())
        for c, s in zip(uc, wsum):
            rows.append((row.image_id, int(c), float(s)))
    return (
        pd.DataFrame(rows, columns=["image_id", "tile_cell", "weight"])
        .sort_values(["image_id", "tile_cell"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("res,pitch", [(14, 1e-4), (18, 1e-5), (10, 5e-3)])
def test_tile_assignment_parity(spark, res, pitch):
    imgs = images_df(spark, 60, partitions=4)
    got = (
        tile_assignments(imgs, res=res, pixel_pitch_deg=pitch)
        .toPandas()
        .sort_values(["image_id", "tile_cell"])
        .reset_index(drop=True)
    )
    want = _oracle(generate_batch(np.arange(60)), res, pitch)
    assert len(got) == len(want)
    assert (got["image_id"].to_numpy() == want["image_id"].to_numpy()).all()
    assert (got["tile_cell"].to_numpy() == want["tile_cell"].to_numpy()).all()
    np.testing.assert_allclose(got["weight"].to_numpy(), want["weight"].to_numpy(), rtol=1e-9)
