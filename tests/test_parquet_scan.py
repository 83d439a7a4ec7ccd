"""Arrow parquet scan + fused density scan: parity with the unfused
DataFrame pipeline (spatial_join |> tile_assignments)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.raster import tile_assignments
from geomesa_spark.operators.spatial_join import spatial_join
from geomesa_spark.sources.images import images_df
from geomesa_spark.sources.parquet_scan import (
    density_scan,
    list_row_groups,
    scan_parquet_arrow,
)

POLYS = {
    "nyc": "POLYGON((-74.6 40.2, -73.4 40.2, -73.4 41.2, -74.6 41.2, -74.6 40.2))",
    "pent": "POLYGON((1.9 48.4, 2.8 48.2, 3.1 49.2, 2.2 49.7, 1.6 49.1, 1.9 48.4))",
}


@pytest.fixture(scope="module")
def img_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("imgs") / "images.parquet")
    images_df(spark, 800, partitions=4).write.mode("overwrite").parquet(path)
    return path


def test_scan_matches_jvm_reader(spark, img_parquet):
    a = scan_parquet_arrow(spark, img_parquet).toPandas()
    b = spark.read.parquet(img_parquet).toPandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) == 800
    assert (a["image_id"] == b["image_id"]).all()
    assert (a["phash"] == b["phash"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["bytes"], b["bytes"]))
    np.testing.assert_allclose(a["lon"], b["lon"])


def test_column_pruned_scan(spark, img_parquet):
    slim = scan_parquet_arrow(spark, img_parquet, columns=["image_id", "lon", "lat"])
    assert slim.columns == ["image_id", "lon", "lat"]
    assert slim.count() == 800


def test_row_group_listing(img_parquet):
    splits = list_row_groups(img_parquet)
    assert sum(n for _, _, n in splits) == 800


def test_density_scan_parity_with_unfused(spark, img_parquet):
    fused = density_scan(spark, img_parquet, POLYS, res=14, pixel_pitch_deg=1e-4).toPandas()

    imgs = spark.read.parquet(img_parquet)
    joined = spatial_join(imgs, POLYS)
    tiles = tile_assignments(joined, res=14, pixel_pitch_deg=1e-4)
    unfused = (
        tiles.join(joined.select("image_id", "poly_id"), "image_id")
        .select("image_id", "poly_id", "tile_cell", "weight")
        .toPandas()
    )
    key = ["image_id", "poly_id", "tile_cell"]
    f = fused.sort_values(key).reset_index(drop=True)
    u = unfused.sort_values(key).reset_index(drop=True)
    assert len(f) == len(u)
    assert (f[key].to_numpy() == u[key].to_numpy()).all()
    np.testing.assert_allclose(f["weight"], u["weight"], rtol=1e-9)


def test_density_scan_aggregates(spark, img_parquet):
    agg = (
        density_scan(spark, img_parquet, POLYS, res=14, pixel_pitch_deg=1e-4)
        .groupBy("poly_id")
        .agg(F.countDistinct("image_id").alias("n"))
        .toPandas()
        .set_index("poly_id")["n"]
    )
    # deterministic generator: both city clusters must be populated
    assert agg.get("nyc", 0) > 0
    assert agg.get("pent", 0) > 0
