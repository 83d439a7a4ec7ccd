#!/usr/bin/env python
"""Example job for `spark-submit --py-files dist/geomesa_spark.zip`.

Runs the flagship pipeline (synth image table -> cell-cover PIP join ->
raster tile assignment -> density agg) and prints one JSON line. Used by the
packaging smoke test; doubles as the deployment template.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F


def main(n_images: int) -> None:
    spark = SparkSession.builder.appName("geomesa-spark-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Spark 4 distributes --py-files to executors but no longer prepends them
    # to the DRIVER's sys.path; do it explicitly so the same zip serves both.
    for uri in spark.conf.get("spark.submit.pyFiles", "").split(","):
        p = uri.strip().removeprefix("file://").removeprefix("file:")
        if p and p not in sys.path:
            sys.path.insert(0, p)

    # imports AFTER session creation: proves the zip shipped via --py-files
    # resolves on driver and executors alike
    from geomesa_spark.operators.raster import tile_assignments
    from geomesa_spark.operators.spatial_join import spatial_join
    from geomesa_spark.sources.images import images_df

    polys = {
        "nyc": "POLYGON((-74.6 40.2, -73.4 40.2, -73.4 41.2, -74.6 41.2, -74.6 40.2))",
        "paris": "POLYGON((1.8 48.3, 2.9 48.3, 2.9 49.4, 1.8 49.4, 1.8 48.3))",
    }
    imgs = images_df(spark, n_images)
    joined = spatial_join(imgs, polys)
    tiles = tile_assignments(joined, res=14, pixel_pitch_deg=1e-4)
    agg = (
        tiles.groupBy()
        .agg(
            F.countDistinct("image_id").alias("n_images"),
            F.countDistinct("tile_cell").alias("n_tiles"),
            F.sum("weight").alias("total_weight"),
        )
        .collect()[0]
    )
    print(
        "SUBMITRESULT "
        + json.dumps(
            {
                "n_images": agg.n_images,
                "n_tiles": agg.n_tiles,
                "total_weight": round(agg.total_weight, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
