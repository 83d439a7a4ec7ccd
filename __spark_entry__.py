"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship image pipeline on sf0.001 (synth image table from
                  event ids -> PIP join to city polygons -> tile assignment).
queries()      -> every implemented operator from SURVEY.md §2 as
                  (spark, sf_dir) -> DataFrame callables.
oracle_sql()   -> matching DuckDB SQL (omitted for non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: images synthesized from sf0.001 event ids -> spatial join to
    city boxes -> raster tile assignment -> per-polygon rollup."""
    from geomesa_spark.operators.raster import tile_assignments
    from geomesa_spark.operators.spatial_join import spatial_join
    from geomesa_spark.sources.images import images_df

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = events.count()
    imgs = images_df(spark, max(int(n), 500))

    city_boxes = {
        "nyc": "POLYGON((-74.6 40.2, -73.4 40.2, -73.4 41.2, -74.6 41.2, -74.6 40.2))",
        "paris": "POLYGON((1.8 48.3, 2.9 48.3, 2.9 49.4, 1.8 49.4, 1.8 48.3))",
        "tokyo": "POLYGON((139.1 35.1, 140.3 35.1, 140.3 36.3, 139.1 36.3, 139.1 35.1))",
    }
    joined = spatial_join(imgs, city_boxes)
    tiles = tile_assignments(joined, res=12, pixel_pitch_deg=1e-4)
    per_poly = joined.select("image_id", "poly_id")
    return (
        tiles.join(per_poly, "image_id")
        .groupBy("poly_id")
        .agg(
            F.countDistinct("image_id").alias("n_images"),
            F.countDistinct("tile_cell").alias("n_tiles"),
            F.round(F.sum("weight"), 2).alias("total_weight"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geomesa_spark.catalog import QUERIES

    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from geomesa_spark.catalog import QUERIES

    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
