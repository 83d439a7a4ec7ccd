#!/usr/bin/env python
"""Deployment template for the Catalyst extension jar:

    spark-submit --master local[4] \\
        --py-files dist/geomesa_spark.zip \\
        --jars dist/geomesa-spark-ext.jar \\
        --conf spark.sql.extensions=geomesaspark.ext.SpatialExtensions \\
        scripts/submit_ext_job.py 20000

Runs a plain spark.sql point-in-polygon query through the exact-refine UDF
and reports whether the JVM rule's injected bbox conjuncts reached the
parquet scan (PushedFilters) — the packaged proof that the extension works
through the real spark-submit deployment path, not just in-process tests.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

WKT = "POLYGON ((139.5 35.4, 139.95 35.4, 139.95 35.9, 139.5 35.9, 139.5 35.4))"


def main(n_images: int) -> None:
    spark = SparkSession.builder.appName("geomesa-spark-ext-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Spark 4 distributes --py-files to executors but no longer prepends them
    # to the DRIVER's sys.path; do it explicitly so the same zip serves both.
    for uri in spark.conf.get("spark.submit.pyFiles", "").split(","):
        p = uri.strip().removeprefix("file://").removeprefix("file:")
        if p and p not in sys.path:
            sys.path.insert(0, p)

    from geomesa_spark.extensions import where_pip_sql
    from geomesa_spark.fixtures import ensure_images_parquet

    path = ensure_images_parquet(spark, n_images)
    df = spark.read.parquet(path)
    out = where_pip_sql(spark, df, "lon", "lat", WKT)
    # dynamic SQL conf: stop the plan renderer truncating PushedFilters
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    phys = out._jdf.queryExecution().executedPlan().toString()
    print(
        "SUBMITEXTRESULT "
        + json.dumps(
            {
                "rows": out.count(),
                "pushed": (
                    "GreaterThanOrEqual(lat,35.4)" in phys
                    and "LessThanOrEqual(lon,139.95)" in phys
                ),
                "extension_conf": spark.conf.get("spark.sql.extensions", ""),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000)
