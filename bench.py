#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

--scaling mode (north-rule evidence): runs the flagship spatial-join +
tile-assignment workload at two parallelism levels (local[8] and local[32],
standing in for N and 4N executors) in FRESH subprocess JVMs, computes
throughput scaling efficiency, and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "geo_pip_join",
    "geo_pip_convex",
    "geo_cell_density",
    "geo_tile_density",
    "geo_timebin_cells",
    "geo_knn",
    "geo_track_segments",
    "tpch_q1",
    "join_revenue_by_nation",
    "dedup_exact",
    "text_quality",
    "ann_cosine",
]

IMG_N = 20_000  # flagship image count for the raster workload


def _noop_write(df):
    df.write.mode("overwrite").format("noop").save()


def run_flagship(spark, n_images: int) -> dict:
    """North-rule workload: synth images -> PIP join -> tile assignment."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.raster import tile_assignments
    from geomesa_spark.operators.spatial_join import spatial_join
    from geomesa_spark.sources.images import images_df

    polys = {
        "nyc": "POLYGON((-74.6 40.2, -73.4 40.2, -73.4 41.2, -74.6 41.2, -74.6 40.2))",
        "paris": "POLYGON((1.8 48.3, 2.9 48.3, 2.9 49.4, 1.8 49.4, 1.8 48.3))",
        "tokyo": "POLYGON((139.1 35.1, 140.3 35.1, 140.3 36.3, 139.1 36.3, 139.1 35.1))",
        "la": "POLYGON((-118.9 33.4, -117.6 33.4, -117.6 34.7, -118.9 34.7, -118.9 33.4))",
        "sydney": "POLYGON((150.5 -34.5, 151.9 -34.5, 151.9 -33.2, 150.5 -33.2, 150.5 -34.5))",
    }
    # input materialization is NOT part of the measured operator: the north
    # metric is spatial-join + tile-assignment throughput over an existing
    # table, so generate+cache first (what reading Iceberg would be), then time
    # the join + decode + tile + aggregate pipeline.
    imgs = images_df(spark, n_images).persist()
    n_in = imgs.count()
    t0 = time.time()
    joined = spatial_join(imgs, polys)
    tiles = tile_assignments(joined, res=14, pixel_pitch_deg=1e-4)
    agg = tiles.groupBy("tile_cell").agg(
        F.sum("weight").alias("weight"), F.count("*").alias("n")
    )
    _noop_write(agg)
    dt = time.time() - t0
    n_join = joined.count()
    imgs.unpersist()
    return {
        "seconds": dt,
        "rows_in": n_in,
        "rows_joined": n_join,
        "rows_per_sec": n_in / dt,
    }


def run_bench() -> dict:
    from geomesa_spark.catalog import QUERIES
    from geomesa_spark.session import get_spark

    spark = get_spark(cpus=CPUS, app="geomesa-bench")
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    # untimed warmup: JVM codegen, parquet footers, Python worker imports —
    # steady-state numbers, not first-query cold-start, are what scale to a
    # long-lived cluster session.
    from pyspark.sql import functions as F, types as T

    def _warm_fn(x):
        import geomesa_spark.core.cells  # noqa: F401 — preload worker imports
        return x * 1.0

    _warm = F.pandas_udf(_warm_fn, T.DoubleType())

    spark.range(0, 100_000, 1, CPUS).select(
        F.sum(_warm(F.col("id").cast("double")))
    ).collect()
    _noop_write(QUERIES["geo_pip_join"][0](spark, SF_DIR))
    _noop_write(QUERIES["tpch_q1"][0](spark, SF_DIR))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _ = QUERIES[name]
        t0 = time.time()
        _noop_write(fn(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    flag = run_flagship(spark, IMG_N)
    timings["img_flagship"] = round(flag["seconds"], 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "spatial-join + tile-assignment + analytics runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flagship_rows_per_sec": round(flag["rows_per_sec"], 1),
        "flagship_rows_in": flag["rows_in"],
        "cpus": CPUS,
    }


def _scaling_child(cpus: int, n_images: int) -> None:
    from geomesa_spark.session import get_spark

    spark = get_spark(cpus=cpus, app=f"geomesa-scale-{cpus}")
    # warmup: JVM + codegen
    run_flagship(spark, 2000)
    res = run_flagship(spark, n_images)
    print("SCALERESULT " + json.dumps(res))
    spark.stop()


def run_scaling(n_images: int = 40_000) -> dict:
    out = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cpus), str(n_images)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("SCALERESULT ")]
        if not line:
            raise RuntimeError(f"child failed: {proc.stdout[-2000:]} {proc.stderr[-2000:]}")
        out[cpus] = json.loads(line[-1][len("SCALERESULT "):])
    t8 = out[8]["rows_per_sec"]
    t32 = out[32]["rows_per_sec"]
    eff = (t32 / t8) / (32 / 8)
    report = {
        "n_images": n_images,
        "local8_rows_per_sec": round(t8, 1),
        "local32_rows_per_sec": round(t32, 1),
        "speedup": round(t32 / t8, 3),
        "scaling_efficiency": round(eff, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH — scaling evidence (north rule)\n\n"
            "Flagship workload: deterministic synth image table -> Z2 cell-cover\n"
            "point-in-polygon join (5 city polygons) -> raster tile assignment\n"
            "(decode + pixel-grid -> Z2 tiles) -> tile density aggregation.\n\n"
            "local[8] vs local[32] stand in for N vs 4N executors (sandbox has\n"
            "no real cluster); fresh JVM per level, warmup run excluded.\n\n"
            f"| parallelism | images | rows/sec |\n|---|---|---|\n"
            f"| local[8]  | {n_images} | {report['local8_rows_per_sec']} |\n"
            f"| local[32] | {n_images} | {report['local32_rows_per_sec']} |\n\n"
            f"speedup 8->32 cores: **{report['speedup']}x** "
            f"(ideal 4x)\n\n"
            f"scaling efficiency: **{report['scaling_efficiency']}** "
            f"(target >= 0.8)\n"
        )
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        _scaling_child(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling(int(sys.argv[2]) if len(sys.argv) > 2 else 40_000)
    else:
        print(json.dumps(run_bench()))
