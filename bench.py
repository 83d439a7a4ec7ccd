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

IMG_N = 50_000  # flagship image count for the raster workload


def _noop_write(df):
    df.write.mode("overwrite").format("noop").save()


FLAGSHIP_POLYS = {
    "nyc": "POLYGON((-74.6 40.2, -73.4 40.2, -73.4 41.2, -74.6 41.2, -74.6 40.2))",
    "paris": "POLYGON((1.8 48.3, 2.9 48.3, 2.9 49.4, 1.8 49.4, 1.8 48.3))",
    "tokyo": "POLYGON((139.1 35.1, 140.3 35.1, 140.3 36.3, 139.1 36.3, 139.1 35.1))",
    "la": "POLYGON((-118.9 33.4, -117.6 33.4, -117.6 34.7, -118.9 34.7, -118.9 33.4))",
    "sydney": "POLYGON((150.5 -34.5, 151.9 -34.5, 151.9 -33.2, 150.5 -33.2, 150.5 -34.5))",
}

BENCH_TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/spark_graft_bench")


def ensure_images_parquet(spark, n_images: int) -> str:
    """Materialize the deterministic image table as parquet once (the stand-in
    for the pre-existing Iceberg table the north rule reads); reused across
    runs and across the two scaling children. 16 MB row groups so scan
    parallelism scales with data size, not file count."""
    from geomesa_spark.sources.images import images_df

    path = os.path.join(BENCH_TMP, f"images_{n_images}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            images_df(spark, n_images)
            .write.mode("overwrite")
            .option("parquet.block.size", str(16 * 1024 * 1024))
            .parquet(path)
        )
    return path


def run_flagship(spark, n_images: int, reps: int = 2) -> dict:
    """North-rule workload: image table (parquet) -> fused density scan
    (cell-cover PIP filter + decode + tile assignment inside the Arrow scan,
    the reference's server-side DensityScan analog) -> native tile agg.
    Reports the steady-state (last) rep: first execution at a new scale pays
    one-time JVM/Arrow/heap costs a long-lived cluster session amortizes."""
    from pyspark.sql import functions as F

    from geomesa_spark.operators.spatial_join import spatial_join
    from geomesa_spark.sources.parquet_scan import density_scan, scan_parquet_arrow

    path = ensure_images_parquet(spark, n_images)
    n_in = spark.read.parquet(path).count()
    # MEDIAN of the post-warmup reps: the first execution at a new scale pays
    # one-time JVM/Arrow costs a long-lived session amortizes; median (not
    # min) is the same protocol the mp.Pool hardware control uses, so the
    # scaling ratio and the control are comparable measurements
    times = []
    for _ in range(max(reps, 1)):
        t0 = time.time()
        tiles = density_scan(spark, path, FLAGSHIP_POLYS, res=14, pixel_pitch_deg=1e-4)
        agg = tiles.groupBy("tile_cell").agg(
            F.sum("weight").alias("weight"), F.count("*").alias("n")
        )
        _noop_write(agg)
        times.append(time.time() - t0)
    post = times[1:] if len(times) > 1 else times
    dt = sorted(post)[len(post) // 2]
    # join cardinality via the slim DataFrame-native path (column-pruned scan)
    slim = scan_parquet_arrow(spark, path, columns=["image_id", "lon", "lat"])
    n_join = spatial_join(slim, FLAGSHIP_POLYS).count()
    return {
        "seconds": dt,
        "rows_in": n_in,
        "rows_joined": n_join,
        "rows_per_sec": n_in / dt,
    }


def run_skew(spark, n_images: int = 50_000) -> dict:
    """Skew variant (north rule): 70% of rows forced into ONE city cluster so
    one cell dominates. Exercises both physical strategies of the spatial
    join — broadcast (immune to skew: the point side never shuffles) and the
    salted shuffle path (hot cover cells replicated x salt buckets + AQE
    skew-join) — and reports both so the strategy choice is evidence, not
    assertion."""
    import time as _t

    from geomesa_spark.operators.spatial_join import spatial_join
    from geomesa_spark.sources.images import images_df

    imgs = images_df(spark, n_images, hot_city=0, hot_frac=0.7).drop("bytes").persist()
    imgs.count()
    out = {}
    for strategy in ("broadcast", "shuffle"):
        t0 = _t.time()
        n = spatial_join(imgs, FLAGSHIP_POLYS, strategy=strategy).count()
        out[strategy] = {"seconds": round(_t.time() - t0, 3), "rows": n}
    imgs.unpersist()
    assert out["broadcast"]["rows"] == out["shuffle"]["rows"]
    return out


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

    skew = run_skew(spark)
    timings["img_skew_broadcast"] = skew["broadcast"]["seconds"]
    timings["img_skew_salted_shuffle"] = skew["shuffle"]["seconds"]

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
    # warmup: JVM + codegen + python worker imports
    run_flagship(spark, 2000, reps=1)
    res = run_flagship(spark, n_images, reps=4)
    print("SCALERESULT " + json.dumps(res))
    spark.stop()


def _mp_control_worker(args):
    """No-Spark control: the identical fused-scan kernel via mp.Pool."""
    file, rg = args
    from geomesa_spark.operators.spatial_join import prepare_polygons
    from geomesa_spark.sources.parquet_scan import process_density_split

    global _CTRL_PREP
    try:
        prep = _CTRL_PREP
    except NameError:
        prep = _CTRL_PREP = prepare_polygons(FLAGSHIP_POLYS)
    process_density_split(file, rg, prep, res=14, pixel_pitch_deg=1e-4)
    return 0


def run_mp_control(path: str, procs: int) -> float:
    """Seconds to run the full fused-scan workload with a bare mp.Pool(procs):
    measures the HARDWARE's core-scaling (turbo clocks, hypervisor steal,
    memory bandwidth) with zero framework overhead."""
    import multiprocessing as mp

    from geomesa_spark.sources.parquet_scan import list_row_groups

    splits = [(f, rg) for f, rg, _ in list_row_groups(path)]
    with mp.Pool(procs) as pool:
        # SAME protocol as the engine measurement: one full warmup pass,
        # then median of 3 timed passes
        pool.map(_mp_control_worker, splits)
        times = []
        for _ in range(3):
            t0 = time.time()
            pool.map(_mp_control_worker, splits)
            times.append(time.time() - t0)
        return sorted(times)[1]


def run_scaling(n_images: int = 1_200_000) -> dict:
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

    # hardware-ceiling calibration: same kernel, bare multiprocessing
    path = os.path.join(BENCH_TMP, f"images_{n_images}.parquet")
    ctrl8 = run_mp_control(path, 8)
    ctrl32 = run_mp_control(path, 32)
    ctrl_eff = (ctrl8 / ctrl32) / (32 / 8)

    report = {
        "n_images": n_images,
        "local8_rows_per_sec": round(t8, 1),
        "local32_rows_per_sec": round(t32, 1),
        "speedup": round(t32 / t8, 3),
        "scaling_efficiency": round(eff, 3),
        "control_mp8_sec": round(ctrl8, 2),
        "control_mp32_sec": round(ctrl32, 2),
        "hardware_ceiling_efficiency": round(ctrl_eff, 3),
        "normalized_efficiency": round(eff / ctrl_eff, 3) if ctrl_eff else None,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH — scaling evidence (north rule)\n\n"
            "Flagship workload: image+caption parquet table -> fused density scan\n"
            "(Z2 cell-cover PIP filter + decode + pixel-grid->tile assignment inside\n"
            "Arrow-batched scan tasks, the reference DensityScan analog) -> native\n"
            "partial+final tile aggregation.\n\n"
            "local[8] vs local[32] stand in for N vs 4N executors (sandbox has no\n"
            "real cluster); fresh JVM per level, steady-state rep measured (first\n"
            "full-scale execution pays one-time JVM/Arrow warmup a long-lived\n"
            "cluster session amortizes).\n\n"
            "Measurement protocol (identical for the engine and the control):\n"
            "one full warmup pass, then the MEDIAN of the timed passes.\n\n"
            f"| parallelism | images | rows/sec |\n|---|---|---|\n"
            f"| local[8]  | {n_images} | {report['local8_rows_per_sec']} |\n"
            f"| local[32] | {n_images} | {report['local32_rows_per_sec']} |\n\n"
            f"- speedup 8->32 cores: **{report['speedup']}x** (ideal 4x)\n"
            f"- **HEADLINE: raw scaling efficiency {report['scaling_efficiency']}**"
            f" (north-rule target >= 0.8 judged on this raw number)\n\n"
            "## Hardware ceiling control (diagnostic only)\n\n"
            "The identical kernel (same `process_density_split` function, same\n"
            "splits) run with a bare `multiprocessing.Pool` — no Spark at all,\n"
            "same warmup + median-of-3 protocol — measures what this\n"
            "single-socket VM gives 8 vs 32 busy cores (turbo clocking +\n"
            "hypervisor steal shrink per-core throughput when all cores are\n"
            "loaded; a real 4N-executor cluster adds machines at constant\n"
            "clocks instead):\n\n"
            f"- control mp.Pool(8): {report['control_mp8_sec']} s\n"
            f"- control mp.Pool(32): {report['control_mp32_sec']} s\n"
            f"- hardware ceiling efficiency: **{report['hardware_ceiling_efficiency']}**\n"
            f"- engine efficiency / hardware ceiling: "
            f"{report['normalized_efficiency']} (diagnostic context for the raw\n"
            "number, not part of the target claim)\n"
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
