"""Bench/driver fixture layer: idempotent materialization of the synthetic
image+caption table as parquet.

The fused-scan operators (sources.parquet_scan.density_scan) are STORAGE
scans — their input must be parquet row groups, the local stand-in for the
pre-existing Iceberg table the north rule reads. Materializing that fixture
is environment setup, not query work, so it lives here (the analog of the
reference's in-memory test store seeding, TestGeoMesaDataStore.scala) and
both bench.py and the driver-gate catalog entries read THROUGH this module
instead of owning filesystem side effects themselves.

The cache is keyed by image count; the generator (sources.images.images_df)
is deterministic and frozen — if its output recipe ever changes, bump
``IMAGES_FIXTURE_VERSION`` so stale caches are ignored.
"""

from __future__ import annotations

import os

IMAGES_FIXTURE_VERSION = 1  # images_df recipe unchanged since round 1

FIXTURE_DIR = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/spark_graft_bench")


def ensure_images_parquet(
    spark,
    n_images: int,
    base_dir: str | None = None,
    row_group_mb: int = 16,
    **gen_kwargs,
) -> str:
    """Return the path of the n-image fixture table, writing it on first use.

    16 MB row groups by default so scan parallelism scales with data size,
    not file count. ``gen_kwargs`` (e.g. hot_city/hot_frac for the skew
    fixture) become part of the cache key.
    """
    from .sources.images import images_df

    base = base_dir or FIXTURE_DIR
    suffix = "".join(f"_{k}{v}" for k, v in sorted(gen_kwargs.items()))
    path = os.path.join(base, f"images_{n_images}{suffix}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            images_df(spark, int(n_images), **gen_kwargs)
            .write.mode("overwrite")
            .option("parquet.block.size", str(row_group_mb * 1024 * 1024))
            .parquet(path)
        )
    return path
