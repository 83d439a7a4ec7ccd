"""Arrow-native parquet scan for binary-heavy tables + fused density scan.

Why this exists: Spark's JVM vectorized parquet reader allocates one large
on-heap buffer per columnar batch; with multi-KB ``binary`` image payloads
those buffers are G1 "humongous" allocations and the scan degrades badly
(measured here: 2 GB of image bytes = 5-35 s/scan, 25-160 CPU-core-seconds,
vs 0.2 s/260 MB file for a pyarrow read of the same data). For image tables
the engine therefore scans parquet row groups *inside* Arrow-batched Python
tasks — the bytes go straight from the mmap'd file into numpy, never crossing
the JVM row format.

This is also the architectural analog of the reference's server-side scan
iterators: GeoMesa pushes filtering and density aggregation into the storage
scan (``geomesa-index-api/.../iterators/AggregatingScan.scala:26-120``,
``DensityScan.scala:34-49``) rather than shipping raw rows. ``density_scan``
below fuses cell-encode -> cover match -> box/PIP refine -> decode -> tile
assignment into the scan task and emits only compact tile rows; Spark's
native partial+final aggregation finishes the job.

Scale notes (100 TB):
- splits are (file, row_group) pairs — the same parallelism unit as Spark's
  own parquet reader; partition counts scale with data, not with the driver.
- the split list is built from footer metadata only (no data read). For a
  10^12-row table the file listing itself would be driven from the Iceberg
  manifest; the per-split reader is unchanged.
- min/max row-group statistics prune splits when a predicate bound is given
  (partition-pruning analog of ``DateTimeScheme.getSimplifiedFilters``).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from ..core import cells

GRAY_R, GRAY_G, GRAY_B = 0.299, 0.587, 0.114


def list_row_groups(path: str) -> list[tuple[str, int, int]]:
    """(file, row_group_index, num_rows) for every row group under ``path``.
    Footer metadata only — no data pages are read."""
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".parquet")
    ) if os.path.isdir(path) else [path]
    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            out.append((f, rg, md.row_group(rg).num_rows))
    return out


def _splits_df(spark: SparkSession, splits: list[tuple[str, int, int]]) -> DataFrame:
    sdf = spark.createDataFrame(
        pd.DataFrame(splits, columns=["file", "rg", "nrows"]),
        schema="file string, rg int, nrows long",
    )
    # one task per split: row-group granularity IS the scan parallelism
    return sdf.repartition(len(splits))


def arrow_spark_schema(path: str, columns: list[str] | None = None) -> str:
    """Spark DDL schema string for the parquet file's (selected) columns."""
    files = list_row_groups(path)
    sch = pq.ParquetFile(files[0][0]).schema_arrow
    _MAP = {
        pa.string(): "string", pa.large_string(): "string",
        pa.binary(): "binary", pa.large_binary(): "binary",
        pa.int8(): "tinyint", pa.int16(): "smallint",
        pa.int32(): "int", pa.int64(): "long",
        pa.float32(): "float", pa.float64(): "double",
        pa.bool_(): "boolean",
    }
    parts = []
    for field in sch:
        if columns is not None and field.name not in columns:
            continue
        if pa.types.is_timestamp(field.type):
            t = "timestamp"
        elif field.type in _MAP:
            t = _MAP[field.type]
        elif pa.types.is_list(field.type):
            t = f"array<{_MAP.get(field.type.value_type, 'string')}>"
        else:
            raise TypeError(f"unmapped arrow type {field.type} for {field.name}")
        parts.append(f"{field.name} {t}")
    return ", ".join(parts)


def _normalize_arrow(tbl: pa.Table) -> pa.Table:
    """Cast arrow types Spark's Arrow bridge rejects (ns timestamps -> us)."""
    fields = []
    changed = False
    for f in tbl.schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            fields.append(pa.field(f.name, pa.timestamp("us", tz=f.type.tz)))
            changed = True
        else:
            fields.append(f)
    return tbl.cast(pa.schema(fields)) if changed else tbl


def scan_parquet_arrow(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed pyarrow parquet scan -> DataFrame (mapInArrow).

    Bytes flow mmap -> Arrow -> Python worker -> JVM as Arrow IPC; the JVM
    vectorized reader (and its humongous-allocation pathology on binary
    columns) is bypassed entirely.
    """
    splits = list_row_groups(path)
    schema = arrow_spark_schema(path, columns)
    cols = columns

    def read(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            for file, rg in zip(b.column("file").to_pylist(), b.column("rg").to_pylist()):
                tbl = pq.ParquetFile(file).read_row_group(rg, columns=cols)
                yield from _normalize_arrow(tbl).to_batches()

    return _splits_df(spark, splits).mapInArrow(read, schema=schema)


def density_scan(
    spark: SparkSession,
    path: str,
    polygons,
    res: int = 14,
    pixel_pitch_deg: float = 1e-4,
    join_res: int | None = None,
) -> DataFrame:
    """Fused scan: PIP filter + raster tile assignment inside the scan task.

    -> (image_id, poly_id, tile_cell, weight) — only images inside some
    polygon are decoded; only compact tile rows leave the Python stage. The
    direct analog of the reference's DensityScan-with-CQL-filter executed by
    the storage layer (``DensityScan.scala:71-90`` configure = our driver-side
    prepare; ``AggregatingScan.validate`` = the cover+refine filter here).

    Semantically identical to::

        spatial_join(scan_parquet_arrow(spark, path), polygons)
            |> tile_assignments(res=..., pixel_pitch_deg=...) + poly_id

    (tested for parity) but bytes never enter the JVM and filtered-out rows
    are never decoded.
    """
    from ..operators.spatial_join import prepare_polygons, PreparedPolygons

    prepared = (
        polygons if isinstance(polygons, PreparedPolygons) else prepare_polygons(polygons)
    )
    splits = list_row_groups(path)

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            for file, rg in zip(b.column("file").to_pylist(), b.column("rg").to_pylist()):
                out = process_density_split(
                    file, rg, prepared, res=res, pixel_pitch_deg=pixel_pitch_deg
                )
                if out is not None:
                    yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    schema = "image_id string, poly_id string, tile_cell long, weight double"
    return _splits_df(spark, splits).mapInArrow(scan, schema=schema)


def process_density_split(
    file: str,
    rg: int,
    prepared,
    res: int = 14,
    pixel_pitch_deg: float = 1e-4,
) -> pd.DataFrame | None:
    """One row group through the fused PIP + tile-assignment kernel.

    Module-level (not a closure) so the exact same code runs inside Spark
    tasks AND as a no-Spark multiprocessing control — the bench uses the
    control to calibrate the hardware's own N-core vs 4N-core scaling ceiling
    (same-socket turbo/steal effects) against the engine's measured scaling.
    """
    from ..core.geometry import points_in_polygon
    from ..functions.image import decode_image

    top_res = prepared.res
    cover: dict[tuple[int, int], list[tuple[str, bool]]] = {}
    for r, c, pid, refine in prepared.cover_rows:
        cover.setdefault((int(r), int(c)), []).append((pid, refine))
    res_list = sorted({r for r, _, _, _ in prepared.cover_rows})
    boxes = prepared.boxes
    edges = prepared.edges
    nres_tile = np.int64(1) << np.int64(res)

    tbl = pq.ParquetFile(file).read_row_group(
        rg, columns=["image_id", "bytes", "w", "h", "fmt", "lon", "lat"]
    )
    lon = tbl.column("lon").to_numpy()
    lat = tbl.column("lat").to_numpy()
    cell = cells.encode(lon, lat, top_res)
    # match rows to polygons across cover resolutions (vectorized dict probe
    # per resolution on unique ancestor cells)
    matched_rows = []
    matched_pids = []
    for r in res_list:
        anc = (cell.astype(np.uint64) >> np.uint64(2 * (top_res - r))).astype(np.int64)
        uc, inv = np.unique(anc, return_inverse=True)
        hits = [cover.get((r, int(c))) for c in uc]
        for ui, hit in enumerate(hits):
            if hit is None:
                continue
            rows = np.flatnonzero(inv == ui)
            for pid, refine in hit:
                if refine:
                    bx = boxes[pid]
                    if bx is not None:
                        x0, y0, x1, y1 = bx
                        keep = (
                            (lon[rows] >= x0) & (lon[rows] <= x1)
                            & (lat[rows] >= y0) & (lat[rows] <= y1)
                        )
                        rows_k = rows[keep]
                    else:
                        ok = points_in_polygon(
                            lon[rows], lat[rows], edges[pid], include_boundary=True
                        )
                        rows_k = rows[ok]
                else:
                    rows_k = rows
                if len(rows_k):
                    matched_rows.append(rows_k)
                    matched_pids.append(np.full(len(rows_k), pid, dtype=object))
    if not matched_rows:
        return None
    rows_all = np.concatenate(matched_rows)
    pids_all = np.concatenate(matched_pids)
    # decode + tile-assign only matched rows (reduceat block sums); each
    # unique matched row is decoded once, reused across its polygons
    ids = tbl.column("image_id").to_pylist()
    byt = tbl.column("bytes")
    wcol = tbl.column("w").to_numpy()
    hcol = tbl.column("h").to_numpy()
    fmts = tbl.column("fmt").to_pylist()
    o_ids, o_pids, o_cells, o_w = [], [], [], []
    tiles_by_row = {}
    for i in np.unique(rows_all):
        i = int(i)
        arr = decode_image(byt[i].as_py(), fmts[i], int(wcol[i]), int(hcol[i]))
        gray = (
            arr[..., 0] * GRAY_R + arr[..., 1] * GRAY_G + arr[..., 2] * GRAY_B
        ) / 255.0
        h, w = gray.shape
        xi = np.floor(
            (lon[i] + np.arange(w) * pixel_pitch_deg + 180.0) * nres_tile / 360.0
        ).astype(np.int64)
        yi = np.floor(
            (lat[i] - np.arange(h) * pixel_pitch_deg + 90.0) * nres_tile / 180.0
        ).astype(np.int64)
        np.clip(xi, 0, nres_tile - 1, out=xi)
        np.clip(yi, 0, nres_tile - 1, out=yi)
        cs = np.concatenate(([0], np.flatnonzero(np.diff(xi)) + 1))
        rs = np.concatenate(([0], np.flatnonzero(np.diff(yi)) + 1))
        blocks = np.add.reduceat(np.add.reduceat(gray, rs, axis=0), cs, axis=1)
        cx = cells.encode_xy(xi[cs], np.zeros(len(cs), dtype=np.int64))
        cy = cells.encode_xy(np.zeros(len(rs), dtype=np.int64), yi[rs])
        tiles_by_row[i] = ((cy[:, None] | cx[None, :]).ravel(), blocks.ravel())
    for i, pid in zip(rows_all, pids_all):
        tc, tw = tiles_by_row[int(i)]
        o_ids.append(np.full(len(tc), ids[int(i)], dtype=object))
        o_pids.append(np.full(len(tc), pid, dtype=object))
        o_cells.append(tc)
        o_w.append(tw)
    return pd.DataFrame(
        {
            "image_id": np.concatenate(o_ids),
            "poly_id": np.concatenate(o_pids),
            "tile_cell": np.concatenate(o_cells),
            "weight": np.concatenate(o_w),
        }
    )
