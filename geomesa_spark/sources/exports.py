"""Export sinks — the reference's ExportFormat surface, Spark-first.

Reference: ``geomesa-tools/.../export/formats/ExportFormat.scala:50-86``
(csv/tsv/json/avro/orc/parquet/arrow/bin/leaflet/gml/shp). Everything with a
native Spark writer is a one-liner through ``export()``; the two bespoke
formats are re-implemented:

- BIN: the reference's compact 16/24-byte track record
  (``geomesa-utils/.../bin/BinaryOutputEncoder.scala:87-163`` — little-endian
  [trackId:int32][dtg_seconds:int32][lat:float32][lon:float32] and the
  24-byte variant appending [label:int64]). Encoded vectorized in numpy
  inside ``mapInPandas``; one packed blob per Arrow batch.
- Arrow IPC: one .arrow stream file per partition via ``mapInArrow``
  pass-through + pyarrow writer (the reference's ArrowExporter equivalent,
  dictionary encoding left to pyarrow).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

NATIVE_FORMATS = {"csv", "tsv", "json", "parquet", "orc", "avro"}


def export(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options):
    """Write via the matching native sink (ExportFormat dispatch)."""
    fmt = fmt.lower()
    if fmt == "tsv":
        return df.write.mode(mode).options(sep="\t", header=True, **options).csv(path)
    if fmt == "csv":
        return df.write.mode(mode).options(header=True, **options).csv(path)
    if fmt == "json":
        return df.write.mode(mode).options(**options).json(path)
    if fmt in ("parquet", "orc"):
        return getattr(df.write.mode(mode).options(**options), fmt)(path)
    if fmt == "avro":
        return df.write.mode(mode).format("avro").options(**options).save(path)
    raise ValueError(f"unsupported export format: {fmt} (native: {NATIVE_FORMATS})")


def bin_records(
    df: DataFrame,
    track: str,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    label: str | None = None,
    sort_within_partitions: bool = True,
) -> DataFrame:
    """-> (n_records, payload binary): BIN-packed rows, one blob per batch.

    Record layout (BinaryOutputEncoder.scala:100): little-endian int32 track
    id (hash of the track value, as the reference hashes string track ids),
    int32 epoch seconds, float32 lat, float32 lon [, int64 label] = 16 or 24
    bytes/record. Batches are time-sorted when ``sort_within_partitions``
    (BinSorter analog, index/utils/bin/BinSorter.scala).
    """
    cols = [track, lon, lat, ts] + ([label] if label else [])
    slim = df.select(
        F.xxhash64(F.col(track)).bitwiseAND(F.lit(0x7FFFFFFF)).cast("int").alias("__tid"),
        F.col(ts).cast("timestamp").cast("long").cast("int").alias("__ts"),
        F.col(lat).cast("float").alias("__lat"),
        F.col(lon).cast("float").alias("__lon"),
        *([F.col(label).cast("long").alias("__label")] if label else []),
    )
    if sort_within_partitions:
        slim = slim.sortWithinPartitions("__ts")
    rec_size = 24 if label else 16

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            buf = np.zeros(n * rec_size, dtype=np.uint8)
            v = buf.view()
            def put(offset, arr, dtype):
                b = np.ascontiguousarray(arr.astype(dtype)).view(np.uint8).reshape(n, -1)
                w = b.shape[1]
                idx = (np.arange(n)[:, None] * rec_size) + offset + np.arange(w)[None, :]
                v[idx.ravel()] = b.ravel()
            put(0, pdf["__tid"].to_numpy(), "<i4")
            put(4, pdf["__ts"].to_numpy(), "<i4")
            put(8, pdf["__lat"].to_numpy(), "<f4")
            put(12, pdf["__lon"].to_numpy(), "<f4")
            if label:
                put(16, pdf["__label"].to_numpy(), "<i8")
            yield pd.DataFrame({"n_records": [n], "payload": [buf.tobytes()]})

    return slim.mapInPandas(pack, schema="n_records long, payload binary")


def decode_bin(payload: bytes, with_label: bool = False) -> pd.DataFrame:
    """Inverse of :func:`bin_records` for one payload blob (client decode)."""
    rec = 24 if with_label else 16
    a = np.frombuffer(payload, dtype=np.uint8).reshape(-1, rec)
    out = pd.DataFrame(
        {
            "track_id": a[:, 0:4].copy().view("<i4").ravel(),
            "ts": a[:, 4:8].copy().view("<i4").ravel(),
            "lat": a[:, 8:12].copy().view("<f4").ravel(),
            "lon": a[:, 12:16].copy().view("<f4").ravel(),
        }
    )
    if with_label:
        out["label"] = a[:, 16:24].copy().view("<i8").ravel()
    return out


def to_geojson_rows(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    props: list[str] | None = None,
    out: str = "geojson",
) -> DataFrame:
    """One GeoJSON Feature string per row — GeoJSONExtensions analog
    (geomesa-spark-sql/.../GeoJSONExtensions.scala), fully native:
    ``to_json(struct(...))`` under codegen, no Python."""
    props = props if props is not None else [c for c in df.columns if c not in (lon, lat)]
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(F.col(lon), F.col(lat)).alias("coordinates"),
        ).alias("geometry"),
        F.struct(*[F.col(p) for p in props]).alias("properties"),
    )
    return df.withColumn(out, F.to_json(feature))


def export_arrow_ipc(df: DataFrame, path: str) -> int:
    """Write one Arrow IPC stream file per partition; returns file count.

    The scan stays distributed (mapInArrow pass-through writes from the
    executors); the reference's multi-level Arrow delta merge is unnecessary
    because each file is already a self-contained dictionary-encoded stream.
    """
    os.makedirs(path, exist_ok=True)

    def write_part(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import uuid

        writer = None
        fname = None
        n = 0
        for b in batches:
            if writer is None:
                fname = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
                writer = pa.ipc.new_stream(fname, b.schema)
            writer.write_batch(b)
            n += b.num_rows
        if writer is not None:
            writer.close()
        yield pa.RecordBatch.from_pydict({"rows": [n], "file": [fname or ""]})

    manifest = df.mapInArrow(write_part, schema="rows long, file string").collect()
    return sum(1 for r in manifest if r.file)
