"""Partitioned storage (date/cell scheme + pruning) and export sinks."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from geomesa_spark.sources.exports import (
    bin_records,
    decode_bin,
    export,
    export_arrow_ipc,
)
from geomesa_spark.sources.storage import read_pruned, write_partitioned


@pytest.fixture(scope="module")
def pts_df(spark):
    rng = np.random.default_rng(11)
    n = 2000
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-85, 85, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
        }
    )
    return spark.createDataFrame(pdf)


BOX = "POLYGON((0 0, 40 0, 40 40, 0 40, 0 0))"


def test_partitioned_write_and_prune(spark, pts_df, tmp_path):
    path = str(tmp_path / "store")
    write_partitioned(pts_df, path)

    full = spark.read.parquet(path)
    pruned = read_pruned(spark, path, geom=BOX, time_range=("2024-01-03", "2024-01-08"))

    # pruning must actually reduce the files READ at execution time
    # (inputFiles() reflects the unpruned relation, so count executed files)
    n_full = full.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert n_pruned < n_full / 4

    # and must not lose any matching row (coarse partitions are a superset)
    exact = full.filter(
        (F.col("lon") >= 0) & (F.col("lon") <= 40)
        & (F.col("lat") >= 0) & (F.col("lat") <= 40)
        & (F.col("p_date") >= "2024-01-03") & (F.col("p_date") <= "2024-01-08")
    )
    refined = pruned.filter(
        (F.col("lon") >= 0) & (F.col("lon") <= 40)
        & (F.col("lat") >= 0) & (F.col("lat") <= 40)
    )
    got = {r.pid for r in refined.select("pid").collect()}
    want = {r.pid for r in exact.select("pid").collect()}
    assert got == want and len(want) > 0


def test_bin_records_roundtrip(spark):
    pdf = pd.DataFrame(
        {
            "track": ["t1", "t1", "t2"],
            "lon": [1.5, 2.5, -3.0],
            "lat": [10.0, 11.0, -12.0],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:05", "2024-01-01 00:00:01", "2024-01-01 00:00:03"]
            ),
            "lbl": [7, 8, 9],
        }
    )
    df = spark.createDataFrame(pdf).coalesce(1)

    out16 = bin_records(df, "track", ts="ts").collect()
    assert sum(r.n_records for r in out16) == 3
    dec = pd.concat([decode_bin(bytes(r.payload)) for r in out16])
    assert len(dec) == 3
    # time-sorted within partition
    assert list(dec["ts"]) == sorted(dec["ts"])
    np.testing.assert_allclose(sorted(dec["lon"]), sorted(pdf["lon"]), rtol=1e-6)

    out24 = bin_records(df, "track", ts="ts", label="lbl").collect()
    dec24 = pd.concat([decode_bin(bytes(r.payload), with_label=True) for r in out24])
    assert set(dec24["label"]) == {7, 8, 9}
    # same track -> same hashed id
    t1_ids = dec24.loc[dec24.label.isin([7, 8]), "track_id"].unique()
    assert len(t1_ids) == 1


def test_native_exports(spark, pts_df, tmp_path):
    for fmt in ("csv", "tsv", "json", "parquet", "orc"):
        p = str(tmp_path / f"out_{fmt}")
        export(pts_df.limit(50), p, fmt)
        assert os.path.isdir(p)
    back = spark.read.options(header=True, sep="\t").csv(str(tmp_path / "out_tsv"))
    assert back.count() == 50


def test_arrow_ipc_export(spark, pts_df, tmp_path):
    p = str(tmp_path / "arrow_out")
    nfiles = export_arrow_ipc(pts_df.repartition(3), p)
    assert nfiles == 3
    total = 0
    for f in os.listdir(p):
        with pa.ipc.open_stream(os.path.join(p, f)) as reader:
            t = reader.read_all()
            total += t.num_rows
    assert total == 2000
