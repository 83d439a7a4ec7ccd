"""Streaming cell density — a live heatmap over an event stream.

The incremental twin of :func:`geomesa_spark.operators.density.cell_density`
(the reference's DensityScan / heatmap aggregation,
geomesa-process/.../DensityProcess.scala, re-expressed over
``readStream``): Z2 cell encode as the SAME native staged SQL expressions
the batch path uses (``spatial_join.add_cell_column`` — whole-stage
codegen, zero Python, identical bit math so live tiles line up with
batch backfills), then a watermarked event-time tumbling window and a
(window, cell) count.

Scale notes: state is one (window, cell) counter per active window —
bounded by the watermark horizon and the cell resolution, independent of
event volume; the shuffle key is (window, cell), so hot cells are exactly
the stream's spatial skew (same mitigation story as the batch density:
resolution choice caps per-key mass). Output modes: ``update`` for a live
view sink, ``append`` to emit finalized windows once the watermark passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_cell_density(
    events: DataFrame,
    res: int = 10,
    lon: str = "lon",
    lat: str = "lat",
    ts_col: str = "ts",
    window_s: int = 300,
    watermark_s: int = 600,
) -> DataFrame:
    """-> (window_start_s, cell, weight) per event-time tumbling window.

    Works on batch DataFrames too (the watermark applies only to streams),
    which is how the test pins it against an independent groupBy of the
    same cell expression.
    """
    from ..operators.spatial_join import add_cell_column

    src = (
        events.withWatermark(ts_col, f"{int(watermark_s)} seconds")
        if events.isStreaming
        else events
    )
    with_cell = add_cell_column(src, res, lon=lon, lat=lat, out="cell")
    return (
        with_cell.groupBy(
            F.window(F.col(ts_col), f"{int(window_s)} seconds").alias("__w"),
            F.col("cell"),
        )
        .agg(F.count("*").alias("weight"))
        .select(
            F.unix_timestamp(F.col("__w.start")).alias("window_start_s"),
            "cell",
            F.col("weight").cast("long").alias("weight"),
        )
    )
