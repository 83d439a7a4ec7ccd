"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def narrow_is_small(df: DataFrame) -> bool:
    """True when a NARROW (scan/UDF-projection rooted) frame has fewer
    partitions than the session parallelism. Only call this on narrow
    frames: under AQE, ``.rdd.getNumPartitions()`` on a shuffle-rooted plan
    materializes every upstream stage to learn the final partition count —
    and the real query then re-executes them (no cross-query exchange
    reuse), doubling the pipeline. On a narrow plan the probe is free."""
    spark = df.sparkSession
    return df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism


def spread_small(df: DataFrame, known_small: bool | None = None) -> DataFrame:
    """Re-spread a small frame to the session parallelism before a Python
    stage: small-SF inputs arrive as ONE split, and AQE coalesces small
    exchanges (it sizes partitions in BYTES; Python stages cost per ROW),
    either of which serializes the downstream Arrow stage on one core.

    ``known_small``: pass the result of :func:`narrow_is_small` on a narrow
    ANCESTOR when ``df`` itself is shuffle-rooted — probing ``df`` directly
    would execute its upstream stages twice (see narrow_is_small). When the
    producing input was big, its derived frames keep their natural
    partitioning and this is a no-op, which is the production case."""
    if known_small is None:
        known_small = narrow_is_small(df)
    if known_small:
        return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return df
