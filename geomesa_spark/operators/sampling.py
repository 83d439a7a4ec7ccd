"""Sampling operators.

- nth-feature sampling with optional per-key threading, matching
  ``geomesa-index-api/.../index/utils/FeatureSampler.scala:21-40`` semantics
  exactly: keep the 1st of every n features (per key when threaded) — the
  parity tests assert the *same rows*, not just the same fraction.
- fraction sampling delegates to ``df.sample`` (the reference's
  SamplingIterator rate is equivalent; Spark's is cheaper than shuffling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sample_nth(
    df: DataFrame,
    n: int,
    order_by: str,
    key: str | None = None,
) -> DataFrame:
    """Keep every nth row (the 1st, n+1st, ...), deterministically ordered by
    ``order_by``; threaded per ``key`` when given (FeatureSampler semantics).

    Note: unlike the reference's scan-order sampling (arbitrary tablet order),
    we require an explicit order column so results are reproducible across
    partitionings — a necessity for a deterministic distributed engine.
    """
    w = (Window.partitionBy(key) if key else Window.partitionBy(F.lit(1))).orderBy(
        F.col(order_by).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(((F.col("__rn") - 1) % n) == 0)
        .drop("__rn")
    )


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=fraction, seed=seed)
