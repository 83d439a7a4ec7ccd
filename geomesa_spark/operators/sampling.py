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


# --- deterministic stratified sampling ------------------------------------
#
# Engine-portable keep-rule for rebalancing corpora (downsample dominant
# strata — the classic language/source rebalancing step of a training-data
# pipeline): keep iff u01(id) < fraction(stratum), where u01 is a
# Carter-Wegman universal hash over the 64-bit id split into 30-bit limbs.
# Every product stays below 2^61, so the expression is ANSI-mode-safe in
# Spark (no int64 overflow, which ANSI turns into errors) AND expressible
# verbatim in any SQL engine — the DuckDB oracle replays it exactly.
# Deterministic in the row id: re-running at any parallelism, or resuming a
# partially-written job, keeps the SAME rows (unlike df.sample, whose
# output depends on the partitioning).

_MASK30 = (1 << 30) - 1


def wegman_constants(salt: int) -> tuple[int, int, int, int]:
    """(a1, a2, a3, b) < 2^31, derived from ``salt`` by splitmix64 steps
    (the shared public-domain constants in :mod:`.dedup` — one source of
    truth for the recipe) — stateless, reproducible on any engine/driver."""
    from .dedup import _SPLITMIX_C1, _SPLITMIX_C2, _SPLITMIX_C3

    out = []
    x = salt & 0xFFFFFFFFFFFFFFFF
    for _ in range(4):
        x = (x + _SPLITMIX_C1) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * _SPLITMIX_C2) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * _SPLITMIX_C3) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        out.append((z & 0x7FFFFFFF) | 1)  # odd, < 2^31
    return tuple(out)


def u01_hash_sql(id_expr: str, salt: int) -> str:
    """SQL expression (Spark AND DuckDB dialect-portable) for u01(id) in
    [0, 1): a three-stage multiply-shift cascade (Knuth multiplicative /
    Dietzfelbinger multiply-shift) over the id's 30-bit limbs.

    Each stage multiplies a <2^31 operand by an odd <2^31 constant (product
    < 2^62 — ANSI-Spark-safe, no int64 overflow) and keeps the MIDDLE 30
    bits, which a single multiply mixes well even for sequential inputs;
    chaining the limbs through the stages soaks the high limbs in. Only
    `* + >> &` appear — the operator subset Spark SQL and DuckDB spell
    identically (xor is `^` in Spark but pow in DuckDB, so no xor)."""
    a1, a2, a3, b1 = wegman_constants(salt)
    s1 = f"((({a1} * (({id_expr}) & {_MASK30}) + {b1}) >> 13) & {_MASK30})"
    s2 = f"((({a2} * (((({id_expr}) >> 30) & {_MASK30}) + {s1}) + {b1}) >> 13) & {_MASK30})"
    s3 = f"((({a3} * (((({id_expr}) >> 60) & 15) + {s2}) + {b1}) >> 13) & {_MASK30})"
    return f"(CAST({s3} AS DOUBLE) / {1 << 30}.0)"


def sample_stratified(
    df: DataFrame,
    key_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    salt: int = 7,
) -> DataFrame:
    """Keep each row iff u01(id) < fraction(key) — exact same rows at any
    parallelism. Pure codegen: one CASE over the stratum key, one hash
    expression, zero shuffles (the filter composes with the scan)."""
    frac = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(key_col) == k, F.lit(float(v))).otherwise(frac)
    u = F.expr(u01_hash_sql(id_col, salt))
    return df.filter(u < frac)
