"""Streaming sessionization — native merging session windows + watermark.

The incremental twin of :func:`geomesa_spark.operators.sessions.sessionize`
(the batch/backfill path that carries the SQL oracle): gap-based sessions
per entity over an unbounded stream, expressed with Spark's built-in
``session_window`` — the state store merges overlapping windows per key and
the watermark both bounds state and admits bounded-late events, so no
custom ``applyInPandasWithState`` operator is needed for this shape
(reference event-time view semantics: geomesa-kafka
KafkaFeatureCache.scala event-time ordering; the custom-state path for
upsert caches lives in ``streaming.live_view``).

Scale notes: state is one (key, open-window) entry per ACTIVE session —
bounded by the watermark horizon, not by history; the shuffle key is the
entity id, exactly like the batch operator. Skewed hot keys follow the
stream's key distribution (same story as any keyed stateful op).

Boundary convention: ``session_window`` merges an event falling EXACTLY
``gap_s`` after the previous one (window end is merge-inclusive), i.e. a
new session starts only when the gap strictly exceeds ``gap_s`` — the
same strict-> rule as the batch operator, so the two agree row-for-row
(pinned by the parity test, including the exact-boundary case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    watermark_s: int = 3600,
) -> DataFrame:
    """-> (user, start_s, end_s, n_events, duration_s) per closed-or-open
    session; epoch-second outputs match the batch ``sessionize`` schema
    (``end_s`` is the LAST EVENT's second — Spark extends the raw window
    end to last-event + gap, subtracted back here). ``session_idx`` is
    deliberately absent: a global per-user ordinal is not defined on an
    unbounded stream — derive it downstream by ``start_s`` order if needed.

    Works on batch DataFrames too (``session_window`` is batch-capable;
    the watermark only applies to streams), which is how the parity test
    checks it row-for-row against the oracle-gated batch operator.
    """
    gap = int(gap_s)
    src = (
        events.withWatermark(ts_col, f"{int(watermark_s)} seconds")
        if events.isStreaming
        else events
    )
    return (
        src.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap} seconds").alias("__w"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.unix_timestamp(F.col("__w.start")).alias("start_s"),
            (F.unix_timestamp(F.col("__w.end")) - F.lit(gap)).alias("end_s"),
            F.col("n_events").cast("long").alias("n_events"),
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
    )
