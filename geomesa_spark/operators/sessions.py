"""Sessionization: gap-based event sessions per entity.

The batch analog of the reference's event-time feature grouping
(geomesa-kafka feature-expiry/event-time views, KafkaFeatureCache.scala)
re-expressed as a pure window pipeline: one shuffle on the entity key,
everything else whole-stage codegen. The streaming twin
(``streaming.live_view``) handles the same semantics incrementally with
watermarks; this operator is the backfill/batch path a training-data
pipeline runs over historical event logs.

Scale notes (100 TB): the ONLY shuffle is the window partition on
``user_col`` — the same key the final groupBy reuses, so Catalyst plans a
single Exchange for both (window + partial/final agg share the
partitioning). Per-key state is a sort of that user's events (Spark
spills sorted runs); no driver state, no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """-> (user, session_idx, start_s, end_s, n_events, duration_s).

    A new session starts when the gap to the entity's previous event
    exceeds ``gap_s`` seconds (the first event always starts session 1).
    ``session_idx`` is 1-based per user; start/end are epoch seconds
    (integer-exact, engine-portable).
    """
    # Both windows MUST order by the same expression (the raw event time):
    # ordering the running sum by a coarser key (e.g. whole-second epoch)
    # than the lag used for gap detection would let tied rows land on the
    # wrong side of a session boundary nondeterministically.
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ep = F.unix_timestamp(F.col(ts_col))
    gap = ep - F.lag(ep).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    marked = df.select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        ep.alias("__ep"),
        new_sess.alias("__new"),
    ).withColumn(
        "session_idx",
        F.sum("__new").over(
            Window.partitionBy(user_col)
            .orderBy("__ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy(user_col, "session_idx")
        .agg(
            F.min("__ep").alias("start_s"),
            F.max("__ep").alias("end_s"),
            F.count("*").alias("n_events"),
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
        .select(
            user_col,
            F.col("session_idx").cast("long").alias("session_idx"),
            "start_s",
            "end_s",
            F.col("n_events").cast("long").alias("n_events"),
            "duration_s",
        )
    )


def session_stats(sessions: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user rollup of a sessionize() result: session count, mean events
    per session, total active seconds. Pure partial/final aggregation."""
    return sessions.groupBy(user_col).agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events"),
        F.sum("duration_s").cast("long").alias("active_s"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_s: int | None = None,
) -> DataFrame:
    """-> (user_id, depth): how far each user progresses through the ordered
    ``steps`` funnel — greedy earliest-completion semantics (the standard
    funnel definition): step 1 matches the user's EARLIEST step-1 event at
    time t1; step i>1 matches the earliest step-i event strictly after the
    previous step and within ``window_s`` seconds of t1 (unbounded when
    None). Epoch-second granularity keeps the comparison integer-exact.

    100 TB shape: events not in ``steps`` are pruned BEFORE the shuffle,
    then ONE groupBy on the user key builds the per-user sorted (ts, type)
    array and a native SQL ``aggregate`` lambda runs the greedy scan —
    whole-stage codegen, no Python, no per-step join (a relational k-step
    formulation shuffles the events table k-1 times; the DuckDB oracle
    replays exactly that nested-min form, making it an INDEPENDENT check).
    Per-user state is bounded by that user's step-event count.
    """
    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    k = len(steps)
    ev = events.select(
        F.col(user_col),
        F.floor(F.col(ts_col).cast("timestamp").cast("double"))
        .cast("long")
        .alias("__t"),
        F.col(type_col).alias("__et"),
    ).filter(F.col(type_col).isin(list(steps)))
    per = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("__t", "__et"))).alias("__evs")
    )
    # SQL-literal-escape step names (quotes/backslashes would break or
    # silently alter the generated lambda otherwise)
    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    steps_arr = "array(" + ", ".join(q(s) for s in steps) + ")"
    win = (
        f"acc.t0 + {int(window_s)}" if window_s is not None else f"e.__t"
    )  # unbounded window: e.__t <= e.__t is always true
    scan = f"""
    aggregate(
      __evs,
      struct(cast(0 as int) as d, cast(0 as long) as tp, cast(0 as long) as t0),
      (acc, e) -> CASE
        WHEN acc.d = 0 AND e.__et = element_at({steps_arr}, 1)
          THEN struct(cast(1 as int) as d, e.__t as tp, e.__t as t0)
        WHEN acc.d > 0 AND acc.d < {k}
             AND e.__et = element_at({steps_arr}, acc.d + 1)
             AND e.__t > acc.tp AND e.__t <= {win}
          THEN struct(cast(acc.d + 1 as int) as d, e.__t as tp, acc.t0 as t0)
        ELSE acc
      END,
      acc -> acc.d)
    """
    return per.select(
        F.col(user_col), F.expr(scan).cast("int").alias("depth")
    )


def funnel_counts(depths: DataFrame) -> DataFrame:
    """-> (depth, n_users) rollup of a funnel() result (depth >= 1; users
    with no step-1 event are grouped under their actual depth 0)."""
    return depths.groupBy("depth").agg(F.count("*").cast("long").alias("n_users"))


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str | None = "event_id",
) -> DataFrame:
    """-> (from_type, to_type, n): first-order transition counts between
    consecutive events of each entity (the Markov matrix behind
    next-action analytics and funnel discovery). ONE shuffle on the entity
    key shared by the lead() window and nothing else; the aggregate over
    (from, to) is map-side combinable. Ties on the event time are broken
    by ``tie_col`` so the sequence — and therefore the counts — are
    deterministic at any parallelism."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tie_col).asc()] if tie_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    return (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 604_800,
) -> DataFrame:
    """-> (cohort, offset, n_users): classic cohort retention — users are
    cohorted by the period (default: epoch week) of their FIRST event;
    ``n_users`` counts distinct users of that cohort active ``offset``
    periods later (offset 0 row = the cohort size, so rates are
    n_users / n_users@offset0).

    The full table shuffles ONCE, keyed by user: collect_set of the
    user's distinct periods (map-side combined — duplicate periods never
    cross the wire) yields both the cohort (array_min) and the activity
    rows (explode) with no window sort and no (user, period) re-shuffle —
    a distinct + window-min formulation costs an extra exchange because
    the distinct's (user, period) partitioning cannot serve the user-only
    window. Per-user state is that user's distinct-period set (bounded by
    the observation span in periods). The final aggregate runs over the
    reduced activity frame.
    """
    per = (
        events.select(
            F.col(user_col),
            F.floor(
                F.col(ts_col).cast("timestamp").cast("double") / F.lit(period_s)
            )
            .cast("long")
            .alias("__p"),
        )
        .groupBy(user_col)
        .agg(F.collect_set("__p").alias("__ps"))
    )
    return (
        per.select(
            F.array_min("__ps").alias("cohort"), F.explode("__ps").alias("__p")
        )
        .select("cohort", (F.col("__p") - F.col("cohort")).alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
