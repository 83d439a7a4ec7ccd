"""Streaming funnel — incremental greedy funnel depth per user.

The incremental twin of :func:`geomesa_spark.operators.sessions.funnel`
(the batch/backfill path that carries the SQL oracle). The batch operator's
greedy earliest-completion scan is ORDER-SENSITIVE, so a session_window-style
native rewrite does not exist for it; this is the genuine custom-stateful
case the task contract routes to ``applyInPandasWithState`` (the same
construct as ``streaming.live_view.stateful_live_view``; reference analog:
the event-time ordered view semantics of geomesa-kafka
KafkaFeatureCache.scala, here applied to a derived aggregate).

Correctness model (exactly-once wrt the batch semantics):

- Events at or below the current watermark can never be preceded by a
  still-unseen earlier event (Spark drops later-arriving rows older than
  the watermark before they reach the state function), so they are COMMITTED
  into the per-user accumulator ``(depth, t_prev, t0)`` in event-time order
  and then discarded — committed state is three longs per user, O(1).
- Events above the watermark are BUFFERED in state (bounded by the
  watermark horizon, not by history) and re-scanned tentatively from the
  committed accumulator each micro-batch, so the EMITTED depth always
  equals the batch funnel over every event seen so far, even when later
  micro-batches deliver earlier timestamps (bounded disorder).
- A user who completes all ``k`` steps is marked done: buffers drop to
  empty and the state stops growing (greedy depth never decreases).
- The above-watermark buffer is CAPPED at ``max_buffer`` step-events per
  user (default 100k). A pathological hot user flooding step events faster
  than the watermark advances would otherwise grow state AND pay an
  O(buffer) re-scan every micro-batch — O(horizon x rate) per user. On
  overflow the newest events beyond the cap are dropped, the user's
  emissions carry ``capped = true`` permanently (the depth is then a lower
  bound — exact again only for users whose dropped events were redundant),
  and state stays O(max_buffer). Events at or below the watermark are
  never subject to the cap — they commit and leave state in the same call.

Emitted rows (update mode): ``(user_id, depth, seq, capped)`` whenever a
user's group receives events — the row with the highest ``seq`` per user is
the current funnel depth. ``seq`` exists because depth is NOT monotone under
disorder + a completion window (a late earlier anchor can re-greedy later
steps out of the window), so "latest", not "max", is the correct readout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _greedy_fold(
    acc: tuple[int, int, int],
    events: list[tuple[int, str]],
    steps: list[str],
    window_s: int | None,
) -> tuple[int, int, int]:
    """Fold (t, type)-sorted events into the greedy accumulator
    (depth, t_prev, t0) — the exact CASE logic of the batch operator's SQL
    ``aggregate`` lambda (operators/sessions.py funnel): step 1 matches the
    earliest step-1 event; step i>1 the earliest step-i event strictly
    after the previous step and within window_s of t0."""
    d, tp, t0 = acc
    k = len(steps)
    for t, et in events:
        if d == 0:
            if et == steps[0]:
                d, tp, t0 = 1, t, t
        elif d < k and et == steps[d] and t > tp and (
            window_s is None or t <= t0 + window_s
        ):
            d, tp = d + 1, t
    return d, tp, t0


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_s: int | None = None,
    watermark_s: int = 3600,
    max_buffer: int = 100_000,
) -> DataFrame:
    """-> streaming (user_id, depth, seq, capped) updates; the highest-seq emission
    per user is that user's current batch-equivalent funnel depth. Non-step events are
    pruned BEFORE the shuffle (same as batch); the only shuffle is the
    groupBy on the user key. Works on finite streams and, via the parity
    tests, agrees row-for-row with the oracle-gated batch ``funnel`` for
    any disorder within the watermark. The emitted ``user_id`` column is
    typed long (the events table's key type); a string-keyed stream needs
    only the ``outputStructType`` declaration changed."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    steps = [str(s) for s in steps]
    k = len(steps)
    win = None if window_s is None else int(window_s)

    src = (
        events.withWatermark(ts_col, f"{int(watermark_s)} seconds")
        .filter(F.col(type_col).isin(steps))
        .select(
            F.col(user_col).alias("__u"),
            F.floor(F.col(ts_col).cast("timestamp").cast("double"))
            .cast("long")
            .alias("__t"),
            F.col(type_col).alias("__et"),
            F.col(ts_col).alias("__ts"),  # event-time column for the watermark
        )
    )

    cap = int(max_buffer)
    if cap < 1:
        raise ValueError("max_buffer must be >= 1")

    def update(key_tuple, pdfs, state: GroupState):
        if state.exists:
            d, tp, t0, done, buf_t, buf_e, seq, capped = state.get
            buf = list(zip([int(t) for t in buf_t], list(buf_e)))
            seq = int(seq) + 1
            capped = bool(capped)
        else:
            d, tp, t0, done, buf, seq, capped = 0, 0, 0, False, [], 1, False
        new = []
        for pdf in pdfs:
            new.extend(
                zip(pdf["__t"].astype(np.int64).tolist(), pdf["__et"].tolist())
            )
        if done:
            # committed depth k is terminal; state stays O(1), re-emit for
            # visibility
            yield pd.DataFrame(
                {"user_id": [key_tuple[0]], "depth": [k], "seq": [seq],
                 "capped": [capped]}
            )
            state.update((k, 0, 0, True, [], [], seq, capped))
            return
        # same tie order as the batch operator's sort_array(struct(t, type))
        pend = sorted(buf + new)
        # strict <: a straggler with event time EQUAL to the watermark is
        # still admitted by Spark, so equal-time events must stay buffered
        wm_s = state.getCurrentWatermarkMs() // 1000
        n_commit = 0
        while n_commit < len(pend) and pend[n_commit][0] < wm_s:
            n_commit += 1
        d, tp, t0 = _greedy_fold((d, tp, t0), pend[:n_commit], steps, win)
        pend = pend[n_commit:]
        if len(pend) > cap:
            # hot-user overflow policy: keep the OLDEST cap events (they
            # commit and leave state soonest), drop the rest, flag the user
            # permanently — depth degrades to a lower bound instead of the
            # state degrading to O(horizon x rate)
            pend, capped = pend[:cap], True
        if d >= k:
            # done only on COMMITTED completion: a TENTATIVE depth k may
            # still decrease if a later-arriving earlier anchor re-greedies
            # the scan out of the completion window
            done, pend = True, []
        depth = _greedy_fold((d, tp, t0), pend, steps, win)[0]
        state.update(
            (
                int(d),
                int(tp),
                int(t0),
                bool(done),
                [t for t, _ in pend],
                [e for _, e in pend],
                seq,
                bool(capped),
            )
        )
        yield pd.DataFrame(
            {"user_id": [key_tuple[0]], "depth": [int(depth)], "seq": [seq],
             "capped": [bool(capped)]}
        )

    return src.groupBy("__u").applyInPandasWithState(
        update,
        outputStructType="user_id long, depth int, seq int, capped boolean",
        stateStructType=(
            "d int, tp long, t0 long, done boolean, "
            "buf_t array<long>, buf_e array<string>, seq int, capped boolean"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
