"""Streaming cohort retention — retroactive-safe delta emission.

The incremental twin of
:func:`geomesa_spark.operators.sessions.cohort_retention`. The batch
definition cohorts a user by the period of their FIRST event — so a
late-arriving EARLIER event legally moves the user's whole cohort row set
(every (cohort, offset) pair they contribute to changes). No windowed
streaming aggregate expresses that retroactive move, and chaining a second
stateful aggregate behind a custom stateful operator is outside Spark's
supported shapes — so the operator emits per-user CONTRIBUTION DELTAS
instead of final counts:

    (cohort, offset, delta)   delta in {-1, +1}

Per user and micro-batch, ``applyInPandasWithState`` keeps (cohort,
distinct-periods) — state bounded by the observation span in periods, not
by event count — computes the user's old and new (cohort, offset)
contribution sets, and emits ``-1`` for pairs that vanished and ``+1`` for
pairs that appeared. Ordinary arrivals emit one +1; a retroactive cohort
move emits the full retraction/re-addition for that ONE user (a handful of
rows — deltas are change-proportional, never table-proportional).

``sum(delta) GROUP BY cohort, offset`` over everything emitted equals the
batch operator exactly (parity-tested, including retroactive moves). At
scale the deltas feed an idempotent MERGE sink per micro-batch
(``foreach_batch_upsert`` pattern in ``streaming.live_view``);
:func:`cohort_table_from_deltas` is that fold for batch readout/tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_cohort_deltas(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 604_800,
    watermark_s: int = 3600,
) -> DataFrame:
    """-> streaming (cohort, offset, delta) contribution deltas; folding
    them (sum of delta per (cohort, offset)) reproduces the batch
    ``cohort_retention`` table at every point in stream time. One shuffle
    on the user key; state per user = cohort + distinct periods."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = events.withWatermark(ts_col, f"{int(watermark_s)} seconds").select(
        F.col(user_col).alias("__u"),
        F.floor(
            F.col(ts_col).cast("timestamp").cast("double") / F.lit(int(period_s))
        )
        .cast("long")
        .alias("__p"),
        F.col(ts_col).alias("__ts"),
    )

    def update(key_tuple, pdfs, state: GroupState):
        if state.exists:
            old_ps = set(int(p) for p in state.get[0])
        else:
            old_ps = set()
        new_ps = set(old_ps)
        for pdf in pdfs:
            new_ps.update(int(p) for p in pdf["__p"].astype(np.int64))
        if new_ps == old_ps:
            return
        out_c, out_o, out_d = [], [], []
        if old_ps:
            c0 = min(old_ps)
            old_pairs = {(c0, p - c0) for p in old_ps}
        else:
            old_pairs = set()
        c1 = min(new_ps)
        new_pairs = {(c1, p - c1) for p in new_ps}
        for c, o in sorted(old_pairs - new_pairs):
            out_c.append(c), out_o.append(o), out_d.append(-1)
        for c, o in sorted(new_pairs - old_pairs):
            out_c.append(c), out_o.append(o), out_d.append(1)
        state.update(([int(p) for p in sorted(new_ps)],))
        yield pd.DataFrame({"cohort": out_c, "offset": out_o, "delta": out_d})

    return src.groupBy("__u").applyInPandasWithState(
        update,
        outputStructType="cohort long, offset long, delta int",
        stateStructType="periods array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cohort_table_from_deltas(deltas: DataFrame) -> DataFrame:
    """Fold emitted deltas into the (cohort, offset, n_users) table — the
    batch readout of the idempotent-MERGE sink a deployment would run
    per micro-batch."""
    return (
        deltas.groupBy("cohort", "offset")
        .agg(F.sum("delta").cast("long").alias("n_users"))
        .filter(F.col("n_users") > 0)
    )
