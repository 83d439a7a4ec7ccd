"""As-of (most-recent-prior) join — an operator Spark's join menu lacks.

Attach to each left row the latest right row with ``right.ts <= left.ts``
per key (the point-in-time join of feature-store backfills and the
track-enrichment analog of the reference's event-time merge views,
``geomesa-lambda`` hot/cold merge semantics: newest state at-or-before the
query instant wins).

Spark-first shape — the union-and-window formulation, fully native:
both sides are tagged and unioned (the right row packed into ONE struct
column, NULL on left rows), then ONE window partitioned by the join key
and ordered by (event time, side tag, right-row tie-break) carries the
last non-null right-row STRUCT forward onto each left row (``last(...,
ignorenulls=True)`` with an unbounded-preceding row frame — the struct
carry is atomic, so a NULL payload field in the matched row stays NULL
instead of backfilling from an older right row). That is a
single shuffle on the key — same cost as one equi-join — with no
range-condition blowup (a naive ``l.ts >= r.ts`` theta-join is O(n·m)
per key) and no per-key driver state. Skew follows the key distribution
exactly like any keyed window; AQE skew handling applies.

Determinism: right rows tied on (key, ts) are ordered by ``tie_col``
(ascending — the LAST one wins) when given, else by a content hash of
the carried payload struct, so the carried payload never depends on
partition-internal order; ties between left and right rows resolve
right-first (``__src`` ordering), giving at-or-before semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """-> left rows + ``r_<col>`` columns from the matched right row +
    ``lag_s`` (whole seconds from the matched right row to the left row).

    Left rows with no right row at-or-before them (or outside
    ``tolerance_s``) are dropped (inner as-of semantics).
    """
    on = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on + [right_ts]]
    lcols = [c for c in left.columns if c not in on]

    # the matched right row is carried as ONE struct (NULL on left rows),
    # so last(ignorenulls) either matches a whole right row or none — a
    # per-column carry would backfill a NULL payload field from an OLDER
    # right row, fabricating a mixed row no single right row ever held
    m_type = T.StructType(
        [T.StructField("__rt", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l_sel = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__src"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        F.lit(None).cast(m_type).alias("__m"),
        F.lit(None).cast(right.schema[tie_col].dataType).alias("__tie")
        if tie_col
        else F.lit(None).cast("long").alias("__tie"),
    )
    r_sel = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__src"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in lcols
        ],
        F.struct(
            F.col(right_ts).alias("__rt"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("__m"),
        (
            F.col(tie_col)
            if tie_col
            # no tie column: break (key, ts) ties by a content hash of the
            # carried payload so the winner depends only on row VALUES,
            # never on partition-internal arrival order
            else F.xxhash64(
                F.struct(F.col(right_ts), *[F.col(c) for c in right_cols])
            )
        ).alias("__tie"),
    )
    u = l_sel.unionByName(r_sel)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__t").asc(),
            F.col("__src").asc(),
            F.col("__tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__m", ignorenulls=True).over(w)
    attached = u.select(
        *on,
        "__t",
        "__src",
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[matched[c].alias(f"r_{c}") for c in right_cols],
        matched["__rt"].alias("__mrt"),
    )
    out = (
        attached.filter((F.col("__src") == 1) & F.col("__mrt").isNotNull())
        .withColumn(
            "lag_s",
            F.unix_timestamp(F.col("__t")) - F.unix_timestamp(F.col("__mrt")),
        )
    )
    if tolerance_s is not None:
        out = out.filter(F.col("lag_s") <= tolerance_s)
    return out.select(
        *on, *lcols, *[f"r_{c}" for c in right_cols], "lag_s"
    )
