"""As-of join vs brute force: at-or-before semantics, ties, tolerance."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from geomesa_spark.operators.asof import asof_join

UTC = dt.timezone.utc


def _ts(s: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(1_700_000_000 + s, tz=UTC)


def test_asof_join_brute_force(spark):
    # left: (user, event_id, ts_offset); right: (user, event_id, ts_offset, value)
    left_rows = [
        (1, 100, 50.0),
        (1, 101, 10.0),    # before any right row of user 1 -> dropped
        (1, 102, 20.0),    # exactly AT right ts 20 -> matches (at-or-before)
        (1, 103, 9000.0),  # matched but outside tolerance -> dropped
        (2, 200, 5.0),
        (3, 300, 100.0),   # user with no right rows -> dropped
    ]
    right_rows = [
        (1, 900, 20.0, 1.5),
        (1, 901, 40.0, 2.5),
        (1, 902, 40.0, 3.5),  # tie on (user, ts): greater event_id wins
        (2, 903, 1.0, 9.0),
    ]
    l = spark.createDataFrame(
        pd.DataFrame(
            [(u, e, _ts(t)) for u, e, t in left_rows],
            columns=["user_id", "event_id", "ts"],
        )
    )
    r = spark.createDataFrame(
        pd.DataFrame(
            [(u, e, _ts(t), v) for u, e, t, v in right_rows],
            columns=["user_id", "event_id", "ts", "value"],
        )
    )
    got = asof_join(
        l, r, on="user_id", right_cols=["event_id", "value"],
        tie_col="event_id", tolerance_s=1000,
    ).toPandas()
    m = {r.event_id: (r.r_event_id, r.r_value, r.lag_s) for r in got.itertuples(index=False)}
    assert m == {
        100: (902, 3.5, 10),   # latest at-or-before 50 is the ts=40 tie -> id 902
        102: (900, 1.5, 0),    # at-or-before includes equal ts
        200: (903, 9.0, 4),
    }


def test_asof_join_left_columns_pass_through(spark):
    l = spark.createDataFrame(
        pd.DataFrame([(1, 10, _ts(100.0), "x")], columns=["k", "eid", "ts", "tag"])
    )
    r = spark.createDataFrame(
        pd.DataFrame([(1, 77, _ts(90.0))], columns=["k", "rid", "ts"])
    )
    got = asof_join(l, r, on="k", right_cols=["rid"], tie_col="rid").toPandas()
    row = got.iloc[0]
    assert (row.k, row.eid, row.tag, row.r_rid, row.lag_s) == (1, 10, "x", 77, 10)


def test_asof_join_null_payload_not_backfilled(spark):
    """The matched right row is carried atomically: a NULL payload field in
    the most recent right row must stay NULL, not backfill from an older
    right row (regression for the per-column ignorenulls carry)."""
    l = spark.createDataFrame(
        pd.DataFrame([(1, 100, _ts(30.0))], columns=["k", "eid", "ts"])
    )
    r = spark.createDataFrame(
        pd.DataFrame(
            [(1, 901, _ts(10.0), 5.0), (1, 902, _ts(20.0), None)],
            columns=["k", "rid", "ts", "value"],
        )
    )
    got = asof_join(l, r, on="k", right_cols=["rid", "value"], tie_col="rid").toPandas()
    row = got.iloc[0]
    assert row.r_rid == 902 and row.lag_s == 10
    assert pd.isna(row.r_value)  # NOT 5.0 from the older row


def test_asof_join_no_tie_col_is_order_independent(spark):
    """Without tie_col, (key, ts)-tied right rows resolve by a content hash
    of the payload — the SAME winner at any input order or parallelism."""
    rows = [(1, 900, 20.0, 1.5), (1, 901, 20.0, 2.5), (1, 902, 20.0, 3.5)]
    l = spark.createDataFrame(
        pd.DataFrame([(1, _ts(30.0))], columns=["user_id", "ts"])
    )
    winners = set()
    for order in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
        r = spark.createDataFrame(
            pd.DataFrame(
                [(u, e, _ts(t), v) for u, e, t, v in order],
                columns=["user_id", "event_id", "ts", "value"],
            )
        ).repartition(4)
        got = asof_join(
            l, r, on="user_id", right_cols=["event_id", "value"]
        ).toPandas()
        assert len(got) == 1
        winners.add((int(got.r_event_id[0]), float(got.r_value[0])))
    assert len(winners) == 1
