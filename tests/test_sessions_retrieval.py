"""Sessionization and BM25 retrieval vs brute-force oracles."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd

from geomesa_spark.operators.retrieval import bm25_topk, tokens
from geomesa_spark.operators.sessions import session_stats, sessionize

UTC = dt.timezone.utc


def _ts(s: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(1_700_000_000 + s, tz=UTC)


def brute_sessions(rows, gap_s):
    """rows: (user, epoch_float) -> {(user, idx): (start, end, n)}."""
    out = {}
    by_user = {}
    for u, e in rows:
        by_user.setdefault(u, []).append(e)
    for u, es in by_user.items():
        es.sort()
        idx = 0
        prev = None
        for e in es:
            ie = math.floor(1_700_000_000 + e)
            if prev is None or ie - prev > gap_s:
                idx += 1
                out[(u, idx)] = [ie, ie, 0]
            cur = out[(u, idx)]
            cur[0] = min(cur[0], ie)
            cur[1] = max(cur[1], ie)
            cur[2] += 1
            prev = ie
    return {k: tuple(v) for k, v in out.items()}


def test_sessionize_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    rows = []
    for u in range(5):
        t = 0.0
        for _ in range(40):
            # mixture of tight bursts and >gap jumps; fractional seconds
            t += float(rng.choice([0.4, 3.0, 90.0, 4000.0], p=[0.3, 0.3, 0.3, 0.1]))
            rows.append((u, t))
    # same-second tie: two events inside one epoch second right at a boundary
    rows += [(9, 0.0), (9, 5000.2), (9, 5000.8), (9, 9999.0)]
    pdf = pd.DataFrame(
        [(u, _ts(e)) for u, e in rows], columns=["user_id", "ts"]
    )
    got = sessionize(spark.createDataFrame(pdf), gap_s=1800).toPandas()
    gmap = {
        (r.user_id, r.session_idx): (r.start_s, r.end_s, r.n_events)
        for r in got.itertuples(index=False)
    }
    assert gmap == brute_sessions(rows, 1800)
    assert (got["duration_s"] == got["end_s"] - got["start_s"]).all()

    stats = session_stats(sessionize(spark.createDataFrame(pdf), gap_s=1800)).toPandas()
    u9 = stats[stats.user_id == 9].iloc[0]
    assert u9.n_sessions == 3 and u9.active_s == 0  # 1 + tie-pair + 1


def brute_bm25(docs, terms, k1=1.2, b=0.75):
    tok = {i: [t for t in text.lower().replace(".", " ").split() if t] for i, text in docs}
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    df = {t: sum(1 for v in tok.values() if t in v) for t in terms}
    scores = {}
    for i, v in tok.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf and df[t]:
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            scores[i] = round(s, 6)
    return scores


def test_bm25_matches_brute_force(spark):
    docs = [
        (1, "spark join scan join join table"),
        (2, "stream window stream agg"),
        (3, "vector batch vector vector vector"),
        (4, "row column filter"),
        (5, "join stream vector join"),
        (6, "scan scan scan scan scan scan scan scan"),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    terms = ["join", "stream", "vector"]
    got = bm25_topk(spark.createDataFrame(pdf), terms, k=10).toPandas()
    expect = brute_bm25(docs, terms)
    assert dict(zip(got.doc_id, got.score)) == expect
    # ranked by rounded score desc then doc_id
    assert list(got.itertuples(index=False)) == sorted(
        got.itertuples(index=False), key=lambda r: (-r.score, r.doc_id)
    )
    assert 6 not in set(got.doc_id)  # no-match docs never appear


def test_sample_stratified_deterministic_and_calibrated(spark):
    from geomesa_spark.operators.sampling import sample_stratified

    pdf = pd.DataFrame(
        [(i, "a" if i % 3 else "b") for i in range(6000)], columns=["id", "k"]
    )
    fracs = {"a": 0.2, "b": 0.7}
    kept1 = set(
        sample_stratified(
            spark.createDataFrame(pdf), "k", "id", fracs
        ).toPandas()["id"]
    )
    # identical row SET at a different parallelism (df.sample would differ)
    kept2 = set(
        sample_stratified(
            spark.createDataFrame(pdf).repartition(17), "k", "id", fracs
        ).toPandas()["id"]
    )
    assert kept1 == kept2
    got = sample_stratified(spark.createDataFrame(pdf), "k", "id", fracs).toPandas()
    rates = got.groupby("k").size() / pdf.groupby("k").size()
    assert abs(rates["a"] - 0.2) < 0.03 and abs(rates["b"] - 0.7) < 0.03


def test_u01_hash_uniform():
    import duckdb

    from geomesa_spark.operators.sampling import u01_hash_sql

    e = u01_hash_sql("id", 42)
    u = np.array(
        [
            r[0]
            for r in duckdb.sql(
                f"SELECT {e} FROM (SELECT unnest(range(0, 50000)) AS id)"
            ).fetchall()
        ]
    )
    assert abs(u.mean() - 0.5) < 0.01
    for q in (0.1, 0.3, 0.9):
        assert abs((u < q).mean() - q) < 0.01


def test_tokens_drops_empties(spark):
    pdf = pd.DataFrame([(1, "  A--b!  c1  "), (2, "")], columns=["doc_id", "text"])
    got = tokens(spark.createDataFrame(pdf)).toPandas()
    assert sorted(got.tok) == ["a", "b", "c1"]


def test_funnel_greedy_semantics(spark):
    """Hand-built funnel cases: strict step ordering, same-second ties
    rejected, window anchored at the EARLIEST step-1 event, non-step events
    ignored, users with no step-1 event at depth 0."""
    import datetime as dt

    from geomesa_spark.operators.sessions import funnel

    W = 1000
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # u1: full funnel
        (1, ts(0), "view"), (1, ts(100), "click"), (1, ts(200), "purchase"),
        # u2: purchase BEFORE click -> depth 2
        (2, ts(0), "view"), (2, ts(50), "purchase"), (2, ts(100), "click"),
        # u3: no view -> depth 0
        (3, ts(0), "click"), (3, ts(10), "purchase"),
        # u4: click at the SAME second as view -> strict > rejects -> depth 1
        (4, ts(0), "view"), (4, ts(0), "click"),
        # u5: click outside the window -> depth 1
        (5, ts(0), "view"), (5, ts(W + 1), "click"),
        # u6: purchase outside the window anchored at t1 -> depth 2
        (6, ts(0), "view"), (6, ts(10), "click"), (6, ts(W + 1), "purchase"),
        # u7: anchor = EARLIEST view (50), so click@60 counts -> depth 2
        (7, ts(100), "view"), (7, ts(50), "view"), (7, ts(60), "click"),
        # noise event types are ignored entirely
        (1, ts(150), "error"), (3, ts(5), "error"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["user_id"]: r["depth"]
        for r in funnel(
            ev, ["view", "click", "purchase"], window_s=W
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 1, 6: 2, 7: 2}


def test_funnel_step_names_with_quotes(spark):
    import datetime as dt

    from geomesa_spark.operators.sessions import funnel

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (1, t0, "add'to'cart"),
        (1, t0 + dt.timedelta(seconds=5), "purchase"),
        (2, t0, "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["user_id"]: r["depth"]
        for r in funnel(ev, ["add'to'cart", "purchase"]).collect()
    }
    assert got == {1: 2, 2: 0}


def test_funnel_fuzz_vs_brute_force(spark):
    """Randomized event streams vs a direct Python implementation of the
    greedy earliest-completion scan — windowed and unbounded."""
    import datetime as dt

    import numpy as np

    from geomesa_spark.operators.sessions import funnel

    rng = np.random.default_rng(21)
    types = ["view", "click", "purchase", "error"]
    steps = ["view", "click", "purchase"]
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    for u in range(40):
        n = int(rng.integers(1, 15))
        secs = sorted(int(s) for s in rng.integers(0, 500, n))
        for s in secs:
            rows.append((u, t0 + dt.timedelta(seconds=s), types[rng.integers(0, 4)]))

    def brute(window):
        per: dict[int, list[tuple[int, str]]] = {}
        for u, ts, et in rows:
            if et in steps:
                per.setdefault(u, []).append((int(ts.timestamp()), et))
        out = {}
        for u, evs in per.items():
            evs.sort()
            d, tp, t_anchor = 0, 0, 0
            for t, et in evs:
                if d == 0 and et == steps[0]:
                    d, tp, t_anchor = 1, t, t
                elif 0 < d < len(steps) and et == steps[d] and t > tp and (
                    window is None or t <= t_anchor + window
                ):
                    d, tp = d + 1, t
            out[u] = d
        return out

    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    for window in (None, 120, 300):
        got = {
            r["user_id"]: r["depth"]
            for r in funnel(ev, steps, window_s=window).collect()
        }
        assert got == brute(window), f"window={window}"


def test_cohort_retention_brute_force(spark):
    import datetime as dt

    from geomesa_spark.operators.sessions import cohort_retention

    P = 100  # tiny period for the test
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        # u1: first in period 0, active 0,1,3 (two events in p1 count once)
        (1, 5), (1, 110), (1, 150), (1, 330),
        # u2: first in period 1, active 1,2
        (2, 120), (2, 260),
        # u3: single event in period 0
        (3, 80),
    ]
    ev = spark.createDataFrame(
        [(u, t0 + dt.timedelta(seconds=s), "view") for u, s in rows],
        ["user_id", "ts", "event_type"],
    )
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in cohort_retention(ev, period_s=P).collect()
    }
    base = int(t0.timestamp()) // P
    assert got == {
        (base, 0): 2, (base, 1): 1, (base, 3): 1,   # cohort of u1+u3
        (base + 1, 0): 1, (base + 1, 1): 1,          # cohort of u2
    }
