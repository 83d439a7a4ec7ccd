"""Structured Streaming live view: upsert semantics, stale-update dropping,
tombstone deletes, TTL age-off, Lambda hot/cold merge — driven through a real
file-source stream (deterministic chunks + processAllAvailable)."""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.streaming.live_view import (
    expire_ttl,
    foreach_batch_upsert,
    live_view,
    merged_view,
    start_live_query,
)

SCHEMA = "fid string, lon double, lat double, ts timestamp, __deleted boolean"


def _chunk(rows):
    pdf = pd.DataFrame(rows, columns=["fid", "lon", "lat", "ts", "__deleted"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


def test_live_view_batch_semantics(spark):
    df = spark.createDataFrame(
        _chunk(
            [
                ("a", 1.0, 1.0, "2024-01-01 00:00:00", False),
                ("a", 2.0, 2.0, "2024-01-01 00:02:00", False),  # newer -> wins
                ("a", 9.0, 9.0, "2024-01-01 00:01:00", False),  # stale -> dropped
                ("b", 5.0, 5.0, "2024-01-01 00:00:30", False),
                ("c", 7.0, 7.0, "2024-01-01 00:00:10", False),
                ("c", 0.0, 0.0, "2024-01-01 00:03:00", True),   # tombstone
            ]
        ),
        schema=SCHEMA,
    )
    out = live_view(df, "fid", "ts", tombstone="__deleted").toPandas()
    got = {r.fid: (r.lon, r.lat) for r in out.itertuples(index=False)}
    assert got == {"a": (2.0, 2.0), "b": (5.0, 5.0)}


def test_streaming_file_source_upsert(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    # chunk 1
    spark.createDataFrame(
        _chunk(
            [
                ("a", 1.0, 1.0, "2024-01-01 00:00:00", False),
                ("b", 5.0, 5.0, "2024-01-01 00:00:30", False),
            ]
        ),
        schema=SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = start_live_query(stream, "fid", "ts", "live_t1", tombstone="__deleted")
    try:
        q.processAllAvailable()
        v1 = {
            r.fid: r.lon for r in spark.sql("SELECT * FROM live_t1").collect()
        }
        assert v1 == {"a": 1.0, "b": 5.0}

        # chunk 2: newer a, stale b, delete for b afterwards
        spark.createDataFrame(
            _chunk(
                [
                    ("a", 2.0, 2.0, "2024-01-01 00:02:00", False),
                    ("b", 9.0, 9.0, "2024-01-01 00:00:10", False),  # stale
                    ("b", 0.0, 0.0, "2024-01-01 00:05:00", True),   # tombstone
                ]
            ),
            schema=SCHEMA,
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM live_t1").collect()
        v2 = {r.fid: r.lon for r in rows}
        assert v2 == {"a": 2.0}  # b deleted, stale update ignored
    finally:
        q.stop()


def test_ttl_expiry(spark):
    df = spark.createDataFrame(
        _chunk(
            [
                ("old", 1.0, 1.0, "2024-01-01 00:00:00", False),
                ("new", 2.0, 2.0, "2024-01-02 00:00:00", False),
            ]
        ),
        schema=SCHEMA,
    )
    view = live_view(df, "fid", "ts")
    kept = expire_ttl(view, "ts", ttl_seconds=12 * 3600, now="2024-01-02 06:00:00").toPandas()
    assert set(kept["fid"]) == {"new"}


def test_lambda_merged_view(spark):
    cold = spark.createDataFrame(
        _chunk(
            [
                ("a", 1.0, 1.0, "2024-01-01 00:00:00", False),
                ("b", 2.0, 2.0, "2024-01-01 00:00:00", False),
            ]
        ),
        schema=SCHEMA,
    )
    hot = spark.createDataFrame(
        _chunk(
            [
                ("a", 10.0, 10.0, "2024-01-01 01:00:00", False),  # hot overrides
                ("c", 3.0, 3.0, "2024-01-01 01:00:00", False),    # hot-only
            ]
        ),
        schema=SCHEMA,
    )
    out = merged_view(hot, cold, "fid", "ts", tombstone="__deleted").toPandas()
    got = {r.fid: r.lon for r in out.itertuples(index=False)}
    assert got == {"a": 10.0, "b": 2.0, "c": 3.0}


def test_foreach_batch_upsert_persistence(spark, tmp_path):
    src = tmp_path / "src2"
    src.mkdir()
    store = str(tmp_path / "cold_store")
    spark.createDataFrame(
        _chunk([("a", 1.0, 1.0, "2024-01-01 00:00:00", False)]), schema=SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(foreach_batch_upsert(store, "fid", "ts"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            _chunk(
                [
                    ("a", 5.0, 5.0, "2024-01-01 02:00:00", False),
                    ("b", 6.0, 6.0, "2024-01-01 02:00:00", False),
                ]
            ),
            schema=SCHEMA,
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    stored = spark.read.parquet(store).toPandas()
    got = {r.fid: r.lon for r in stored.itertuples(index=False)}
    assert got == {"a": 5.0, "b": 6.0}


def test_stateful_live_view_emits_only_changes(spark, tmp_path):
    """applyInPandasWithState custom operator: one output row per REAL
    change; stale updates produce no output at all."""
    from geomesa_spark.streaming.live_view import stateful_live_view

    src = tmp_path / "src3"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt3")
    spark.createDataFrame(
        _chunk(
            [
                ("a", 1.0, 1.0, "2024-01-01 00:00:00", False),
                ("b", 5.0, 5.0, "2024-01-01 00:00:30", False),
            ]
        ),
        schema=SCHEMA,
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    view = stateful_live_view(stream, "fid", "ts", SCHEMA)
    q = (
        view.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_t1")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) AS n FROM stateful_t1").collect()[0].n
        assert n1 == 2  # two keys, two emissions

        # stale update for a (older ts) + fresh update for b
        spark.createDataFrame(
            _chunk(
                [
                    ("a", 9.0, 9.0, "2023-12-31 00:00:00", False),  # stale
                    ("b", 6.0, 6.0, "2024-01-01 01:00:00", False),  # change
                ]
            ),
            schema=SCHEMA,
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        rows = spark.sql("SELECT fid, lon FROM stateful_t1").collect()
        # exactly ONE new emission (b's change); the stale 'a' emitted nothing
        assert len(rows) == 3
        lons = sorted((r.fid, r.lon) for r in rows)
        assert lons == [("a", 1.0), ("b", 5.0), ("b", 6.0)]
    finally:
        q.stop()


def test_read_feature_stream_files_and_kafka_guard(spark, tmp_path):
    """read_feature_stream: file substitution streams messages through the
    live view; the kafka path surfaces the reference's options and fails
    with an actionable error when the connector/broker are absent."""
    import json

    import pytest

    from geomesa_spark.streaming.live_view import read_feature_stream

    d = tmp_path / "msgs"
    d.mkdir()
    (d / "b0.json").write_text(
        "\n".join(
            json.dumps(m)
            for m in [
                {"fid": "a", "v": 1, "ts": 100},
                {"fid": "a", "v": 2, "ts": 200},
                {"fid": "b", "v": 9, "ts": 150},
            ]
        )
    )
    stream = read_feature_stream(
        spark, "files", "fid string, v long, ts long", path=str(d)
    )
    assert stream.isStreaming
    from geomesa_spark.streaming.live_view import start_live_query

    q = start_live_query(stream, "fid", "ts", "rfs_view")
    try:
        q.processAllAvailable()
        rows = {r.fid: r.v for r in spark.sql("select * from rfs_view").collect()}
        assert rows == {"a": 2, "b": 9}
    finally:
        q.stop()

    with pytest.raises((RuntimeError, Exception)) as ei:
        read_feature_stream(
            spark, "kafka", "fid string", kafka_bootstrap="host:9092", topic="t"
        )
    assert "kafka" in str(ei.value).lower()


EV_SCHEMA = "user_id long, ts timestamp"


def _events(rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


def test_streaming_sessionize_batch_parity(spark):
    """session_window on a batch frame matches the oracle-gated batch
    sessionize row-for-row, including AT the exact gap boundary (both use
    the strict-> rule: an event exactly gap_s later merges)."""
    from geomesa_spark.operators.sessions import sessionize
    from geomesa_spark.streaming.sessions import streaming_sessionize

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),   # same session (gap 600 < 1800)
        (1, "2024-01-01 01:00:00"),   # new session (gap 3000 > 1800)
        (2, "2024-01-01 00:00:00"),
        (2, "2024-01-01 02:00:00"),
        (3, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(_events(rows), schema=EV_SCHEMA)
    got = sorted(
        tuple(r)
        for r in streaming_sessionize(df, gap_s=1800)
        .select("user_id", "start_s", "end_s", "n_events", "duration_s")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in sessionize(df, gap_s=1800)
        .select("user_id", "start_s", "end_s", "n_events", "duration_s")
        .collect()
    )
    assert got == want and len(got) == 5

    # exact-boundary convention: gap == gap_s merges in BOTH (strict >);
    # one tick past the gap splits in both
    b = spark.createDataFrame(
        _events([(9, "2024-01-01 00:00:00"), (9, "2024-01-01 00:30:00")]),
        schema=EV_SCHEMA,
    )
    assert streaming_sessionize(b, gap_s=1800).count() == 1
    assert sessionize(b, gap_s=1800).count() == 1
    c = spark.createDataFrame(
        _events([(9, "2024-01-01 00:00:00"), (9, "2024-01-01 00:30:01")]),
        schema=EV_SCHEMA,
    )
    assert streaming_sessionize(c, gap_s=1800).count() == 2
    assert sessionize(c, gap_s=1800).count() == 2


def test_streaming_sessionize_file_stream(spark, tmp_path):
    """Real file-source stream: sessions merge across micro-batches via the
    session_window state store and match the batch result."""
    from geomesa_spark.streaming.sessions import streaming_sessionize

    src = tmp_path / "sess_src"
    src.mkdir()
    chunk1 = [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:05:00")]
    chunk2 = [(1, "2024-01-01 00:10:00"),   # merges into user 1's session
              (1, "2024-01-01 03:00:00")]   # far later -> second session
    spark.createDataFrame(_events(chunk1), schema=EV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(EV_SCHEMA).parquet(str(src))
    q = (
        streaming_sessionize(stream, gap_s=1800, watermark_s=3600)
        .writeStream.format("memory")
        .queryName("sess_t1")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(_events(chunk2), schema=EV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = sorted(
            (r.user_id, r.start_s, r.end_s, r.n_events)
            for r in spark.sql("SELECT * FROM sess_t1").collect()
        )
    finally:
        q.stop()
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert got == [
        (1, base, base + 600, 2),             # chunk-2 event merged in
        (1, base + 10800, base + 10800, 1),   # second session
        (2, base + 300, base + 300, 1),
    ]


PT_SCHEMA = "lon double, lat double, ts timestamp"


def _points(rows):
    pdf = pd.DataFrame(rows, columns=["lon", "lat", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


def test_streaming_cell_density_batch_parity(spark):
    """The streaming heatmap's cell column is the SAME native expression as
    the batch path: counts match an independent batch groupBy."""
    from geomesa_spark.operators.spatial_join import add_cell_column
    from geomesa_spark.streaming.density import streaming_cell_density

    rows = [
        (-73.98, 40.75, "2024-01-01 00:00:10"),
        (-73.98, 40.75, "2024-01-01 00:01:10"),   # same cell, same window
        (-73.98, 40.75, "2024-01-01 00:07:00"),   # same cell, NEXT window
        (2.35, 48.85, "2024-01-01 00:00:30"),     # different cell
    ]
    df = spark.createDataFrame(_points(rows), schema=PT_SCHEMA)
    got = sorted(
        tuple(r)
        for r in streaming_cell_density(df, res=10, window_s=300).collect()
    )
    want = sorted(
        tuple(r)
        for r in add_cell_column(df, 10)
        .groupBy(
            (F.floor(F.unix_timestamp("ts") / 300) * 300).alias("window_start_s"),
            "cell",
        )
        .agg(F.count("*").cast("long").alias("weight"))
        .collect()
    )
    assert got == want and len(got) == 3
    assert sorted(w for _, _, w in got) == [1, 1, 2]


def test_streaming_cell_density_file_stream(spark, tmp_path):
    """Live heatmap over a real file-source stream: counts accumulate
    across micro-batches within the same (window, cell) state."""
    from geomesa_spark.streaming.density import streaming_cell_density

    src = tmp_path / "dens_src"
    src.mkdir()
    spark.createDataFrame(
        _points([(-73.98, 40.75, "2024-01-01 00:00:10")]), schema=PT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(PT_SCHEMA).parquet(str(src))
    q = (
        streaming_cell_density(stream, res=10, window_s=300, watermark_s=600)
        .writeStream.format("memory")
        .queryName("dens_t1")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            _points(
                [
                    (-73.98, 40.75, "2024-01-01 00:02:00"),  # same window+cell
                    (2.35, 48.85, "2024-01-01 00:01:00"),    # other cell
                ]
            ),
            schema=PT_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = sorted(
            (r.window_start_s, r.weight)
            for r in spark.sql("SELECT * FROM dens_t1").collect()
        )
    finally:
        q.stop()
    base = 1704067200
    assert got == [(base, 1), (base, 2)]  # NYC cell accumulated to 2


FEV_SCHEMA = "user_id long, ts timestamp, event_type string"


def _fevents(rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


def _latest(table, spark):
    """Depth at the highest seq per user — the streaming funnel's readout
    contract (depth is not monotone under disorder + window)."""
    return {
        r.user_id: r.depth
        for r in spark.sql(
            f"SELECT user_id, max_by(depth, seq) depth FROM {table} GROUP BY 1"
        ).collect()
    }


def test_greedy_fold_boundaries():
    """The pure fold mirrors the batch SQL lambda's edge rules: strictly-
    after matching (same-second step2 does not count), window inclusive at
    t0 + window_s, greedy earliest completion, depth never decreases."""
    from geomesa_spark.streaming.funnel import _greedy_fold

    steps = ["a", "b", "c"]
    # same-second a then b: b is NOT strictly after a -> depth 1
    assert _greedy_fold((0, 0, 0), [(10, "a"), (10, "b")], steps, None)[0] == 1
    assert _greedy_fold((0, 0, 0), [(10, "a"), (11, "b")], steps, None)[0] == 2
    # window inclusive at t0+window, exclusive beyond
    assert _greedy_fold((0, 0, 0), [(10, "a"), (20, "b")], steps, 10)[0] == 2
    assert _greedy_fold((0, 0, 0), [(10, "a"), (21, "b")], steps, 10)[0] == 1
    # greedy: earliest step-1 anchors even if a later anchor would do better
    assert (
        _greedy_fold(
            (0, 0, 0), [(10, "a"), (30, "a"), (31, "b")], steps, 5
        )[0]
        == 1
    )
    # resume from a committed accumulator
    assert _greedy_fold((1, 10, 10), [(12, "b"), (13, "c")], steps, None)[0] == 3


def test_streaming_funnel_file_stream_out_of_order_parity(spark, tmp_path):
    """Micro-batches deliver timestamps OUT OF ORDER (all within the
    watermark): the last emitted depth per user must equal the oracle-gated
    batch funnel over the full event set — the buffered-rescan path."""
    from geomesa_spark.operators.sessions import funnel
    from geomesa_spark.streaming.funnel import streaming_funnel

    steps = ["view", "cart", "buy"]
    all_rows = [
        (1, "2024-01-01 00:00:10", "view"),
        (1, "2024-01-01 00:01:00", "cart"),
        (1, "2024-01-01 00:02:00", "buy"),    # user 1 completes
        (2, "2024-01-01 00:00:05", "view"),
        (2, "2024-01-01 00:03:00", "cart"),   # user 2 depth 2
        (3, "2024-01-01 00:01:00", "cart"),   # no step-1 -> depth 0
        (4, "2024-01-01 00:04:00", "view"),   # depth 1
    ]
    # chunk 2 delivers EARLIER timestamps than chunk 1 (bounded disorder):
    # user 1's 'view' and user 2's 'cart' arrive late; depths only settle
    # once the late rows land.
    chunk1 = [all_rows[1], all_rows[2], all_rows[3], all_rows[5]]
    chunk2 = [all_rows[0], all_rows[4], all_rows[6]]
    src = tmp_path / "funnel_src"
    src.mkdir()
    spark.createDataFrame(_fevents(chunk1), schema=FEV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(FEV_SCHEMA).parquet(str(src))
    q = (
        streaming_funnel(stream, steps, watermark_s=7 * 24 * 3600)
        .writeStream.format("memory")
        .queryName("funnel_t1")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        mid = _latest("funnel_t1", spark)
        # before the late 'view' rows: user 1 has cart+buy only -> 0
        assert mid[1] == 0 and mid[2] == 1 and mid[3] == 0
        spark.createDataFrame(_fevents(chunk2), schema=FEV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = _latest("funnel_t1", spark)
    finally:
        q.stop()
    batch = spark.createDataFrame(_fevents(all_rows), schema=FEV_SCHEMA)
    want = {r.user_id: r.depth for r in funnel(batch, steps).collect()}
    assert got == want == {1: 3, 2: 2, 3: 0, 4: 1}


def test_streaming_funnel_commit_path_and_fuzz_parity(spark, tmp_path):
    """In-order micro-batches spanning hours with a SMALL watermark, random
    workload: old events flow through the committed-accumulator path (state
    drops them from the buffer) and final depths still equal the batch
    funnel — fuzzed over many users with a fixed seed, window_s engaged."""
    import numpy as np

    from geomesa_spark.operators.sessions import funnel
    from geomesa_spark.streaming.funnel import streaming_funnel

    rng = np.random.default_rng(42)
    steps = ["s1", "s2", "s3"]
    types = steps + ["noise"]
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for _ in range(300):
        u = int(rng.integers(1, 40))
        t = base + pd.Timedelta(seconds=int(rng.integers(0, 6 * 3600)))
        rows.append((u, str(t), str(types[rng.integers(0, len(types))])))
    rows.sort(key=lambda r: r[1])  # in-order arrival, 6-hour span
    thirds = [rows[:100], rows[100:200], rows[200:]]
    src = tmp_path / "funnel_fuzz"
    src.mkdir()
    stream = spark.readStream.schema(FEV_SCHEMA).parquet(str(src))
    q = (
        streaming_funnel(stream, steps, window_s=1800, watermark_s=600)
        .writeStream.format("memory")
        .queryName("funnel_t2")
        .outputMode("update")
        .start()
    )
    try:
        for chunk in thirds:
            spark.createDataFrame(_fevents(chunk), schema=FEV_SCHEMA) \
                .coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
        got = _latest("funnel_t2", spark)
    finally:
        q.stop()
    batch = spark.createDataFrame(_fevents(rows), schema=FEV_SCHEMA)
    want = {
        r.user_id: r.depth for r in funnel(batch, steps, window_s=1800).collect()
    }
    assert got == want and len(want) >= 30


def test_streaming_funnel_tentative_completion_can_retract(spark, tmp_path):
    """Regression for the done-marking rule: a TENTATIVE (above-watermark)
    completion must not freeze — when a later micro-batch delivers an
    EARLIER step-1 anchor that pushes the later steps out of the completion
    window, the emitted depth must retract to the batch truth."""
    from geomesa_spark.operators.sessions import funnel
    from geomesa_spark.streaming.funnel import streaming_funnel

    steps = ["a", "b"]
    chunk1 = [(1, "2024-01-01 01:00:00", "a"), (1, "2024-01-01 01:00:30", "b")]
    late = [(1, "2024-01-01 00:00:00", "a")]  # earlier anchor, b now > window
    src = tmp_path / "funnel_retract"
    src.mkdir()
    spark.createDataFrame(_fevents(chunk1), schema=FEV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(FEV_SCHEMA).parquet(str(src))
    q = (
        streaming_funnel(stream, steps, window_s=60, watermark_s=30 * 24 * 3600)
        .writeStream.format("memory")
        .queryName("funnel_t3")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        assert _latest("funnel_t3", spark) == {1: 2}  # tentative completion
        spark.createDataFrame(_fevents(late), schema=FEV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = _latest("funnel_t3", spark)
    finally:
        q.stop()
    batch = spark.createDataFrame(
        _fevents(chunk1 + late), schema=FEV_SCHEMA
    )
    want = {r.user_id: r.depth for r in funnel(batch, steps, window_s=60).collect()}
    assert got == want == {1: 1}  # retracted: greedy re-anchored at 00:00


def test_streaming_cohort_deltas_retroactive_parity(spark, tmp_path):
    """Cohort deltas fold to the batch cohort_retention table even when a
    LATE EARLIER event retroactively moves a user's cohort (the case no
    windowed streaming aggregate can express): user 1 first appears in
    week 1, then a week-0 event arrives — every (cohort, offset) pair they
    contribute to must retract and re-add."""
    from geomesa_spark.operators.sessions import cohort_retention
    from geomesa_spark.streaming.cohorts import (
        cohort_table_from_deltas,
        streaming_cohort_deltas,
    )

    week = 604_800
    chunk1 = [
        (1, "2024-01-08 00:00:00", "a"),   # week w+1 (provisional cohort)
        (1, "2024-01-16 00:00:00", "a"),   # week w+2
        (2, "2024-01-01 00:00:00", "a"),   # week w
    ]
    late = [(1, "2024-01-02 00:00:00", "a")]  # week w: user 1 cohort moves
    src = tmp_path / "cohort_src"
    src.mkdir()
    spark.createDataFrame(_fevents(chunk1), schema=FEV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(FEV_SCHEMA).parquet(str(src))
    q = (
        streaming_cohort_deltas(stream, period_s=week,
                                watermark_s=30 * 24 * 3600)
        .writeStream.format("memory")
        .queryName("cohort_t1")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        mid = {
            (r.cohort, r.offset): r.n_users
            for r in cohort_table_from_deltas(
                spark.sql("SELECT * FROM cohort_t1")
            ).collect()
        }
        batch_mid = {
            (r.cohort, r.offset): r.n_users
            for r in cohort_retention(
                spark.createDataFrame(_fevents(chunk1), schema=FEV_SCHEMA),
                period_s=week,
            ).collect()
        }
        assert mid == batch_mid
        spark.createDataFrame(_fevents(late), schema=FEV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = {
            (r.cohort, r.offset): r.n_users
            for r in cohort_table_from_deltas(
                spark.sql("SELECT * FROM cohort_t1")
            ).collect()
        }
    finally:
        q.stop()
    want = {
        (r.cohort, r.offset): r.n_users
        for r in cohort_retention(
            spark.createDataFrame(_fevents(chunk1 + late), schema=FEV_SCHEMA),
            period_s=week,
        ).collect()
    }
    assert got == want
    # the retroactive move really happened: user 1's cohort is now week w,
    # so (w, 0) has both users and the provisional (w+1, *) rows are gone
    w = sorted(c for c, _ in want)[0]
    assert want[(w, 0)] == 2 and all(c == w for c, _ in want)


def test_streaming_cohort_deltas_fuzz_parity(spark, tmp_path):
    """Random users/timestamps over 6 weeks in 3 arbitrary chunks: folded
    deltas equal batch cohort_retention exactly."""
    import numpy as np

    from geomesa_spark.operators.sessions import cohort_retention
    from geomesa_spark.streaming.cohorts import (
        cohort_table_from_deltas,
        streaming_cohort_deltas,
    )

    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (
            int(rng.integers(1, 25)),
            str(base + pd.Timedelta(seconds=int(rng.integers(0, 6 * 604_800)))),
            "a",
        )
        for _ in range(200)
    ]
    src = tmp_path / "cohort_fuzz"
    src.mkdir()
    stream = spark.readStream.schema(FEV_SCHEMA).parquet(str(src))
    q = (
        streaming_cohort_deltas(stream, watermark_s=60 * 24 * 3600)
        .writeStream.format("memory")
        .queryName("cohort_t2")
        .outputMode("append")
        .start()
    )
    try:
        for lo, hi in ((0, 70), (70, 140), (140, 200)):
            spark.createDataFrame(_fevents(rows[lo:hi]), schema=FEV_SCHEMA) \
                .coalesce(1).write.mode("append").parquet(str(src))
            q.processAllAvailable()
        got = {
            (r.cohort, r.offset): r.n_users
            for r in cohort_table_from_deltas(
                spark.sql("SELECT * FROM cohort_t2")
            ).collect()
        }
    finally:
        q.stop()
    want = {
        (r.cohort, r.offset): r.n_users
        for r in cohort_retention(
            spark.createDataFrame(_fevents(rows), schema=FEV_SCHEMA)
        ).collect()
    }
    assert got == want and len(want) >= 6


def test_streaming_funnel_hot_user_buffer_capped(spark, tmp_path):
    """Hot-user overflow policy (VERDICT r4 next-round #6): a user flooding
    above-watermark step events must not grow state past max_buffer — the
    kept prefix still yields a correct lower-bound depth, the user's rows
    flag capped=true permanently, and a normal user in the same stream
    stays exact with capped=false."""
    from geomesa_spark.streaming.funnel import streaming_funnel

    steps = ["view", "cart", "buy"]
    # hot user 7: 500 'view' events, all above the (huge) watermark; the
    # step-1 anchor is among the OLDEST kept events so depth stays correct
    hot = [(7, f"2024-01-01 00:{m // 60:02d}:{m % 60:02d}", "view")
           for m in range(500)]
    hot += [(7, "2024-01-01 01:00:00", "cart")]  # dropped (beyond cap)
    norm = [
        (8, "2024-01-01 00:00:01", "view"),
        (8, "2024-01-01 00:00:02", "cart"),
    ]
    src = tmp_path / "funnel_hot_src"
    src.mkdir()
    spark.createDataFrame(_fevents(hot + norm), schema=FEV_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(FEV_SCHEMA).parquet(str(src))
    ckpt = str(tmp_path / "funnel_hot_ckpt")
    q = (
        streaming_funnel(stream, steps, watermark_s=30 * 24 * 3600,
                         max_buffer=16)
        .writeStream.format("memory")
        .queryName("funnel_hot")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # flood again: the capped buffer must not regrow past the cap
        more = [(7, f"2024-01-01 02:{m // 60:02d}:{m % 60:02d}", "view")
                for m in range(300)]
        spark.createDataFrame(_fevents(more), schema=FEV_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, max_by(depth, seq) depth,"
            "       max_by(capped, seq) capped "
            "FROM funnel_hot GROUP BY 1"
        ).collect()
        got = {r.user_id: (r.depth, r.capped) for r in rows}
        # state-store proof: the hot user's buffer arrays hold <= cap events
        sd = spark.read.format("statestore").load(ckpt)
        buf_sizes = {
            r["key"]["__u"]: len(r["value"]["groupState"]["buf_t"])
            for r in sd.collect()
        }
    finally:
        q.stop()
    assert got[7] == (1, True)    # lower bound from the kept prefix, flagged
    assert got[8] == (2, False)   # normal user exact and unflagged
    assert buf_sizes[7] <= 16 and buf_sizes[8] <= 16
