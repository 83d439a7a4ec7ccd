"""Streaming live feature view — the Kafka upsert-cache analog.

Reference semantics re-created (not ported):
- upsert-by-feature-id live view: ``geomesa-kafka/.../index/
  KafkaFeatureCacheImpl.scala:72-130`` (``put``/``remove`` keep the newest
  feature per id in an indexed in-memory cache).
- event-time ordering guard (stale updates ignored):
  ``KafkaFeatureCache.scala:60-73`` — only a message with a newer event time
  replaces the cached feature.
- delete messages: tombstones remove the id from the view.
- TTL expiry: ``KafkaFeatureCache.scala:46-50`` + ``AgeOffFilter``.
- hot/cold Lambda merge: ``geomesa-lambda/.../data/LambdaQueryRunner.scala``
  (union of the live tier with a persisted tier).

Spark-first mapping: the view IS a streaming aggregation —
``groupBy(key).agg(max_by(struct(*), event_time))`` gives newest-per-key with
stale-update dropping for free (no custom state machine needed); watermarks
bound state. A tombstone column handles deletes declaratively. The Lambda
merge is ``unionByName`` + the same newest-per-key reduce over both tiers.
``foreach_batch_upsert`` persists a cold tier as parquet with MERGE-style
upserts for sinks that (unlike Iceberg/Delta) have no native MERGE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

TOMBSTONE_COL = "__deleted"


def live_view(
    stream_df: DataFrame,
    keys: list[str] | str,
    event_time: str,
    watermark: str | None = "10 minutes",
    tombstone: str | None = None,
) -> DataFrame:
    """Newest-row-per-key view of an upsert/delete stream.

    Works on both streaming and batch DataFrames (same plan). Stale updates
    (older ``event_time`` than the current view row) never surface — exactly
    the cache's event-time ordering guard. If ``tombstone`` names a boolean
    column, keys whose NEWEST row is a delete vanish from the view.
    """
    if isinstance(keys, str):
        keys = [keys]
    df = stream_df
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(event_time, watermark)
    row = F.max_by(F.struct(*stream_df.columns), F.col(event_time)).alias("__row")
    out = df.groupBy(*[F.col(k) for k in keys]).agg(row).select("__row.*")
    if tombstone is not None:
        out = out.filter(~F.coalesce(F.col(tombstone), F.lit(False))).drop(tombstone)
    return out


def expire_ttl(view: DataFrame, event_time: str, ttl_seconds: float, now=None) -> DataFrame:
    """Age-off filter: keep rows younger than ``ttl_seconds`` (AgeOffFilter
    analog). ``now`` defaults to the cluster clock at evaluation time."""
    now_expr = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    return view.filter(
        F.col(event_time).cast("timestamp")
        >= now_expr - F.expr(f"INTERVAL {int(ttl_seconds)} SECONDS")
    )


def merged_view(
    hot: DataFrame,
    cold: DataFrame,
    keys: list[str] | str,
    event_time: str,
    tombstone: str | None = None,
) -> DataFrame:
    """Lambda hot+cold merge: union both tiers, newest row per key wins."""
    allc = set(hot.columns) & set(cold.columns)
    h = hot.select(*sorted(allc))
    c = cold.select(*sorted(allc))
    return live_view(h.unionByName(c), keys, event_time, watermark=None, tombstone=tombstone)


def foreach_batch_upsert(store_path: str, keys: list[str] | str, event_time: str):
    """ForeachBatch sink: MERGE each micro-batch into a parquet 'cold tier'.

    Parquet has no MERGE, so the upsert is read-modify-write of the compact
    newest-per-key store (the store only ever holds one row per key, so the
    rewrite is proportional to the live key count, not the stream length).
    On Iceberg/Delta this function is replaced by a single MERGE INTO.
    """
    if isinstance(keys, str):
        keys = [keys]

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_view = live_view(batch_df, keys, event_time, watermark=None)
        if os.path.exists(os.path.join(store_path, "_SUCCESS")):
            existing = spark.read.parquet(store_path)
            merged = live_view(
                existing.unionByName(batch_view), keys, event_time, watermark=None
            )
        else:
            merged = batch_view
        tmp = store_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(store_path)

    return apply


def start_live_query(
    stream_df: DataFrame,
    keys: list[str] | str,
    event_time: str,
    query_name: str,
    tombstone: str | None = None,
):
    """Run the live view as a Structured Streaming query into the in-memory
    sink (complete mode) — the queryable live cache."""
    view = live_view(stream_df, keys, event_time, watermark=None, tombstone=tombstone)
    return (
        view.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
