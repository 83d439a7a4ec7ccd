"""SparkSession factory with scale-aware defaults.

local[N] here stands in for an N-executor cluster; every knob is chosen so the
same code runs unchanged under spark-submit --py-files on a real cluster
(AQE, skew-join handling, Arrow batches, UTC timestamps)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cpus: int | None = None,
    app: str = "geomesa-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~2x cores locally; on a real cluster this scales with executors
        shuffle_partitions = max(cpus * 2, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # multi-KB binary payloads x 4096-row columnar batches produce G1
        # humongous allocations in the JVM vectorized parquet reader and
        # degrade scans ~10-100x (measured); 1024-row batches keep buffers
        # under the humongous threshold. Binary-heavy tables should prefer
        # sources.parquet_scan.scan_parquet_arrow, which bypasses the JVM
        # reader entirely.
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
    )
    # Python workers fork from one daemon process per executor; preload the
    # numpy/pandas/pyarrow + engine import cascade there so forked workers
    # inherit it copy-on-write instead of each paying ~0.9 s on its first
    # task (idle workers are reaped between stages, so a warmup stage
    # cannot pre-pay this). The daemon module must be importable where the
    # daemon STARTS — guaranteed here because this factory always builds
    # local[N] (executor shares the driver cwd/sys.path, checked via
    # find_spec). A multi-node deployment must ship the package on executor
    # PYTHONPATH (spark.executorEnv.PYTHONPATH / --archives) before setting
    # this conf, or leave it unset: see geomesa_spark/worker_daemon.py.
    import importlib.util

    if os.environ.get("SPARK_GRAFT_NO_DAEMON_PRELOAD") != "1" and (
        importlib.util.find_spec("geomesa_spark.worker_daemon") is not None
    ):
        b = b.config("spark.python.daemon.module", "geomesa_spark.worker_daemon")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
