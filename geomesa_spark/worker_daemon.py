"""Python worker daemon that preloads the engine's import cascade.

PySpark forks every Python UDF worker from one long-lived daemon process
per executor (pyspark/daemon.py); forked children inherit the daemon's
already-imported modules via copy-on-write, so anything imported HERE
costs each worker nothing. Without it, every fresh worker re-imports
numpy + pandas + pyarrow + pyspark.sql plus whatever engine module the
unpickled UDF references (~0.9 s measured in this sandbox) — and idle
workers are reaped between stages (spark.python.worker.idleTimeoutSeconds),
so a 32-core local session pays ~30 CPU-seconds of imports again on the
next Python stage. On a real cluster the preload happens once per
executor, exactly where a 1000-executor deployment wants it.

Wired up by session.get_spark via spark.python.daemon.module — gated on
find_spec there, which is a valid probe because that factory always builds
local[N] (the executor shares the driver's cwd/sys.path, so `python -m
geomesa_spark.worker_daemon` resolves the same way). NOTE: the daemon
module itself must be importable wherever the daemon process starts — if
it is not, the daemon fails to launch and every Python stage fails; the
try/except below only degrades the OPTIONAL preloads (e.g. a stripped
deployment missing a heavy dependency), it cannot rescue a missing
package. On a multi-node cluster, ship the package on executor PYTHONPATH
(spark.executorEnv.PYTHONPATH or --archives) before setting the conf, or
set SPARK_GRAFT_NO_DAEMON_PRELOAD=1 to leave the stock daemon in place.
"""

from __future__ import annotations


def _preload() -> None:
    try:
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        import pyarrow.parquet  # noqa: F401
        import pyspark.sql.functions  # noqa: F401
        import pyspark.sql.pandas.serializers  # noqa: F401
    except Exception:  # pragma: no cover — bare worker env
        return
    try:
        import geomesa_spark.operators  # noqa: F401 — pulls every operator module
        import geomesa_spark.functions.image  # noqa: F401
        import geomesa_spark.functions.jpeg  # noqa: F401
        import geomesa_spark.functions.text  # noqa: F401
        import geomesa_spark.core.cells  # noqa: F401
        import geomesa_spark.core.geometry  # noqa: F401
        import geomesa_spark.sources.parquet_scan  # noqa: F401
    except Exception:  # pragma: no cover — py-files deploy without cwd pkg
        pass


_preload()

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
