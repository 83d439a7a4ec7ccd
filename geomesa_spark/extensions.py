"""Real Catalyst extension wiring (the reference's SQLRules analog, JVM side).

The engine's primary spatial API builds the cell-prefilter + exact-refine
plan explicitly with DataFrame ops (operators/spatial_join.py) and the
``where_spatial`` facade parses predicate strings at the API layer
(planner_rules.py). This module closes the remaining gap the survey declared
a stretch: a REAL ``SparkSessionExtensions`` injection — a Catalyst
optimizer rule living in the JVM (reference: geomesa-spark/geomesa-spark-sql
/src/main/scala/org/apache/spark/sql/SQLRules.scala:204-256) — so even a
plain ``spark.sql(...)``/``df.filter(udf(...))`` query that never touches
this package's planner gets the index-prefilter treatment automatically.

The rule (jvm/src/geomesaspark/ext/BBoxPrefilterRule.java, compiled to
dist/geomesa-spark-ext.jar by jvm/build.sh with nothing but javac + the
pyspark distribution's own jars) rewrites

    Filter(... st_pip_wkt(lon, lat, '<WKT literal>') ...)

into the same Filter AND'ed with native ``lon BETWEEN minx AND maxx AND lat
BETWEEN miny AND maxy`` bbox conjuncts — a necessary condition of the exact
predicate, so results are unchanged — which Catalyst's own pushdown then
carries into the parquet scan (PushedFilters + row-group pruning). The
Arrow-batched exact point-in-polygon UDF only ever sees bbox survivors.

Static-conf caveat: ``spark.sql.extensions`` and ``spark.jars`` bind at JVM
launch, so :func:`extended_session` must run in a process with no prior
SparkContext (tests spawn a subprocess; a deployment passes
``--conf spark.sql.extensions=... --jars dist/geomesa-spark-ext.jar`` to
spark-submit next to the --py-files zip).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTENSION_CLASS = "geomesaspark.ext.SpatialExtensions"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR_PATH = os.path.join(_REPO, "dist", "geomesa-spark-ext.jar")


def build_extensions_jar(force: bool = False) -> str:
    """Compile jvm/src -> dist/geomesa-spark-ext.jar if missing (javac +
    jar against pyspark's bundled jars; no other toolchain)."""
    if force or not os.path.exists(JAR_PATH):
        subprocess.run(
            ["/bin/sh", os.path.join(_REPO, "jvm", "build.sh")],
            check=True,
            capture_output=True,
        )
    return JAR_PATH


def extended_session(
    cpus: int = 8, app: str = "geomesa-spark-ext", **conf
) -> SparkSession:
    """SparkSession with the Catalyst rule injected. Must be the process's
    FIRST session (static confs); raises if a SparkContext already exists."""
    from pyspark import SparkContext

    if SparkContext._active_spark_context is not None:
        raise RuntimeError(
            "spark.sql.extensions is a static conf: build the extended "
            "session in a fresh process (no prior SparkContext)"
        )
    from .session import get_spark

    jar = build_extensions_jar()
    return get_spark(
        cpus=cpus,
        app=app,
        extra_conf={
            "spark.jars": jar,
            "spark.sql.extensions": EXTENSION_CLASS,
            **conf,
        },
    )


def register_st_pip_wkt(spark: SparkSession):
    """Register the exact point-in-polygon refine UDF the JVM rule
    recognizes: st_pip_wkt(lon, lat, wkt) -> boolean. Arrow-batched; the
    polygon parses once per batch (the WKT argument is a literal, so the
    whole column is one repeated value). Returns the UDF handle for
    DataFrame-API use; also registered for spark.sql use."""
    from .core.geometry import from_wkt, points_in_polygon, polygon_edges

    cache: dict[str, np.ndarray] = {}

    @F.pandas_udf(T.BooleanType())
    def st_pip_wkt(
        lon: pd.Series, lat: pd.Series, wkt: pd.Series
    ) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        lons = lon.to_numpy(dtype=np.float64)
        lats = lat.to_numpy(dtype=np.float64)
        wkts = wkt.to_numpy()
        for w in pd.unique(wkts):
            edges = cache.get(w)
            if edges is None:
                edges = cache[w] = polygon_edges(from_wkt(w))
            m = wkts == w
            out[m] = points_in_polygon(lons[m], lats[m], edges)
        return pd.Series(out)

    spark.udf.register("st_pip_wkt", st_pip_wkt)
    return st_pip_wkt


def register_st_dwithin_pt(spark: SparkSession):
    """Register the exact haversine-radius refine UDF the JVM rule also
    recognizes: st_dwithin_pt(lon, lat, lon0, lat0, meters) -> boolean.
    Vectorized numpy great-circle distance (same EARTH_RADIUS_M as
    operators.proximity.haversine_sql)."""
    EARTH_RADIUS_M = 6371008.8

    @F.pandas_udf(T.BooleanType())
    def st_dwithin_pt(
        lon: pd.Series,
        lat: pd.Series,
        lon0: pd.Series,
        lat0: pd.Series,
        meters: pd.Series,
    ) -> pd.Series:
        la = np.radians(lat.to_numpy(dtype=np.float64))
        lb = np.radians(lat0.to_numpy(dtype=np.float64))
        dla = lb - la
        dlo = np.radians(
            lon0.to_numpy(dtype=np.float64) - lon.to_numpy(dtype=np.float64)
        )
        h = (
            np.sin(dla / 2) ** 2
            + np.cos(la) * np.cos(lb) * np.sin(dlo / 2) ** 2
        )
        d = 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))
        return pd.Series(d <= meters.to_numpy(dtype=np.float64))

    spark.udf.register("st_dwithin_pt", st_dwithin_pt)
    return st_dwithin_pt


def where_dwithin_sql(
    spark: SparkSession,
    df: DataFrame,
    lon: str,
    lat: str,
    lon0: float,
    lat0: float,
    meters: float,
) -> DataFrame:
    """Filter ``df`` to rows within ``meters`` of (lon0, lat0) through the
    PLAIN SQL path; with the extension active the JVM rule injects the
    latitude-corrected bbox prefilter, without it the exact haversine UDF
    scans every row."""
    register_st_dwithin_pt(spark)
    df.createOrReplaceTempView("_dwithin_input")
    cols = ", ".join(f"`{c}`" for c in df.columns)
    return spark.sql(
        f"SELECT {cols} FROM _dwithin_input "
        f"WHERE st_dwithin_pt(`{lon}`, `{lat}`, "
        f"{float(lon0)!r}, {float(lat0)!r}, {float(meters)!r})"
    )


def where_pip_sql(
    spark: SparkSession, df: DataFrame, lon: str, lat: str, wkt: str
) -> DataFrame:
    """Filter ``df`` to rows inside the WKT polygon through the PLAIN SQL
    path — no engine planner involved; with the extension active the JVM
    rule injects the bbox prefilter, without it the UDF scans every row."""
    register_st_pip_wkt(spark)
    df.createOrReplaceTempView("_pip_input")
    cols = ", ".join(f"`{c}`" for c in df.columns)
    lit = wkt.replace("'", "''")  # SQL-literal escape
    return spark.sql(
        f"SELECT {cols} FROM _pip_input "
        f"WHERE st_pip_wkt(`{lon}`, `{lat}`, '{lit}')"
    )
