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

import itertools
import os
import subprocess

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# unique temp-view names per facade call: a fixed global name lets two
# interleaved lazy uses in one session clobber each other's input before
# either executes
_VIEW_SEQ = itertools.count()


def _unique_view(prefix: str) -> str:
    return f"_{prefix}_input_{next(_VIEW_SEQ)}"


def _sql_over_view(spark: SparkSession, df: DataFrame, prefix: str, where: str):
    """Register ``df`` under a unique temp view, run ``SELECT * WHERE
    <where>`` against it, and ALWAYS drop the view: spark.sql analyzes
    eagerly, so the returned plan has the view inlined and the catalog
    entry is droppable at once — and the drop sits in a finally so a bad
    predicate (AnalysisException) can't leak the view either."""
    view = _unique_view(prefix)
    df.createOrReplaceTempView(view)
    cols = ", ".join(f"`{c}`" for c in df.columns)
    try:
        return spark.sql(f"SELECT {cols} FROM {view} WHERE {where}")
    finally:
        spark.catalog.dropTempView(view)

EXTENSION_CLASS = "geomesaspark.ext.SpatialExtensions"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR_PATH = os.path.join(_REPO, "dist", "geomesa-spark-ext.jar")


def build_extensions_jar(force: bool = False) -> str:
    """Compile jvm/src -> dist/geomesa-spark-ext.jar if missing OR stale
    (any .java under jvm/src newer than the jar — a checkout that built
    the jar before a rule change must not silently load the old rule).
    javac + jar against pyspark's bundled jars; no other toolchain."""
    stale = force or not os.path.exists(JAR_PATH)
    if not stale:
        jar_mtime = os.path.getmtime(JAR_PATH)
        src_root = os.path.join(_REPO, "jvm", "src")
        for root, _, files in os.walk(src_root):
            if any(
                f.endswith(".java")
                and os.path.getmtime(os.path.join(root, f)) > jar_mtime
                for f in files
            ):
                stale = True
                break
    if stale:
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


def with_bbox_columns(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """Writer-side step for WKB geometry tables: materialize the per-row
    bounding box as four plain double columns ``{geom}_xmin/_xmax/_ymin/
    _ymax`` next to the opaque binary column — the XZ-storage analog
    (reference: geomesa-index-api XZ2/XZ3 write keys derived from the
    geometry envelope). Parquet keeps min/max row-group statistics for
    plain doubles, so the JVM rule's injected range conjuncts prune IO
    where a predicate over WKB bytes never could. One Arrow-batched parse
    per row at WRITE time; queries pay nothing.

    Null geometry -> null bbox columns (any range conjunct then evaluates
    null and the row drops, matching the refine UDF's False on null)."""
    bbox_udf = _bbox_struct_udf()
    b = f"__{geom_col}_bbox"
    out = df.withColumn(b, bbox_udf(F.col(geom_col)))
    for part in ("xmin", "xmax", "ymin", "ymax"):
        out = out.withColumn(f"{geom_col}_{part}", F.col(f"{b}.{part}"))
    return out.drop(b)


def _bbox_struct_udf():
    from .core.geometry import from_wkb

    schema = T.StructType(
        [T.StructField(p, T.DoubleType()) for p in ("xmin", "xmax", "ymin", "ymax")]
    )

    @F.pandas_udf(schema)
    def geom_bbox(wkb: pd.Series) -> pd.DataFrame:
        rows = []
        for buf in wkb:
            if buf is None:
                rows.append((None, None, None, None))
                continue
            x0, y0, x1, y1 = from_wkb(bytes(buf)).bounds()
            rows.append((float(x0), float(x1), float(y0), float(y1)))
        return pd.DataFrame(rows, columns=["xmin", "xmax", "ymin", "ymax"])

    return geom_bbox


def with_point_cell_column(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    res: int = 8,
    name: str = "p_cell",
) -> DataFrame:
    """Writer-side step for point tables: materialize the Z2 cell of
    (lon, lat) at ``res`` as a LongType column — the layout key the JVM
    rule's cell-IN-list injection prunes against (reference: the Z2 index
    write key, geomesa-index-api Z2IndexKeySpace). Native codegen expression
    (core.cells.cell_sql_expr), zero Python at write OR read time. Pair with
    ``.write.partitionBy(name)`` so the injected IN list becomes a
    PartitionFilter (directory pruning), and activate with
    :func:`cell_pruning_conf`."""
    from .core import cells

    return df.withColumn(name, F.expr(cells.cell_sql_expr(lon, lat, res)))


def cell_pruning_conf(
    column: str = "p_cell",
    res: int = 8,
    max_cells: int = 2048,
    lon: str = "lon",
    lat: str = "lat",
) -> dict:
    """Session confs activating the JVM rule's cell-IN-list injection.
    Runtime confs (settable via ``spark.conf.set`` or passed to
    :func:`extended_session`). CONTRACT: ``column`` must equal
    ``core.cells.encode(lon, lat, res)`` of the coordinate columns the
    spatial UDFs receive — :func:`with_point_cell_column` writes exactly
    that. Same trust class as the ``{geom}_xmin`` bbox-column contract.

    The confs are session-global while the contract is per-table, so the
    coordinate column names are PART OF the registration: the rule injects
    only into predicates over exactly (``lon``, ``lat``), which keeps a
    second table's same-named cell column over DIFFERENT coordinates from
    being pruned with the wrong cover. Consequence: if your table's
    coordinate columns are not literally named lon/lat, you MUST pass
    their names here — otherwise the guard (correctly) refuses to inject
    and queries silently fall back to bbox-only pruning (visible as a
    missing p_cell PartitionFilter in the plan, never as wrong rows). Tables sharing all three names but
    written at different resolutions cannot be told apart — run one cell
    layout per session, or encode the res in the column name
    (``p_cell_r8`` / ``p_cell_r10``) and re-register between queries."""
    return {
        "spark.geomesaspark.cell.column": column,
        "spark.geomesaspark.cell.res": str(int(res)),
        "spark.geomesaspark.cell.maxCells": str(int(max_cells)),
        "spark.geomesaspark.cell.lonColumn": lon,
        "spark.geomesaspark.cell.latColumn": lat,
    }


def register_st_intersects_wkb(spark: SparkSession):
    """Register the exact geometry-column refine UDF the JVM rule
    recognizes: st_intersects_wkb(geom_wkb, wkt) -> boolean — full DE-9IM
    intersects (core.geometry.relate) of each row's WKB geometry against
    the WKT literal, parsed once per batch. Null geometry -> False."""
    from .core.geometry import from_wkb, from_wkt, relate

    cache: dict[str, object] = {}

    @F.pandas_udf(T.BooleanType())
    def st_intersects_wkb(geom: pd.Series, wkt: pd.Series) -> pd.Series:
        wkts = wkt.to_numpy()
        out = np.zeros(len(geom), dtype=bool)
        for w in pd.unique(wkts):
            q = cache.get(w)
            if q is None:
                q = cache[w] = from_wkt(w)
            idx = np.nonzero(wkts == w)[0]
            for i in idx:
                buf = geom.iloc[int(i)]
                if buf is not None:
                    out[i] = relate(from_wkb(bytes(buf)), q, "intersects")
        return pd.Series(out)

    spark.udf.register("st_intersects_wkb", st_intersects_wkb)
    return st_intersects_wkb


def where_intersects_sql(
    spark: SparkSession, df: DataFrame, geom: str, wkt: str
) -> DataFrame:
    """Filter ``df`` to rows whose WKB geometry intersects the WKT literal
    through the PLAIN SQL path. With the extension active AND the table
    carrying with_bbox_columns' materialized bbox, the JVM rule injects
    bbox-overlap conjuncts that push into the scan; without either, the
    exact DE-9IM UDF scans every row."""
    register_st_intersects_wkb(spark)
    lit = wkt.replace("'", "''")
    return _sql_over_view(
        spark, df, "intersects", f"st_intersects_wkb(`{geom}`, '{lit}')"
    )


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
    return _sql_over_view(
        spark,
        df,
        "dwithin",
        f"st_dwithin_pt(`{lon}`, `{lat}`, "
        f"{float(lon0)!r}, {float(lat0)!r}, {float(meters)!r})",
    )


def where_pip_sql(
    spark: SparkSession, df: DataFrame, lon: str, lat: str, wkt: str
) -> DataFrame:
    """Filter ``df`` to rows inside the WKT polygon through the PLAIN SQL
    path — no engine planner involved; with the extension active the JVM
    rule injects the bbox prefilter, without it the UDF scans every row."""
    register_st_pip_wkt(spark)
    lit = wkt.replace("'", "''")  # SQL-literal escape
    return _sql_over_view(
        spark, df, "pip", f"st_pip_wkt(`{lon}`, `{lat}`, '{lit}')"
    )
