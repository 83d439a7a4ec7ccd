"""SQL surface tests for the st_* function catalog — golden semantics from
the reference's SparkSQLSpatialRelationshipsTest fixture (boxRef + interior/
edge/corner/exterior points) exercised END-TO-END through spark.sql."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import Row

from geomesa_spark.functions.st_funcs import (
    ST_FUNCTIONS,
    geohash_decode_bounds,
    geohash_encode,
    register_st_functions,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    n = register_st_functions(spark)
    assert n >= 60


BOX = "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"


def _sql1(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_catalog_size():
    assert len(ST_FUNCTIONS) >= 60


def test_contains_fixture(spark):
    # interior / edge / corner / exterior — reference golden expectations
    cases = {
        "POINT(5 5)": True,     # interior
        "POINT(0 5)": False,    # edge (contains excludes boundary)
        "POINT(0 0)": False,    # corner
        "POINT(15 5)": False,   # exterior
    }
    for wkt, want in cases.items():
        got = _sql1(
            spark,
            f"st_contains(st_geomFromWKT('{BOX}'), st_geomFromWKT('{wkt}'))",
        )
        assert got == want, wkt


def test_covers_includes_boundary(spark):
    for wkt in ("POINT(5 5)", "POINT(0 5)", "POINT(0 0)"):
        assert _sql1(
            spark, f"st_covers(st_geomFromWKT('{BOX}'), st_geomFromWKT('{wkt}'))"
        )
    assert not _sql1(
        spark, f"st_covers(st_geomFromWKT('{BOX}'), st_geomFromWKT('POINT(11 5)'))"
    )


def test_intersects_within_disjoint(spark):
    a = "LINESTRING(-5 5, 15 5)"
    assert _sql1(spark, f"st_intersects(st_geomFromWKT('{BOX}'), st_geomFromWKT('{a}'))")
    assert _sql1(spark, f"st_within(st_geomFromWKT('POINT(3 3)'), st_geomFromWKT('{BOX}'))")
    assert _sql1(
        spark, f"st_disjoint(st_geomFromWKT('{BOX}'), st_geomFromWKT('POINT(20 20)'))"
    )


def test_constructors_accessors(spark):
    assert _sql1(spark, "st_x(st_makePoint(3.5, -7.25))") == 3.5
    assert _sql1(spark, "st_y(st_makePoint(3.5, -7.25))") == -7.25
    assert _sql1(spark, f"st_geometryType(st_geomFromWKT('{BOX}'))") == "Polygon"
    assert _sql1(spark, f"st_dimension(st_geomFromWKT('{BOX}'))") == 2
    assert _sql1(spark, f"st_numPoints(st_geomFromWKT('LINESTRING(0 0, 1 1, 2 2)'))") == 3
    assert _sql1(spark, "st_area(st_makeBBOX(0, 0, 10, 10))") == 100.0
    assert _sql1(spark, f"st_length(st_geomFromWKT('LINESTRING(0 0, 3 4)'))") == 5.0


def test_outputs_roundtrip(spark):
    wkt = _sql1(spark, "st_asText(st_makePoint(1, 2))")
    assert wkt.replace(" ", "").startswith("POINT(1")
    gj = json.loads(_sql1(spark, f"st_asGeoJSON(st_geomFromWKT('POINT(1 2)'))"))
    assert gj == {"type": "Point", "coordinates": [1.0, 2.0]}
    # WKB -> geom -> WKT round trip through two functions
    assert "POLYGON" in _sql1(
        spark, f"st_asText(st_geomFromWKB(st_asBinary(st_geomFromWKT('{BOX}'))))"
    )


def test_distance_sphere(spark):
    # Paris <-> London great-circle ~343.5 km
    d = _sql1(
        spark,
        "st_distanceSphere(st_makePoint(2.3522, 48.8566), st_makePoint(-0.1276, 51.5072))",
    )
    assert abs(d - 343_500) < 3_000


def test_translate_and_centroid(spark):
    c = _sql1(
        spark,
        f"st_asText(st_centroid(st_translate(st_geomFromWKT('{BOX}'), 10, 0)))",
    )
    assert "15" in c and "5" in c


def test_geohash_roundtrip_sql(spark):
    gh = _sql1(spark, "st_geoHash(st_makePoint(2.3522, 48.8566), 35)")
    assert isinstance(gh, str) and len(gh) == 7
    x0, y0, x1, y1 = geohash_decode_bounds(gh)
    assert x0 <= 2.3522 <= x1 and y0 <= 48.8566 <= y1
    # center point of decoded bounds returns same hash
    assert geohash_encode((x0 + x1) / 2, (y0 + y1) / 2, 35) == gh


def test_antimeridian_safe(spark):
    wkt = _sql1(
        spark,
        "st_asText(st_antimeridianSafeGeom(st_geomFromWKT('POINT(190 10)')))",
    )
    assert "-170" in wkt


def test_buffer_point_contains_nearby(spark):
    got = _sql1(
        spark,
        "st_contains(st_bufferPoint(st_makePoint(0, 45), 10000), st_makePoint(0.05, 45))",
    )
    # 0.05 deg lon at 45N ~ 3.9 km < 10 km buffer
    assert got is True


def test_dataframe_api_usage(spark):
    """st_* callables usable directly on DataFrames (not only via SQL)."""
    from pyspark.sql import functions as F

    udf, _ = ST_FUNCTIONS["st_makePoint"]
    df = spark.range(3).select(
        F.col("id").cast("double").alias("x"), F.lit(1.0).alias("y")
    )
    out = df.select(ST_FUNCTIONS["st_asText"][0](udf(F.col("x"), F.col("y"))).alias("w"))
    rows = [r.w for r in out.collect()]
    assert rows[0].startswith("POINT")


def test_null_propagation(spark):
    assert _sql1(spark, "st_geomFromWKT(CAST(NULL AS STRING))") is None
    assert (
        _sql1(
            spark,
            "st_contains(CAST(NULL AS BINARY), st_geomFromWKT('POINT(0 0)'))",
        )
        is None
    )
