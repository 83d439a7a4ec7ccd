"""Non-point geometry join (XZ analog): parity vs brute-force relate()."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.core.geometry import box, from_wkt, relate, to_wkb
from geomesa_spark.operators.geometry_join import geometry_join

POLYS = {
    "west": "POLYGON((-30 -20, 10 -20, 10 25, -30 25, -30 -20))",
    "east": "POLYGON((5 -10, 40 -5, 45 30, 10 35, 5 -10))",  # non-box
}


def _fixture_geoms():
    rng = np.random.default_rng(5)
    geoms = []
    # small boxes scattered around the polygons (some straddle edges)
    for i in range(120):
        cx, cy = rng.uniform(-60, 70), rng.uniform(-40, 50)
        w, h = rng.uniform(0.5, 6, 2)
        geoms.append((f"box{i}", box(cx, cy, cx + w, cy + h)))
    # lines crossing / avoiding
    for i in range(40):
        x0, y0 = rng.uniform(-60, 70), rng.uniform(-40, 50)
        dx, dy = rng.uniform(-15, 15, 2)
        geoms.append(
            (
                f"line{i}",
                from_wkt(f"LINESTRING({x0} {y0}, {x0+dx} {y0+dy})"),
            )
        )
    return geoms


@pytest.mark.parametrize("predicate", ["intersects", "within"])
def test_geometry_join_parity(spark, predicate):
    geoms = _fixture_geoms()
    pdf = pd.DataFrame(
        {"gid": [g[0] for g in geoms], "geom": [to_wkb(g[1]) for g in geoms]}
    )
    df = spark.createDataFrame(pdf)
    got = (
        geometry_join(df, POLYS, geom_col="geom", row_id="gid", predicate=predicate)
        .select("gid", "poly_id")
        .toPandas()
    )
    got_pairs = set(zip(got["gid"], got["poly_id"]))

    want_pairs = set()
    parsed = {pid: from_wkt(w) for pid, w in POLYS.items()}
    for gid, g in geoms:
        for pid, poly in parsed.items():
            if relate(g, poly, predicate):
                want_pairs.add((gid, pid))
    assert got_pairs == want_pairs
    assert len(want_pairs) > 10  # fixture actually exercises matches


def test_geometry_join_dedup(spark):
    """A geometry spanning many cells must appear once per polygon."""
    big = box(-25.0, -15.0, 8.0, 20.0)  # inside 'west', spans many cells
    df = spark.createDataFrame(
        pd.DataFrame({"gid": ["big"], "geom": [to_wkb(big)]})
    )
    out = geometry_join(df, POLYS, geom_col="geom", row_id="gid").toPandas()
    assert list(out["poly_id"]).count("west") == 1


def test_geometry_join_generated_rid(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"geom": [to_wkb(box(0, 0, 1, 1))], "tag": ["t"]})
    )
    out = geometry_join(df, POLYS, geom_col="geom").toPandas()
    assert set(out.columns) == {"geom", "tag", "poly_id"}
    assert set(out["poly_id"]) == {"west"}  # box(0..1) is west of east's x>=5


def test_geometry_join_time_semantics_and_pruning(spark):
    """XZ3 analog: (bbox cell, epoch bin) keys. Semantics: a row joins a
    polygon iff it intersects spatially AND its ts falls in the polygon's
    window. Pruning: rows in epochs the window never touches produce ZERO
    candidate pairs (they are filtered by the join key, not by a refine)."""
    import numpy as np
    from geomesa_spark.operators.geometry_join import (
        _geom_time_candidates,
        geometry_join_time,
    )

    week = 604_800
    t0 = 1_704_067_200  # 2024-01-01, epoch-aligned enough for bins
    pdf = pd.DataFrame(
        {
            "gid": ["a", "b", "c", "d"],
            "geom": [
                to_wkb(box(-10, -10, -8, -8)),   # in west, week 0
                to_wkb(box(-10, -10, -8, -8)),   # in west, week 5 (outside)
                to_wkb(box(11, 2, 13, 4)),       # in east only, week 1
                to_wkb(box(60, 60, 61, 61)),     # in neither
            ],
            "ts_s": [
                float(t0 + 3 * 86400),
                float(t0 + 5 * week + 3600),
                float(t0 + week + 86400),
                float(t0),
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    windows = {
        "west": (float(t0), float(t0 + 2 * week)),       # weeks 0-1
        "east": (float(t0 + week), float(t0 + 2 * week)),  # week 1 only
    }
    out = geometry_join_time(
        df, POLYS, windows, geom_col="geom", ts="ts_s", row_id="gid"
    ).toPandas()
    got = set(zip(out["gid"], out["poly_id"]))
    assert got == {("a", "west"), ("c", "east")}

    # pruning assertion: row b (week 5) must not even become a candidate
    cand, rows2, rid, _, _, _ = _geom_time_candidates(
        df, POLYS, windows, "geom", "ts_s", "gid", 8, week, 2048
    )
    cpdf = cand.toPandas()
    assert "b" not in set(cpdf["gid"])       # epoch-bin key pruned it
    assert ("a") in set(cpdf["gid"])         # same geometry, in-window week


def test_geometry_join_tables_brute_force(spark):
    """Two-relation join vs brute force: multi-cell geometries pair ONCE
    (dedup), disjoint pairs absent, intersects includes containment."""
    import struct

    from geomesa_spark.operators.geometry_join import geometry_join_tables

    def box_wkb(x0, y0, x1, y1):
        coords = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        return (
            b"\x01" + struct.pack("<III", 3, 1, 5)
            + b"".join(struct.pack("<dd", x, y) for x, y in coords)
        )

    # left: three boxes — one HUGE (spans many res-8 cells), one small, one far
    lrows = [
        (1, box_wkb(-30.0, -30.0, 30.0, 30.0)),   # huge
        (2, box_wkb(10.0, 10.0, 11.0, 11.0)),     # small, inside huge's range
        (3, box_wkb(150.0, 70.0, 151.0, 71.0)),   # far away
    ]
    # right: one box inside huge (containment), one overlapping small,
    # one disjoint from everything
    rrows = [
        (100, box_wkb(-1.0, -1.0, 1.0, 1.0)),
        (200, box_wkb(10.5, 10.5, 12.0, 12.0)),
        (300, box_wkb(-170.0, -80.0, -169.0, -79.0)),
    ]
    l = spark.createDataFrame(lrows, ["lid", "geom"])
    r = spark.createDataFrame(rrows, ["rid", "geom"])
    got = {
        (row["lid"], row["rid"])
        for row in geometry_join_tables(
            l, r, left_id="lid", right_id="rid"
        ).collect()
    }
    assert got == {(1, 100), (1, 200), (2, 200)}


def test_geometry_join_tables_int32_ids_and_same_name_guard(spark):
    """int32 id columns must work without caller-side casts (the Arrow
    stage emits against the declared schema), and identical id names on
    both sides are rejected up front."""
    import struct

    from pyspark.sql import functions as F

    from geomesa_spark.operators.geometry_join import geometry_join_tables

    def box_wkb(x0, y0, x1, y1):
        coords = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        return (
            b"\x01" + struct.pack("<III", 3, 1, 5)
            + b"".join(struct.pack("<dd", x, y) for x, y in coords)
        )

    l = spark.createDataFrame(
        [(1, box_wkb(0.0, 0.0, 2.0, 2.0))], ["lid", "geom"]
    ).withColumn("lid", F.col("lid").cast("int"))
    r = spark.createDataFrame(
        [(9, box_wkb(1.0, 1.0, 3.0, 3.0))], ["rid", "geom"]
    ).withColumn("rid", F.col("rid").cast("int"))
    got = geometry_join_tables(l, r, left_id="lid", right_id="rid").collect()
    assert [(row["lid"], row["rid"]) for row in got] == [(1, 9)]
    with pytest.raises(ValueError, match="must differ"):
        geometry_join_tables(l, r.withColumnRenamed("rid", "lid"),
                             left_id="lid", right_id="lid")
