"""Tile-pyramid rollup: parent/child conservation, single-scan plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.operators.density import cell_density, tile_pyramid


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(7)
    n = 4000
    pdf = pd.DataFrame(
        {
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
            "value": rng.uniform(0, 10, n).round(3),
        }
    )
    return spark.createDataFrame(pdf)


def test_pyramid_levels_and_conservation(spark, pts):
    res, levels = 8, 3
    pyr = tile_pyramid(pts, res, levels, weight="value").toPandas()
    assert sorted(pyr.res.unique()) == [6, 7, 8]
    # every level's totals equal the input totals (nothing lost in rollup)
    for r in (6, 7, 8):
        lv = pyr[pyr.res == r]
        assert int(lv.n.sum()) == 4000
        assert abs(lv.weight.sum() - pts.toPandas().value.sum()) < 1e-6
    # each parent cell's (n, weight) is the sum of its 4 children
    fine = pyr[pyr.res == 8].assign(parent=lambda d: d.cell // 4)
    agg = fine.groupby("parent").agg(n=("n", "sum"), w=("weight", "sum"))
    mid = pyr[pyr.res == 7].set_index("cell")
    assert (agg.n == mid.n.loc[agg.index]).all()
    assert np.allclose(agg.w, mid.weight.loc[agg.index])


def test_pyramid_finest_level_matches_cell_density(spark, pts):
    pyr = tile_pyramid(pts, 6, 2, weight="value").toPandas()
    base = cell_density(pts, 6, weight="value").toPandas()
    fine = (
        pyr[pyr.res == 6][["cell", "n", "weight"]]
        .sort_values("cell")
        .reset_index(drop=True)
    )
    base = base.sort_values("cell").reset_index(drop=True)
    assert (fine.cell == base.cell).all() and (fine.n == base.n).all()
    assert np.allclose(fine.weight, base.weight)


def test_pyramid_single_scan_plan(spark, pts):
    """The coarse levels must come from the reduced fine-cell frame — the
    raw input is scanned once (one Exchange pair: fine groupBy, rollup)."""
    plan = (
        tile_pyramid(pts, 8, 3)._jdf.queryExecution().executedPlan().toString()
    )
    scans = sum(
        plan.count(m)
        for m in ("Scan ExistingRDD", "Scan parquet", "LocalTableScan")
    )
    assert scans == 1


def test_pyramid_arg_validation(spark, pts):
    with pytest.raises(ValueError, match="levels"):
        tile_pyramid(pts, 8, 0)
    with pytest.raises(ValueError, match="below resolution 0"):
        tile_pyramid(pts, 2, 5)


def test_pyramid_high_res_exact_above_2_53(spark):
    """Ancestor derivation must stay integer: res-30 cells use 60 bits, and
    a floor(cell / 4^k) form rides DOUBLE division, corrupting ids above
    2^53 — the >> form must keep parent/child conservation exact."""
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            # cluster points so res-30 siblings actually share parents
            "lon": 179.99 + rng.uniform(0, 1e-5, 300),
            "lat": 89.99 + rng.uniform(0, 1e-5, 300),
            "value": rng.uniform(0, 1, 300).round(3),
        }
    )
    pts = spark.createDataFrame(pdf)
    pyr = tile_pyramid(pts, 30, 3, weight="value").toPandas()
    fine = pyr[pyr.res == 30]
    assert (fine.cell > 2**53).any()  # the regime double division corrupts
    for r in (28, 29, 30):
        lv = pyr[pyr.res == r]
        assert int(lv.n.sum()) == 300
    mid = pyr[pyr.res == 29].set_index("cell")
    agg = fine.assign(parent=lambda d: d.cell // 4).groupby("parent").n.sum()
    assert (agg == mid.n.loc[agg.index]).all()
