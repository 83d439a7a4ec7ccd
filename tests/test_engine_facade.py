"""Engine facade smoke: the one-object API a reference user switches to."""

from __future__ import annotations

import pandas as pd

from geomesa_spark.engine import Engine


def test_facade_surface(spark):
    eng = Engine(spark)
    assert eng.register_sql() >= 60

    pdf = pd.DataFrame({"lon": [2.35, -74.0], "lat": [48.85, 40.7], "pid": [1, 2]})
    df = spark.createDataFrame(pdf)
    hits = eng.spatial_join(
        df, {"eu": "POLYGON((-10 35, 40 35, 40 70, -10 70, -10 35))"}
    )
    assert [r.pid for r in hits.collect()] == [1]

    plan = eng.plan(geom="POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert plan.strategy == "z2"

    stats = eng.stats(df, "Count(); MinMax(lon)")
    assert stats["Count()"].collect()[0].cnt == 2
