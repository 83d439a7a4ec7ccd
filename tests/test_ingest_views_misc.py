"""Ingest converters, merged/routed views, embedding near-dup, GeoJSON rows,
st_aggregateDistanceSphere."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.similarity import embedding_neardup_pairs
from geomesa_spark.sources.exports import to_geojson_rows
from geomesa_spark.sources.ingest import apply_converter, ingest_delimited
from geomesa_spark.sources.views import merged_store_view, query_route, routed_view


def test_ingest_delimited(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("name,when,x,y\n Alice ,2024-01-02 03:04:05,1.5,2.5\nbob,2024-02-03 04:05:06,-3,9\n")
    spec = {
        "name": "lower(trim(name))",
        "ts": "to_timestamp(when)",
        "lon": "cast(x as double)",
        "lat": "cast(y as double)",
        "fid": "md5(concat(name, when))",
    }
    out = ingest_delimited(spark, str(p), spec).toPandas()
    assert list(out.columns) == ["name", "ts", "lon", "lat", "fid"]
    assert set(out["name"]) == {"alice", "bob"}
    assert out["lon"].dtype == np.float64


def test_apply_converter_prunes(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1], "b": [2], "c": [3]}))
    out = apply_converter(df, {"double_a": "a * 2"})
    assert out.columns == ["double_a"]
    assert out.collect()[0].double_a == 2


def test_merged_and_routed_views(spark):
    a = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["x", "y"]}))
    b = spark.createDataFrame(pd.DataFrame({"k": [3], "v": ["z"], "extra": [9.0]}))
    m = merged_store_view(a, b)
    assert m.count() == 3 and "extra" in m.columns

    r = routed_view({"hot": a, "cold": b})
    hot_only = r.filter(F.col("__store") == "hot")
    assert hot_only.count() == 2

    picked = query_route({"hot": a, "cold": b}, lambda name: name == "cold")
    assert picked.count() == 1


def test_embedding_neardup_exact_vs_lsh(spark):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    # make 5 true near-dup pairs (tiny perturbations)
    dup = base[:5] + rng.normal(scale=0.01, size=(5, 16)).astype(np.float32)
    vecs = np.concatenate([base, dup])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs)), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    exact = embedding_neardup_pairs(df, 0.98, dim=16, exact=True).toPandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    assert {(i, 40 + i) for i in range(5)} <= exact_pairs

    lsh = embedding_neardup_pairs(df, 0.98, dim=16, n_planes=4, n_tables=8).toPandas()
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    # LSH is a recall-oriented prefilter: must find most true pairs, no false
    # positives beyond the exact set (refine is exact)
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs & exact_pairs) >= 4


def test_geojson_rows(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"lon": [1.5], "lat": [2.5], "name": ["x"]})
    )
    row = to_geojson_rows(df).collect()[0]
    gj = json.loads(row.geojson)
    assert gj["type"] == "Feature"
    assert gj["geometry"] == {"type": "Point", "coordinates": [1.5, 2.5]}
    assert gj["properties"] == {"name": "x"}


def test_aggregate_distance_sphere(spark):
    from geomesa_spark.functions.st_funcs import register_st_functions

    register_st_functions(spark)
    # Paris -> London -> Paris: twice the single-leg distance
    d = spark.sql(
        """
        SELECT st_aggregateDistanceSphere(array(
            st_asBinary(st_makePoint(2.3522, 48.8566)),
            st_asBinary(st_makePoint(-0.1276, 51.5072)),
            st_asBinary(st_makePoint(2.3522, 48.8566))
        )) AS d
        """
    ).collect()[0].d
    assert abs(d - 2 * 343_500) < 6_000
