"""Approximate-nearest-neighbor search over embedding columns.

Training-data-pipeline operator (no GeoMesa analog; the kNN ring-expansion
pattern of knn.py is its spatial cousin). Two paths:

- brute_force_topk: exact cosine top-k. The dot products run JVM-side via
  zip_with/aggregate on the embedding arrays — no Python — so the only cost
  is the Q x N candidate expansion (Q broadcast), then a window top-k.
- lsh_topk: scale path. Random-hyperplane LSH (Charikar 2002) bucketing via
  one Arrow-batched UDF; queries probe their own bucket (+ multiprobe
  neighbors), so each query scores only its bucket's vectors. Recall is
  tunable by (n_planes, n_tables); exactness is NOT guaranteed — the bench
  compares it against brute force for recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _norm_expr(col: str) -> str:
    return (
        f"sqrt(aggregate(transform({col}, x -> cast(x as double) * x), "
        f"cast(0.0 as double), (acc, x) -> acc + x))"
    )


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: -> (qid, vec_id, sim, rnk). Queries broadcast."""
    cand = vectors.crossJoin(F.broadcast(queries))
    sim = (
        F.expr(_dot_expr(vec_col, qvec_col))
        / (F.expr(_norm_expr(vec_col)) * F.expr(_norm_expr(qvec_col)))
    )
    cand = cand.withColumn("sim", sim)
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(qid_col))
    w = Window.partitionBy(qid_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, id_col, "sim", "rnk")
    )


def hyperplane_bucket_udf(dim: int, n_planes: int = 12, table: int = 0):
    rng = np.random.default_rng(42 + table * 1000)
    planes = rng.standard_normal((n_planes, dim))

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int64))

    return bucket


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    n_planes: int = 10,
    n_tables: int = 4,
) -> DataFrame:
    """LSH-bucketed approximate cosine top-k: -> (qid, vec_id, sim, rnk).

    Each of ``n_tables`` hash tables buckets both sides; candidates = union of
    same-bucket pairs; exact cosine re-rank on candidates only. At 10^12 rows
    the bucket join replaces the Q x N cross product with Q x (N / 2^planes)
    per table."""
    cands = None
    for t in range(n_tables):
        b = hyperplane_bucket_udf(dim, n_planes, t)
        v = vectors.withColumn("__b", b(F.col(vec_col)))
        q = queries.withColumn("__b", b(F.col(qvec_col)))
        c = v.join(F.broadcast(q), "__b").drop("__b")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates([qid_col, id_col])
    sim = (
        F.expr(_dot_expr(vec_col, qvec_col))
        / (F.expr(_norm_expr(vec_col)) * F.expr(_norm_expr(qvec_col)))
    )
    cands = cands.withColumn("sim", sim).filter(F.col(id_col) != F.col(qid_col))
    w = Window.partitionBy(qid_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        cands.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(qid_col, id_col, "sim", "rnk")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: -> (id_a, id_b, sim) with
    id_a < id_b and cosine(sim) >= threshold.

    Scale path (default): multi-table hyperplane-LSH bucket join — candidate
    pairs share a bucket in >= 1 of ``n_tables`` tables, exact cosine refine
    on candidates only. ``exact=True`` is the O(N^2) broadcast cross join for
    small sides / oracle parity.
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    if exact:
        cands = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    else:
        cands = None
        for t in range(n_tables):
            h = hyperplane_bucket_udf(dim, n_planes, t)
            av = a.withColumn("__b", h(F.col("__va")))
            bv = b.withColumn("__b", h(F.col("__vb")))
            c = av.join(bv, "__b").filter(F.col("id_a") < F.col("id_b")).drop("__b")
            cands = c if cands is None else cands.unionByName(c)
        cands = cands.dropDuplicates(["id_a", "id_b"])
    sim = (
        F.expr(_dot_expr("__va", "__vb"))
        / (F.expr(_norm_expr("__va")) * F.expr(_norm_expr("__vb")))
    )
    return (
        cands.withColumn("sim", F.round(sim, 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
