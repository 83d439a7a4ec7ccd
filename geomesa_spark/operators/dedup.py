"""Deduplication operators for large-scale training-data pipelines.

No reference analog (GeoMesa dedups only join duplicates); these are the
standard public algorithms (Broder 1997 MinHash; Charikar 2002 SimHash;
banded LSH from Mining of Massive Datasets ch.3), expressed Spark-first:

- exact_dedup: hash-groupBy, fully native.
- minhash_lsh_dedup: shingle -> minhash signature (one Arrow-batched pandas
  UDF) -> band buckets (native explode) -> bucket equi-join -> exact Jaccard
  verify on candidates only. The join is on short band-hash keys, never on
  document text; the text is re-joined by id afterwards, so 100 TB of
  payloads never crosses the candidate shuffle.
- simhash_dedup: 64-bit SimHash + banding into 4x16-bit chunks (hamming<=3
  guarantee within <=4 chunks by pigeonhole) -> chunk equi-join -> exact
  hamming verify.
- ngram_jaccard_join: exact n-gram Jaccard over candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

_HASH_PRIME = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the minimum-id row per distinct text. -> (keep_id, copies)."""
    return (
        df.groupBy(F.md5(F.col(text_col).cast("string")).alias("__h"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("copies"))
        .drop("__h")
    )


def _shingles(text: str, n: int) -> np.ndarray:
    t = " ".join(text.lower().split())
    if len(t) < n:
        return np.array([hash(t) & 0xFFFFFFFF], dtype=np.uint64)
    arr = np.frombuffer(t.encode("utf-8", "ignore")[: len(t)], dtype=np.uint8)
    # rolling polynomial hash of n-byte shingles, vectorized
    if arr.shape[0] < n:
        return np.array([int(arr.sum())], dtype=np.uint64)
    weights = np.power(
        np.uint64(31), np.arange(n - 1, -1, -1).astype(np.uint64), dtype=np.uint64
    )
    windows = np.lib.stride_tricks.sliding_window_view(arr, n).astype(np.uint64)
    return np.unique((windows * weights).sum(axis=1) & np.uint64(0xFFFFFFFF))


def minhash_signature_udf(num_hashes: int = 64, shingle_n: int = 5):
    """Arrow-batched UDF: text -> array<long> minhash signature."""
    rng = np.random.default_rng(42)
    a = rng.integers(1, _HASH_PRIME, num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _HASH_PRIME, num_hashes, dtype=np.int64).astype(np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingles(t or "", shingle_n)
            # (a*x + b) mod p, min per hash fn; uint64 overflow-safe via object->mod
            vals = (sh[None, :] * a[:, None] + b[:, None]) % np.uint64(_HASH_PRIME)
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return sig


def jaccard_udf(shingle_n: int = 5):
    @F.pandas_udf(T.DoubleType())
    def jac(t1: pd.Series, t2: pd.Series) -> pd.Series:
        out = np.zeros(len(t1))
        for i, (x, y) in enumerate(zip(t1, t2)):
            s1, s2 = set(_shingles(x or "", shingle_n)), set(_shingles(y or "", shingle_n))
            u = len(s1 | s2)
            out[i] = len(s1 & s2) / u if u else 1.0
        return pd.Series(out)

    return jac


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """-> (id_a, id_b, jaccard) candidate near-duplicate pairs (id_a < id_b)
    whose exact shingle Jaccard >= threshold.

    Plan: signature (1 UDF pass) -> explode to (band, band_hash) keys (native)
    -> self-join on the short keys -> dedup pairs -> exact verify. Only ids +
    band hashes shuffle; text is fetched back by id for the verify stage.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature_udf(num_hashes, shingle_n)
    with_sig = df.select(F.col(id_col), F.col(text_col)).withColumn(
        "__sig", sig(F.col(text_col))
    )

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",", *[F.col("__sig")[b * rows_per_band + i] for i in range(rows_per_band)]
                )
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = with_sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    left = buckets.alias("l")
    right = buckets.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )

    texts = df.select(F.col(id_col), F.col(text_col))
    jac = jaccard_udf(shingle_n)
    verified = (
        cand.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed(text_col, "__ta"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed(text_col, "__tb"), "id_b")
        .withColumn("jaccard", jac(F.col("__ta"), F.col("__tb")))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash_udf(shingle_n: int = 4):
    """text -> 64-bit SimHash (sign-sum of shingle hash bits), Arrow-batched."""

    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            hs = _shingles(t or "", shingle_n)
            # re-mix to 64 bits (splitmix-style)
            x = hs.astype(np.uint64)
            x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
            x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
                0xFFFFFFFFFFFFFFFF
            )
            x ^= x >> np.uint64(31)
            bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            v = np.where((2 * bits - 1).sum(axis=0) >= 0, 1, 0).astype(np.uint64)
            acc = np.uint64(0)
            for j in range(64):
                acc |= v[j] << np.uint64(j)
            out[i] = np.int64(acc)
        return pd.Series(out)

    return sh


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """-> (id_a, id_b, hamming): pairs within ``max_hamming`` bits.

    Banding: split 64 bits into 4 x 16-bit chunks; by pigeonhole any pair with
    hamming <= 3 shares at least one chunk exactly -> chunk equi-join, then
    exact popcount verify (native bit_count, no UDF in the verify)."""
    sh = simhash_udf()
    with_h = df.select(id_col).join(
        df.select(id_col, text_col), id_col
    ).withColumn("__sh", sh(F.col(text_col))).select(id_col, "__sh")

    chunks = with_h.select(
        id_col,
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("__sh"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "__sh", F.col("ck.chunk").alias("chunk"), F.col("ck.cv").alias("cv"))

    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.__sh").alias("ha"),
            F.col("r.__sh").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
