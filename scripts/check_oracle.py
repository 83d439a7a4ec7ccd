"""Local simulation of the driver's CORRECTNESS check: run every queries()
entry on Spark at sf0.01 and compare row-count + value-hash with the DuckDB
oracle_sql() on the same parquet tables.

Usage: python scripts/check_oracle.py [query ...]

SF_DIR overrides the scale factor. Note: the five img_* oracles regenerate
the image fixture at its IMG_N cap (the oracle strings are static, per the
driver contract, while the Spark fixture is min(events.count(), IMG_N)), so
img_* entries mismatch only where the events table is smaller than IMG_N —
i.e. sf0.001. Verified: all 50 pass at sf0.01 AND sf0.1; at sf0.001 the 45
non-img entries pass.
"""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    out = []
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "f":
            s = s.round(6)
        out.append(s.astype(str))
    joined = pd.concat(out, axis=1).agg("|".join, axis=1)
    return hashlib.md5("\n".join(joined).encode()).hexdigest()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only, {len(sdf)} rows, cols={list(sdf.columns)}")
            if len(sdf) == 0:
                print(f"  WARNING: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        s, o = norm_df(sdf), norm_df(odf)
        cols_match = list(s.columns) == list(o.columns)
        rows_match = len(s) == len(o)
        h_s, h_o = (value_hash(s), value_hash(o)) if cols_match and rows_match else ("-", "x")
        ok = cols_match and rows_match and h_s == h_o
        status = "OK " if ok else "FAIL"
        print(f"{name}: {status} rows={len(s)}/{len(o)} cols_match={cols_match} hash={'=' if h_s == h_o else '!='}")
        if not ok:
            failures.append(name)
            if not cols_match:
                print(f"  spark cols: {list(s.columns)}\n  oracle cols: {list(o.columns)}")
            elif rows_match:
                diff = s.compare(o) if s.shape == o.shape else None
                if diff is not None and len(diff):
                    print(diff.head(10))
            else:
                print(f"  spark head:\n{s.head(5)}\n  oracle head:\n{o.head(5)}")
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
