#!/usr/bin/env python
"""Bare-session (driver-contract) parity check: builds queries through
__spark_entry__ with a vanilla SparkSession (the external driver's shape,
NOT session.get_spark) and hash-compares against the DuckDB oracle.

Usage: python bench_logs/bare_parity.py key1,key2 [sf_dir]
Keys may be given without their rotation prefix; the declared (prefixed)
key is resolved by suffix match.
"""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

want = sys.argv[1].split(",")
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs, osql = e.queries(), e.oracle_sql()


def resolve(name):
    if name in qs:
        return name
    # removeprefix, not lstrip: lstrip("z_") strips the CHARACTER SET
    # {z, _}, over-stripping keys that begin with z (ADVICE r17)
    def dez(k):
        return k.removeprefix("z_")

    hits = [k for k in qs if dez(k) == name or k.endswith("_" + name)]
    hits = [k for k in hits if dez(k) == name] or hits
    if len(hits) != 1:
        raise SystemExit(f"cannot resolve {name!r}: {hits}")
    return hits[0]


con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
    )


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


fail = 0
for name in want:
    k = resolve(name)
    sdf = qs[k](spark, sf).toPandas()
    if osql.get(k):
        ok = canon(sdf) == canon(con.execute(osql[k]).df())
        print(f"{k}: hash_match={ok} rows={len(sdf)}")
        fail += 0 if ok else 1
    else:
        print(f"{k}: rows-only rows={len(sdf)} cols={sorted(sdf.columns)}")
spark.stop()
sys.exit(1 if fail else 0)
