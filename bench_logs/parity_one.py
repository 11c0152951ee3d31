#!/usr/bin/env python
"""Standalone per-key oracle parity check (mirrors tests/test_parity.py)."""
import datetime
import math
import os
import sys

sys.path.insert(0, "/root/repo")

names = sys.argv[1].split(",")
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

import duckdb

from unfccc_documents_database_sandbox_spark.registry import load_all_plans, lookup
from unfccc_documents_database_sandbox_spark.session import get_spark

load_all_plans()
spark = get_spark(app_name="parity_one")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
from unfccc_documents_database_sandbox_spark.catalog import TABLES

for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return sorted(cols), out


fail = 0
for name in names:
    spec = lookup(name)
    df = spec.build(spark, sf)
    s_cols, s_rows = _normalize(df.columns, [tuple(r) for r in df.collect()])
    res = con.execute(spec.oracle)
    d_cols, d_rows = _normalize([d[0] for d in res.description], res.fetchall())
    ok = s_cols == d_cols and s_rows == d_rows
    print(f"{name}: cols={'OK' if s_cols == d_cols else (s_cols, d_cols)} "
          f"rows={len(s_rows)}/{len(d_rows)} match={ok}")
    if not ok:
        fail += 1
        bad = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        print("  first mismatches:", bad)
spark.stop()
sys.exit(1 if fail else 0)
