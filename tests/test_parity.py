"""Differential parity harness — mirrors the driver's correctness gate.

For every registered query with an oracle: run the Spark plan and the
DuckDB oracle SQL on the same sf0.01 parquet, then compare
  1. row count
  2. column-name set
  3. order-insensitive exact values (columns sorted by name, rows sorted)

Exact equality, including doubles: the engine's determinism rules
(registry.py docstring) are designed to make cross-engine results
bit-identical, so any drift is a bug, not noise.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from tests.conftest import SF_CORRECT

import __spark_entry__ as entry_mod

ALL_QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    from unfccc_documents_database_sandbox_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell for cross-engine compare."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
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
    named = sorted(cols)
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return named, out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    df = ALL_QUERIES[name](spark, SF_CORRECT)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} (spark) != {len(duck_rows)} (duckdb)"
    )
    s_cols, s_rows = _normalize(spark_cols, spark_rows)
    d_cols, d_rows = _normalize(duck_cols, duck_rows)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"


@pytest.mark.parametrize(
    "name", sorted(set(ALL_QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    """Oracle-less ops still must run and return a stable schema."""
    df = ALL_QUERIES[name](spark, SF_CORRECT)
    assert df.columns
    assert df.count() >= 0
