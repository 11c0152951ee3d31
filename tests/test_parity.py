"""Differential parity harness — mirrors the driver's correctness gate.

For every registered query with an oracle: run the Spark plan and the
DuckDB oracle SQL on the same sf0.01 parquet, then compare
  1. row count
  2. column-name set
  3. order-insensitive exact values (columns sorted by name, rows sorted)

Exact equality, including doubles: the engine's determinism rules
(registry.py docstring) are designed to make cross-engine results
bit-identical, so any drift is a bug, not noise.

Wall-time sharding (VERDICT r11 #8): the suite grew ~10 oracle keys per
round and re-ran every Spark build SERIALLY (~940 s total suite at r11).
The Spark side is now precomputed ONCE through a thread pool sharing the
session-scoped SparkSession — Spark's scheduler runs the concurrent jobs
fairly, local[8] was mostly idle under one-job-at-a-time — while every
parametrized test keeps its own identity: it fetches its key's cached
(columns, rows) [or re-raises its key's captured build error] and does
its own DuckDB comparison. Same test count, same failure attribution,
several-fold less wall time. PARITY_WORKERS=1 restores serial execution
(the builders are mutually independent — per-key fixture roots, per-key
memory-sink views — but a sequential escape hatch beats debugging a
concurrency heisenbug during a round close). NOTE: this parallelism is
IN-PROCESS on one SparkSession; running two verification *processes*
concurrently is still forbidden (shared .csv_tmp fixture roots — see
README dev notes).
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from tests.conftest import SF_CORRECT

import __spark_entry__ as entry_mod

ALL_QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

_RESULTS: dict[str, tuple[list[str], list[tuple]]] = {}
_ERRORS: dict[str, BaseException] = {}


@pytest.fixture(scope="module")
def spark_results(spark):
    """Precompute every registered query's Spark result concurrently
    (threads share the one SparkSession; each .collect() is an
    independent Spark job). Errors are captured per key and re-raised by
    that key's own test."""
    if _RESULTS or _ERRORS:
        return _RESULTS
    from concurrent.futures import ThreadPoolExecutor

    def run(name: str) -> None:
        try:
            df = ALL_QUERIES[name](spark, SF_CORRECT)
            _RESULTS[name] = (df.columns, [tuple(r) for r in df.collect()])
        except BaseException as e:  # noqa: BLE001 — re-raised in-test
            _ERRORS[name] = e

    workers = max(1, int(os.environ.get("PARITY_WORKERS", "4")))
    if workers == 1:
        for name in sorted(ALL_QUERIES):
            run(name)
    else:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(run, sorted(ALL_QUERIES)))
    return _RESULTS


def _spark_result(spark_results, name):
    if name in _ERRORS:
        raise _ERRORS[name]
    return spark_results[name]


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
def test_oracle_parity(spark_results, duck, name):
    spark_cols, spark_rows = _spark_result(spark_results, name)

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
def test_rows_only_queries_run(spark_results, name):
    """Oracle-less ops still must run and return a stable schema."""
    cols, rows = _spark_result(spark_results, name)
    assert cols
    assert len(rows) >= 0


def test_ivf_full_probe_is_exact(spark):
    """IVF with nprobe = n_cells must reproduce the exact brute-force
    answer — the approximation comes only from probing fewer cells."""
    from pyspark.sql import functions as F

    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.operators import similarity as S

    emb = load_table(spark, SF_CORRECT, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(emb, queries, k=5).collect()
    ivf = S.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=8).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, exact))


def test_ivf_partial_probe_recall(spark):
    """Probing 4 of 16 cells must beat random-fraction pruning by a clear
    margin. (This corpus's embeddings are uniform random — labels carry no
    cosine structure, so the true top-5 are noise extremes; recall == probed
    fraction would mean the index adds nothing. Measured here: ~0.72 vs the
    0.25 probed fraction.)"""
    from pyspark.sql import functions as F

    from unfccc_documents_database_sandbox_spark.catalog import load_table
    from unfccc_documents_database_sandbox_spark.operators import similarity as S

    emb = load_table(spark, SF_CORRECT, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(emb, queries, k=5, n_cells=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 4 / 16 + 0.2, f"IVF recall {recall:.2f} no better than random pruning"
