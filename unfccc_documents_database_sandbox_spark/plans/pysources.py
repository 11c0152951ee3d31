"""Custom-source query keys (PySpark 4 Python DataSource API)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import ensure_pyfiles
from unfccc_documents_database_sandbox_spark.registry import register


@register(
    "source_pyds",
    oracle="""
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(SUM(amount_cents) AS BIGINT) AS total_cents
    FROM (
        SELECT i % 16 AS bucket, (i * 2654435761) % 10000 AS amount_cents
        FROM range(0, 10000) t(i)
    )
    GROUP BY 1
    """,
)
def x_source_pyds(spark, sf_dir):
    """S-ext custom Python data source end-to-end: the synthetic-ledger
    source (sources/pyds.py — PySpark 4 DataSource API: driver-side
    partition planning, executor-side per-partition reads) scanned and
    rolled up per bucket. Rows derive from the row index by pure integer
    arithmetic, so the oracle replays the SOURCE itself from a SQL range()
    — the hash check covers the reader, not just the aggregation.
    tests/test_sources.py asserts the scan parallelism equals the planned
    partition count (one task per InputPartition)."""
    from unfccc_documents_database_sandbox_spark.sources.pyds import (
        register_synthetic_ledger,
    )

    # reader classes unpickle on workers via a package import (cloudpickle
    # by-reference) — ship the package exactly like the mapInPandas stages
    ensure_pyfiles(spark)
    register_synthetic_ledger(spark)
    ledger = (
        spark.read.format("synthetic_ledger")
        .option("rows", 10_000)
        .option("partitions", 8)
        .load()
    )
    return ledger.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_entries"),
        F.sum("amount_cents").cast("long").alias("total_cents"),
    )
