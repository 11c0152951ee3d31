"""Data-layout operators: multi-dimensional clustering for scan locality.

Z-ordering (bit-interleaved space-filling curve) is the standard way to
make ONE physical sort order serve range predicates on TWO columns: rows
close in (x, y) space land in the same file, so per-file min/max stats
prune scans on either dimension (the technique behind Delta/Iceberg
OPTIMIZE ZORDER; Morton, 1966). The curve value itself is pure integer bit
arithmetic — whole-stage-codegen'd JVM expressions here, and expressible
in ANSI SQL for the oracle twin, so the key is exact-hash-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.registry import register

_BITS = 8  # 8 bits per dimension → 16-bit z-value, 65536 cells


def _z_sql(x: str, y: str) -> str:
    """ANSI-SQL bit-interleave of the low 8 bits of x (even positions) and
    y (odd positions) — the same arithmetic the Spark expression runs."""
    terms = []
    for i in range(_BITS):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _z_col(x, y):
    """JVM-side bit-interleave (codegen'd; no UDF)."""
    z = F.lit(0)
    for i in range(_BITS):
        z = z + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return z


@register(
    "layout_zorder",
    oracle=f"""
    WITH d AS (
        SELECT o_orderkey,
               o_custkey % 256 AS x,
               EXTRACT(day FROM o_orderdate) AS y
        FROM orders
    ),
    z AS (SELECT o_orderkey, x, y, {_z_sql('x', 'y')} AS zval FROM d)
    SELECT CAST(zval // 1024 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS x_lo, CAST(MAX(x) AS BIGINT) AS x_hi,
           CAST(MIN(y) AS BIGINT) AS y_lo, CAST(MAX(y) AS BIGINT) AS y_hi
    FROM z GROUP BY zval // 1024
    """,
)
def layout_zorder(spark, sf_dir):
    """Z-order clustering audit over orders on (customer, day-of-month):
    interleave the low 8 bits of each dimension into a 16-bit Morton
    value, range-bucket it by integer division (bucket = zval DIV 1024 →
    shuffle-free, unlike ntile's global sort), and report each
    bucket's (x, y) bounding box. The tight per-bucket min/max boxes in
    the output ARE the point: written as files in this order, a predicate
    on EITHER column prunes most buckets via footer stats. At 100 TB this
    bucket id is the repartitionByRange / write-partition key; the audit
    aggregation here is one map-side-combinable shuffle."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.pmod("o_custkey", F.lit(256)).cast("long").alias("x"),
        F.dayofmonth("o_orderdate").cast("long").alias("y"),
    )
    z = d.select("o_orderkey", "x", "y", _z_col(F.col("x"), F.col("y")).alias("zval"))
    return (
        z.groupBy(F.expr("zval DIV 1024").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").cast("long").alias("x_lo"),
            F.max("x").cast("long").alias("x_hi"),
            F.min("y").cast("long").alias("y_lo"),
            F.max("y").cast("long").alias("y_hi"),
        )
        .select("bucket", "n_rows", "x_lo", "x_hi", "y_lo", "y_hi")
    )
