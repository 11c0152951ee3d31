"""Data-quality expectation suite (Deequ/Great-Expectations shape): a
declarative list of checks — completeness, uniqueness, range bounds, set
membership — verified in ONE aggregation pass and reported as a metrics
table (check_name, observed, expected, ok).

Why an engine operator: every production training-data pipeline gates
ingest on exactly these assertions (AWS Deequ runs them as Spark jobs for
the same reason), and the naive implementation runs one job per check —
N scans of a 100 TB table. Here every check contributes its observed and
expected values as aggregate EXPRESSIONS to a single `df.agg(...)` (one
scan, map-side partial aggregation), and the per-check rows are exploded
from that one-row result — plan cost is independent of the number of
checks.

Checks are (name, observed_expr, expected_expr, op) where op ∈
{'==', '>=', '<='} compares observed against expected to produce the
bigint ok flag. Observed/expected must be integer-exact aggregates (the
registry's determinism rule — counts, distinct counts, integer-cent
min/max), so the report hash-matches a relational oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Check = tuple[str, Column, Column, str]


def completeness(col: str) -> Check:
    """Column must be fully populated: non-null count == row count."""
    return (
        f"completeness:{col}",
        F.count(col),
        F.count(F.lit(1)),
        "==",
    )


def uniqueness(col: str) -> Check:
    """Column must be unique: distinct count == row count."""
    return (
        f"uniqueness:{col}",
        F.countDistinct(col),
        F.count(F.lit(1)),
        "==",
    )


def min_at_least(col: Column, name: str, bound: int) -> Check:
    return (f"range_min:{name}", F.min(col), F.lit(bound), ">=")


def max_at_most(col: Column, name: str, bound: int) -> Check:
    return (f"range_max:{name}", F.max(col), F.lit(bound), "<=")


def no_violations(cond: Column, name: str) -> Check:
    """Count of rows FAILING ``cond`` must be zero (set membership,
    cross-column invariants, date windows — any row predicate)."""
    return (
        name,
        F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))),
        F.lit(0),
        "==",
    )


def expectation_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every check in ONE aggregation pass; returns
    (check_name, observed, expected, ok) with ok as bigint 0/1."""
    if not checks:
        raise ValueError("expectation_report: no checks given")
    aggs = []
    for i, (_name, obs, exp, op) in enumerate(checks):
        if op not in ("==", ">=", "<="):
            raise ValueError(f"unknown expectation op {op!r}")
        aggs.append(obs.cast("long").alias(f"_o{i}"))
        aggs.append(exp.cast("long").alias(f"_e{i}"))
    row = df.agg(*aggs)
    structs = []
    for i, (name, _obs, _exp, op) in enumerate(checks):
        o, e = F.col(f"_o{i}"), F.col(f"_e{i}")
        ok = {"==": o == e, ">=": o >= e, "<=": o <= e}[op]
        structs.append(
            F.struct(
                F.lit(name).alias("check_name"),
                o.alias("observed"),
                e.alias("expected"),
                ok.cast("long").alias("ok"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("c")).select(
        "c.check_name", "c.observed", "c.expected", "c.ok"
    )
