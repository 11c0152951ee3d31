"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here with:
- a Spark builder ``(spark, sf_dir) -> DataFrame``
- an optional DuckDB oracle SQL string (ANSI SQL over the same parquet
  views). Oracle-less entries get the driver's weaker rows-only check
  (approximate / non-deterministic / streaming-only semantics).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash comparison is exact, not flaky):
- no raw double SUM/AVG across rows (order-dependent FP error): money is
  summed as bigint cents via round(x*100); quantities are whole-number
  doubles (exact); averages divide one exact sum by one exact count.
- every computed column is aliased identically in Spark and oracle SQL.
- ties in any top-k / row_number ordering are broken by a unique key.
- integer-typed outputs are cast to BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder (and its oracle twin) by name."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def load_all_plans() -> None:
    """Import every plans/ module so registration side effects run."""
    from unfccc_documents_database_sandbox_spark import plans  # noqa: F401

    plans.load()
