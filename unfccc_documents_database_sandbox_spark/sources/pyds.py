"""Custom Python data source (PySpark 4 DataSource API).

The reference's front door is an external engine handing it rows (Postgres
via SQLAlchemy — reference README.md:15-18); the Spark-native analogue for
"a source Spark has no built-in reader for" is the Python DataSource API:
plan partitions on the driver, read each partition independently on
executors. This module implements a deterministic synthetic-ledger source
that exercises the full surface — schema declaration, option handling,
partition planning, per-partition iteration — with pure-integer row
derivation so a SQL oracle can replay it exactly.

Scale shape: `partitions()` is the unit of parallelism — each
InputPartition becomes one Spark task, so a 100 TB-scale source splits its
keyspace/manifest here and never funnels through the driver. Rows are
generated (or fetched) lazily per partition; nothing materializes
driver-side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth's multiplicative-hash constant — same derivation the corpus-mix /
# hash-sampling keys use, exactly replayable in ANSI SQL.
_MULT = 2654435761


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class SyntheticLedgerDataSource(DataSource):
    """spark.read.format("synthetic_ledger").option("rows", N)
    .option("partitions", P) — N deterministic rows split across P tasks."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ledger"

    def schema(self) -> str:
        return "entry_id bigint, bucket bigint, amount_cents bigint"

    def reader(self, schema) -> "SyntheticLedgerReader":
        return SyntheticLedgerReader(self.options)


class SyntheticLedgerReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 10_000))
        self.n_parts = max(1, int(options.get("partitions", 8)))

    def partitions(self):
        # contiguous ranges; the LAST partition absorbs the remainder
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step))[: self.n_parts]
        return [
            _Range(lo, hi)
            for lo, hi in zip(bounds, bounds[1:] + [self.n_rows])
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield (i, i % 16, (i * _MULT) % 10_000)


_REGISTERED: set[str] = set()


def register_synthetic_ledger(spark) -> None:
    """Idempotent per-session registration of the custom source."""
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(SyntheticLedgerDataSource)
    _REGISTERED.add(key)
