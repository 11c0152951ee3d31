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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

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
        # bounds staged by pushFilters for the NEXT partitions() call only
        self._pending: tuple[int, int] | None = None

    def pushFilters(self, filters):
        """Accept entry_id range predicates; everything else stays
        Spark-side. This is the custom-source half of predicate pushdown:
        Spark hands the reader the query's AND-ed filters during planning,
        the reader narrows its key range, and partitions() then plans ONLY
        the ranges that can contain matches — at 100 TB this is the
        difference between scanning a keyspace slice and scanning the
        world. Returned (yielded) filters are the ones Spark must still
        apply itself.

        State discipline: narrowed bounds are staged in _pending and
        consumed by exactly one partitions() call, never persisted on the
        reader. Even so, Spark caches the PLANNED PARTITIONS JVM-side on
        the loaded relation and re-invokes neither pushFilters nor
        partitions for a later filter-less query on the SAME DataFrame —
        observed on 4.1: load() once, run a filtered query, then an
        unfiltered count on the same object reuses the pruned partitions
        and undercounts. No reader-side discipline can prevent that, so
        the usage contract (followed by the x_source_pyds builder and
        pinned in tests/test_sources.py::test_pyds_filter_pushdown) is:
        one load() per query when pushdown is enabled."""
        lo, hi = 0, self.n_rows
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual, LessThan,
                              LessThanOrEqual, EqualTo)) and f.attribute == (
                "entry_id",
            ) and isinstance(f.value, int):
                if isinstance(f, GreaterThan):
                    lo = max(lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    lo = max(lo, f.value)
                elif isinstance(f, LessThan):
                    hi = min(hi, f.value)
                elif isinstance(f, LessThanOrEqual):
                    hi = min(hi, f.value + 1)
                else:  # EqualTo
                    lo = max(lo, f.value)
                    hi = min(hi, f.value + 1)
            else:
                yield f
        self._pending = (lo, hi)

    def partitions(self):
        # contiguous ranges over the key range this query's pushFilters
        # staged (full range if none ran); the LAST partition absorbs the
        # remainder; a fully-pruned source still returns one empty range
        # (Spark requires >= 1 partition)
        lo, hi = self._pending or (0, self.n_rows)
        self._pending = None
        hi = max(lo, hi)
        span = hi - lo
        step = max(1, span // self.n_parts)
        bounds = list(range(lo, hi, step))[: self.n_parts] or [lo]
        return [
            _Range(a, b) for a, b in zip(bounds, bounds[1:] + [hi])
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield (i, i % 16, (i * _MULT) % 10_000)


_REGISTERED: set[str] = set()
_REGISTER_LOCK = __import__("threading").Lock()


def register_synthetic_ledger(spark) -> None:
    """Idempotent per-session registration of the custom source.

    Also enables Python-data-source filter pushdown: Spark refuses to plan
    a reader that implements pushFilters() while
    spark.sql.python.filterPushdown.enabled is false (a hard
    DATA_SOURCE_PUSHDOWN_DISABLED error, not a silent fallback), and
    caller-owned sessions — the driver harness — won't have set it. It is
    a runtime SQLConf scoped to Python data sources only."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    key = spark.sparkContext.applicationId
    with _REGISTER_LOCK:
        if key in _REGISTERED:
            return
        spark.dataSource.register(SyntheticLedgerDataSource)
        _REGISTERED.add(key)


def _ledger_rows(lo: int, hi: int):
    # a LIST-backed iterator, not a generator: Spark's driver-side prefetch
    # cache copy.copy()s the returned iterator when serving
    # readBetweenOffsets from cache, and generators are not copyable
    return iter([(i, i % 16, (i * _MULT) % 10_000) for i in range(lo, hi)])


class SyntheticLedgerStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the Python DataSource API: offsets are {"pos": n}
    cursors into the same deterministic ledger the batch reader derives,
    advanced ``batch_rows`` per micro-batch; ``readBetweenOffsets`` replays
    any committed range exactly (the recovery contract — a restarted query
    re-reads (start, end] and MUST see identical rows, which the pure
    integer derivation guarantees for free).

    Scale seam: SimpleDataSourceStreamReader reads on the DRIVER and is
    the documented low-throughput variant; the partition-planning
    DataSourceStreamReader is the executor-parallel path — same offset
    algebra, partitions() per batch (this source's batch reader already
    shows the partition planning; composing the two is mechanical)."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1_000))
        self.batch = max(1, int(options.get("batch_rows", 300)))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(self.n_rows, pos + self.batch)
        return (_ledger_rows(pos, end), {"pos": end})

    def readBetweenOffsets(self, start, end):
        return _ledger_rows(int(start["pos"]), int(end["pos"]))


class SyntheticLedgerStreamSource(DataSource):
    """spark.readStream.format("synthetic_ledger_stream") — the streaming
    twin of SyntheticLedgerDataSource (same schema, same rows)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_ledger_stream"

    def schema(self) -> str:
        return "entry_id bigint, bucket bigint, amount_cents bigint"

    def simpleStreamReader(self, schema) -> SyntheticLedgerStreamReader:
        return SyntheticLedgerStreamReader(self.options)


def register_synthetic_ledger_stream(spark) -> None:
    """Idempotent per-session registration of the streaming source."""
    key = ("stream", spark.sparkContext.applicationId)
    with _REGISTER_LOCK:
        if key in _REGISTERED:
            return
        spark.dataSource.register(SyntheticLedgerStreamSource)
        _REGISTERED.add(key)
