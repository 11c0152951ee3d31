"""Polymorphic (schema-deriving) Python UDTFs — Spark 4 `analyze()`.

A normal `@udtf(returnType=...)` pins its output schema at definition
time; Spark 4's polymorphic form derives it at PLAN time from the actual
arguments via a static `analyze()` (SPARK-44503). Two production shapes
live here:

- ``make_sum_numeric_cols_udtf`` — schema-generic aggregation over a
  TABLE argument: string columns pass through as grouping keys, every
  integral column c becomes ``sum_c`` BIGINT. The resolved field lists
  ride from analyze() to the executors inside an AnalyzeResult SUBCLASS
  (Spark passes it to ``__init__`` — the documented side-channel), so
  eval never re-guesses column order from row dicts.
- ``make_split_fields_udtf`` — constant-argument polymorphism: the
  OUTPUT ARITY comes from a literal argument (``split_fields(text, 3)``
  → columns f1..f3), the classic fixed-width splitter; exercised with
  LATERAL correlation in tests.

Registered per-session via ``spark.udtf.register`` (factories return the
decorated class so sessions never share registration state).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.functions import udtf
from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


@dataclass
class _SumColsResult(AnalyzeResult):
    """AnalyzeResult subclass carrying the resolved column lists to the
    executor-side __init__ (ordering contract: analyze decides once).
    Must be a DATACLASS — Spark reconstructs AnalyzeResult subclasses
    from their dataclass fields when shipping them to executors."""

    str_cols: tuple = ()
    num_cols: tuple = ()


def make_sum_numeric_cols_udtf(use_arrow: bool = False):
    """A UDTF whose schema is derived from its TABLE argument: string
    columns pass through (grouping keys — call with PARTITION BY them),
    integral columns map to sum_<name> BIGINT (SQL SUM semantics: NULLs
    ignored; an all-NULL column sums to NULL).

    ``use_arrow`` picks the serializer; the MEASURED default is pickle
    (VERDICT r11 #6, resolved by benchmark in r12): the Arrow-optimized
    UDTF path (useArrow=True) converts each eval call's input/output
    through Arrow, which pays off for fan-out UDTFs yielding many rows
    per call — but THIS shape is an aggregator (150k eval calls, ONE
    terminate row per partition), where per-call Arrow conversion added
    ~4x wall time at sf0.1 (12.9 s vs 3.2 s pickle, BENCH r12 probe).
    Both serializers stay registerable and bit-equal
    (tests/test_functions.py's cross-serializer test); the 10-100x
    production path for any fixed schema remains the JVM groupBy."""

    class SumNumericCols:
        def __init__(self, analyze_result: _SumColsResult | None = None):
            # Spark passes the AnalyzeResult subclass when analyze() ran
            self._strs = list(analyze_result.str_cols)
            self._nums = list(analyze_result.num_cols)
            self._keys: dict[str, object] = {}
            self._sums: dict[str, int | None] = {c: None for c in self._nums}

        @staticmethod
        def analyze(t: AnalyzeArgument) -> _SumColsResult:
            if not isinstance(t.dataType, StructType):
                raise Exception(
                    "sum_numeric_cols expects a TABLE argument")
            str_cols = tuple(
                f.name for f in t.dataType.fields
                if isinstance(f.dataType, StringType))
            num_cols = tuple(
                f.name for f in t.dataType.fields
                if isinstance(f.dataType, _INTEGRAL))
            if not num_cols:
                raise Exception(
                    "sum_numeric_cols: the TABLE argument has no "
                    "integral columns to sum")
            schema = StructType(
                [StructField(c, StringType()) for c in str_cols]
                + [StructField(f"sum_{c}", LongType()) for c in num_cols]
            )
            return _SumColsResult(schema=schema, str_cols=str_cols,
                                  num_cols=num_cols)

        def eval(self, row):
            d = row.asDict()
            for c in self._strs:
                self._keys[c] = d.get(c)
            for c in self._nums:
                v = d.get(c)
                if v is not None:
                    self._sums[c] = (self._sums[c] or 0) + int(v)

        def terminate(self):
            yield tuple(
                [self._keys.get(c) for c in self._strs]
                + [self._sums[c] for c in self._nums]
            )

    return udtf(SumNumericCols, useArrow=use_arrow)


@dataclass
class _SplitFieldsResult(AnalyzeResult):
    n: int = 0


def make_split_fields_udtf():
    """Constant-argument polymorphism: ``split_fields(text, n)`` emits n
    string columns f1..fn from a ','-split (missing fields NULL, extras
    dropped) — the output ARITY comes from the literal argument, which
    only analyze() can express."""

    @udtf
    class SplitFields:
        def __init__(self, analyze_result: _SplitFieldsResult | None = None):
            self._n = analyze_result.n

        @staticmethod
        def analyze(text: AnalyzeArgument,
                    n: AnalyzeArgument) -> _SplitFieldsResult:
            if n.value is None or not isinstance(n.value, int) or n.value < 1:
                raise Exception(
                    "split_fields: n must be a positive integer LITERAL "
                    "(the output schema depends on it)")
            schema = StructType(
                [StructField(f"f{i + 1}", StringType())
                 for i in range(n.value)]
            )
            return _SplitFieldsResult(schema=schema, n=n.value)

        def eval(self, text: str, n: int):
            if text is None:
                return
            parts = text.split(",")
            yield tuple(
                (parts[i] if i < len(parts) else None)
                for i in range(self._n)
            )

    return SplitFields
