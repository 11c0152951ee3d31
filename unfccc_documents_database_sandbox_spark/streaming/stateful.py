"""Custom stateful streaming operator via applyInPandasWithState (T-ext).

The reference is pure batch (SURVEY.md §2.9), so this is north-star
territory: the canonical "running per-key profile" operator a training-data
pipeline needs (per-user counters, last-seen, running spend) expressed with
Spark's arbitrary-stateful-processing API.

Scale shape: state lives in the state store, partitioned by the grouping
key — each executor owns its key range, no driver involvement. The same
function body also runs in batch mode through applyInPandas for testing
(minus timeout semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

USER_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def _update_user_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (event count, total spend) per user across micro-batches."""
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += int(pdf["value_cents"].fillna(0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [total]}
    )


def _with_cents(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile: one output row per user per
    micro-batch with the running totals. State is (count, spend) per user —
    bytes per key, so state-store size is O(distinct users), not O(events)."""
    return _with_cents(events).groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=USER_PROFILE_SCHEMA,
        stateStructType=USER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_profile_batch(events: DataFrame) -> DataFrame:
    """The batch twin (same output schema) for oracle checks: a plain
    grouped aggregation — what the stateful operator's totals converge to
    after all input is processed."""
    return _with_cents(events).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.coalesce(F.sum("value_cents"), F.lit(0)).cast("long").alias("total_cents"),
    )
