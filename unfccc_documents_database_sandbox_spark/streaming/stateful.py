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


class UserProfileProcessor:
    """Spark 4 ``transformWithStateInPandas`` stateful processor (the
    successor API to applyInPandasWithState — typed state handles, timers,
    TTL): per-user running (n_events, total_cents) in a ValueState, one
    output row per user per micro-batch with the running totals.

    API surface exercised deliberately: getValueState with a TTL (state
    for users idle past the TTL is dropped by the store — set far above
    any test run so expiry never perturbs the totals), a registered
    processing-time timer per key (the handleExpiredTimer seam a
    session-close/last-seen-flush operator needs; registered far in the
    future so it never fires mid-run).

    ENV-GATED (the TEST_POSTGRES_URL precedent): Spark's
    transformWithStateInPandas state server speaks protobuf to the
    Python worker, and this sandbox has no `google.protobuf` module and
    no way to install one — so the operator cannot execute here and is
    exercised by tests/test_streaming.py ONLY where protobuf imports
    (pytest.importorskip, skipped-not-failed otherwise). The registered
    driver key for the per-user-profile semantics remains
    stream_stateful_profile (applyInPandasWithState), which runs
    everywhere; this class is the drop-in modernization for Spark 4
    deployments with a complete Python environment.

    Unlock attempt (2026-08, per the r08 review): a full-disk sweep
    found no runtime protobuf anywhere — only typeshed STUBS (jedi's
    bundled type annotations, no runtime) and pyspark's own .proto
    descriptors (which themselves need the runtime); no wheel cache,
    package installs are disallowed in the sandbox, and vendoring would
    mean re-implementing the protobuf runtime. The gate stands; it
    re-opens automatically the moment `import google.protobuf`
    resolves (the importorskip needs no code change).
    """

    # one year, in ms: never expires / never fires inside a test run
    _TTL_MS = 365 * 24 * 3600 * 1000
    _TIMER_OFFSET_MS = 365 * 24 * 3600 * 1000

    def init(self, handle) -> None:
        import pyspark.sql.types as T  # noqa: PLC0415 — worker-side import

        self._handle = handle
        self._state = handle.getValueState(
            "profile",
            T.StructType(
                [
                    T.StructField("n_events", T.LongType()),
                    T.StructField("total_cents", T.LongType()),
                ]
            ),
            ttlDurationMs=self._TTL_MS,
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        n, total = (0, 0)
        if self._state.exists():
            n, total = self._state.get()
        for pdf in rows:
            n += len(pdf)
            total += int(pdf["value_cents"].fillna(0).sum())
        self._state.update((n, total))
        # a per-key flush timer (far future: exercises registerTimer
        # plumbing; firing semantics are test-pinned separately)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._TIMER_OFFSET_MS
        )
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [total]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd  # noqa: PLC0415 — worker-side import

        # flush-on-expiry: emit the final profile with a sentinel marker
        # (negative n_events) and clear the state — the session-close /
        # last-seen-flush shape. Only reachable when a past-timestamp
        # timer fires (tests); the registered key's far-future timers
        # never do.
        n, total = (0, 0)
        if self._state.exists():
            n, total = self._state.get()
        self._state.clear()
        self._handle.deleteTimer(expiredTimerInfo.getExpiryTimeInMs())
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [-n], "total_cents": [total]}
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        return None

    def close(self) -> None:
        return None


def user_profile_tws(events: DataFrame, timer_offset_ms: int | None = None) -> DataFrame:
    """Streaming per-user running profile on the transformWithStateInPandas
    API (update mode, processing-time timers). Same convergence contract as
    user_profile_stream: totals are monotonic, so per-user MAX over the
    emitted rows equals the batch aggregation. ``timer_offset_ms`` overrides
    the flush-timer delay (tests pass a negative value to force expiry)."""
    proc = UserProfileProcessor()
    if timer_offset_ms is not None:
        proc._TIMER_OFFSET_MS = timer_offset_ms
    return (
        _with_cents(events)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=USER_PROFILE_SCHEMA,
            outputMode="update",
            timeMode="processingTime",
        )
    )
