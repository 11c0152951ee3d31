"""Streaming-operator queries (T1/T2), checked in batch mode — the window
expressions are identical under readStream (see streaming/windows.py)."""

from __future__ import annotations

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.registry import register
from unfccc_documents_database_sandbox_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)


@register(
    "stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
               AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark, sf_dir):
    """T1 tumbling 10-minute window aggregation over events."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_sliding",
    oracle="""
    WITH s AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_id FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws,
               event_id
        FROM events
    )
    SELECT ws AS window_start, ws + INTERVAL '10 minutes' AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY 1, 2
    """,
)
def stream_sliding(spark, sf_dir):
    """T1 sliding window (10 min width / 5 min slide): every event lands in
    exactly two windows; the oracle reconstructs them as two offset buckets."""
    return sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_session",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL '5 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '5 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def stream_session(spark, sf_dir):
    """T2 per-user session windows (5-minute inactivity gap). The DuckDB
    oracle reconstructs Spark's session semantics with a gaps-and-islands
    window (new session when gap >= 5 min; end = last + gap)."""
    return session_counts(load_table(spark, sf_dir, "events"))
