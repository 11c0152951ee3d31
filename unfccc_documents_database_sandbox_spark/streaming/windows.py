"""Structured Streaming operators (T1-T4) — [N] extensions; the reference
is pure batch (SURVEY.md §2.9).

The windowed aggregations are defined once and used from BOTH batch and
streaming: `F.window`/`F.session_window` are plan-level operators, so the
driver's batch oracle checks validate the same expressions the streaming
jobs run. Streaming-only semantics (watermarks, stateful dedup) are
exercised in tests/test_streaming.py with a file/memory source.

Scale notes: streaming state (session windows, dedup keys) is partitioned
by the grouping key across executors; watermarks bound state size — without
one, a 100 TB/day stream's dedup state grows unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """T1 tumbling window: per-window event count + exact value sum (cents)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "value_cents",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """T1 sliding window variant."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_counts(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """T2 session window per user: sessions close after ``gap`` of
    inactivity; window end = last event + gap (Spark semantics)."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_cents",
        )
    )


def _as_event_time(stream: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); the corpus carries NTZ. Under the
    engine's fixed UTC session timezone the cast is a pure re-tag."""
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_tumbling_with_watermark(
    stream: DataFrame, width: str = "10 minutes", late: str = "1 hour"
) -> DataFrame:
    """T3 watermarked streaming aggregation: events later than ``late`` are
    dropped; state for closed windows is evicted. Window bounds are cast
    back to NTZ so streaming output schema matches the batch operator."""
    out = tumbling_counts(_as_event_time(stream).withWatermark("ts", late), width)
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.col("window_end").cast("timestamp_ntz").alias("window_end"),
        "n_events",
        "value_cents",
    )


def stream_dedup(stream: DataFrame, keys: list[str], late: str = "1 hour") -> DataFrame:
    """T4 stateful streaming dedup with bounded state (watermark-evicted)."""
    deduped = _as_event_time(stream).withWatermark("ts", late).dropDuplicatesWithinWatermark(keys)
    return deduped.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
