"""Interval-overlap join: the scale-correct plan for `a.start <= b.end AND
b.start <= a.end` predicates.

Spark's optimizer can only execute a bare overlap predicate as a (broadcast)
nested-loop join — O(|A|·|B|) work per key, the same failure mode the dedup
operators avoid. The standard fix (used by every distributed interval /
range-join implementation) is bucketization: quantize the coordinate space
into fixed-width buckets, explode each interval to the buckets it covers,
equi-join on (key, bucket), dedup the candidate pairs, and verify the exact
overlap predicate. The join becomes a hash shuffle whose fan-out is bounded
by interval_length / bucket_width + 1, and candidates are exact supersets of
true overlaps — the verify filter makes the result exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    start: str = "start_n",
    end: str = "end_n",
    id_col: str = "event_id",
    bucket_width: int = 1000,
) -> DataFrame:
    """Exact overlap pairs (id_a, id_b, overlap_len) between interval sets
    ``a`` and ``b`` sharing ``key``. Intervals are closed integer ranges
    [start, end]; ``bucket_width`` should exceed the typical interval
    length so the per-interval bucket fan-out stays 1-2."""

    def bucketed(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(key),
            F.col(id_col).alias(f"id_{tag}"),
            F.col(start).alias(f"start_{tag}"),
            F.col(end).alias(f"end_{tag}"),
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / bucket_width),
                    F.floor(F.col(end) / bucket_width),
                )
            ).alias("bucket"),
        )

    ab = bucketed(a, "a")
    bb = bucketed(b, "b")
    cands = ab.join(bb, [key, "bucket"]).drop("bucket")
    # an interval pair spanning a bucket boundary meets in every shared
    # bucket — dedup before the exact check so each pair is verified once
    return (
        cands.distinct()
        .filter(
            (F.col("start_a") <= F.col("end_b"))
            & (F.col("start_b") <= F.col("end_a"))
        )
        .select(
            "id_a",
            "id_b",
            (
                F.least("end_a", "end_b") - F.greatest("start_a", "start_b")
            ).cast("long").alias("overlap_len"),
        )
    )
