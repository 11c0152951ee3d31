"""Vector expression helpers — JVM-side (whole-stage codegen), no UDFs.

Shared by the similarity operators (operators/similarity.py) and usable
directly in any plan over `array<float>` / `array<double>` columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    """array<float> → array<double>: promote once so all later arithmetic is
    double (and identical to engines that compute in double)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product as a left fold over zip_with — sequential, deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(vec: Column) -> Column:
    """Unit-normalize; with pre-normalized vectors cosine degrades to dot,
    saving one norm per comparison in top-k loops."""
    n = norm(vec)
    return F.transform(vec, lambda x: x / n)
