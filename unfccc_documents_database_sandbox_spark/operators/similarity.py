"""Similarity search over embedding columns (north star L3).

Two paths, mirroring how a 100 TB ANN pipeline is actually built:
- brute-force cosine top-k — the exact baseline. Queries are broadcast
  (they're few); the corpus streams through map-side — no corpus shuffle,
  O(|Q|·N) JVM-side arithmetic via zip_with/aggregate (no Python).
- LSH-bucketed (random hyperplane) — the scale path. Each vector gets a
  short sign-bit bucket id; only same-bucket pairs are compared. Buckets
  are deterministic (fixed integer hyperplanes), so results are stable.

An IVF variant (cluster-prune by centroid) would slot in the same shape:
assign → shuffle on centroid id → per-bucket brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.functions.vectors import dot, to_double


def as_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Cast array<float> → array<double> once, up front — keeps all later
    arithmetic in double and identical across engines."""
    return df.withColumn("vec", to_double(F.col(col)))


def with_norm(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    return df.withColumn("norm", F.sqrt(dot(F.col(vec_col), F.col(vec_col))))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus; rank per query. Returns (query_id, neighbor_id, rank, score)."""
    c = with_norm(as_double_vec(corpus)).select(
        F.col(id_col).alias("neighbor_id"), F.col("vec").alias("cvec"), F.col("norm").alias("cnorm")
    )
    q = with_norm(as_double_vec(queries)).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("score"))
    )


# deterministic integer hyperplanes for sign-bit LSH (values in [-8, 8])
def _hyperplane(j: int, dim: int) -> list[float]:
    return [float(((j * 131 + d * 31 + (j * d) % 7) % 17) - 8) for d in range(dim)]


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH buckets, then exact
    rank within each (query, bucket). One equi-join shuffle on bucket id —
    the 100 TB path where broadcast-everything is impossible."""
    planes = [F.array(*[F.lit(v) for v in _hyperplane(j, dim)]) for j in range(n_planes)]

    def bucket(vec: F.Column) -> F.Column:
        bits = [
            F.when(dot(vec, planes[j]) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(n_planes)
        ]
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out.cast("long")

    c = with_norm(as_double_vec(corpus)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
        bucket(F.col("vec")).alias("bucket"),
    )
    q = with_norm(as_double_vec(queries)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        bucket(F.col("vec")).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("score"))
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    block_col: str = "label",
    threshold: float = 0.9,
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by ``block_col`` (an
    LSH-bucket stand-in): equi-join on the block, compare within."""
    v = with_norm(as_double_vec(corpus)).select(
        id_col, block_col, F.col("vec"), F.col("norm")
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "cos",
            dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.norm") * F.col("b.norm")),
        )
        .filter(F.col("cos") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("cos", 4).alias("score"),
        )
    )
