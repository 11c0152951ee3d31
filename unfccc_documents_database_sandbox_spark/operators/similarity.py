"""Similarity search over embedding columns (north star L3).

Two paths, mirroring how a 100 TB ANN pipeline is actually built:
- brute-force cosine top-k — the exact baseline. Queries are broadcast
  (they're few); the corpus streams through map-side — no corpus shuffle,
  O(|Q|·N) JVM-side arithmetic via zip_with/aggregate (no Python).
- LSH-bucketed (random hyperplane) — the scale path. Each vector gets a
  short sign-bit bucket id; only same-bucket pairs are compared. Buckets
  are deterministic (fixed integer hyperplanes), so results are stable.

- IVF (inverted file) — the other standard scale path: a KMeans coarse
  quantizer assigns every vector to a cell; a query probes only its
  ``nprobe`` nearest cells. Index build is a one-time MLlib fit; search is
  an equi-join on cell id. With nprobe = n_cells it degrades gracefully to
  the exact answer (tested).
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


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    max_train: int = 100_000,
) -> list[list[float]]:
    """Fit the IVF coarse quantizer (KMeans) and return its centers.

    The fit runs on a bounded sample — a coarse quantizer only needs a
    sketch of the distribution, so index build stays O(max_train) no matter
    the corpus size. Centers are k×dim doubles: tiny, safe to collect and
    re-broadcast as literals."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # cluster L2-normalized vectors: on the unit sphere, euclidean order ==
    # cosine order, so the cells align with the metric the search uses
    nv = with_norm(as_double_vec(corpus))
    train = nv.select(
        array_to_vector(
            F.transform(F.col("vec"), lambda x: x / F.col("norm"))
        ).alias("features")
    )
    n = train.count()
    if n > max_train:
        train = train.sample(fraction=max_train / n, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(train)
    return [[float(v) for v in c] for c in model.clusterCenters()]


def _l2sq(a: F.Column, b: F.Column) -> F.Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    n_cells: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k: assign corpus vectors to their nearest
    centroid cell, explode each query to its ``nprobe`` nearest cells, then
    equi-join on cell id and rank exactly within the probed slice.

    Scale shape: the only shuffle is the equi-join on cell id; per-query
    compute is nprobe/n_cells of the corpus instead of all of it. All
    assignment arithmetic is zip_with/aggregate folds inside codegen —
    the MLlib model never appears in the query path."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_cells=n_cells)
    cents = F.array(
        *[F.array(*[F.lit(v) for v in c]) for c in centroids]
    )

    def cell_of(vec: F.Column) -> F.Column:
        dists = F.transform(cents, lambda c: _l2sq(c, vec))
        # argmin: both sides computed by the identical expression → exact match
        return F.array_position(dists, F.array_min(dists)).cast("int")

    def probe_cells(vec: F.Column) -> F.Column:
        dists = F.transform(cents, lambda c: _l2sq(c, vec))
        idx = F.sequence(F.lit(1), F.lit(len(centroids)))
        ranked = F.array_sort(
            F.zip_with(dists, idx, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
        )
        return F.slice(F.transform(ranked, lambda s: s["i"]), 1, nprobe)

    # assign on the unit sphere — centroids were trained on normalized vecs
    unit = F.transform(F.col("vec"), lambda x: x / F.col("norm"))
    c = with_norm(as_double_vec(corpus)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
        cell_of(unit).alias("cell"),
    )
    q = with_norm(as_double_vec(queries)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.explode(probe_cells(unit)).alias("cell"),
    )
    scored = (
        c.join(q, "cell")
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
