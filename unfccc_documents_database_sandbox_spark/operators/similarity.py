"""Similarity search over embedding columns (north star L3).

Two paths, mirroring how a 100 TB ANN pipeline is actually built:
- brute-force cosine top-k — the exact baseline. Queries are broadcast
  (they're few); the corpus streams through map-side — no corpus shuffle,
  O(|Q|·N) JVM-side arithmetic via zip_with/aggregate (no Python).
- LSH-bucketed (random hyperplane) — the scale path. Each vector gets a
  short sign-bit bucket id; only same-bucket pairs are compared. Buckets
  are deterministic (fixed integer hyperplanes), so results are stable.

- IVF (inverted file) — the other standard scale path: a k-means coarse
  quantizer assigns every vector to a cell; a query probes only its
  ``nprobe`` nearest cells. Index build is a one-time numpy Lloyd fit on a
  bounded sample; search is an equi-join on cell id. With nprobe = n_cells
  it degrades gracefully to the exact answer (tested).
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
    # r17 (guide §2.5): the corpus side feeds a BroadcastNestedLoopJoin
    # (non-equi != condition) and inherits the parquet scan's few
    # row-group splits — spread() it so the per-pair dot products use
    # the whole core count (adaptive no-op when already wide).
    from unfccc_documents_database_sandbox_spark.catalog import spread

    c = with_norm(as_double_vec(spread(corpus))).select(
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
    iters: int = 10,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Fit the IVF coarse quantizer: Lloyd's k-means on a bounded,
    L2-normalized sample, driver-side in numpy.

    A coarse quantizer needs only a sketch of the distribution, so the
    standard practice (FAISS does the same) is to train on a sample that
    fits one machine: collect ≤ max_train vectors (≈50 MB at 100k×64),
    iterate in vectorized numpy — no per-iteration cluster jobs. Index
    build cost is O(max_train·n_cells·iters) regardless of corpus size.
    Normalized vectors make euclidean cells align with cosine ranking.

    The sample is the max_train LOWEST ids (TakeOrdered — a top-k heap, no
    full sort materialization): a bare limit() on an unordered DataFrame
    picks whatever partitions answer first, so centroids — and every
    downstream cell assignment — would vary across runs and partition
    layouts despite the fixed seed. Zero vectors are dropped before the
    normalize divide (they carry no direction to cluster)."""
    import numpy as np

    sample = (
        corpus.select(F.col(id_col).alias("i"), F.col("embedding").alias("e"))
        .orderBy("i")
        .limit(max_train)
    )
    x = np.array([r.e for r in sample.collect()], dtype="float64")
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x[norms[:, 0] > 0]
    x /= norms[norms[:, 0] > 0].reshape(-1, 1)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        # squared L2 via the expansion: argmin over cells of |c|² - 2c·v
        d = (cents * cents).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
        assign = d.argmin(axis=1)
        for j in range(len(cents)):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


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
    compute is nprobe/n_cells of the corpus instead of all of it. Cell
    assignment is a vectorized pandas UDF — one (batch × dim)·(dim × cells)
    matmul per Arrow batch. (Spark's higher-order array functions are
    interpreted, not codegen'd: an expression-tree argmin over 16 centroids
    measured ~10× slower than the matmul UDF.)"""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_cells=n_cells)
    cents = np.array(centroids, dtype="float64")
    cnorm2 = (cents * cents).sum(axis=1)
    n_probe = min(nprobe, len(centroids))

    def _unit(vecs):
        x = np.array(vecs.tolist(), dtype="float64")
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0  # zero vectors stay zero instead of NaN-ing the batch
        return x / n

    @pandas_udf("int")
    def cell_of(vecs):
        d = cnorm2[None, :] - 2.0 * (_unit(vecs) @ cents.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    @pandas_udf("array<int>")
    def probe_cells(vecs):
        d = cnorm2[None, :] - 2.0 * (_unit(vecs) @ cents.T)
        order = np.argsort(d, axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    c = with_norm(as_double_vec(corpus)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
        cell_of(F.col("vec")).alias("cell"),
    )
    q = with_norm(as_double_vec(queries)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.explode(probe_cells(F.col("vec"))).alias("cell"),
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


# ADC-style query sets are collected driver-side (each query precomputes a
# lookup table, so queries must be few by construction). Bound the collect so
# an oversized query DataFrame fails loudly instead of OOMing the driver —
# the same explicit-bound contract as train_ivf_centroids' max_train.
_MAX_ADC_QUERIES = 10_000


def _bounded_query_rows(queries: DataFrame, id_col: str) -> list:
    """Collect the query set for driver-side ADC table construction, capped
    at _MAX_ADC_QUERIES (limit+1 probe — no extra count() job): past that
    size the broadcast-table design is wrong and the caller should batch or
    use the corpus-side variants instead."""
    rows = queries.select(id_col, "embedding").limit(_MAX_ADC_QUERIES + 1).collect()
    if len(rows) > _MAX_ADC_QUERIES:
        raise ValueError(
            f"ADC query set exceeds {_MAX_ADC_QUERIES} rows; per-query lookup "
            "tables are a broadcast-side structure — batch the queries or use "
            "lsh_bucket_topk/ivf_topk for corpus-vs-corpus workloads"
        )
    return rows


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    max_train: int = 100_000,
    iters: int = 10,
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Fit product-quantization codebooks: split the D-dim space into ``m``
    subspaces of D/m dims and run Lloyd's k-means (``k`` centroids) in each,
    driver-side in numpy on a bounded, deterministically-chosen sample —
    the same FAISS-style bounded-fit pattern as train_ivf_centroids, and
    the same reproducibility rule (sample = lowest ids, fixed seed).
    Vectors are L2-normalized first so ADC dot products rank like cosine.
    Returns m × k × (D/m) nested lists."""
    import numpy as np

    sample = (
        corpus.select(F.col(id_col).alias("i"), F.col("embedding").alias("e"))
        .orderBy("i")
        .limit(max_train)
    )
    x = np.array([r.e for r in sample.collect()], dtype="float64")
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x[norms[:, 0] > 0]
    x /= norms[norms[:, 0] > 0].reshape(-1, 1)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} must divide evenly into {m} subspaces")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cents = xs[rng.choice(len(xs), size=min(k, len(xs)), replace=False)]
        for _ in range(iters):
            dist = (cents * cents).sum(axis=1)[None, :] - 2.0 * (xs @ cents.T)
            assign = dist.argmin(axis=1)
            for c in range(len(cents)):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    topk: int = 5,
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Product-quantization approximate cosine top-k via asymmetric
    distance computation (ADC — Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011).

    Corpus vectors are ENCODED once to m uint8 codes (m bytes instead of
    D×4 — 32× smaller at D=64/m=8/float32): per subspace, the index of the
    nearest codebook centroid, computed as one matmul per Arrow batch in a
    vectorized pandas UDF. Queries stay EXACT: each query precomputes a
    flat m×k table of its subvector·centroid dot products (numpy,
    driver-side — queries are few), and the approximate score of a corpus
    vector is the sum of m table lookups by its codes — a row-local
    F.aggregate over the code array after the broadcast query join; no
    Python in the corpus-scan hot path, no shuffle except the final
    per-query top-k rank.

    At 100 TB this is the memory story the other ANN variants lack: the
    scan ships bytes, not vectors (the exact re-rank slice, if wanted,
    re-reads only the top candidates). Approximate by construction →
    rows-only key; recall-vs-exact and reconstruction-error bounds are
    property-tested in tests/test_functions.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, m=m, k=k, id_col=id_col)
    books = np.array(codebooks, dtype="float64")  # m × k × sub
    n_sub, n_cent, sub = books.shape

    def _unit(vecs):
        x = np.array(vecs.tolist(), dtype="float64")
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    @pandas_udf("array<int>")
    def encode(vecs):
        x = _unit(vecs)
        codes = np.empty((len(x), n_sub), dtype="int32")
        for j in range(n_sub):
            xs = x[:, j * sub : (j + 1) * sub]
            cents = books[j]
            dist = (cents * cents).sum(axis=1)[None, :] - 2.0 * (xs @ cents.T)
            codes[:, j] = dist.argmin(axis=1)
        return pd.Series(list(codes))

    # per-query flat ADC table: table[j*k + c] = q_sub_j · centroid_c
    q_rows = _bounded_query_rows(queries, id_col)
    qx = _unit(pd.Series([r.embedding for r in q_rows]))
    tables = []
    for qi, r in enumerate(q_rows):
        t = np.concatenate(
            [qx[qi, j * sub : (j + 1) * sub] @ books[j].T for j in range(n_sub)]
        )
        tables.append((r[0], [float(v) for v in t]))
    q = F.broadcast(
        corpus.sparkSession.createDataFrame(
            tables, f"query_id long, adc array<double>"
        )
    )

    enc = corpus.select(F.col(id_col).alias("neighbor_id"), encode("embedding").alias("codes"))
    scored = (
        enc.join(q, F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score_raw",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(n_sub - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    "adc", (j * n_cent + F.element_at("codes", j + 1) + 1).cast("int")
                ),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "rank", F.round("score_raw", 4).alias("score"))
    )


def train_ivfpq_index(
    corpus: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    max_train: int = 100_000,
    iters: int = 10,
    id_col: str = "vec_id",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Fit the composed IVF+PQ index (Jégou et al., TPAMI 2011 §V: IVFADC):
    the IVF coarse quantizer first, then PQ codebooks trained on the
    RESIDUALS (unit vector − assigned centroid) — residuals are what the
    codes must reconstruct once the coarse cell has absorbed the vector's
    rough position, and quantizing them is what lets an m-byte code stay
    accurate at 100 TB corpus scale. Same bounded-sample / fixed-seed /
    lowest-ids reproducibility contract as train_ivf_centroids.
    Returns (centroids n_cells × D, codebooks m × k × D/m)."""
    import numpy as np

    centroids = train_ivf_centroids(
        corpus, n_cells=n_cells, seed=seed, max_train=max_train,
        iters=iters, id_col=id_col,
    )
    cents = np.array(centroids, dtype="float64")

    sample = (
        corpus.select(F.col(id_col).alias("i"), F.col("embedding").alias("e"))
        .orderBy("i")
        .limit(max_train)
    )
    x = np.array([r.e for r in sample.collect()], dtype="float64")
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x[norms[:, 0] > 0]
    x /= norms[norms[:, 0] > 0].reshape(-1, 1)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} must divide evenly into {m} subspaces")
    sub = d // m
    # residuals w.r.t. each vector's assigned cell
    dist = (cents * cents).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
    resid = x - cents[dist.argmin(axis=1)]
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        xs = resid[:, j * sub : (j + 1) * sub]
        bk = xs[rng.choice(len(xs), size=min(k, len(xs)), replace=False)]
        for _ in range(iters):
            dd = (bk * bk).sum(axis=1)[None, :] - 2.0 * (xs @ bk.T)
            assign = dd.argmin(axis=1)
            for c in range(len(bk)):
                members = xs[assign == c]
                if len(members):
                    bk[c] = members.mean(axis=0)
        books.append([[float(v) for v in c] for c in bk])
    return centroids, books


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    topk: int = 5,
    id_col: str = "vec_id",
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k: int = 16,
    refine: int = 4,
    index: tuple[list[list[float]], list[list[list[float]]]] | None = None,
) -> DataFrame:
    """Composed IVF+PQ approximate cosine top-k — the production 100 TB ANN
    shape (VERDICT r06 #4; FAISS IndexIVFPQ): IVF cell pruning decides WHICH
    vectors a query even looks at, PQ/ADC decides how cheaply each candidate
    is scored. Neither half alone survives 100 TB: plain IVF still ships
    full float vectors through the probe join; plain PQ still scans every
    code. Composed, the scan ships (cell int + m bytes) per vector and each
    query touches ~nprobe/n_cells of them.

    Pipeline:
    - ENCODE (one Arrow-batched pandas UDF pass over the corpus): unit-
      normalize, assign the nearest IVF centroid, PQ-encode the RESIDUAL
      (u − centroid) — one matmul per subspace per batch, no per-row Python.
    - QUERY (driver-side, bounded by _MAX_ADC_QUERIES): for each query and
      each of its nprobe nearest cells, one row (query_id, cell, bias, adc)
      where bias = u_q · centroid_cell (the coarse term of the decomposed
      inner product u_q · (centroid + residual_recon)) and adc[j*k + c] =
      u_q_sub_j · codebook[j][c] (the residual term's lookup table — cell-
      independent under inner product, shipped per probe row for a
      single-equi-join plan).
    - SCORE: equi-join on cell (the ONLY corpus shuffle — and on a real
      cluster a cell-partitioned layout makes it a pruned scan instead),
      score = bias + Σ_j adc[j*k + codes_j] as a row-local JVM fold, then
      an ADC shortlist of refine×topk per query.
    - REFINE (FAISS IndexRefineFlat; refine=0 skips it): re-score only the
      shortlist with exact cosine by joining the refine×topk×|Q| survivor
      ids back to the full vectors — the standard fix for PQ quantization
      loss that re-reads O(|Q|·refine·topk) vectors, not the corpus. The
      returned score is then the exact cosine of the survivors, so recall
      matches plain IVF whenever the true neighbors survive the shortlist.

    Approximate by construction → rows-only key; the ADC decomposition
    exactness, cell-pruning containment, and recall-vs-IVF floor are
    property-tested in tests/test_functions.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if index is None:
        index = train_ivfpq_index(
            corpus, n_cells=n_cells, m=m, k=k, id_col=id_col
        )
    centroids, codebooks = index
    cents = np.array(centroids, dtype="float64")
    cnorm2 = (cents * cents).sum(axis=1)
    books = np.array(codebooks, dtype="float64")  # m × k × sub
    n_sub, n_cent, sub = books.shape
    n_probe = min(nprobe, len(centroids))

    def _unit(vecs):
        x = np.array(vecs.tolist(), dtype="float64")
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return x / n

    @pandas_udf("struct<cell: int, codes: array<int>>")
    def encode(vecs):
        x = _unit(vecs)
        d = cnorm2[None, :] - 2.0 * (x @ cents.T)
        cell = d.argmin(axis=1)
        resid = x - cents[cell]
        codes = np.empty((len(x), n_sub), dtype="int32")
        for j in range(n_sub):
            xs = resid[:, j * sub : (j + 1) * sub]
            bk = books[j]
            dist = (bk * bk).sum(axis=1)[None, :] - 2.0 * (xs @ bk.T)
            codes[:, j] = dist.argmin(axis=1)
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "codes": list(codes)}
        )

    # query side: nprobe rows per query — (query_id, cell, bias, adc)
    q_rows = _bounded_query_rows(queries, id_col)
    qx = _unit(pd.Series([r.embedding for r in q_rows]))
    qd = cnorm2[None, :] - 2.0 * (qx @ cents.T)
    probe = np.argsort(qd, axis=1)[:, :n_probe]
    probe_rows = []
    for qi, r in enumerate(q_rows):
        adc = np.concatenate(
            [qx[qi, j * sub : (j + 1) * sub] @ books[j].T for j in range(n_sub)]
        )
        adc_l = [float(v) for v in adc]
        for cell in probe[qi]:
            bias = float(qx[qi] @ cents[cell])
            probe_rows.append((r[0], int(cell), bias, adc_l))
    q = F.broadcast(
        corpus.sparkSession.createDataFrame(
            probe_rows, "query_id long, cell int, bias double, adc array<double>"
        )
    )

    enc = corpus.select(
        F.col(id_col).alias("neighbor_id"), encode("embedding").alias("e")
    ).select("neighbor_id", F.col("e.cell").alias("cell"), F.col("e.codes").alias("codes"))
    scored = (
        enc.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score_raw",
            F.col("bias")
            + F.aggregate(
                F.sequence(F.lit(0), F.lit(n_sub - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    "adc", (j * n_cent + F.element_at("codes", j + 1) + 1).cast("int")
                ),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score_raw").desc(), F.col("neighbor_id"))
    if not refine:
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= topk)
            .select("query_id", "neighbor_id", "rank", F.round("score_raw", 4).alias("score"))
        )

    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= refine * topk)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank: full vectors only for the shortlist survivors
    c = with_norm(as_double_vec(corpus)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    qv = F.broadcast(
        with_norm(as_double_vec(queries)).select(
            F.col(id_col).alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
        )
    )
    refined = (
        shortlist.join(c, "neighbor_id")
        .join(qv, "query_id")
        .withColumn("cos", dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        refined.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= topk)
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
    # r17 (guide §2.5): the probe side of the broadcast self-join inherits
    # the parquet scan's split count (a handful of row groups), so the
    # CPU-bound within-block dot products ran ~4-wide on 32 cores — AQE
    # can't help because the stage is tiny in BYTES. spread() the probe
    # side only (the build side broadcasts either way); row-local compute
    # + equi-join, so the pair set is unchanged.
    from unfccc_documents_database_sandbox_spark.catalog import spread

    a, b = spread(v).alias("a"), v.alias("b")
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
