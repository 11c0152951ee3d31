"""Similarity-search queries (north star L3) over the embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.operators import similarity as S
from unfccc_documents_database_sandbox_spark.registry import register

_COSINE_CTE = """
v AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
    FROM embeddings
),
vn AS (
    SELECT vec_id, label, vec, sqrt(list_dot_product(vec, vec)) AS norm FROM v
)
"""


@register(
    "sim_topk",
    oracle=f"""
    WITH {_COSINE_CTE},
    q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm FROM vn WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, vn.vec_id AS neighbor_id,
               list_dot_product(q.qvec, vn.vec) / (q.qnorm * vn.norm) AS cos
        FROM q JOIN vn ON vn.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, ROUND(cos, 4) AS score
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
)
def sim_topk(spark, sf_dir):
    """L3 exact brute-force cosine top-k (queries = vec_id < 5, broadcast):
    the ANN baseline. Corpus never shuffles; dot products are zip_with/
    aggregate folds inside codegen — no Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return S.brute_force_topk(emb, queries, k=5)


@register("sim_topk_lsh", oracle=None, tags=("rows-only",))
def sim_topk_lsh(spark, sf_dir):
    """L3 scale path: random-hyperplane LSH buckets → per-bucket exact rank.
    Approximate recall by construction → rows-only check."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return S.lsh_bucket_topk(emb, queries, k=5)


# one-time-per-(session, sf_dir) quantizer fit — the index build is the
# expensive bounded-sample collect; repeated sim_topk_ivf calls (driver
# sweep, bench loop, parity suite) reuse the centroids like a real ANN
# system reuses its index.
_IVF_CENTROIDS: dict[tuple[object, str], list[list[float]]] = {}


@register("sim_topk_ivf", oracle=None, tags=("rows-only",))
def sim_topk_ivf(spark, sf_dir):
    """L3 IVF scale path: KMeans coarse quantizer (one-time fit on a bounded
    sample) → corpus partitioned by nearest-centroid cell → queries probe
    their nprobe nearest cells → exact rank inside the probed slice.
    Approximate recall by construction → rows-only check; exactness when
    nprobe = n_cells is asserted in tests/test_parity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    key = (spark, sf_dir)
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[key] = S.train_ivf_centroids(emb, n_cells=16)
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=4, centroids=_IVF_CENTROIDS[key]
    )


# one-time-per-(session, sf_dir) codebook fit, same reuse pattern as IVF
_PQ_CODEBOOKS: dict[tuple[object, str], list[list[list[float]]]] = {}


@register("sim_topk_pq", oracle=None, tags=("rows-only",))
def sim_topk_pq(spark, sf_dir):
    """L3 product-quantization scale path (Jégou et al., TPAMI 2011):
    corpus encoded to m=8 one-byte codes (32x smaller than the float32
    vectors — the ANN variant whose win is MEMORY, not fewer comparisons),
    queries score via per-query ADC lookup tables summed row-locally over
    the code array. Approximate by construction → rows-only check;
    recall-vs-exact and reconstruction-error bounds are property-tested
    in tests/test_functions.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    key = (spark, sf_dir)
    if key not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[key] = S.train_pq_codebooks(emb, m=8, k=16)
    queries = emb.filter(F.col("vec_id") < 5)
    return S.pq_topk(emb, queries, topk=5, m=8, k=16, codebooks=_PQ_CODEBOOKS[key])


@register(
    "sim_near_dup_pairs",
    oracle=f"""
    WITH {_COSINE_CTE}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.vec, b.vec) / (a.norm * b.norm), 4) AS score
    FROM vn a JOIN vn b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.vec, b.vec) / (a.norm * b.norm) >= 0.4
    """,
)
def sim_near_dup_pairs(spark, sf_dir):
    """L2/L3 embedding-cosine near-dup pairs, blocked on the label column
    (stand-in for an LSH bucket): equi-join shuffle, quadratic only within
    blocks. Threshold 0.4, not a production-ish 0.9: the corpus embeddings
    are uniform random with no planted near-dups (max within-label cosine
    ≈ 0.47 at sf0.01), so 0.9 matched the oracle on an empty result — 0.4
    keeps the key's evidence non-trivial (5 pairs at sf0.01)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_near_dup_pairs(emb, block_col="label", threshold=0.4)
