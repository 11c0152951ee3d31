"""Dedup queries (north star L1/L2) over the documents table."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import load_table
from unfccc_documents_database_sandbox_spark.operators import dedup as D
from unfccc_documents_database_sandbox_spark.registry import register


@register(
    "dedup_exact",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, text
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark, sf_dir):
    """L1 exact dedup: canonical (min-id) row per distinct text — one
    shuffle on the text hash, no window."""
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_hash_sha",
    oracle="""
    SELECT sha256(text) AS text_sha, CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id
    FROM documents GROUP BY sha256(text)
    """,
)
def dedup_hash_sha(spark, sf_dir):
    """L1 content-hash dedup ledger: at 100 TB you group on a 32-byte
    digest, not the document body (tiny shuffle payload)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.sha2("text", 256).alias("text_sha")).agg(
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.min("doc_id").cast("long").alias("keeper_id"),
    )


@register("dedup_fuzzy_minhash", oracle=None, tags=("rows-only",))
def dedup_fuzzy_minhash(spark, sf_dir):
    """L2 MinHash+LSH near-dup pairs (shingle → minhash → band → bucket
    join → exact-Jaccard verify). xxhash64 isn't portable to DuckDB →
    rows-only check; the Jaccard math itself is oracle-covered by
    dedup_ngram_jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, threshold=0.8)


@register("dedup_simhash", oracle=None, tags=("rows-only",))
def dedup_simhash(spark, sf_dir):
    """L2 SimHash near-dup pairs (64-bit sign-sum signature, chunk-banded
    Hamming search). xxhash64-based → rows-only check."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, max_hamming=3)


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH grams AS (
        SELECT DISTINCT doc_id, lang, source,
               w.word || ' ' || lead(w.word) OVER
                   (PARTITION BY doc_id ORDER BY w.seq) AS gram
        FROM (
            SELECT doc_id, lang, source,
                   CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS seq,
                   unnest(string_split(text, ' ')) AS word
            FROM documents
        ) w
    ),
    grams2 AS (SELECT * FROM grams WHERE gram IS NOT NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams2 GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM grams2 a JOIN grams2 b
          ON a.gram = b.gram AND a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """L2 exact bigram-Jaccard near-dup pairs, blocked by (lang, source),
    with a PPJoin-style PREFIX FILTER inside each block.

    The r01 plan joined full gram sets within each block; block sizes grow
    linearly with the corpus, so the within-block join trended quadratic.
    Prefix filtering keeps the result EXACT (oracle unchanged) while
    bounding the candidate join: order each doc's grams globally by
    (document frequency, gram), keep only the rarest
    |A| - ceil(t*|A|) + 1 grams as its prefix — two docs with
    J >= t MUST share a prefix gram (pigeonhole on the canonical order) —
    then join prefixes, and verify candidates on full gram sets.
    ceil(t*sz) is computed in integer arithmetic (80*sz/100): a double
    0.8*sz can land epsilon above an exact integer and over-shrink the
    prefix, silently dropping true pairs."""
    from unfccc_documents_database_sandbox_spark.catalog import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    return bigram_jaccard_pairs(docs, threshold_pct=80)


@register(
    "dedup_components",
    oracle="""
    WITH RECURSIVE grams AS (
        SELECT DISTINCT doc_id, lang, source,
               w.word || ' ' || lead(w.word) OVER
                   (PARTITION BY doc_id ORDER BY w.seq) AS gram
        FROM (
            SELECT doc_id, lang, source,
                   CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS seq,
                   unnest(string_split(text, ' ')) AS word
            FROM documents
        ) w
    ),
    grams2 AS (SELECT * FROM grams WHERE gram IS NOT NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams2 GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
        FROM grams2 a JOIN grams2 b
          ON a.gram = b.gram AND a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.4
    ),
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT e.d AS id, reach.r FROM reach JOIN edges e ON e.s = reach.id
    )
    SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS component_id
    FROM reach GROUP BY id
    """,
)
def dedup_components(spark, sf_dir):
    """L2 final step: near-dup PAIRS → duplicate CLUSTERS. Edges are exact
    bigram-Jaccard >= 0.4 pairs (shared prefix-filtered builder); clusters
    come from iterative min-label propagation (operators/dedup.py::
    connected_components — the genuinely iterative, non-single-SQL-pass
    operator); every document gets component_id = min doc_id reachable
    through the pair graph (singletons label themselves). The DuckDB twin
    proves it with a recursive transitive-closure CTE."""
    from unfccc_documents_database_sandbox_spark.catalog import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = bigram_jaccard_pairs(docs, threshold_pct=40)
    labels = D.connected_components(
        docs.select("doc_id"),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        id_col="doc_id",
    )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").cast("long").alias("component_id")
    )


def bigram_jaccard_pairs(docs, threshold_pct: int):
    """Exact bigram-Jaccard pairs >= threshold within (lang, source)
    blocks, prefix-filtered (see dedup_ngram_jaccard docstring). Shared by
    the pair query and the duplicate-cluster (connected components) query."""
    w = Window.partitionBy("doc_id").orderBy("seq")
    words = docs.select(
        "doc_id",
        "lang",
        "source",
        F.posexplode(F.split("text", " ")).alias("seq", "word"),
    )
    grams = (
        words.withColumn("nxt", F.lead("word").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "doc_id", "lang", "source", F.concat_ws(" ", "word", "nxt").alias("gram")
        )
        .distinct()
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    # canonical rarity order: document frequency within the block, gram text
    # as tiebreak — identical for every doc in a block, which is what the
    # prefix-filter guarantee needs.
    freq = grams.groupBy("lang", "source", "gram").agg(
        F.count(F.lit(1)).alias("gram_df")
    )
    pos_w = Window.partitionBy("doc_id").orderBy("gram_df", "gram")
    prefix_len = F.col("sz") - F.ceil(
        F.lit(threshold_pct) * F.col("sz") / F.lit(100)
    ) + 1
    prefix = (
        grams.join(freq, ["lang", "source", "gram"])
        .withColumn("pos", F.row_number().over(pos_w))
        .join(sizes, "doc_id")
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "lang", "source", "gram")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # exact verify over FULL gram sets, restricted to candidates (same-block
    # by construction, so lang/source equality is implied per pair)
    ga = grams.select(F.col("doc_id").alias("id_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("id_b"), "gram")
    inter = (
        cands.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a")
    sb = sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b")
    jac = F.col("n_inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold_pct / 100.0)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )
