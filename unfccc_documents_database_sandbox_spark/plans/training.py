"""Training-data pipeline operators, round 6 (north star L4 extensions):
corpus vocabulary build, TF-IDF term weighting, sliding-window chunking,
BPE pair statistics, and a bigram conditional LM table — the tokenizer- and
LM-adjacent preprocessing a 100 TB pretraining pipeline runs between raw
text and batch packing (reference tie-in: tiktoken at requirements.txt:67
and the summarize-then-train flow of generate_decisions_summaries.py are
the reference's only brush with this layer; everything here is the scaled
Spark-native restatement).

Scale design notes shared by these plans:
- tokenization stays JVM-side (split/transform/explode — no Python UDFs);
  explode fans out rows but never materializes the corpus on the driver.
  The aggregating keys spread() the scan first (catalog.spread — the
  similarity/minhash precedent): a row-group-bound parquet scan can hand
  the whole corpus to one task, and tokenization is the CPU-heavy step;
  chunking stays map-only (no spread — it claims, and tests pin, a
  zero-exchange plan; scan parallelism governs it at scale).
- term-level aggregates (vocab, DF, pair counts) shuffle on the term key,
  which is zipfian at corpus scale — every groupBy here is a partial-agg
  (map-side combine) shape where the hot term's partials collapse per
  task before the shuffle, so the skew that breaks naive row-shuffles
  (index_inverted's docstring hazard) never ships raw postings.
- doc→term joins broadcast the term side: a real vocabulary (even 1M
  terms × a few counters) is megabytes — the canonical broadcast dim.
- determinism: counts are bigint-exact; ratio scores are single double
  divisions of exact integers (log-free idf — java.lang.Math.log and
  libm ln can differ in the last ulp, so scores that must hash-match
  across engines avoid transcendental calls entirely); every ordering
  tie-breaks on the term / id.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unfccc_documents_database_sandbox_spark.catalog import load_table, spread
from unfccc_documents_database_sandbox_spark.registry import register

_VOCAB_MIN_FREQ = 20

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


@register(
    "text_vocab",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    cnt AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
        FROM tok WHERE token <> '' GROUP BY token
        HAVING COUNT(*) >= {_VOCAB_MIN_FREQ}
    )
    SELECT token, freq,
           CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT)
               AS vocab_id
    FROM cnt
    """,
)
def text_vocab(spark, sf_dir):
    """Corpus vocabulary build: token -> (frequency, dense id), min-count
    pruned. The id assignment is the deterministic (freq DESC, token)
    rank — the contract a downstream tokenizer needs to reproduce ids
    without re-reading the corpus. Scale: explode + partial-agg count on
    the term key; the final global rank runs over the PRUNED vocabulary
    (orders of magnitude smaller than the corpus), so the single-partition
    window is a dim-sized sort, not a corpus sort."""
    d = spread(load_table(spark, sf_dir, "documents"))
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("freq"))
        .filter(F.col("freq") >= _VOCAB_MIN_FREQ)
    )
    w = Window.orderBy(F.col("freq").desc(), "token")
    return cnt.select(
        "token", "freq", F.row_number().over(w).cast("long").alias("vocab_id")
    )


@register(
    "text_tfidf",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE term <> '' GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               ROUND(tf.tf * (2 * n.n_docs - 2 * df.df + 1)
                     / CAST(2 * df.df + 1 AS DOUBLE), 6) AS score
        FROM tf, df, n WHERE tf.term = df.term
    )
    SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def text_tfidf(spark, sf_dir):
    """TF-IDF top-3 terms per document. The idf is the BM25-flavored ratio
    (N - df + 0.5)/(df + 0.5) written as an exact-integer fraction
    (2N - 2df + 1)/(2df + 1) — log-free so the double is ONE division of
    exact bigints and hashes identically across engines. Scale: the DF
    table is vocabulary-sized -> broadcast to the doc-term side (no
    corpus shuffle for the join); the per-doc top-3 window partitions on
    doc_id, the natural data key."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        spread(d).select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    # N as a LAZY one-row aggregate cross-joined in (mirrors the oracle's n
    # CTE) — an eager d.count() would block the build with an extra job
    # (the basket_pairs review lesson, applied consistently)
    n = d.agg(F.count("*").cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (2 * F.col("n_docs") - 2 * F.col("df") + 1)
                / (2 * F.col("df") + 1).cast("double"),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )


@register(
    "text_chunk_sliding",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n FROM documents
    ),
    idx AS (
        SELECT doc_id, toks, n,
               unnest(generate_series(0,
                   CASE WHEN n <= {_CHUNK_SIZE} THEN 0
                        ELSE CAST(ceil((n - {_CHUNK_SIZE})
                                  / {_CHUNK_STRIDE}.0) AS BIGINT) END))
                   AS chunk_idx
        FROM t
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(GREATEST(LEAST(chunk_idx * {_CHUNK_STRIDE},
                               n - {_CHUNK_SIZE}), 0) AS BIGINT) AS start,
           CAST(LEAST(n - GREATEST(LEAST(chunk_idx * {_CHUNK_STRIDE},
                                         n - {_CHUNK_SIZE}), 0),
                      {_CHUNK_SIZE}) AS BIGINT) AS chunk_len,
           array_to_string(toks[
               GREATEST(LEAST(chunk_idx * {_CHUNK_STRIDE},
                              n - {_CHUNK_SIZE}), 0) + 1 :
               GREATEST(LEAST(chunk_idx * {_CHUNK_STRIDE},
                              n - {_CHUNK_SIZE}), 0) + {_CHUNK_SIZE}],
               ' ') AS chunk_text
    FROM idx
    """,
)
def text_chunk_sliding(spark, sf_dir):
    """Sliding-window document chunking (size 32, stride 24) — the
    standard context-window preparation step. Start offsets are CLAMPED to
    n - size so the final chunk is always full-width when the doc allows
    (no overlap-dominated tail fragment); docs shorter than one window
    yield exactly one chunk. Scale: pure per-row JVM expressions
    (sequence/transform/posexplode) — chunking is embarrassingly parallel,
    no shuffle at all; the fan-out multiplies rows ~n/stride, which is the
    same growth the downstream trainer requires anyway. Integer note:
    ceil((n-size)/stride) is written (n-size+stride-1) DIV stride —
    Spark's DIV truncates toward zero, so the -(-x DIV y) idiom would
    under-count chunks whenever stride doesn't divide n-size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_extra = F.expr(
        f"(size(split(text, ' ')) - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)"
        f" DIV {_CHUNK_STRIDE}"
    )
    n_last = F.when(n <= _CHUNK_SIZE, F.lit(0)).otherwise(n_extra)
    starts = F.transform(
        F.sequence(F.lit(0), n_last),
        lambda i: F.greatest(
            F.least(i * _CHUNK_STRIDE, n - _CHUNK_SIZE), F.lit(0)
        ),
    )
    exploded = d.select(
        "doc_id",
        toks.alias("toks"),
        n.alias("n"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start"),
        F.least(F.col("n") - F.col("start"), F.lit(_CHUNK_SIZE))
        .cast("long")
        .alias("chunk_len"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start") + 1, _CHUNK_SIZE), " "
        ).alias("chunk_text"),
    )


@register(
    "text_bpe_pairs",
    oracle="""
    WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wfreq
        FROM w WHERE length(word) >= 2 GROUP BY word
    ),
    pairs AS (
        SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, wfreq
        FROM wc, unnest(generate_series(1, length(word) - 1)) AS g(i)
    )
    SELECT pair, CAST(SUM(wfreq) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair LIMIT 50
    """,
)
def text_bpe_pairs(spark, sf_dir):
    """BPE training, merge-candidate step: corpus-wide adjacent symbol-pair
    frequencies (the statistic argmaxed by every byte-pair-encoding merge
    iteration, Sennrich et al. 2016). Scale: the word-frequency table is
    computed FIRST (zipfian partial-agg), so pair explosion runs over
    DISTINCT words weighted by count — corpus size drops out of the
    expensive fan-out entirely; pair space is at most |alphabet|^2."""
    d = spread(load_table(spark, sf_dir, "documents"))
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wfreq"))
    )
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "wfreq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wfreq").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), "pair")
        .limit(50)
    )


@register(
    "text_bigram_cond",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n FROM documents
    ),
    bi AS (
        SELECT toks[CAST(i AS INTEGER)] AS w1,
               toks[CAST(i AS INTEGER) + 1] AS w2
        FROM t, unnest(generate_series(1, n - 1)) AS g(i)
        WHERE n >= 2
    ),
    bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
        FROM bi WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2
    ),
    uc AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1 FROM bc GROUP BY w1)
    SELECT bc.w1, bc.w2, bc.c, uc.c1,
           ROUND(bc.c / CAST(uc.c1 AS DOUBLE), 6) AS p_cond
    FROM bc, uc WHERE bc.w1 = uc.w1
    ORDER BY bc.c DESC, bc.w1, bc.w2 LIMIT 100
    """,
)
def text_bigram_cond(spark, sf_dir):
    """Bigram conditional LM table: P(w2|w1) = c(w1 w2)/c(w1 ·) as one
    double division of exact bigint counts, top-100 bigrams. The simplest
    LM artifact a data pipeline materializes (and the n-gram-LM quality
    signal of Gopher/CCNet-style filters). Scale: bigram extraction is a
    per-row zip of the token array with its tail (no shuffle); both
    aggregations are zipfian-key partial-aggs; the unigram totals derive
    from the ALREADY-AGGREGATED bigram table (vocabulary-sized input) and
    broadcast back onto it."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    bi = d.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = (
        bi.filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c"))
    )
    uc = bc.groupBy("w1").agg(F.sum("c").cast("long").alias("c1"))
    return (
        bc.join(F.broadcast(uc), "w1")
        .select(
            "w1",
            "w2",
            "c",
            "c1",
            F.round(F.col("c") / F.col("c1").cast("double"), 6).alias("p_cond"),
        )
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(100)
    )
