"""Data-layout operators: multi-dimensional clustering for scan locality.

Z-ordering (bit-interleaved space-filling curve) is the standard way to
make ONE physical sort order serve range predicates on TWO columns: rows
close in (x, y) space land in the same file, so per-file min/max stats
prune scans on either dimension (the technique behind Delta/Iceberg
OPTIMIZE ZORDER; Morton, 1966). The curve value itself is pure integer bit
arithmetic — whole-stage-codegen'd JVM expressions here, and expressible
in ANSI SQL for the oracle twin, so the key is exact-hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import load_table, pin
from unfccc_documents_database_sandbox_spark.registry import register

_BITS = 8  # 8 bits per dimension → 16-bit z-value, 65536 cells


def _snap_create(spark, root, df, **kw):
    """Fixture-root create-or-replace: plan builders rebuild the same
    deterministic .csv_tmp/ roots every run, so they opt in to
    ``overwrite=True`` explicitly (create() itself now refuses to
    clobber an existing table — r09 ADVICE #3)."""
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    return snap.create(spark, root, df, overwrite=True, **kw)


def _z_sql(x: str, y: str) -> str:
    """ANSI-SQL bit-interleave of the low 8 bits of x (even positions) and
    y (odd positions) — the same arithmetic the Spark expression runs."""
    terms = []
    for i in range(_BITS):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _z_col(x, y):
    """JVM-side bit-interleave (codegen'd; no UDF)."""
    z = F.lit(0)
    for i in range(_BITS):
        z = z + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return z


@register(
    "layout_zorder",
    oracle=f"""
    WITH d AS (
        SELECT o_orderkey,
               o_custkey % 256 AS x,
               EXTRACT(day FROM o_orderdate) AS y
        FROM orders
    ),
    z AS (SELECT o_orderkey, x, y, {_z_sql('x', 'y')} AS zval FROM d)
    SELECT CAST(zval // 1024 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS x_lo, CAST(MAX(x) AS BIGINT) AS x_hi,
           CAST(MIN(y) AS BIGINT) AS y_lo, CAST(MAX(y) AS BIGINT) AS y_hi
    FROM z GROUP BY zval // 1024
    """,
)
def layout_zorder(spark, sf_dir):
    """Z-order clustering audit over orders on (customer, day-of-month):
    interleave the low 8 bits of each dimension into a 16-bit Morton
    value, range-bucket it by integer division (bucket = zval DIV 1024 →
    shuffle-free, unlike ntile's global sort), and report each
    bucket's (x, y) bounding box. The tight per-bucket min/max boxes in
    the output ARE the point: written as files in this order, a predicate
    on EITHER column prunes most buckets via footer stats. At 100 TB this
    bucket id is the repartitionByRange / write-partition key; the audit
    aggregation here is one map-side-combinable shuffle."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.pmod("o_custkey", F.lit(256)).cast("long").alias("x"),
        F.dayofmonth("o_orderdate").cast("long").alias("y"),
    )
    z = d.select("o_orderkey", "x", "y", _z_col(F.col("x"), F.col("y")).alias("zval"))
    return (
        z.groupBy(F.expr("zval DIV 1024").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").cast("long").alias("x_lo"),
            F.max("x").cast("long").alias("x_hi"),
            F.min("y").cast("long").alias("y_lo"),
            F.max("y").cast("long").alias("y_hi"),
        )
        .select("bucket", "n_rows", "x_lo", "x_hi", "y_lo", "y_hi")
    )


_SHARD_CHARS = 65_536  # target shard payload (chars stand in for bytes)

_MANIFEST_SQL = f"""
    WITH d AS (
        SELECT source, doc_id, n_chars,
               SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS run
        FROM documents
    ),
    s AS (
        SELECT source, doc_id, n_chars,
               (run - n_chars) // {_SHARD_CHARS} AS shard_id
        FROM d
    )
    SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM s GROUP BY source, shard_id
    """


def _with_shard(d):
    """Attach the running-offset shard assignment to a documents frame:
    shard_id = starting-char-offset DIV target, packed per source. Integer
    DIV (not floor of double division) keeps the arithmetic bigint-exact
    at any running-offset magnitude, matching the oracle's //."""
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.withColumn(
        "start_off", F.sum("n_chars").over(w) - F.col("n_chars")
    ).withColumn(
        "shard_id",
        F.expr(f"start_off DIV {_SHARD_CHARS}").cast("long"),
    )


def _manifest(assigned):
    """Aggregate doc-level shard assignments into the shard manifest."""
    return assigned.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


@register("layout_compaction", oracle=_MANIFEST_SQL)
def layout_compaction(spark, sf_dir):
    """Small-file compaction planner: assign documents to ~64 KiB output
    shards by running-offset bin packing (shard = starting-offset DIV
    target), packed per source so shards never mix provenance. The output
    is the shard manifest (doc count, payload size, contiguous doc-id
    range) a rewrite job would consume — the OPTIMIZE/compaction half of
    layout_zorder's clustering story, and the standard fix for the
    small-files problem a 100 TB ingest inevitably produces.

    Scale shape: the running sum partitions by source (no global window);
    the manifest aggregate map-side combines on (source, shard_id). If one
    source dominates, pre-split it by a doc_id range key — same plan, finer
    partitions. Offsets are exact bigint char counts, so the oracle twin
    is hash-exact."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return _manifest(_with_shard(d))


@register("layout_compaction_apply", oracle=_MANIFEST_SQL)
def layout_compaction_apply(spark, sf_dir):
    """The rewrite half of the OPTIMIZE story (VERDICT r05 #4):
    layout_compaction PLANS the shards; this key EXECUTES the plan —
    repartition the full document rows by (source, shard_id) and write
    parquet partitioned the same way, so every shard becomes exactly one
    output file (each (source, shard_id) combination hashes to exactly one
    task, and partitionBy splits that task's output by directory), then
    read the rewritten corpus BACK and re-derive the manifest from it.

    The oracle is the manifest computed from the ORIGINAL table, so a
    hash-green row proves round-trip integrity: the rewrite preserved
    every row and every char of every shard. The one-file-per-shard and
    size-band invariants are pinned in tests/test_scale.py (file counts
    aren't SQL-expressible).

    Scale shape: one shuffle sized by output shards (the repartition), one
    file per shard — the standard small-files fix a 100 TB ingest needs
    (the reference's pandas to_csv sink, generate_decisions_summaries.py:120,
    sidesteps this at toy scale by writing one file total). Like
    source_schema_evolution, the build writes under the repo's .csv_tmp/
    as a side effect — sandbox-scale seam, documented."""
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = os.path.join(repo_root, ".csv_tmp", f"compacted_{tag}")
    d = load_table(spark, sf_dir, "documents")
    assigned = _with_shard(d).drop("start_off")
    (
        assigned.repartition("source", "shard_id")
        .write.mode("overwrite")
        .partitionBy("source", "shard_id")
        .parquet(out)
    )
    # read back under the WRITER's schema: partition-value inference types
    # the partition columns from directory names, so a numeric-looking
    # source ("123", "2024") would come back INT — diverging from the
    # STRING the oracle groups on — and a post-hoc cast could not recover
    # a leading-zero source ("01" -> 1 -> "1"). Supplying the schema
    # disables inference for exactly these columns (r06 review finding).
    back = spark.read.schema(assigned.schema).parquet(out)
    return _manifest(back)


def _version_stats_sql(version: int, where: str) -> str:
    return f"""
    SELECT CAST({version} AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents WHERE {where}
    """


@register(
    "table_snapshot_read",
    oracle=" UNION ALL ".join(
        _version_stats_sql(v, w)
        for v, w in enumerate(
            [
                "doc_id % 3 = 0",
                "doc_id % 3 <= 1",
                "TRUE",
                "(lang = 'de') IS NOT TRUE",
            ]
        )
    ),
)
def table_snapshot_read(spark, sf_dir):
    """Snapshot/commit-log table format end-to-end (VERDICT r06 #6 — the
    transactional story SURVEY §1.4's "Parquet (+ optionally Delta)" was
    missing): build a versioned table under .csv_tmp/ with four commits —
    v0 CREATE (docs with doc_id%3=0), v1/v2 APPEND (the other two thirds),
    v3 copy-on-write DELETE (lang='de') — then TIME-TRAVEL read every
    version and emit each snapshot's stats. The oracle recomputes each
    version's expected contents from the original table (v0..v2 cumulative
    thirds; v3 = everything minus the deleted language), so a hash-green
    row proves snapshot isolation (v0's stats are unchanged by three later
    commits), append visibility, and that the COW delete removed exactly
    the predicate rows and nothing else.

    Scale shape (sources/snapshots.py): the log is O(commits) JSON; reads
    resolve a file list and scan only live files (readers never block on
    writers, old versions are immutable); the delete rewrites ONLY files
    containing matching rows — at 100 TB a 0.1%-selective delete costs
    0.1% of a rewrite. Commit publication is an atomic create-if-absent,
    the optimistic-concurrency protocol Delta runs on object stores
    (conflict and immutability invariants pinned in
    tests/test_snapshots.py). Like layout_compaction_apply, the build
    writes under the repo's .csv_tmp/ — sandbox-scale seam, documented."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snaptable_{tag}")

    d = load_table(spark, sf_dir, "documents")
    _snap_create(spark, root, d.filter(F.col("doc_id") % 3 == 0))
    snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 1))
    snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 2))
    snap.delete_where(spark, root, "lang = 'de'")

    def stats(version: int):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        ).select(
            F.lit(version).cast("long").alias("version"),
            "n_docs", "total_chars", "n_langs", "first_doc", "last_doc",
        )

    return reduce(
        lambda a, b: a.unionByName(b), [stats(v) for v in range(4)]
    )


def _evo_stats_sql(version: int, where: str, evolved: bool) -> str:
    tok = (
        "CAST(SUM(CASE WHEN doc_id % 3 = 2 THEN CAST(FLOOR(n_chars / 5) AS BIGINT) END) AS BIGINT)"
        if evolved else "CAST(NULL AS BIGINT)"
    )
    ntok = (
        "CAST(SUM(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT)"
        if evolved else "CAST(NULL AS BIGINT)"
    )
    return f"""
    SELECT CAST({version} AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST({4 if evolved else 3} AS BIGINT) AS n_cols,
           {ntok} AS tokens_nonnull,
           {tok} AS sum_tokens
    FROM documents WHERE {where}
    """


@register(
    "table_schema_evolution",
    oracle=" UNION ALL ".join(
        _evo_stats_sql(v, w, e)
        for v, (w, e) in enumerate(
            [
                ("doc_id % 3 = 0", False),
                ("doc_id % 3 <= 1", False),
                ("TRUE", True),
                ("TRUE", True),
            ]
        )
    ),
)
def table_schema_evolution(spark, sf_dir):
    """Schema evolution + VACUUM on the snapshot table (VERDICT r07 #3):
    v0 CREATE (doc_id%3=0, 3 columns), v1 APPEND (%3=1 — schema-validated,
    a mismatched append now raises instead of silently truncating), v2
    EVOLVE_SCHEMA (%3=2 rows carrying a NEW n_tokens column as one
    schema-bearing commit — history null-fills it at scan, no rewrite),
    v3 OPTIMIZE compaction, then VACUUM(retain=2) physically reclaims the
    pre-compaction layout. The emitted per-version stats prove: pre-
    evolution time travel keeps the OLD 3-column schema (n_cols), the
    null-fill is exact (tokens_nonnull counts only the %3=2 cohort), the
    evolved sum survives compaction bit-identically, and the post-vacuum
    HEAD read still resolves (v3 row computed AFTER vacuum ran). The
    oracle recomputes every version from the original table. Guard/
    protocol invariants (additive-only, duplicate-merge-keys, racing
    writers, unicode roots) are pinned in tests/test_snapshots.py.

    Scale: evolution is a metadata commit + one append — zero historical
    bytes rewritten; vacuum is a log replay + file-list diff, O(files)."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapevo_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.filter(F.col("doc_id") % 3 == 0))
    snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 1))
    snap.evolve_schema(
        spark,
        root,
        d.filter(F.col("doc_id") % 3 == 2).withColumn(
            "n_tokens", F.floor(F.col("n_chars") / F.lit(5)).cast("long")
        ),
    )
    snap.compact(spark, root, max_files=2)
    snap.vacuum(root, retain_versions=2)

    def stats(version: int):
        df = snap.read(spark, root, version)
        cols = df.columns
        agg = [
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.lit(len(cols)).cast("long").alias("n_cols"),
        ]
        if "n_tokens" in cols:
            agg += [
                F.count("n_tokens").cast("long").alias("tokens_nonnull"),
                F.sum("n_tokens").cast("long").alias("sum_tokens"),
            ]
        else:
            agg += [
                F.lit(None).cast("long").alias("tokens_nonnull"),
                F.lit(None).cast("long").alias("sum_tokens"),
            ]
        return df.agg(*agg).select(
            F.lit(version).cast("long").alias("version"),
            "n_docs", "n_cols", "tokens_nonnull", "sum_tokens",
        )

    return reduce(lambda a, b: a.unionByName(b), [stats(v) for v in range(4)])


@register(
    "table_stats_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    WHERE doc_id BETWEEN 100 AND 299
    """,
)
def table_stats_prune(spark, sf_dir):
    """Min/max data skipping on the snapshot table (the `live_files`
    pruning seam the module docstring deferred — the core Delta/Iceberg
    scan win at 100 TB): every commit records per-file [min, max] stats
    for atomic columns, collected in ONE pass over only the newly written
    files; `read_pruned` then resolves a range predicate against the log
    and scans ONLY files whose stats intersect it, applying the residual
    row filter exactly. The build range-partitions documents by doc_id
    (repartitionByRange → each file covers a tight doc_id band, the
    clustering that makes stats selective — the layout_zorder lesson),
    commits, and reads doc_id ∈ [100, 299]; the oracle recomputes the agg
    from the raw table. That the prune actually SKIPS files (not just
    filters rows) and never changes answers on adversarial layouts is
    pinned in tests/test_snapshots.py.

    Scale: stats ride in O(files) commit JSON; pruning is a log replay
    with zero data I/O, so a 0.1%-selective range on a range-clustered
    100 TB table reads ~0.1% of bytes."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapstats_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.repartitionByRange(8, "doc_id"))
    pruned = snap.read_pruned(spark, root, {"doc_id": (100, 299)})
    return pruned.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


_MOR_V1 = "(lang = 'de') IS NOT TRUE"
_MOR_V2 = f"{_MOR_V1} AND NOT (doc_id % 5 = 0)"


@register(
    "table_delete_mor",
    oracle=" UNION ALL ".join(
        _version_stats_sql(v, w)
        for v, w in enumerate(["TRUE", _MOR_V1, _MOR_V2, _MOR_V2])
    ),
)
def table_delete_mor(spark, sf_dir):
    """Merge-on-read DELETE via deletion vectors (VERDICT r08 #2 — the
    COW-only seam at sources/snapshots.py): v0 CREATE documents, v1 MOR
    DELETE lang='de' (commits a deletion vector of (file, row-position)
    identities — ZERO data files rewritten; reads anti-join the DV at
    scan), v2 MOR DELETE doc_id%5=0 (overlapping files get a superseding
    superset vector), v3 OPTIMIZE (physically drops the DV'd rows and
    retires the vectors). The per-version stats prove: v0 time travel
    still sees everything, each DV read subtracts exactly the predicate
    rows, and the compaction preserves the logical table bit-exactly
    while clearing the DVs. The oracle recomputes every version from the
    raw table. Protocol invariants that aren't SQL-expressible — the
    live file set is UNCHANGED by v1/v2, dv_map supersede-is-superset,
    VACUUM of superseded parts, CDF exactness both via change-data files
    and via DV-delta derivation — are pinned in tests/test_snapshots.py.

    Scale: a 0.001%-selective GDPR-style delete on 100 TB writes
    O(deleted rows) of DV parquet instead of rewriting every containing
    file — deletes become O(changed rows), the reason Delta/Iceberg grew
    deletion vectors; the read-path cost is one hash anti-join keyed on
    (file, position) whose build side is only the deleted positions."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapmor_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.repartition(3))
    snap.delete_where_mor(spark, root, "lang = 'de'")
    snap.delete_where_mor(spark, root, "doc_id % 5 = 0")
    snap.compact(spark, root, max_files=2)

    def stats(version: int):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        ).select(
            F.lit(version).cast("long").alias("version"),
            "n_docs", "total_chars", "n_langs", "first_doc", "last_doc",
        )

    return reduce(
        lambda a, b: a.unionByName(b), [stats(v) for v in range(4)]
    )


@register(
    "table_partition_prune",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    WHERE lang IN ('en', 'de') AND doc_id BETWEEN 100 AND 499
    GROUP BY lang
    """,
)
def table_partition_prune(spark, sf_dir):
    """Partition-aware snapshot commits + log-level partition pruning
    (VERDICT r08 #3 — `read_pruned` was stats-only): the table is CREATEd
    with partition_by=['lang'], so every commit's payload lands under
    Hive-style `lang=<v>` dirs with the per-file partition value recorded
    in the log (Delta's partitionValues); `pruned_files` then resolves a
    partition predicate BEFORE per-file stats — an equality/range on the
    partition column opens ONLY that partition's files, with zero data
    I/O, for every commit and every data type (no stats required). The
    build reads lang∈[de,en] ∧ doc_id∈[100,499]: the lang bound prunes at
    the partition tier, the doc_id bound at the stats tier (the two
    compose), and the residual filter exacts the rows. The duplicated-
    column write keeps lang inside the data files, so the pinned-schema
    file-list read needs no basePath/type-inference reconstruction (the
    layout_compaction_apply lesson). That the prune opens ONLY the named
    partitions' files — and survives append/delete/MERGE/OPTIMIZE (which
    preserves partition boundaries: one file per partition) — is pinned
    in tests/test_snapshots.py.

    Scale: partition pruning is the first cut on any 100 TB table (date/
    tenant/source partitions); it works from O(files) log metadata where
    stats need write-time collection, and composes with `join_dpp`'s
    dynamic pruning on the query side."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snappart_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(
        spark, root, d.repartitionByRange(4, "doc_id"), partition_by=["lang"]
    )
    pruned = snap.read_pruned(
        spark, root, {"lang": ("de", "en"), "doc_id": (100, 499)}
    )
    return (
        pruned.filter(F.col("lang").isin("de", "en"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


@register(
    "table_history",
    oracle="""
    SELECT CAST(version AS BIGINT) AS version, operation,
           CAST(data_change AS BIGINT) AS data_change,
           CAST(schema_change AS BIGINT) AS schema_change,
           CAST(deletion_vector AS BIGINT) AS deletion_vector,
           CAST(change_data AS BIGINT) AS change_data
    FROM (VALUES
        (5, 'merge',      1, 0, 0, 0),
        (4, 'optimize',   0, 0, 0, 0),
        (3, 'delete_mor', 1, 0, 1, 1),
        (2, 'delete',     1, 0, 0, 0),
        (1, 'append',     1, 0, 0, 0),
        (0, 'create',     1, 1, 0, 0)
    ) AS t(version, operation, data_change, schema_change,
           deletion_vector, change_data)
    """,
)
def table_history(spark, sf_dir):
    """DESCRIBE HISTORY for the snapshot table: every commit now records
    its operation name (Delta's commitInfo.operation), and `history()`
    surfaces the audit trail — version, operation, dataChange, and which
    protocol features (schema change, deletion vector, change-data
    files) the commit carries — from log metadata alone, zero data I/O.
    The fixture runs the full operation alphabet (create, append, COW
    delete, MOR delete, OPTIMIZE, MERGE) and the oracle is the exact
    expected trail as a VALUES literal (file COUNTS are excluded — they
    depend on the session's shuffle partitioning, not the protocol).

    Scale: the history of a 100 TB table is O(commits) JSON — the same
    metadata read every writer already does; this is the observability
    surface an operator checks before VACUUM/RESTORE decisions."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snaphist_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.filter(F.col("doc_id") % 3 == 0))
    snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 1))
    snap.delete_where(spark, root, "lang = 'de'")
    snap.delete_where_mor(spark, root, "doc_id % 5 = 0")
    snap.compact(spark, root, max_files=2)
    snap.merge_into(
        spark, root,
        d.filter((F.col("doc_id") % 11 == 0) & (F.col("lang") != "de")
                 & (F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 3 < 2))
        .withColumn("n_chars", F.col("n_chars") + F.lit(7)),
        ["doc_id"],
    )
    rows = [
        (h["version"], h["operation"], int(h["data_change"]),
         int(h["schema_change"]), int(h["deletion_vector"]),
         int(h["change_data"]))
        for h in snap.history(root)
    ]
    return spark.createDataFrame(
        rows,
        "version long, operation string, data_change long, "
        "schema_change long, deletion_vector long, change_data long",
    )


@register(
    "table_update",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    UNION ALL
    SELECT CAST(1 AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_chars
                    + CASE WHEN lang = 'en' THEN 500 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(doc_id) AS BIGINT),
           CAST(MAX(doc_id) AS BIGINT)
    FROM documents
    """,
)
def table_update(spark, sf_dir):
    """Transactional UPDATE on the snapshot table (completing the DML
    alphabet: append/DELETE-COW/DELETE-MOR/MERGE/UPDATE): v0 CREATE all
    documents, v1 `update_where` adds 500 chars to every English doc —
    copy-on-write, rewriting ONLY the files containing matches, with
    each SET expression cast to the column's pinned type so an UPDATE
    can never drift the schema. Per-version stats prove v0 time travel
    is untouched and v1 applied the SET to exactly the predicate rows.
    The commit also writes exact update_preimage/update_postimage
    change-data pairs (Delta CDF's native UPDATE types — the same cdc
    path table_changes_typed reads); feed exactness and predicate-NULL
    rows staying un-updated are pinned in tests/test_snapshots.py.

    Scale: identical to the COW delete — one hit-detection scan plus a
    rewrite bounded by the matching files; the CDC write costs only the
    updated rows (twice)."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapupd_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.repartition(3))
    snap.update_where(
        spark, root, "lang = 'en'", {"n_chars": "n_chars + 500"}
    )

    def stats(version: int):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(
                F.when(F.col("lang") == "en", 1).otherwise(0)
            ).cast("long").alias("n_en"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        ).select(
            F.lit(version).cast("long").alias("version"),
            "n_docs", "total_chars", "n_en", "first_doc", "last_doc",
        )

    return reduce(lambda a, b: a.unionByName(b), [stats(v) for v in range(2)])


@register(
    "table_bloom_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    WHERE text IN (SELECT text FROM documents
                   WHERE doc_id IN (7, 77, 177, 277, 377))
    """,
)
def table_bloom_prune(spark, sf_dir):
    """Per-file Bloom-filter index on the snapshot table (Delta's bloom
    filter index / Iceberg's puffin sidecars, inlined into the commit
    log): CREATE with bloom_cols=['text'] computes an m-bit/k-probe
    bitmap per (file, column) at write time — one JVM xxhash64 pass over
    only the new files — and `read_point` probes the bitmaps from log
    metadata to open ONLY files that might contain the probed value.
    This is the pruning tier for EQUALITY on high-cardinality columns
    where min/max stats are useless (text bodies scattered across
    files — exactly the "is this exact document already in the corpus?"
    dedup lookup). The build probes five known document texts and
    aggregates the hits; the oracle recomputes from the raw table, so a
    hash-green row proves probe-side and write-side hashing agree and
    the prune never drops a present value. No-false-negative
    (exhaustive), DV-composition, NULL-probe, and checkpoint-carry
    invariants are pinned in tests/test_snapshots.py.

    Scale: the index is ~1 KiB per file per column in the log; a point
    lookup on a 100 TB table resolves to O(matching files + FPR x
    files) opens with zero data I/O spent deciding — size bits/probes
    to the per-file distinct count (8192/5 here ≈ 1% FPR at ~850
    values/file)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapbloom_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    _snap_create(spark, root, d.repartition(8), bloom_cols=["text"])
    probe_ids = [7, 77, 177, 277, 377]
    # distinct probe texts: two probe docs sharing a body must probe once
    # (the oracle's IN-subquery dedups the same way)
    texts = sorted({
        r.text
        for r in d.filter(F.col("doc_id").isin(probe_ids)).collect()
    })
    from functools import reduce

    hits = reduce(
        lambda a, b: a.unionByName(b),
        [snap.read_point(spark, root, "text", t) for t in texts],
    )
    return hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


@register(
    "table_constraints",
    oracle="""
    SELECT c.name, c.expr,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_rows_valid
    FROM (VALUES
        ('chars_nonneg', 'n_chars >= 0'),
        ('doc_id_nonneg', 'doc_id >= 0')
    ) AS c(name, expr)
    """,
)
def table_constraints(spark, sf_dir):
    """CHECK constraints on the snapshot table (Delta's ADD CONSTRAINT):
    CREATE with one constraint, ADD two more (each first validated
    against the existing rows — violations reject the constraint, not
    the data), DROP one, then emit the active constraint metadata plus
    the validated row count. Every writer (append/MERGE/UPDATE) now
    gates its incoming rows: a violating write raises naming the
    constraint and a violating row instead of poisoning the table —
    including an UPDATE whose SET falsifies its own predicate (the
    post-image is what validates). NULL passes, FALSE violates — SQL
    CHECK semantics. Enforcement, existing-row rejection, and
    checkpoint survival are pinned in tests/test_snapshots.py.

    Scale: validation is one short-circuit probe per constraint over
    only the INCOMING payload (limit-1, never a table scan); the
    metadata rides the log like every other table property."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapcons_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(
        spark, root, d.filter(F.col("doc_id") % 2 == 0),
        check_constraints={"chars_nonneg": "n_chars >= 0"},
    )
    snap.add_constraint(spark, root, "doc_id_nonneg", "doc_id >= 0")
    snap.add_constraint(spark, root, "lang_short", "length(lang) <= 8")
    snap.drop_constraint(root, "lang_short")
    snap.append(spark, root, d.filter(F.col("doc_id") % 2 == 1))
    n = snap.read(spark, root).count()
    active = snap.constraints(root)
    return spark.createDataFrame(
        [(k, v, n) for k, v in sorted(active.items())],
        "name string, expr string, n_rows_valid long",
    )


def _cmap_stats_sql(version: int, bump: str, n_cols: int) -> str:
    return f"""
    SELECT CAST({version} AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars{bump}) AS BIGINT) AS sum_chars,
           CAST({n_cols} AS BIGINT) AS n_cols
    FROM documents
    """


@register(
    "table_column_mapping",
    oracle=" UNION ALL ".join(
        [
            _cmap_stats_sql(0, "", 3),
            _cmap_stats_sql(1, "", 3),
            _cmap_stats_sql(
                2, " + CASE WHEN doc_id % 10 = 0 THEN 100 ELSE 0 END", 3
            ),
            _cmap_stats_sql(
                3, " + CASE WHEN doc_id % 10 = 0 THEN 100 ELSE 0 END", 2
            ),
        ]
    ),
)
def table_column_mapping(spark, sf_dir):
    """Column mapping — RENAME/DROP COLUMN without rewriting a byte
    (Delta's name-mode mapping): every logical field carries a stable
    physical name (c-<uuid>) that the parquet files, per-file stats,
    Bloom bitmaps, and partition specs all key on, so a rename or drop
    is ONE metadata commit. The fixture: v0 CREATE mapped, v1 RENAME
    n_chars->chars (live file set unchanged — pinned in tests), v2
    UPDATE through the NEW name (+100 on doc_id%10=0), v3 DROP lang.
    Per-version stats prove the rename is value-preserving, the update
    lands through the new logical name, and the drop hides exactly one
    column while every earlier era still reads under ITS schema. The
    no-resurrection guarantee (re-adding a dropped name gets a fresh
    physical id), enable-on-existing-tables, and constraint guards are
    pinned in tests/test_snapshots.py.

    Scale: renaming a column on a 100 TB table is O(1) metadata — the
    whole reason mapping exists; without it the rename is a full
    rewrite or an engine-specific view hack."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapcmap_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.repartition(3), column_mapping=True)
    snap.rename_column(root, "n_chars", "chars")
    snap.update_where(spark, root, "doc_id % 10 = 0", {"chars": "chars + 100"})
    snap.drop_column(root, "lang")

    def stats(version: int):
        df = snap.read(spark, root, version)
        ccol = "chars" if "chars" in df.columns else "n_chars"
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(ccol).cast("long").alias("sum_chars"),
        ).select(
            F.lit(version).cast("long").alias("version"),
            "n_docs", "sum_chars",
            F.lit(len(df.columns)).cast("long").alias("n_cols"),
        )

    return reduce(lambda a, b: a.unionByName(b), [stats(v) for v in range(4)])


_GP_LO = "2024-01-08 00:00:00"
_GP_HI = "2024-01-12 23:59:59.999999"


@register(
    "table_generated_partition",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{_GP_LO}' AND TIMESTAMP '{_GP_HI}'
    GROUP BY event_type
    """,
)
def table_generated_partition(spark, sf_dir):
    """GENERATED partition transforms (Iceberg's hidden partitioning /
    Delta's generated columns): the events table is CREATEd with
    partition_by=[{{source: ts, transform: day}}] — the partition value
    is DERIVED (the timestamp's ISO date), exists only in the directory
    layout and the log, and queries never mention it: a range predicate
    on the raw ts column is mapped through the monotonic transform to
    partition bounds ([T(lo), T(hi)]) before per-file stats, so a 5-day
    window on a month of events opens ~5/30ths of the files while the
    residual filter keeps rows exact to the microsecond. The oracle
    recomputes the same window from the raw table. The truncate
    (integer floor-bucket) transform, transform-preserving OPTIMIZE,
    and name-direct pruning are pinned in tests/test_snapshots.py.

    Scale: time-partitioned event tables are THE 100 TB shape, and
    hidden partitioning removes the classic failure mode — a user
    filtering raw ts while the table partitions on a derived date
    column they forgot to also bound (Iceberg's founding pitch)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapgp_{tag}")

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    _snap_create(
        spark, root, e,
        partition_by=[{"source": "ts", "transform": "day", "name": "day"}],
    )
    pruned = snap.read_pruned(spark, root, {"ts": (_GP_LO, _GP_HI)})
    return pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


_RESTORE_V1 = "(lang = 'de') IS NOT TRUE"
_RESTORE_V2 = f"{_RESTORE_V1} AND NOT (doc_id % 5 = 0)"


@register(
    "table_restore",
    oracle=" UNION ALL ".join(
        _version_stats_sql(v, w)
        for v, w in enumerate(["TRUE", _RESTORE_V1, _RESTORE_V2, "TRUE"])
    ),
)
def table_restore(spark, sf_dir):
    """RESTORE TABLE to an earlier version (Delta RESTORE): v0 CREATE
    all documents, v1 COW DELETE lang='de', v2 MOR DELETE doc_id%5=0
    (deletion vector), v3 RESTORE to v0 — one forward commit that rolls
    back the live set AND the deletion vector by log reference (no data
    copied), leaving the bad era auditable and time-travelable. The
    per-version stats prove v3 == v0 row-exactly while v1/v2 still read
    their own eras. The restore writes change-data files holding its
    exact row diff (a DV rollback re-inserts rows no file-level diff can
    see), so the feed's replication invariant v0 + feed == HEAD holds
    across the restore — pinned with the fold test in
    tests/test_snapshots.py.

    Scale: restore is O(log) metadata plus one diff over only the
    state-changing files — undoing an accidental 0.1% delete on 100 TB
    touches 0.1% of files, never the table."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snaprestore_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.repartition(3))
    snap.delete_where(spark, root, "lang = 'de'")
    snap.delete_where_mor(spark, root, "doc_id % 5 = 0")
    snap.restore(spark, root, 0)

    def stats(version: int):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        ).select(
            F.lit(version).cast("long").alias("version"),
            "n_docs", "total_chars", "n_langs", "first_doc", "last_doc",
        )

    return reduce(
        lambda a, b: a.unionByName(b), [stats(v) for v in range(4)]
    )


def _build_cdf_fixture(spark, sf_dir: str, prefix: str) -> str:
    """The shared 6-commit snapshot-table fixture for the change-feed
    keys: v0 CREATE (doc_id%3=0 of documents), v1/v2 APPEND (the other
    thirds), v3 COW DELETE (lang='de'), v4 OPTIMIZE (data_change=false),
    v5 MERGE bumping n_chars by 1000 on the doc_id%7=0 survivors.
    Returns the table root (rebuilt from scratch per call under the
    repo's .csv_tmp/ — the documented sandbox-scale seam)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"{prefix}_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.filter(F.col("doc_id") % 3 == 0))
    snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 1))
    snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 2))
    snap.delete_where(spark, root, "lang = 'de'")
    snap.compact(spark, root, max_files=2)
    snap.merge_into(
        spark,
        root,
        d.filter((F.col("doc_id") % 7 == 0) & (F.col("lang") != "de"))
        .withColumn("n_chars", F.col("n_chars") + F.lit(1000)),
        ["doc_id"],
    )
    return root


def _cdf_sql(version: int, ctype: str, where: str, bump: int = 0) -> str:
    chars = (
        f"CAST(SUM(n_chars) + {bump} * COUNT(*) AS BIGINT)"
        if bump
        else "CAST(SUM(n_chars) AS BIGINT)"
    )
    return f"""
    SELECT CAST({version} AS BIGINT) AS version,
           '{ctype}' AS change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           {chars} AS sum_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents WHERE {where}
    """


@register(
    "table_changes",
    oracle=" UNION ALL ".join(
        [
            _cdf_sql(1, "insert", "doc_id % 3 = 1"),
            _cdf_sql(2, "insert", "doc_id % 3 = 2"),
            _cdf_sql(3, "delete", "lang = 'de'"),
            _cdf_sql(5, "delete", "doc_id % 7 = 0 AND lang <> 'de'"),
            _cdf_sql(5, "insert", "doc_id % 7 = 0 AND lang <> 'de'", bump=1000),
        ]
    ),
)
def table_changes(spark, sf_dir):
    """Change Data Feed over the snapshot table (Delta CDF, recovered from
    the COW commit log with no per-commit change files — see
    sources/snapshots.py `changes`): build a 6-commit table — v0 CREATE
    (doc_id%3=0), v1/v2 APPEND, v3 COW DELETE (lang='de'), v4 OPTIMIZE
    (data_change=false), v5 MERGE bumping n_chars by 1000 on the
    doc_id%7=0 survivors — then read the feed since v0 and aggregate it
    per (commit, change_type). The oracle recomputes every cohort from
    the raw table: appends surface as pure inserts, the delete's feed is
    exactly the predicate rows, the compaction contributes NOTHING (the
    dataChange=false skip), and each merged row appears as its
    delete+insert pair (old n_chars out, n_chars+1000 in) — so a
    hash-green row proves the feed is row-exact end to end.

    Scale shape: appends emit their files with zero diff work; COW
    commits diff ONLY the files they touched (never snapshot-vs-
    snapshot), so a 0.1%-selective delete's feed costs an EXCEPT ALL
    over 0.1% of the table; compactions cost nothing. The feed is what
    turns the table into an incremental source: a downstream consumer
    (the stream_foreach_merge sink being the producer-side twin) reads
    (last_seen, HEAD] instead of re-scanning 100 TB."""
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    root = _build_cdf_fixture(spark, sf_dir, "snapcdf")
    feed = snap.changes(spark, root, 0)
    return (
        feed.groupBy(
            F.col("_commit_version").alias("version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
    )


@register(
    "table_changes_typed",
    oracle=" UNION ALL ".join(
        [
            _cdf_sql(1, "insert", "doc_id % 3 = 1"),
            _cdf_sql(2, "insert", "doc_id % 3 = 2"),
            _cdf_sql(3, "delete", "lang = 'de'"),
            _cdf_sql(5, "update_preimage", "doc_id % 7 = 0 AND lang <> 'de'"),
            _cdf_sql(
                5, "update_postimage",
                "doc_id % 7 = 0 AND lang <> 'de'", bump=1000,
            ),
        ]
    ),
)
def table_changes_typed(spark, sf_dir):
    """Change Data Feed with UPDATE classification (VERDICT r08 #5 —
    Delta CDF's four change types): same 6-commit fixture as
    table_changes, read with classify_updates=True. The v5 MERGE commit
    records its key columns, so within its diff each matched
    delete+insert pair is re-labelled update_preimage (old n_chars out) /
    update_postimage (n_chars+1000 in) — what CDC consumers key on to
    distinguish an update from a churned row — while v1/v2 appends stay
    inserts and the v3 COW delete stays deletes. The oracle recomputes
    all five cohorts from the raw table, so a hash-green row proves the
    classification is row-exact and classifies ONLY the merge commit.

    Scale: classification adds two key-projected semi/anti joins over
    the commit's OWN diff (O(commit's changed rows), broadcast-sized
    key sets) — never a table scan; the two-type default path and the
    type-agnostic incremental-MV fold are unchanged."""
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    root = _build_cdf_fixture(spark, sf_dir, "snapcdft")
    feed = snap.changes(spark, root, 0, classify_updates=True)
    return (
        feed.groupBy(
            F.col("_commit_version").alias("version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("doc_id").cast("long").alias("sum_doc_id"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
    )


@register(
    "stream_table_changes",
    oracle=" UNION ALL ".join(
        [
            _cdf_sql(1, "insert", "doc_id % 3 = 1"),
            _cdf_sql(2, "insert", "doc_id % 3 = 2"),
            _cdf_sql(3, "delete", "lang = 'de'"),
            _cdf_sql(
                5, "delete", "doc_id % 5 = 0 AND (lang = 'de') IS NOT TRUE"
            ),
        ]
    ),
)
def stream_table_changes(spark, sf_dir):
    """STREAMING read of the snapshot table's change feed (VERDICT r08
    #4 — the Delta streaming-source shape): a Python streaming
    DataSource whose offsets are table VERSIONS (sources/cdc_stream.py),
    run as a REAL readStream with a processingTime trigger against a
    6-commit table — v0 CREATE (doc_id%3=0), v1/v2 APPEND, v3 MOR
    DELETE lang='de' (streamed from its change-data files), v4 OPTIMIZE
    (data_change=false, contributes nothing), v5 MOR DELETE doc_id%5=0
    with cdf=False (streamed by deriving the DV delta driver-side) —
    aggregated per (commit, change_type) in complete mode until the
    stream converges to the batch feed's row count. The oracle
    recomputes every cohort from the raw table, so a hash-green row
    proves the STREAMED feed equals the batch `changes()` end to end
    across all three streamable commit kinds. Restart recovery
    (readBetweenOffsets replays committed version ranges exactly) is
    pinned in tests/test_streaming.py.

    Scale: offsets advance by commit-log metadata only; each batch
    reads O(that commit's changed bytes). The Simple (driver-side)
    reader is the documented low-throughput variant — the pyds.py
    precedent; partition-per-commit executor parallelism is the
    mechanical upgrade."""
    return _run_cdf_stream(spark, sf_dir, "table_changes_stream")


def _run_cdf_stream(spark, sf_dir, fmt, max_versions_per_batch=None,
                    min_batches=None, root=None):
    """Shared live-run harness for the streaming-CDF keys (driver-side
    simple reader vs executor-parallel partition-per-commit reader vs
    rate-limited catch-up): identical fixture, identical convergence
    contract. ``max_versions_per_batch`` forwards the admission-control
    option; ``min_batches`` asserts the backlog actually drained across
    at least that many micro-batches (the bounded-catch-up proof)."""
    import time
    import uuid as _uuid

    from unfccc_documents_database_sandbox_spark.catalog import ensure_pyfiles
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap
    from unfccc_documents_database_sandbox_spark.sources.cdc_stream import (
        register_table_changes_stream,
    )

    if root is None:
        root = _build_stream_cdf_fixture(spark, sf_dir)
    expected = snap.changes(spark, root, 0).count()

    ensure_pyfiles(spark)
    register_table_changes_stream(spark)
    reader = (
        spark.readStream.format(fmt)
        .option("path", root)
        .option("since_version", 0)
    )
    if max_versions_per_batch is not None:
        reader = reader.option("max_versions_per_batch",
                               str(max_versions_per_batch))
    feed = reader.load()
    # streaming aggregations reject COUNT DISTINCT: aggregate at the
    # finer (version, change_type, lang) grain in the stream and finalize
    # the distinct-lang rollup on the converged (bounded) result below
    agg = feed.groupBy(
        F.col("_commit_version").alias("version"),
        F.col("_change_type").alias("change_type"),
        "lang",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    name = f"cdc_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if not q.isActive and q.exception() is not None:
                raise q.exception()
            # the memory sink registers its temp view only once the
            # FIRST micro-batch commits; under a loaded session (the
            # concurrent parity build) q.start() returns well before
            # that, so an early poll must wait. Probe the catalog
            # instead of swallowing exceptions — a real failure in the
            # poll query must propagate, not masquerade as a 300 s
            # TimeoutError (r14 ADVICE).
            if not spark.catalog.tableExists(name):
                got = -1
            else:
                got = (
                    spark.table(name)
                    .agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n"))
                    .collect()[0]["n"]
                )
            if got == expected:
                break
            time.sleep(0.2)
        else:
            raise TimeoutError(
                f"{fmt} did not converge to the batch feed "
                f"({expected} rows) within 300s"
            )
        if min_batches is not None:
            # admission control really sliced the backlog: the version
            # cursor needed >= min_batches non-empty micro-batches
            done = [
                p for p in q.recentProgress
                if p.get("numInputRows", 0) > 0
            ]
            if len(done) < min_batches:
                raise AssertionError(
                    f"rate limit did not bound the catch-up: "
                    f"{len(done)} non-empty batches < {min_batches}")
    finally:
        if q.isActive:
            q.stop()
    q.awaitTermination(60)
    fine = spark.createDataFrame(
        spark.table(name).collect(), spark.table(name).schema
    )
    spark.catalog.dropTempView(name)
    return fine.groupBy("version", "change_type").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("sum_doc_id").cast("long").alias("sum_doc_id"),
        F.sum("sum_chars").cast("long").alias("sum_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


@register(
    "stream_table_changes_dist",
    oracle=" UNION ALL ".join(
        [
            _cdf_sql(1, "insert", "doc_id % 3 = 1"),
            _cdf_sql(2, "insert", "doc_id % 3 = 2"),
            _cdf_sql(3, "delete", "lang = 'de'"),
            _cdf_sql(
                5, "delete", "doc_id % 5 = 0 AND (lang = 'de') IS NOT TRUE"
            ),
        ]
    ),
)
def stream_table_changes_dist(spark, sf_dir):
    """EXECUTOR-PARALLEL streaming change feed: the partition-planning
    DataSourceStreamReader variant of stream_table_changes — each
    micro-batch plans one InputPartition PER COMMIT in its version
    range, and each partition's rows are materialized ON AN EXECUTOR
    (commit-log JSON + pyarrow reads, package shipped via addPyFile) —
    the scale path the simple driver-side reader documents. Same
    fixture, same live processingTime run, same batch-feed convergence
    contract, same oracle: a hash-green row proves the parallel reader
    streams the identical feed. Partition planning and executor-side
    row exactness are additionally pinned in tests/test_streaming.py.

    Scale: throughput now scales with executors x commits per batch
    (or files, one mechanical split finer); on a cluster the table
    root lives on shared storage — the Delta streaming-source shape."""
    return _run_cdf_stream(spark, sf_dir, "table_changes_stream_dist")


# THREE registered keys (stream_table_changes, stream_table_changes_dist,
# stream_changes_bounded) stream the SAME deterministic fixture root —
# the one cross-key shared fixture in the repo. Under the r12 parity
# suite's in-process thread pool (VERDICT r11 #8) two of them could race
# create()/commits on that root, so the build is serialized by a lock
# and memoized per (process, root): the content is deterministic, so the
# first caller's build serves every later caller this process.
import threading as _threading

_CDF_FIXTURE_LOCK = _threading.Lock()
_CDF_FIXTURE_BUILT: set[str] = set()


def _build_stream_cdf_fixture(spark, sf_dir: str) -> str:
    """6-commit fixture for the STREAMING feed: appends + MOR deletes
    (one via change-data files, one via DV-delta derivation) + a skipped
    OPTIMIZE — every streamable commit kind, no unstreamable COW.
    Lock-serialized and build-once per process (see note above)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapcdcstream_{tag}")

    with _CDF_FIXTURE_LOCK:
        if root in _CDF_FIXTURE_BUILT:
            return root
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        _snap_create(spark, root, d.filter(F.col("doc_id") % 3 == 0))
        snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 1))
        snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 2))
        snap.delete_where_mor(spark, root, "lang = 'de'", cdf=True)
        snap.compact(spark, root, max_files=2)
        snap.delete_where_mor(spark, root, "doc_id % 5 = 0", cdf=False)
        _CDF_FIXTURE_BUILT.add(root)
    return root


@register(
    "table_incremental_mv",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars
                    + CASE WHEN doc_id % 7 = 0 THEN 1000 ELSE 0 END)
                AS BIGINT) AS sum_chars
    FROM documents
    WHERE lang <> 'de'
    GROUP BY lang
    """,
)
def table_incremental_mv(spark, sf_dir):
    """Incremental materialized-view maintenance over the Change Data Feed
    (the consumer-side story: Delta CDF's headline use case, and the
    algebraic core of every streaming-SQL engine's continuous aggregate):
    seed a per-lang (COUNT, SUM) view from the v0 snapshot, then fold the
    ENTIRE (v0, HEAD] change feed into it as signed deltas — inserts add,
    deletes subtract (count and sum are abelian-group aggregates, so
    delete = inverse) — and emit the maintained view, dropping groups
    whose count reaches zero (the deleted 'de' cohort). The HEAD snapshot
    is NEVER rescanned: the oracle aggregates the equivalent final state
    directly from the raw table, so a hash-green row proves v0 + folded
    deltas == full recompute, across appends, a COW delete, a skipped
    compaction, and delete+insert MERGE pairs.

    Scale: this is the O(changes) vs O(table) trade — at 100 TB with a
    0.1%/day churn the view refresh touches 0.1% of the data; the fold is
    one groupBy over the feed plus a |groups|-sized outer join with the
    previous view (at true scale the view itself lives in a snapshot
    table and the fold lands via merge_into — stream_foreach_merge is
    that writer). Non-invertible aggregates (MIN/MAX) would need the
    full-group rescan on delete; documented limit of the algebraic
    path."""
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    root = _build_cdf_fixture(spark, sf_dir, "snapmv")
    # fold = union of signed partial aggregates, re-aggregated: groupBy
    # treats a NULL group key as ONE group (exactly like the recompute's
    # GROUP BY would), where a full-outer equality join on the key would
    # silently split a NULL group in two
    mv0 = (
        snap.read(spark, root, 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dn"),
            F.sum("n_chars").cast("long").alias("ds"),
        )
    )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = (
        snap.changes(spark, root, 0)
        .groupBy("lang")
        .agg(
            F.sum(sign).cast("long").alias("dn"),
            F.sum(sign * F.col("n_chars")).cast("long").alias("ds"),
        )
    )
    merged = (
        mv0.unionByName(delta)
        .groupBy("lang")
        .agg(
            F.sum("dn").cast("long").alias("n_docs"),
            F.sum("ds").cast("long").alias("sum_chars"),
        )
    )
    return merged.filter(F.col("n_docs") > 0)


def _clone_stats_sql(label: str, where: str) -> str:
    return f"""
    SELECT '{label}' AS snap,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents WHERE {where}
    """


_CLONE_FORK = "(lang = 'de') IS NOT TRUE"


@register(
    "table_clone",
    oracle=" UNION ALL ".join(
        _clone_stats_sql(label, where)
        for label, where in [
            ("clone@fork", _CLONE_FORK),
            ("clone@head", f"{_CLONE_FORK} AND NOT (doc_id % 5 = 0)"),
            ("src@head", f"{_CLONE_FORK} AND NOT (doc_id % 3 = 0)"),
        ]
    ),
)
def table_clone(spark, sf_dir):
    """SHALLOW CLONE (Delta's CREATE TABLE ... SHALLOW CLONE — the
    zero-copy dev/test-branch and write-audit-publish primitive): the
    source table is CREATEd from documents (v0) and MOR-deletes lang='de'
    (v1, a deletion vector); `clone` then initializes an INDEPENDENT
    table whose commit 0 references the source's payload files by
    absolute path — zero data bytes copied, O(files) metadata, carrying
    the fork-point schema, stats, and deletion vectors. Both sides then
    diverge: the source COW-deletes doc_id%3=0, the clone MOR-deletes
    doc_id%5=0 (a deletion vector over files it does NOT own — row
    lineage is the globally-unique payload basename, so DV anti-joins
    work across table roots). The three output rows prove the fork:
    clone@fork (time travel to the clone's v0) sees exactly the source's
    as-of-clone state, clone@head subtracts only the clone's own delete,
    src@head only the source's — neither side's writes leak into the
    other. Isolation invariants that aren't SQL-expressible — the
    clone's data/ starts empty, vacuum on either side never reclaims the
    other's files (and the source-vacuum hazard + OPTIMIZE localization
    escape), clone-of-clone, constraint/partition carry-over — are
    pinned in tests/test_snapshots.py.

    Scale: cloning a 100 TB table is one commit-log replay plus one JSON
    write — branching for experiments, staging writes for audit, or
    pinning a training-data snapshot costs metadata, not a copy."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    src = os.path.join(repo_root, ".csv_tmp", f"snapclone_src_{tag}")
    dst = os.path.join(repo_root, ".csv_tmp", f"snapclone_dst_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, src, d.repartition(3))
    snap.delete_where_mor(spark, src, "lang = 'de'")
    snap.clone(src, dst)
    snap.delete_where(spark, src, "doc_id % 3 = 0")      # source diverges
    snap.delete_where_mor(spark, dst, "doc_id % 5 = 0")  # clone diverges

    def stats(label: str, df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        ).select(
            F.lit(label).alias("snap"),
            "n_docs", "total_chars", "n_langs", "first_doc", "last_doc",
        )

    return reduce(
        lambda a, b: a.unionByName(b),
        [
            stats("clone@fork", snap.read(spark, dst, 0)),
            stats("clone@head", snap.read(spark, dst)),
            stats("src@head", snap.read(spark, src)),
        ],
    )


def _mev_stats_sql(version: int, body: str, n_cols: int,
                   scored: bool) -> str:
    score_sum = ("CAST(SUM(score) AS BIGINT)" if scored
                 else "CAST(NULL AS BIGINT)")
    n_scored = ("CAST(COUNT(score) AS BIGINT)" if scored
                else "CAST(0 AS BIGINT)")
    return f"""
    SELECT CAST({version} AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {score_sum} AS score_sum,
           {n_scored} AS n_scored,
           CAST({n_cols} AS BIGINT) AS n_cols
    FROM {body}
    """


_MEV_HEAD = """(
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000
                ELSE n_chars END AS n_chars,
           CASE WHEN doc_id % 7 = 0 THEN 3 * doc_id END AS score
    FROM documents
    UNION ALL
    SELECT doc_id + 100000, n_chars, 3 * doc_id
    FROM documents WHERE doc_id % 7 = 1
)"""


@register(
    "table_merge_evolve",
    oracle=" UNION ALL ".join([
        _mev_stats_sql(0, "documents", 3, scored=False),
        _mev_stats_sql(1, _MEV_HEAD, 4, scored=True),
    ]),
)
def table_merge_evolve(spark, sf_dir):
    """MERGE with schema auto-evolution (Delta's schema.autoMerge): ONE
    merge_into(evolve=True) commit both upserts rows AND adds the
    source-only `score` column to the table schema. The fixture: v0
    CREATE documents(doc_id, lang, n_chars); v1 MERGE a source that
    updates doc_id%7=0 (n_chars+1000, score=3*doc_id) and inserts
    shifted rows (doc_id+100000) — all carrying the NEW column. The
    per-version stats prove: v0 time travel keeps the 3-column era
    (score_sum reads NULL, zero scored rows), the head's matched rows
    carry the merged score, survivors and historical files null-fill it
    with zero extra rewrites (only the COW hit files moved), and the
    insert rows arrive scored. The typed change feed across the evolving
    commit (preimage null-filled, postimage scored), the additive-only
    guards, and the mapped-table fresh-physical-id path are pinned in
    tests/test_snapshots.py.

    Scale: schema evolution inside MERGE is one metadata field on the
    commit the MERGE was writing anyway — the alternative (evolve, then
    merge) doubles the table's commit rate and opens a window where
    concurrent readers see the half-applied state."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapmev_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.repartition(3))
    upd = (
        d.filter("doc_id % 7 = 0")
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .withColumn("score", (3 * F.col("doc_id")).cast("long"))
    )
    ins = d.filter("doc_id % 7 = 1").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "lang", "n_chars",
        (3 * F.col("doc_id")).cast("long").alias("score"),
    )
    snap.merge_into(spark, root, upd.unionByName(ins), ["doc_id"],
                    evolve=True)

    def stats(version: int):
        df = snap.read(spark, root, version)
        scored = "score" in df.columns
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (F.sum("score") if scored else F.lit(None))
            .cast("long").alias("score_sum"),
            (F.count("score") if scored else F.lit(0))
            .cast("long").alias("n_scored"),
        ).select(
            F.lit(version).cast("long").alias("version"),
            "n_docs", "total_chars", "score_sum", "n_scored",
            F.lit(len(df.columns)).cast("long").alias("n_cols"),
        )

    return reduce(lambda a, b: a.unionByName(b), [stats(0), stats(1)])


@register(
    "table_merge_sync",
    oracle="""
    WITH t AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0),
    head AS (
        SELECT doc_id,
               n_chars + CASE WHEN doc_id % 12 = 0 THEN 1000 ELSE 0 END
                   AS n_chars
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 1
    )
    SELECT 'v0_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS agg FROM t
    UNION ALL
    SELECT 'head_docs', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM head
    UNION ALL
    SELECT 'feed_insert', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT 'feed_delete', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 1
    UNION ALL
    SELECT 'feed_update_preimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 12 = 0
    UNION ALL
    SELECT 'feed_update_postimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 12 = 0
    """,
)
def table_merge_sync(spark, sf_dir):
    """Three-clause MERGE — Delta's WHEN NOT MATCHED BY SOURCE THEN
    DELETE (VERDICT r10 #2): ONE merge_into(not_matched_by_source=
    "delete") commit updates matched rows, inserts new ones, AND deletes
    target rows absent from the source — the standard "sync a table to
    the latest extract" shape. Fixture: v0 CREATE documents where
    doc_id%3=0; the source is the new truth (doc_id%6=0 kept, n_chars
    +1000 where doc_id%12=0, plus doc_id%3=1 as fresh inserts), so
    after the merge the table EQUALS the source — an overwrite's
    result, but the typed change feed carries only the actual diff:
    matched-but-unchanged rows (doc_id%6=0, not %12=0) cancel in the
    CDF's add/remove exceptAll and emit NO rows, which the feed_* rows
    of this output pin exactly (update pairs only for %12=0, deletes
    only for the odd multiples of 3, inserts only for %3=1).

    Scale: the rewrite set is still file-bounded (files holding a
    matched OR deletable row); the sync clause's cost honestly
    approaches a full rewrite as the source diverges — same as Delta —
    but CHANGE DATA stays O(diff), which is what the downstream CDC
    consumers pay. Reference parity: the reference re-materializes its
    whole decision_summaries.csv on every run
    (decisions-summaries/generate_decisions_summaries.py:119-121, a
    full overwrite); a sync merge reaches the same end state as one
    atomic commit whose change feed is just the diff."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapmsync_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    src = (
        d.filter("doc_id % 6 = 0")
        .withColumn(
            "n_chars",
            F.col("n_chars")
            + F.when(F.col("doc_id") % 12 == 0, F.lit(1000)).otherwise(0),
        )
        .unionByName(d.filter("doc_id % 3 = 1"))
    )
    v = snap.merge_into(spark, root, src, ["doc_id"],
                        not_matched_by_source="delete")

    def stats(label: str, version: int):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("agg"),
        ).select(F.lit(label).alias("metric"), "n", "agg")

    feed = snap.changes(spark, root, v - 1, v, classify_updates=True)
    kinds = spark.createDataFrame(
        [("insert",), ("delete",), ("update_preimage",),
         ("update_postimage",)], "_change_type string")
    feed_stats = (
        kinds.join(
            feed.groupBy("_change_type").agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("doc_id").alias("_agg"),
            ),
            "_change_type", "left",
        )
        .select(
            F.concat(F.lit("feed_"), F.col("_change_type")).alias("metric"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("_agg"), F.lit(0)).cast("long").alias("agg"),
        )
    )
    return stats("v0_docs", v - 1).unionByName(
        stats("head_docs", v)).unionByName(feed_stats)


@register(
    "table_generated_columns",
    oracle="""
    WITH t AS (
        SELECT doc_id, n_chars,
               CAST(n_chars // 1000 AS BIGINT) AS bucket,
               CASE WHEN doc_id % 3 = 2 THEN 'bulk' ELSE 'live' END
                   AS status
        FROM documents
    )
    SELECT 'v0' AS metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS chars,
           CAST(COALESCE(SUM(bucket), 0) AS BIGINT) AS buckets
    FROM t WHERE doc_id % 3 = 0
    UNION ALL
    SELECT 'head_live', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
           CAST(COALESCE(SUM(bucket), 0) AS BIGINT)
    FROM t WHERE status = 'live'
    UNION ALL
    SELECT 'head_bulk', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
           CAST(COALESCE(SUM(bucket), 0) AS BIGINT)
    FROM t WHERE status = 'bulk'
    """,
)
def table_generated_columns(spark, sf_dir):
    """GENERATED ALWAYS AS + DEFAULT columns in the snapshot format
    (VERDICT r11 #5 — Delta's generated/default columns): v0 CREATEs
    documents (doc_id%3=0) declaring bucket GENERATED ALWAYS AS
    n_chars DIV 1000 and status DEFAULT 'live' — the writer supplies
    NEITHER; both derive at write time. A second append (%3=1) again
    omits both; a third (%3=2) supplies an explicitly-CORRECT bucket
    (enforced: a mismatch would abort, tests/test_snapshots.py pins the
    refusal) and an explicit status 'bulk' overriding the default. The
    head aggregates prove every era derived/enforced identically, and
    the derived column's stats record like any data column (the same
    suite pins pruned_files skipping on bucket, and the generated-
    partition-source composition).

    Scale: derivation is a write-time column expression (zero extra
    passes); enforcement is ONE short-circuit probe over the incoming
    payload only — the CHECK-constraint cost discipline. Reference
    parity: the reference derives document_type/translated flags in
    Python at insert time (probe.py's per-row attribute fill); a
    generated column moves that derivation into the table contract where
    it cannot drift per-writer."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapgcol_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(
        spark, root, d.filter("doc_id % 3 = 0").repartition(2),
        generated_cols={"bucket": "CAST(n_chars DIV 1000 AS BIGINT)"},
        default_cols={"status": "'live'"},
    )
    snap.append(spark, root, d.filter("doc_id % 3 = 1"))
    snap.append(
        spark, root,
        d.filter("doc_id % 3 = 2")
        .withColumn("bucket", F.expr("CAST(n_chars DIV 1000 AS BIGINT)"))
        .withColumn("status", F.lit("bulk")),
    )

    def stats(label: str, df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long")
            .alias("chars"),
            F.coalesce(F.sum("bucket"), F.lit(0)).cast("long")
            .alias("buckets"),
        ).select(F.lit(label).alias("metric"), "n", "chars", "buckets")

    v0 = snap.read(spark, root, 0)
    head = snap.read(spark, root)
    return (
        stats("v0", v0)
        .unionByName(stats("head_live", head.filter("status = 'live'")))
        .unionByName(stats("head_bulk", head.filter("status = 'bulk'")))
    )


@register(
    "table_merge_mor",
    oracle="""
    WITH t AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0),
    head AS (
        SELECT doc_id,
               n_chars + CASE WHEN doc_id % 12 = 0 THEN 1000 ELSE 0 END
                   AS n_chars
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id, n_chars FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 6 <> 0
        UNION ALL
        SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 1
    )
    SELECT 'v0_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS agg FROM t
    UNION ALL
    SELECT 'head_docs', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM head
    UNION ALL
    SELECT 'feed_insert', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT 'feed_delete', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'feed_update_preimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 6 = 0
    UNION ALL
    SELECT 'feed_update_postimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 6 = 0
    UNION ALL
    SELECT 'mor_invariants', CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    """,
)
def table_merge_mor(spark, sf_dir):
    """Merge-on-read MERGE (r12 — Iceberg's MoR MERGE; the zero-rewrite
    sibling of merge_upsert/table_merge_sync): ONE merge_into_mor
    commit DV-kills the matched rows in place and APPENDS their
    replacements (+1000 chars where doc_id%12=0) and the %3=1 inserts —
    no pre-existing file is rewritten, which the mor_invariants row
    pins structurally (n=1: every v0 file still live at head; agg=1:
    the commit assigned deletion vectors). The commit-time change data
    types EVERY matched row as an update pair — including the
    value-identical ones (doc_id%6=0 but not %12=0): MoR replaces
    whatever matches, with no COW-style exceptAll cancellation — which
    is exactly how this key differs from table_merge_sync's O(diff)
    feed. Zero deletes: this is the pure upsert shape.

    Scale: a trickle upsert writes O(source rows) + O(matched
    positions), never O(containing files) — the write-amplification
    fix for continuous ingest; OPTIMIZE folds the DVs away
    (tests/test_snapshots.py pins the fold and the COW-equality).
    Reference parity: the reference re-materializes its whole summary
    CSV per run (generate_decisions_summaries.py:119-121); MoR merge is
    the minimal-write restatement of that refresh."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapmmor_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    files_v0 = set(snap.live_files(root))
    src = (
        d.filter("doc_id % 6 = 0")
        .withColumn(
            "n_chars",
            F.col("n_chars")
            + F.when(F.col("doc_id") % 12 == 0, F.lit(1000)).otherwise(0),
        )
        .unionByName(d.filter("doc_id % 3 = 1"))
    )
    v = snap.merge_into_mor(spark, root, src, ["doc_id"])
    preserved = int(files_v0 <= set(snap.live_files(root)))
    has_dv = int(bool(snap.dv_map(root)))

    def stats(label: str, version: int):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("agg"),
        ).select(F.lit(label).alias("metric"), "n", "agg")

    feed = snap.changes(spark, root, v - 1, v, classify_updates=True)
    kinds = spark.createDataFrame(
        [("insert",), ("delete",), ("update_preimage",),
         ("update_postimage",)], "_change_type string")
    feed_stats = (
        kinds.join(
            feed.groupBy("_change_type").agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("doc_id").alias("_agg"),
            ),
            "_change_type", "left",
        )
        .select(
            F.concat(F.lit("feed_"), F.col("_change_type")).alias("metric"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("_agg"), F.lit(0)).cast("long").alias("agg"),
        )
    )
    inv = spark.createDataFrame(
        [("mor_invariants", preserved, has_dv)], "metric string, n long, agg long")
    return stats("v0_docs", v - 1).unionByName(
        stats("head_docs", v)).unionByName(feed_stats).unionByName(inv)


@register(
    "table_identity_columns",
    oracle="""
    WITH c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM documents
        WHERE doc_id % 3 = 0
    ),
    h AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
        WHERE doc_id % 3 IN (0, 1)
    )
    SELECT 'v0' AS metric, n0 AS n, n0 AS n_distinct,
           CAST(1000 AS BIGINT) AS id_min,
           CAST(1000 + 2 * (n0 - 1) AS BIGINT) AS id_max,
           CAST(1000 * n0 + n0 * (n0 - 1) AS BIGINT) AS id_sum
    FROM c
    UNION ALL
    SELECT 'head', n, n, CAST(1000 AS BIGINT),
           CAST(1000 + 2 * (n - 1) AS BIGINT),
           CAST(1000 * n + n * (n - 1) AS BIGINT)
    FROM h
    """,
)
def table_identity_columns(spark, sf_dir):
    """GENERATED ALWAYS AS IDENTITY columns (r12 — Delta's identity
    columns, the allocation sibling of `table_generated_columns`): v0
    CREATEs documents (doc_id%3=0) declaring uid IDENTITY (START WITH
    1000 INCREMENT BY 2) — the writer never supplies it; an append
    (%3=1) allocates the next contiguous block above the table's
    identity high watermark. The oracle pins the ALLOCATED SET in
    closed form (count, distinct count, min, max, and the arithmetic-
    series sum per era) — exactly the facts that are deterministic:
    which ROW gets which id depends on physical partitioning, Delta's
    own contract (unique + monotonic, not a row mapping), so no
    per-row id joins appear in any oracle-checked output.

    Scale: no global sort — one localCheckpoint pins partitioning, a
    partition-count-sized pass derives per-partition offsets (bounded
    driver state), and the per-row value is offset + local rank (one
    partition-id-keyed exchange). Writers supplying the column, SET on
    it, MERGE, and evolve_schema all refuse (Delta parity —
    tests/test_snapshots.py pins each). Reference parity: the
    reference leans on Postgres SERIAL ids for every table
    (models.py's autoincrement primary keys); identity columns are
    that contract on a lakehouse table."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapident_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(
        spark, root, d.filter("doc_id % 3 = 0").repartition(3),
        identity_cols={"uid": {"start": 1000, "step": 2}},
    )
    snap.append(spark, root, d.filter("doc_id % 3 = 1").repartition(2))

    def stats(label: str, version: int | None):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("uid").cast("long").alias("n_distinct"),
            F.min("uid").cast("long").alias("id_min"),
            F.max("uid").cast("long").alias("id_max"),
            F.sum("uid").cast("long").alias("id_sum"),
        ).select(F.lit(label).alias("metric"), "n", "n_distinct",
                 "id_min", "id_max", "id_sum")

    return stats("v0", 0).unionByName(stats("head", None))


# shared by table_merge_clauses (Python clause list) and table_sql_merge
# (the same commit driven through a MERGE INTO SQL string): identical
# oracle = identical expected hash = the SQL front-end is pure syntax.
_MERGE_CLAUSES_ORACLE = """
    WITH head AS (
        -- matched (doc_id%6=0): clause 1 (n_chars%3=0) updates,
        -- clause 2 (n_chars%3=1) deletes, else carried
        SELECT doc_id, n_chars + n_chars AS n_chars, 'upd' AS tag
        FROM documents WHERE doc_id % 6 = 0 AND n_chars % 3 = 0
        UNION ALL
        SELECT doc_id, n_chars, 'base'
        FROM documents WHERE doc_id % 6 = 0 AND n_chars % 3 = 2
        UNION ALL
        -- unmatched target rows carried
        SELECT doc_id, n_chars, 'base'
        FROM documents WHERE doc_id % 3 = 0 AND doc_id % 6 <> 0
        UNION ALL
        -- conditional inserts
        SELECT doc_id, n_chars, 'src'
        FROM documents
        WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0 AND n_chars % 2 = 0
    )
    SELECT tag AS metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS agg
    FROM head GROUP BY tag
    UNION ALL
    SELECT 'feed_insert', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents
    WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0 AND n_chars % 2 = 0
    UNION ALL
    SELECT 'feed_delete', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 6 = 0 AND n_chars % 3 = 1
    UNION ALL
    SELECT 'feed_update_preimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 6 = 0 AND n_chars % 3 = 0
    UNION ALL
    SELECT 'feed_update_postimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 6 = 0 AND n_chars % 3 = 0
    """


@register("table_merge_clauses", oracle=_MERGE_CLAUSES_ORACLE)
def table_merge_clauses(spark, sf_dir):
    """Delta's FULL WHEN MATCHED surface in one commit (r12, beyond
    VERDICT r11 #2): ordered conditioned clauses — UPDATE SET with
    both-sides (t./s.) expressions where s.n_chars%3=0, DELETE where
    s.n_chars%3=1, unclaimed matched rows carried verbatim — plus
    whenNotMatchedInsert(condition): unmatched source rows insert only
    where n_chars is even. First-TRUE-clause-wins ordering, FALSE/NULL
    falls through (the by-source rule), and the typed change feed pins
    the consequences: update pairs only for clause-1 rows, plain
    deletes only for clause-2 rows, inserts only for the
    condition-passing unmatched rows, NOTHING for carried rows.

    Scale: identical to the classic merge — one broadcast-semi hit-file
    discovery, matched pairs via one broadcast hash join, clause
    dispatch is a row-local CASE; the rewrite stays file-bounded.
    Reference parity: the reference's pipeline decides per-row whether
    to refresh, skip, or drop a summary in Python
    (generate_decisions_summaries.py:96-118); conditioned MERGE clauses
    are that decision table as one declarative atomic commit."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapmcl_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(
        spark, root,
        d.filter("doc_id % 3 = 0").withColumn("tag", F.lit("base"))
        .repartition(3),
    )
    src = d.filter("doc_id % 2 = 0").withColumn("tag", F.lit("src"))
    v = snap.merge_into(
        spark, root, src, ["doc_id"],
        matched_clauses=[
            {"action": "update", "condition": "s.n_chars % 3 = 0",
             "set": {"n_chars": "s.n_chars + t.n_chars", "tag": "'upd'"}},
            {"action": "delete", "condition": "s.n_chars % 3 = 1"},
        ],
        not_matched_condition="n_chars % 2 = 0",
    )
    return _merge_clauses_stats(spark, root, v)


def _merge_clauses_stats(spark, root, v):
    """Post-merge head stats by tag + typed-change-feed stats by kind —
    the shared observable for the Python-API and SQL-string merge twins."""
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    head = (
        snap.read(spark, root).groupBy("tag").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("agg"),
        ).select(F.col("tag").alias("metric"), "n", "agg")
    )
    feed = snap.changes(spark, root, v - 1, v, classify_updates=True)
    kinds = spark.createDataFrame(
        [("insert",), ("delete",), ("update_preimage",),
         ("update_postimage",)], "_change_type string")
    feed_stats = (
        kinds.join(
            feed.groupBy("_change_type").agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("doc_id").alias("_agg"),
            ),
            "_change_type", "left",
        )
        .select(
            F.concat(F.lit("feed_"), F.col("_change_type")).alias("metric"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("_agg"), F.lit(0)).cast("long").alias("agg"),
        )
    )
    return head.unionByName(feed_stats)


@register(
    "table_analyze",
    oracle="""
    WITH kept AS (
        SELECT doc_id, source, n_chars FROM documents
        WHERE doc_id % 3 = 0 AND (n_chars % 2 = 0) IS NOT TRUE
    )
    SELECT 'doc_id' AS col,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndv,
           CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS nulls
    FROM kept
    UNION ALL
    SELECT 'source', CAST(COUNT(DISTINCT source) AS BIGINT),
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM kept
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(DISTINCT n_chars) AS BIGINT),
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM kept
    UNION ALL
    SELECT '__rows', CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT)
    FROM kept
    """,
)
def table_analyze(spark, sf_dir):
    """ANALYZE TABLE → commit-log CBO stats (VERDICT r13 #6): one
    aggregation pass over the LIVE snapshot — here a merge-on-read
    table whose DV-deleted rows must NOT count, which this key pins —
    publishes table row count + per-column exact NDV and null counts
    as an advisory version-stamped metadata commit; the key reads them
    back through `analyzed_stats` as a metadata table. The size stat
    (on-disk bytes, not oracle-comparable) drives `read_cbo`'s
    broadcast decision — planning from measured stats instead of
    engine thresholds — pinned by tests/test_snapshots.py's
    executed-plan assertion (BroadcastHashJoin with the session
    estimator disabled).

    Scale: the stats pass is one whole-stage count + N count-distinct
    aggregation over one scan, run after loads like any warehouse's
    ANALYZE; the commit is O(columns) JSON. Reference parity: the
    reference leans on Postgres' ANALYZE/pg_stats for its query
    planning (README.md:15-18) — this is that surface on the snapshot
    format."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapanl_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    snap.delete_where_mor(spark, root, "n_chars % 2 = 0")
    snap.analyze_table(spark, root)
    st = snap.analyzed_stats(root)
    rows = [
        (c, int(st["cols"][c]["ndv"]), int(st["cols"][c]["nulls"]))
        for c in ("doc_id", "source", "n_chars")
    ] + [("__rows", int(st["rows"]), 0)]
    return spark.createDataFrame(
        rows, "col string, ndv long, nulls long")


@register(
    "table_sql_history",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(4 AS BIGINT), 'optimize', FALSE, FALSE, FALSE, FALSE),
        (CAST(3 AS BIGINT), 'add_column', TRUE, TRUE, FALSE, FALSE),
        (CAST(2 AS BIGINT), 'delete_mor', TRUE, FALSE, TRUE, TRUE),
        (CAST(1 AS BIGINT), 'append', TRUE, FALSE, FALSE, FALSE),
        (CAST(0 AS BIGINT), 'create', TRUE, TRUE, FALSE, FALSE)
    ) AS t(version, operation, data_change, schema_change,
           deletion_vector, change_data)
    """,
)
def table_sql_history(spark, sf_dir):
    """DESCRIBE HISTORY as a SQL statement (Delta's audit surface,
    rounding out the all-SQL front door): an entirely-SQL commit
    sequence — CREATE TABLE, INSERT INTO ... SELECT, a merge-on-read
    DELETE, ALTER TABLE ADD COLUMN, OPTIMIZE — read back through
    `read_sql("DESCRIBE HISTORY t")` as a metadata table, newest first.
    The oracle is the expected log verbatim: operation names, the
    data_change flag (FALSE only for OPTIMIZE — contents identical,
    layout moved), schema-bearing commits (create + add_column), the
    DV bit on the MoR delete, and its change-data bit. Pure driver-side
    log metadata — zero data I/O, O(commits)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.sql_ddl import (
        execute_ddl,
    )
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        execute_dml,
        read_sql,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snaphist_{tag}")
    t = {"docs": root}

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d.createOrReplaceTempView("hist_docs_src")
    execute_ddl(
        spark,
        "CREATE OR REPLACE TABLE docs (doc_id BIGINT, n_chars BIGINT)", t)
    execute_dml(
        spark,
        "INSERT INTO docs SELECT doc_id, n_chars FROM hist_docs_src "
        "WHERE doc_id % 3 = 0", t)
    execute_dml(spark, "DELETE FROM docs WHERE n_chars % 2 = 0", t,
                mode="mor")
    execute_ddl(spark, "ALTER TABLE docs ADD COLUMN tag STRING", t)
    execute_ddl(spark, "OPTIMIZE docs MAX FILES 1", t)
    return read_sql(spark, "DESCRIBE HISTORY docs", t)


@register(
    "table_dv_legacy",
    oracle="""
    WITH base AS (
        SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0
    ),
    after_legacy AS (
        SELECT * FROM base WHERE (n_chars % 2 = 0) IS NOT TRUE
    ),
    head AS (
        SELECT * FROM after_legacy WHERE (n_chars % 3 = 0) IS NOT TRUE
    )
    SELECT 'v_legacy' AS metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS agg
    FROM after_legacy
    UNION ALL
    SELECT 'head', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM head
    UNION ALL
    SELECT 'dv_positions', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM base WHERE n_chars % 2 = 0 OR n_chars % 3 = 0
    """,
)
def table_dv_legacy(spark, sf_dir):
    """Legacy (src, pos) row-format deletion vectors decode exactly
    (r13 ADVICE high, the fallback half — the protocol half is the
    reader-4 stamp, tests/test_dv_bitmap.py): the first MoR delete is
    committed the way the PRE-BITMAP engine wrote it — raw (src, pos)
    parquet rows as the DV payload — then read back through the
    footer-schema router, which must keep those rows deleted instead of
    NULL-reading bitmap columns and resurrecting them; a second,
    normal BITMAP delete then SUPERSEDES the legacy entries (bitmap-OR
    over the decoded positions — the dv_positions row pins each dead
    position exactly once across both encodings). v_legacy /
    head rows pin both eras' reads.

    Scale: the legacy decode adds one footer read per DV part
    (O(touched files) driver metadata) + the same container pack the
    writer runs — the scan-side probe is unchanged; old tables migrate
    to bitmaps lazily as superseding writes land, Delta's
    protocol-upgrade story."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapdvlg_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    # commit a LEGACY-format MoR delete: exactly the pre-bitmap engine's
    # payload — (src, pos) parquet rows pointed at by the dv action
    scan = snap._scan(spark, root, lineage=True) \
        .filter("n_chars % 2 = 0").transform(pin)
    entries = scan.select(
        F.col("__src").alias("src"), F.col("__pos").alias("pos"))
    rel_of = snap._rel_by_name(snap.live_files(root))
    affected = sorted(
        {rel_of[r["src"]] for r in entries.select("src").distinct()
         .collect()})
    pdir = snap._new_payload_dir(root)
    entries.write.parquet(pdir)
    v_legacy = snap._publish_commit(
        root, snap.latest_version(root), op="delete_mor",
        dv={"files": affected, "parts": snap._dir_files(root, pdir)})
    # a normal bitmap-era delete supersedes the legacy entries
    snap.delete_where_mor(spark, root, "n_chars % 3 = 0")

    def stats(label, df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long")
            .alias("agg"),
        ).select(F.lit(label).alias("metric"), "n", "agg")

    ents = snap.dv_entries(spark, root)
    n_dead = ents.count()
    assert n_dead == ents.distinct().count()  # OR'd exactly once
    dvrow = spark.createDataFrame(
        [("dv_positions", n_dead, n_dead)], "metric string, n long, agg long")
    return (
        stats("v_legacy", snap.read(spark, root, v_legacy))
        .unionByName(stats("head", snap.read(spark, root)))
        .unionByName(dvrow)
    )


@register(
    "table_merge_clauses_mor",
    oracle="""
    WITH mupd AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 6 = 0 AND n_chars % 3 = 0
    ),
    bysrc AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 6 <> 0 AND n_chars % 5 = 0
    ),
    head AS (
        -- matched: clause 1 updates (n_chars doubled), clause 2
        -- deletes, n_chars%3=2 pairs unclaimed -> carried
        SELECT doc_id, n_chars + n_chars AS n_chars, 'upd' AS tag
        FROM documents WHERE doc_id % 6 = 0 AND n_chars % 3 = 0
        UNION ALL
        SELECT doc_id, n_chars, 'base'
        FROM documents WHERE doc_id % 6 = 0 AND n_chars % 3 = 2
        UNION ALL
        -- unmatched target rows: by-source UPDATE re-tags n_chars%5=0
        SELECT doc_id, n_chars,
               CASE WHEN n_chars % 5 = 0 THEN 'stale' ELSE 'base' END
        FROM documents WHERE doc_id % 3 = 0 AND doc_id % 6 <> 0
        UNION ALL
        -- conditional inserts
        SELECT doc_id, n_chars, 'src'
        FROM documents
        WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0 AND n_chars % 2 = 0
    )
    SELECT tag AS metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS agg
    FROM head GROUP BY tag
    UNION ALL
    SELECT 'feed_insert', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents
    WHERE doc_id % 2 = 0 AND doc_id % 3 <> 0 AND n_chars % 2 = 0
    UNION ALL
    SELECT 'feed_delete', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 6 = 0 AND n_chars % 3 = 1
    UNION ALL
    SELECT 'feed_update_preimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM (SELECT doc_id FROM mupd UNION ALL SELECT doc_id FROM bysrc)
    UNION ALL
    SELECT 'feed_update_postimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM (SELECT doc_id FROM mupd UNION ALL SELECT doc_id FROM bysrc)
    UNION ALL
    SELECT 'mor_invariants', CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    """,
)
def table_merge_clauses_mor(spark, sf_dir):
    """The FULL MERGE clause matrix under merge-on-read (VERDICT r13
    #3): ONE merge_into_mor commit runs ordered conditioned WHEN
    MATCHED clauses (UPDATE SET with t./s. expressions where
    s.n_chars%3=0, DELETE where %3=1, unclaimed pairs UNTOUCHED — in
    MoR that means zero write cost, not a carry-rewrite), a
    conditional INSERT (even n_chars only), AND a by-source UPDATE
    (unmatched target rows with n_chars%5=0 re-tagged 'stale') — with
    NO pre-existing data file rewritten. The mor_invariants row pins
    that structurally (n=1: every v0 file still live; agg=1: the
    commit assigned deletion vectors); the feed_* rows pin the typed
    change feed per clause: update pairs = clause-1 matches + fired
    by-source rows, deletes = clause-2 matches only, inserts = the
    condition-passing unmatched source rows, NOTHING for unclaimed
    pairs or unfired by-source rows.

    Scale: candidate-file skipping is disabled by the by-source clause
    (any file may hold an unmatched row — the same rule as COW), but
    the WRITE stays O(touched rows): DV containers for claimed/fired
    positions plus appended rebuilds, never O(containing files) — the
    trickle-upsert shape Delta/Iceberg users run MoR for. Reference
    parity: generate_decisions_summaries.py:96-118's per-row
    refresh/skip/drop decision table as one minimal-write commit."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapmclmor_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(
        spark, root,
        d.filter("doc_id % 3 = 0").withColumn("tag", F.lit("base"))
        .repartition(3),
    )
    files_v0 = set(snap.live_files(root))
    src = d.filter("doc_id % 2 = 0").withColumn("tag", F.lit("src"))
    v = snap.merge_into_mor(
        spark, root, src, ["doc_id"],
        matched_clauses=[
            {"action": "update", "condition": "s.n_chars % 3 = 0",
             "set": {"n_chars": "s.n_chars + t.n_chars", "tag": "'upd'"}},
            {"action": "delete", "condition": "s.n_chars % 3 = 1"},
        ],
        not_matched_condition="n_chars % 2 = 0",
        not_matched_by_source="update",
        not_matched_by_source_condition="n_chars % 5 = 0",
        not_matched_by_source_set={"tag": "'stale'"},
    )
    preserved = int(files_v0 <= set(snap.live_files(root)))
    has_dv = int(bool(snap.dv_map(root)))
    inv = spark.createDataFrame(
        [("mor_invariants", preserved, has_dv)],
        "metric string, n long, agg long")
    return _merge_clauses_stats(spark, root, v).unionByName(inv)


@register(
    "table_merge_mark_stale",
    oracle="""
    WITH t AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0),
    head AS (
        SELECT doc_id,
               n_chars + CASE WHEN doc_id % 12 = 0 THEN 1000 ELSE 0 END
                   AS n_chars,
               'live' AS status
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id, n_chars, 'live' FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        SELECT doc_id,
               CASE WHEN n_chars % 2 = 0 THEN -n_chars ELSE n_chars END,
               CASE WHEN n_chars % 2 = 0 THEN 'stale' ELSE 'live' END
        FROM documents WHERE doc_id % 3 = 0 AND doc_id % 6 <> 0
    ),
    upd AS (
        SELECT doc_id FROM documents WHERE doc_id % 12 = 0
        UNION ALL
        SELECT doc_id FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 6 <> 0 AND n_chars % 2 = 0
    )
    SELECT 'v0_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS agg FROM t
    UNION ALL
    SELECT 'head_docs', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) FROM head
    UNION ALL
    SELECT 'head_stale', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM head WHERE status = 'stale'
    UNION ALL
    SELECT 'feed_insert', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT)
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT 'feed_delete', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'feed_update_preimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM upd
    UNION ALL
    SELECT 'feed_update_postimage', CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM upd
    """,
)
def table_merge_mark_stale(spark, sf_dir):
    """MERGE's by-source UPDATE clause — Delta's WHEN NOT MATCHED BY
    SOURCE THEN UPDATE SET (VERDICT r11 #2): ONE merge_into(
    not_matched_by_source="update") commit replaces matched rows,
    inserts new ones, AND marks target rows absent from the source as
    stale (condition-gated: only even-n_chars unmatched rows flip;
    odd-n_chars rows are carried untouched). The SET negates n_chars
    while another SET'd column reads it — evaluated simultaneously
    against the pre-update row, Delta's UPDATE rule. The typed change
    feed classifies by-source updates as update_preimage/postimage
    pairs (old/new copies share the merge key) while untouched rows in
    rewritten files cancel and emit NOTHING — the feed_* rows pin that
    exactly (zero deletes: this sync marks, never removes).

    Scale: identical to the delete-form sync — the rewrite set is
    file-bounded (files holding a matched or clause-touched row), the
    clause itself is an anti-join against the broadcast source key set,
    and CHANGE DATA stays O(diff). Reference parity: the reference's
    pipeline re-derives its whole decision_summaries.csv per run
    (decisions-summaries/generate_decisions_summaries.py:119-121);
    mark-stale is the incremental form a real sync needs — rows that
    fell out of the extract are flagged, not silently dropped."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapmstale_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    base = d.filter("doc_id % 3 = 0").withColumn("status", F.lit("live"))
    _snap_create(spark, root, base.repartition(3))
    src = (
        d.filter("doc_id % 6 = 0")
        .withColumn(
            "n_chars",
            F.col("n_chars")
            + F.when(F.col("doc_id") % 12 == 0, F.lit(1000)).otherwise(0),
        )
        .unionByName(d.filter("doc_id % 3 = 1"))
        .withColumn("status", F.lit("live"))
    )
    v = snap.merge_into(
        spark, root, src, ["doc_id"],
        not_matched_by_source="update",
        not_matched_by_source_condition="n_chars % 2 = 0",
        not_matched_by_source_set={"status": "'stale'",
                                   "n_chars": "-n_chars"},
    )

    def stats(label: str, version: int):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("agg"),
        ).select(F.lit(label).alias("metric"), "n", "agg")

    stale = (
        snap.read(spark, root, v).filter("status = 'stale'").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("agg"),
        ).select(F.lit("head_stale").alias("metric"), "n", "agg")
    )
    feed = snap.changes(spark, root, v - 1, v, classify_updates=True)
    kinds = spark.createDataFrame(
        [("insert",), ("delete",), ("update_preimage",),
         ("update_postimage",)], "_change_type string")
    feed_stats = (
        kinds.join(
            feed.groupBy("_change_type").agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("doc_id").alias("_agg"),
            ),
            "_change_type", "left",
        )
        .select(
            F.concat(F.lit("feed_"), F.col("_change_type")).alias("metric"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("_agg"), F.lit(0)).cast("long").alias("agg"),
        )
    )
    return stats("v0_docs", v - 1).unionByName(
        stats("head_docs", v)).unionByName(stale).unionByName(feed_stats)


@register(
    "table_type_widening",
    oracle="""
    SELECT 'era0_head' AS metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS chars,
           CAST(CAST(COALESCE(SUM(CAST(n_chars % 10000 + 0.25
                                       AS DECIMAL(9,2))), 0)
                     AS DECIMAL(38,4)) AS VARCHAR) AS money
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'era1_head',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_chars + 3000000000), 0) AS BIGINT),
           CAST(CAST(COALESCE(SUM(CAST(n_chars + 0.0625 AS DECIMAL(13,4))),
                              0) AS DECIMAL(38,4)) AS VARCHAR)
    FROM documents WHERE doc_id % 2 = 1
    UNION ALL
    SELECT 'v0_narrow',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(n_chars), 0) AS BIGINT),
           CAST(CAST(COALESCE(SUM(CAST(n_chars % 10000 + 0.25
                                       AS DECIMAL(9,2))), 0)
                     AS DECIMAL(38,4)) AS VARCHAR)
    FROM documents WHERE doc_id % 2 = 0
    """,
)
def table_type_widening(spark, sf_dir):
    """TYPE-WIDENING schema evolution (VERDICT r10 #3 — Delta's type
    widening): v0 CREATEs documents with an INT char count and a
    DECIMAL(9,2) money column; two METADATA commits widen them to
    BIGINT / DECIMAL(13,4) (zero files rewritten); an era-1 append then
    lands values the narrow types could not hold (+3e9 chars, 4-decimal
    money). The head read proves one scan spans both eras exactly —
    narrow-era parquet pages surface under the wide schema via Spark 4's
    native parquet type promotions (int32→long, decimal rescale), so
    era0_head equals v0_narrow value-for-value while era1_head carries
    the beyond-int32 sums. Narrowing refusals, the metadata-commit
    conflict classification, and era-accurate time travel are pinned in
    tests/test_snapshots.py::test_widen_column_type_*.

    Scale: outgrowing an int32 id or decimal(9,2) money column on a
    100 TB table costs ONE commit-log JSON here; the alternative is an
    O(table) CREATE-TABLE-AS rewrite."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapwiden_{tag}")

    d = load_table(spark, sf_dir, "documents")
    era0 = d.filter("doc_id % 2 = 0").select(
        "doc_id",
        F.expr("CAST(n_chars AS INT)").alias("n_chars_i"),
        F.expr("CAST(n_chars % 10000 + 0.25 AS DECIMAL(9,2))").alias("price"),
    )
    _snap_create(spark, root, era0.repartition(2))
    snap.widen_column_type(root, "n_chars_i", "long")
    snap.widen_column_type(root, "price", "decimal(13,4)")
    era1 = d.filter("doc_id % 2 = 1").select(
        "doc_id",
        F.expr("CAST(n_chars + 3000000000 AS BIGINT)").alias("n_chars_i"),
        F.expr("CAST(n_chars + 0.0625 AS DECIMAL(13,4))").alias("price"),
    )
    snap.append(spark, root, era1)

    def era_stats(label: str, df, pred: str):
        return df.filter(pred).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("n_chars_i"), F.lit(0))
            .cast("long").alias("chars"),
            F.coalesce(F.sum("price"), F.lit(0))
            .cast("decimal(38,4)").cast("string").alias("money"),
        ).select(F.lit(label).alias("metric"), "n", "chars", "money")

    head = snap.read(spark, root)
    v0 = snap.read(spark, root, 0)
    return (
        era_stats("era0_head", head, "doc_id % 2 = 0")
        .unionByName(era_stats("era1_head", head, "doc_id % 2 = 1"))
        .unionByName(era_stats("v0_narrow", v0, "doc_id % 2 = 0"))
    )


@register(
    "table_vacuum_audit",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
                      CAST(COUNT(*) FILTER (lang <> 'de') AS BIGINT)
                          AS n_keep
               FROM documents)
    SELECT 'v0_create' AS metric, CAST(2 AS BIGINT) AS n_files,
           n_all AS n_rows FROM n
    UNION ALL
    SELECT 'head_after_compact', CAST(1 AS BIGINT), n_keep FROM n
    UNION ALL
    SELECT 'tag_survives_vacuum', CAST(2 AS BIGINT), n_all FROM n
    UNION ALL
    SELECT 'tag_drop_sweeps', CAST(2 AS BIGINT), n_keep FROM n
    """,
)
def table_vacuum_audit(spark, sf_dir):
    """VACUUM lifecycle end-to-end (Delta's VACUUM + Iceberg's
    tag-pinned retention), driver-evidenced: v0 CREATEs documents as
    exactly 2 files (repartition), a COW DELETE drops lang='de', OPTIMIZE
    compacts to 1 file, and v0 is TAGGED. The audited guarantees: (1)
    vacuum(retain_versions=1) reclaims every file no retained version
    references while the TAG keeps v0's 2 files readable — time travel
    to the tagged version still returns every original row AFTER the
    sweep; (2) dropping the tag releases exactly those 2 files to the
    next vacuum (the returned swept list is checked by count), after
    which HEAD still reads every kept row. File counts in the output are
    pinned by construction (repartition(2) create, max_files=1 compact),
    never by accidental layout; the intermediate delete-era sweep count
    IS layout-dependent and deliberately excluded.

    Scale: vacuum resolves keep-sets from commit-log/checkpoint JSON —
    O(files) metadata, zero data I/O; the sweep itself is embarrassingly
    parallel deletes. The tag pin is what makes audit/repro snapshots
    compatible with storage reclamation on a 100 TB table."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapvac_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    _snap_create(spark, root, d.repartition(2))
    snap.delete_where(spark, root, "lang = 'de'")
    snap.compact(spark, root, max_files=1)
    snap.tag(root, "pinned", version=0)
    snap.vacuum(root, retain_versions=1)
    rows = [
        ("v0_create", len(snap.live_files(root, 0)),
         snap.read(spark, root, 0).count()),
        ("head_after_compact", len(snap.live_files(root)),
         snap.read(spark, root).count()),
        # the tagged era survived the sweep: still 2 files, all rows
        ("tag_survives_vacuum", len(snap.live_files(root, 0)),
         snap.read_tag(spark, root, "pinned").count()),
    ]
    snap.delete_tag(root, "pinned")
    swept = snap.vacuum(root, retain_versions=1)
    rows.append(
        ("tag_drop_sweeps", len(swept), snap.read(spark, root).count())
    )
    return spark.createDataFrame(
        rows, "metric string, n_files long, n_rows long"
    )


@register(
    "table_row_ids",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         keep AS (SELECT * FROM documents WHERE (lang = 'de') IS NOT TRUE)
    SELECT (SELECT n FROM n) AS n_v0,
           (SELECT n FROM n) AS ids_v0,
           CAST(0 AS BIGINT) AS min_v0,
           (SELECT n - 1 FROM n) AS max_v0,
           (SELECT n * (n - 1) // 2 FROM n) AS sum_v0,
           CAST((SELECT COUNT(*) FROM keep) AS BIGINT) AS n_head,
           CAST((SELECT COUNT(*) FROM keep) AS BIGINT) AS ids_head,
           CAST((SELECT COUNT(*) FROM keep) AS BIGINT) AS n_stable,
           CAST(1000 * (SELECT COUNT(*) FROM keep WHERE doc_id % 10 = 0)
                AS BIGINT) AS chars_delta
    """,
)
def table_row_ids(spark, sf_dir):
    """Row tracking (Delta's row tracking): every row gets a STABLE
    bigint `_row_id` minted once at its first commit — fresh files store
    NOTHING (id = logged per-file base + row position, O(files) metadata
    from the stats pass's row counts), and every COW/OPTIMIZE rewrite
    MATERIALIZES the ids into a hidden parquet column the pinned-schema
    read never sees. The fixture: v0 CREATE documents tracked (3 files),
    then OPTIMIZE (materializing rewrite), COW DELETE lang='de', and
    UPDATE n_chars+=1000 on doc_id%10=0 — three full rewrites of the
    survivor set. The one-row output proves: v0 ids are exactly the
    dense range 0..N-1 (count/distinct/min/max/sum all pinned), the head
    still has one distinct id per surviving row, and the _row_id
    equi-join between HEAD and the v0 time travel matches every survivor
    to ITS original row (n_stable = survivor count; the joined n_chars
    delta isolates exactly the updated rows) — the id is a durable key
    across rewrites, which file paths and row positions are not.
    Append/merge watermark minting, restore/clone/checkpoint carriage,
    and MOR interplay are pinned in tests/test_snapshots.py.

    Scale: incremental consumers (CDC appliers, feature stores, vector
    indexes) need a join key that survives OPTIMIZE; row ids give them
    one for O(files) log metadata on the fresh path and one hidden
    column only on rewritten files — exactly Delta's design."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snaprid_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.repartition(3), row_tracking=True)
    snap.compact(spark, root, max_files=2)
    snap.delete_where(spark, root, "lang = 'de'")
    snap.update_where(spark, root, "doc_id % 10 = 0",
                      {"n_chars": "n_chars + 1000"})

    v0 = snap.read_with_row_ids(spark, root, 0).select(
        "doc_id", "n_chars", "_row_id"
    )
    head = snap.read_with_row_ids(spark, root).select(
        "doc_id", "n_chars", "_row_id"
    )
    a_v0 = v0.agg(
        F.count(F.lit(1)).cast("long").alias("n_v0"),
        F.countDistinct("_row_id").cast("long").alias("ids_v0"),
        F.min("_row_id").cast("long").alias("min_v0"),
        F.max("_row_id").cast("long").alias("max_v0"),
        F.sum("_row_id").cast("long").alias("sum_v0"),
    )
    a_head = head.agg(
        F.count(F.lit(1)).cast("long").alias("n_head"),
        F.countDistinct("_row_id").cast("long").alias("ids_head"),
    )
    j = head.alias("h").join(v0.alias("v"), "_row_id")
    a_join = j.agg(
        F.sum(
            F.when(F.col("h.doc_id") == F.col("v.doc_id"), 1).otherwise(0)
        ).cast("long").alias("n_stable"),
        F.sum(F.col("h.n_chars") - F.col("v.n_chars"))
        .cast("long").alias("chars_delta"),
    )
    return a_v0.crossJoin(F.broadcast(a_head)).crossJoin(F.broadcast(a_join))


@register(
    "table_null_prune",
    oracle="""
    SELECT 'with_score' AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT 'unscored' AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents WHERE doc_id % 3 <> 0
    """,
)
def table_null_prune(spark, sf_dir):
    """NULL-predicate data skipping (Delta's nullCount stats): every
    commit's stats pass records [min, max, null_count] per file-column
    in the one pass it already ran; `read_pruned(is_null=...)` /
    `(not_null=...)` then skip whole files from the log alone — a file
    with zero nulls can't satisfy IS NULL, an all-null file can't
    satisfy IS NOT NULL. The fixture derives a nullable `score`
    (non-null iff doc_id%3=0) and clusters the write on that predicate,
    so the two NULL-tier reads each open ONLY their half of the files;
    the residual row filter exacts the rows, and the two output groups
    recompute from the raw table in the oracle. That files are actually
    SKIPPED (file-count assertions) and that pre-nullcount-era commits
    (2-element [min,max] stats) degrade to scanning — never to a wrong
    prune — are pinned in tests/test_snapshots.py.

    Scale: IS NULL filters are everywhere in data-quality and backfill
    scans (`WHERE embedding IS NULL` drives re-embedding jobs); at
    100 TB the null-count tier turns those into O(affected files) reads
    using metadata the writer was already collecting."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapnull_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    scored = d.withColumn(
        "score",
        F.when(F.col("doc_id") % 3 == 0, F.col("n_chars")).cast("long"),
    )
    _snap_create(
        spark, root,
        scored.repartition(2, (F.col("doc_id") % 3 == 0).cast("int")),
    )

    def stats(label: str, df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        ).select(F.lit(label).alias("grp"),
                 "n_docs", "total_chars", "first_doc", "last_doc")

    return stats(
        "with_score", snap.read_pruned(spark, root, not_null=["score"])
    ).unionByName(
        stats("unscored", snap.read_pruned(spark, root, is_null=["score"]))
    )


@register(
    "table_partition_evolve",
    oracle="""
    SELECT 'by_lang' AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents WHERE lang IN ('de', 'en')
    UNION ALL
    SELECT 'by_bucket' AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents WHERE doc_id BETWEEN 100 AND 299
    """,
)
def table_partition_evolve(spark, sf_dir):
    """PARTITION SPEC EVOLUTION (Iceberg's founding feature; Delta needs a
    full rewrite): half the corpus is CREATEd under partition_by=['lang'],
    then ONE metadata commit (`evolve_partition_spec`) switches future
    writes to an integer bucket transform (doc_id DIV 200) and the other
    half appends under the NEW layout — zero existing bytes touched. The
    two pruned reads prove per-era pruning: the lang read prunes the
    old-era files on their Hive values (new-era files pass to the stats
    tier), the doc_id read prunes new-era files on the bucket transform
    AND old-era files on their doc_id stats, and both answers equal the
    raw-table recomputation exactly. That each era opens only its own
    spec's files, OPTIMIZE lazily migrates everything to the current
    layout, the spec union survives checkpoint+log expiry, and unknown
    sources raise — all pinned in tests/test_snapshots.py.

    Scale: re-partitioning a growing table's future (daily → hourly) is
    one JSON commit instead of a 100 TB rewrite or a second table; old
    eras migrate lazily through the OPTIMIZE the table runs anyway."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snappevo_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.filter("doc_id % 2 = 0").repartition(2),
                partition_by=["lang"])
    snap.evolve_partition_spec(
        root, [{"source": "doc_id", "transform": "truncate", "param": 200}]
    )
    snap.append(spark, root, d.filter("doc_id % 2 = 1").repartition(2))

    def stats(label: str, df):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        ).select(F.lit(label).alias("grp"),
                 "n_docs", "total_chars", "first_doc", "last_doc")

    by_lang = snap.read_pruned(
        spark, root, {"lang": ("de", "en")}
    ).filter(F.col("lang").isin("de", "en"))
    by_bucket = snap.read_pruned(spark, root, {"doc_id": (100, 299)})
    return stats("by_lang", by_lang).unionByName(
        stats("by_bucket", by_bucket)
    )


_UMOR_V1 = """(
    SELECT doc_id, lang,
           CASE WHEN lang = 'de' THEN n_chars + 1000 ELSE n_chars END
               AS n_chars
    FROM documents
)"""


@register(
    "table_update_mor",
    oracle=" UNION ALL ".join([
        _version_stats_sql(0, "TRUE"),
        f"""
    SELECT CAST(1 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM {_UMOR_V1}
    """,
    ]),
)
def table_update_mor(spark, sf_dir):
    """Merge-on-read UPDATE (Iceberg's positional-delete + data-file
    form of row-level UPDATE — the MOR sibling of `table_delete_mor` and
    the zero-rewrite alternative to `table_update`'s copy-on-write): v1
    updates every lang='de' row (n_chars += 1000) by committing (a) a
    deletion vector over the matched (file, position) identities and (b)
    the post-SET rows as APPENDED files — no existing data file is
    rewritten, so the write cost is O(updated rows) regardless of how
    many files contain matches. The per-version stats prove v0 time
    travel is untouched and the head reads exactly the post-update
    table. Exact update_preimage/postimage change data is always
    written (the feed's DV-delta fallback can't see this commit's
    appended inserts); supersede-is-superset across repeated MOR
    updates, the no-rewrite file-set invariant, NULL-predicate and
    constraint guards, row-id preservation, and OPTIMIZE folding the
    DVs away are pinned in tests/test_snapshots.py.

    Scale: frequent narrow UPDATEs (label fixes, redactions, feature
    backfills) on a 100 TB corpus write deltas instead of rewriting
    every touched file — the reason Iceberg v2 made MOR the default
    row-level-operation mode."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapumor_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    _snap_create(spark, root, d.repartition(3))
    snap.update_where_mor(spark, root, "lang = 'de'",
                          {"n_chars": "n_chars + 1000"})

    def stats(version: int):
        return snap.read(spark, root, version).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        ).select(
            F.lit(version).cast("long").alias("version"),
            "n_docs", "total_chars", "n_langs", "first_doc", "last_doc",
        )

    return reduce(lambda a, b: a.unionByName(b), [stats(0), stats(1)])


_CONCURRENT_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars + CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
            AS BIGINT) AS sum_chars
FROM documents WHERE lang <> 'de'
GROUP BY lang
UNION ALL
SELECT 'xx', CAST(3 AS BIGINT),
       CAST(100 + 101 + 102 AS BIGINT)
UNION ALL
SELECT '__commits', CAST(7 AS BIGINT), CAST(0 AS BIGINT)
"""


@register("table_concurrent", oracle=_CONCURRENT_ORACLE)
def table_concurrent(spark, sf_dir):
    """CONCURRENT WRITERS through the logical conflict matrix (VERDICT
    r09 #2): two real threads race live O_CREAT|O_EXCL commits on one
    partitioned snapshot table — an appender publishing three 'xx'
    batches and a DML writer running a MOR DELETE of partition 'de' then
    a MOR UPDATE in partition 'en' (n_chars + 1), every operation with
    ``max_retries`` so a lost race rebases through
    `snapshots._publish_commit`: the loser re-reads each winning commit
    and re-publishes iff the winners changed no metadata and wrote a
    DISJOINT file set (true here by partition layout — Delta's
    WriteSerializable conflict matrix; same-file or metadata races raise
    ConcurrentWriteConflict instead, pinned in tests/test_snapshots.py).
    The operations commute (appends never match the DML predicates), so
    the final table is deterministic whatever the interleaving — the
    oracle recomputes it from `documents`, and the '__commits' row pins
    that ALL seven commits landed (create + 3 appends + 2 DML + final
    OPTIMIZE) rather than any writer silently dropping out.

    Scale: without logical conflict resolution every lost race on a
    many-writer 100 TB table serializes all DML through user-level
    retries; with it, partition-disjoint writers make progress
    independently and only true conflicts surface.

    Reference parity: the reference's Postgres backend gets this from
    MVCC + row locks (generate_decisions_summaries.py writes while
    readers run); here the same guarantee is re-derived on an
    object-store-friendly optimistic log."""
    import os
    import threading

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapconc_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    _snap_create(spark, root, d, partition_by=["lang"])
    errs: list[Exception] = []

    def appender():
        try:
            for k in range(3):
                snap.append(
                    spark, root,
                    spark.createDataFrame(
                        [(1_000_000_000 + k, "xx", 100 + k)],
                        "doc_id long, lang string, n_chars long",
                    ),
                    max_retries=16,
                )
        except Exception as ex:  # pragma: no cover - asserted below
            errs.append(ex)

    def dml():
        try:
            snap.delete_where_mor(spark, root, "lang = 'de'",
                                  max_retries=16)
            snap.update_where_mor(spark, root, "lang = 'en'",
                                  {"n_chars": "n_chars + 1"},
                                  max_retries=16)
        except Exception as ex:  # pragma: no cover - asserted below
            errs.append(ex)

    ts = [threading.Thread(target=appender), threading.Thread(target=dml)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if errs:
        raise errs[0]
    # OPTIMIZE folds the DVs away after the race — and is itself the
    # seventh commit the '__commits' row pins
    snap.compact(spark, root, max_files=2, max_retries=16)

    head = snap.latest_version(root)
    agg = (
        snap.read(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )
    meta = spark.createDataFrame(
        [("__commits", head + 1, 0)],
        "lang string, n_docs long, sum_chars long",
    )
    return agg.unionByName(meta)


_BRANCH_ORACLE = """
WITH full_t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents
), merged AS (
  SELECT CAST(COUNT(*) + 2 AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) + 100 + 101 AS BIGINT) AS sum_chars
  FROM documents WHERE lang <> 'de'
)
SELECT 'main_before' AS stage, n_docs, sum_chars FROM full_t
UNION ALL
SELECT 'main_during', n_docs, sum_chars FROM full_t
UNION ALL
SELECT 'branch_head', n_docs, sum_chars FROM merged
UNION ALL
SELECT 'main_after', n_docs, sum_chars FROM merged
UNION ALL
SELECT 'feed_replay',
       CAST(2 AS BIGINT),
       CAST((SELECT COUNT(*) FROM documents WHERE lang = 'de') AS BIGINT)
"""


@register("table_branch", oracle=_BRANCH_ORACLE)
def table_branch(spark, sf_dir):
    """WRITABLE BRANCHES on the snapshot table (VERDICT r09 #3 —
    Iceberg's refs, the write-audit-publish workflow `clone` could only
    approximate with a permanent fork): fork branch 'audit' at main's
    HEAD (`create_branch` — one O_EXCL _base.json under _log/_refs/,
    zero data copied), run two commits THROUGH the branch ref (an append
    of two 'xx' docs, then a COW DELETE of lang='de'), and prove with
    emitted stages that (a) main is bit-identical while the branch
    diverges ('main_before' == 'main_during'), (b) the branch head sees
    both its commits ('branch_head'), (c) `merge_branch` fast-forwards
    the chain onto main — pure commit-JSON renames, data already in
    place — so 'main_after' == 'branch_head', and (d) the change feed
    over the merged chain replays the branch's history exactly
    ('feed_replay' counts the feed's inserts and deletes across the two
    merged commits — the replication invariant holds through a merge).
    Non-ff merges rebase through the same logical conflict matrix as
    concurrent DML (disjoint files, no metadata; pinned with cherry-pick
    and retention integration in tests/test_snapshots.py).

    Scale: branch points and merges are O(commits) JSON regardless of
    table size — a 100 TB write-audit-publish cycle moves zero data
    bytes until OPTIMIZE chooses to."""
    import os
    from functools import reduce

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapbranch_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    _snap_create(spark, root, d)

    def agg(stage: str, src_root: str):
        return snap.read(spark, src_root).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        ).select(F.lit(stage).alias("stage"), "n_docs", "sum_chars")

    stages = [agg("main_before", root)]
    snap.create_branch(root, "audit")
    broot = snap.branch_root(root, "audit")
    snap.append(
        spark, broot,
        spark.createDataFrame(
            [(1_000_000_000, "xx", 100), (1_000_000_001, "xx", 101)],
            "doc_id long, lang string, n_chars long",
        ),
    )
    snap.delete_where(spark, broot, "lang = 'de'")
    stages.append(agg("main_during", root))   # main untouched by the branch
    stages.append(agg("branch_head", broot))
    head = snap.merge_branch(spark, root, "audit")
    stages.append(agg("main_after", root))
    feed = snap.changes(spark, root, 0, head)  # (0, head]: both merged commits
    stages.append(
        feed.agg(
            F.sum((F.col("_change_type") == "insert").cast("long"))
            .cast("long").alias("n_docs"),
            F.sum((F.col("_change_type") == "delete").cast("long"))
            .cast("long").alias("sum_chars"),
        ).select(F.lit("feed_replay").alias("stage"), "n_docs", "sum_chars")
    )
    return reduce(lambda a, b: a.unionByName(b), stages)


@register(
    "stream_changes_bounded",
    oracle=" UNION ALL ".join(
        [
            _cdf_sql(1, "insert", "doc_id % 3 = 1"),
            _cdf_sql(2, "insert", "doc_id % 3 = 2"),
            _cdf_sql(3, "delete", "lang = 'de'"),
            _cdf_sql(
                5, "delete", "doc_id % 5 = 0 AND (lang = 'de') IS NOT TRUE"
            ),
        ]
    ),
)
def stream_changes_bounded(spark, sf_dir):
    """RATE-LIMITED streaming change feed (VERDICT r09 #5 — Delta's
    maxFilesPerTrigger / Kafka's maxOffsetsPerTrigger): the same live
    readStream + 6-commit fixture as `stream_table_changes`, but with
    ``max_versions_per_batch=1`` so a consumer starting from version 0
    must drain the 5-commit backlog across AT LEAST four non-empty
    micro-batches (asserted from the query's own progress log) instead
    of replaying the whole history in one — and the converged feed is
    still bit-identical to the batch `changes()` (the identical oracle):
    admission control shapes batch BOUNDARIES, never rows. Planned
    ranges replay exactly on restart (readBetweenOffsets is never
    re-clamped — the checkpointed batch must reproduce bit-identically;
    pinned with the cursor arithmetic in tests/test_streaming.py).

    Scale: a catch-up consumer on a year-old 100 TB table would
    otherwise plan ONE batch spanning every commit — unbounded executor
    memory and a single commit barrier; bounded version spans make
    catch-up incremental, checkpointable, and restartable mid-backlog."""
    return _run_cdf_stream(spark, sf_dir, "table_changes_stream",
                           max_versions_per_batch=1, min_batches=4)


_FILES_META_ORACLE = """
SELECT lang,
       CAST(COUNT(DISTINCT doc_id % 2) AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents GROUP BY lang
"""


@register("table_files_meta", oracle=_FILES_META_ORACLE)
def table_files_meta(spark, sf_dir):
    """FILES METADATA TABLE (Iceberg's `table.files` / Delta's DESCRIBE
    DETAIL): the per-partition physical inventory — live file count, row
    count, and column min/max — computed from the COMMIT LOG ALONE with
    ZERO data I/O: `live_files` resolves the snapshot's file list,
    `partition_values` its recorded partition tuples, `file_rows` the
    write-time row counts, `file_stats` the write-time min/max. The
    fixture writes each half of `documents` as one file per lang
    partition (create + append, coalesced), so per-lang n_files is the
    number of halves containing that lang and the per-lang min/max fold
    the per-FILE stats — the oracle recomputes everything from the raw
    rows, so hash-green proves the log's metadata (counts, partition
    values, stats) is row-exact, not approximate.

    Scale: this is the operational query every table owner runs
    (skew/small-file audits, OPTIMIZE targeting); on a 100 TB table it
    reads kilobytes of checkpoint/commit JSON instead of the table —
    the reason Iceberg exposes metadata AS tables. The metadata rows
    are parallelize()'d locally (they are O(files), driver-sized by
    construction — same seam as the commit log itself)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapfiles_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    _snap_create(spark, root, d.filter(F.col("doc_id") % 2 == 0).coalesce(1),
                 partition_by=["lang"])
    snap.append(spark, root, d.filter(F.col("doc_id") % 2 == 1).coalesce(1))

    pv = snap.partition_values(root)
    nrows = snap.file_rows(root)
    stats = snap.file_stats(root)
    meta = [
        (
            pv[f]["lang"],
            int(nrows[f]),
            int(stats[f]["doc_id"][0]),
            int(stats[f]["doc_id"][1]),
        )
        for f in snap.live_files(root)
    ]
    mdf = spark.createDataFrame(
        meta, "lang string, n_rows long, mn long, mx long"
    )
    return mdf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.min("mn").cast("long").alias("min_doc"),
        F.max("mx").cast("long").alias("max_doc"),
    )


_BUCKET_PROBES = (3, 17, 42, 101, 250)

_BUCKET_ORACLE = f"""
SELECT doc_id,
       CAST(1 AS BIGINT) AS n_files_scanned,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE doc_id IN {_BUCKET_PROBES}
"""


@register("table_bucket_prune", oracle=_BUCKET_ORACLE)
def table_bucket_prune(spark, sf_dir):
    """HASH-BUCKET PARTITIONING with point-probe pruning (Iceberg's
    bucket transform): the table is laid out by a PORTABLE published
    Carter-Wegman hash of doc_id into 8 buckets (one file per bucket —
    the coalesced write), and a point lookup maps the probed key through
    the SAME hash driver-side to keep exactly one file — zero data I/O
    to decide, like the truncate/day transforms but for keys with no
    exploitable order. The emitted n_files_scanned=1 per probe is the
    pruning proof (the fixture makes the per-bucket file count exact);
    range predicates are undecidable through a hash and degrade to the
    stats tier (test-pinned). Iceberg buckets with Murmur3; this engine
    publishes its hash so the pure-Python probe in `pruned_files`
    reproduces the JVM writer's bucket bit-for-bit — same portability
    discipline as the sketch keys.

    Scale: bucket layouts are how high-cardinality point-lookup keys
    (doc ids, user ids) get partition pruning without millions of tiny
    identity partitions — 8 buckets here, thousands on a 100 TB table;
    a point read opens 1/N of the table's files before any stats tier
    runs."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapbucket_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(
        spark, root, d.coalesce(1),
        partition_by=[{"name": "db", "transform": "hashbucket",
                       "source": "doc_id", "param": 8}],
    )
    out = None
    for probe in _BUCKET_PROBES:
        kept = snap.pruned_files(root, {"doc_id": (probe, probe)})
        row = (
            snap.read_pruned(spark, root, {"doc_id": (probe, probe)})
            .filter(F.col("doc_id") == probe)
            .select(
                "doc_id",
                F.lit(len(kept)).cast("long").alias("n_files_scanned"),
                F.col("n_chars").cast("long").alias("n_chars"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "stream_branch_changes",
    oracle=" UNION ALL ".join(
        [
            _cdf_sql(1, "insert", "doc_id % 3 = 1"),
            _cdf_sql(2, "insert", "doc_id % 3 = 2"),
            _cdf_sql(3, "delete", "lang = 'de'"),
        ]
    ),
)
def stream_branch_changes(spark, sf_dir):
    """STREAMING a BRANCH's change feed (the r10 branch layer composed
    with the streaming CDF source): fork 'wip' off a 2-commit main, run
    an append + a MOR DELETE on the branch, then also land a DECOY
    append on MAIN after the fork — and readStream over
    `branch_root(root, 'wip')`. The ref-aware log resolution gives the
    stream main's chain THROUGH the fork point plus the branch's own
    commits; the decoy main commit is invisible (its rows carry
    n_chars bumped by 10^6, so any leak would blow the hash). The
    oracle recomputes the branch's expected feed from the raw table —
    hash-green proves streaming isolation end to end, the live-run twin
    of tests/test_streaming.py's offset-level check.

    Scale: a staging pipeline can stream-validate its un-published
    branch exactly like production streams main — same source, same
    offsets, zero copies (branch payloads share the table's data/)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapcdcbranch_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    _snap_create(spark, root, d.filter(F.col("doc_id") % 3 == 0))
    snap.append(spark, root, d.filter(F.col("doc_id") % 3 == 1))  # main v1
    snap.create_branch(root, "wip")
    broot = snap.branch_root(root, "wip")
    snap.append(spark, broot, d.filter(F.col("doc_id") % 3 == 2))  # b v2
    snap.delete_where_mor(spark, broot, "lang = 'de'", cdf=True)   # b v3
    # decoy on MAIN after the fork: must never reach the branch stream
    snap.append(
        spark, root,
        d.filter(F.col("doc_id") % 3 == 2)
        .withColumn("n_chars", F.col("n_chars") + 1_000_000),
    )
    return _run_cdf_stream(spark, sf_dir, "table_changes_stream",
                           root=broot)


@register("table_sql_merge", oracle=_MERGE_CLAUSES_ORACLE)
def table_sql_merge(spark, sf_dir):
    """SQL DML front-end, MERGE (VERDICT r12 #2): the EXACT
    table_merge_clauses commit — ordered conditioned WHEN MATCHED
    clauses, conditional INSERT — driven through a ``MERGE INTO`` SQL
    string (sources/sql_dml.py) instead of the Python clause list, with
    the source bound as a USING subquery over a temp view. Same oracle
    as the Python twin, so the driver's value hash pins the two paths
    bit-equal: the front-end is pure syntax over the same transactional
    writer (atomic commit, typed change feed included in the output).

    Reference parity: the reference's ONLY interface is SQL strings over
    psycopg2/SQLAlchemy (SURVEY §1.1; /root/reference/README.md:15-18) —
    this closes the last surface asymmetry between its front door and
    the engine's table format. Scale: parsing is O(statement) on the
    driver; the physical plan is merge_into's broadcast-semi hit-file
    discovery + file-bounded rewrite, unchanged."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.sql_dml import execute_dml

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapsqlm_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(
        spark, root,
        d.filter("doc_id % 3 = 0").withColumn("tag", F.lit("base"))
        .repartition(3),
    )
    d.filter("doc_id % 2 = 0").createOrReplaceTempView("sqlm_changes")
    v = execute_dml(
        spark,
        """MERGE INTO docs AS tgt
           USING (SELECT *, 'src' AS tag FROM sqlm_changes) AS delta
           ON tgt.doc_id = delta.doc_id
           WHEN MATCHED AND delta.n_chars % 3 = 0 THEN
               UPDATE SET n_chars = delta.n_chars + tgt.n_chars,
                          tag = 'upd'
           WHEN MATCHED AND delta.n_chars % 3 = 1 THEN DELETE
           WHEN NOT MATCHED AND n_chars % 2 = 0 THEN INSERT *""",
        {"docs": root},
    )
    return _merge_clauses_stats(spark, root, v)


@register(
    "table_sql_update",
    oracle="""
    WITH base AS (SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0),
    upd AS (
        SELECT doc_id,
               CASE WHEN doc_id % 5 = 0 THEN n_chars * 2 + 1
                    ELSE n_chars END AS n_chars,
               CASE WHEN doc_id % 5 = 0 THEN
                        (CASE WHEN n_chars % 2 = 0 THEN 'even' ELSE 'odd' END)
                    ELSE 'base' END AS tag
        FROM base
    )
    SELECT CAST(doc_id % 7 AS BIGINT) AS bucket, tag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM upd GROUP BY doc_id % 7, tag
    """,
)
def table_sql_update(spark, sf_dir):
    """SQL DML front-end, UPDATE: ``UPDATE ... SET ... WHERE`` routed to
    the copy-on-write update_where — including a CASE WHEN inside a SET
    expression (the statement scanner treats CASE...END as nesting, so
    expression-level WHEN/THEN never split statement clauses) and the
    simultaneous-SET rule (the tag CASE reads the OLD n_chars even
    though n_chars is SET in the same statement). Oracle recomputes the
    post-UPDATE table directly from parquet. Scale: one predicate scan
    for hit-file discovery + a rewrite bounded to files containing
    matches — the statement adds only driver-side parsing."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.sql_dml import execute_dml

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapsqlu_{tag}")

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    _snap_create(
        spark, root,
        d.filter("doc_id % 3 = 0").withColumn("tag", F.lit("base"))
        .repartition(3),
    )
    execute_dml(
        spark,
        """UPDATE docs
           SET n_chars = n_chars * 2 + 1,
               tag = CASE WHEN n_chars % 2 = 0 THEN 'even' ELSE 'odd' END
           WHERE doc_id % 5 = 0""",
        {"docs": root},
    )
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    return (
        snap.read(spark, root)
        .groupBy(
            F.expr("doc_id % 7").cast("long").alias("bucket"), "tag"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


@register(
    "table_sql_delete",
    oracle="""
    WITH base AS (
        SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 3 = 0
    ),
    kept AS (SELECT * FROM base WHERE (n_chars % 4 = 1) IS NOT TRUE)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM kept GROUP BY source
    """,
)
def table_sql_delete(spark, sf_dir):
    """SQL DML front-end, DELETE: ``DELETE FROM ... WHERE`` routed to
    the copy-on-write delete_where, inheriting the NULL-predicate
    discipline (rows where the condition evaluates NULL are KEPT — the
    oracle's IS NOT TRUE). Per-source survivor stats are the
    observable. Scale: hit-file discovery is one scan; only files
    containing predicate-TRUE rows are rewritten."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.sql_dml import execute_dml

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapsqld_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    execute_dml(spark, "DELETE FROM docs WHERE n_chars % 4 = 1",
                {"docs": root})
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    return (
        snap.read(spark, root)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )


@register(
    "table_dv_bitmap",
    oracle="""
    WITH base AS (
        SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 3 = 0
    ),
    gone AS (
        SELECT * FROM base WHERE n_chars % 5 = 0 OR doc_id % 7 = 0
    ),
    kept AS (
        SELECT * FROM base
        WHERE NOT (n_chars % 5 = 0 OR doc_id % 7 = 0)
    )
    SELECT 'src_' || source AS metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS agg
    FROM kept GROUP BY source
    UNION ALL
    SELECT 'dv_positions',
           CAST((SELECT COUNT(*) FROM gone) AS BIGINT),
           CAST((SELECT COUNT(*) FROM gone) AS BIGINT)
    """,
)
def table_dv_bitmap(spark, sf_dir):
    """Compressed deletion vectors (VERDICT r12 #6): two overlapping
    merge-on-read DELETEs whose positions land in bit-packed per-file
    bitmaps — the superseding commit ORs the old bits in (structural
    dedup), the scan applies them as one broadcast byte-probe per row,
    and the decoded entry view still yields each (file, pos) exactly
    once. The output pins both the relational result (per-source
    survivor stats after the two deletes) and the encoding's own
    bookkeeping: the bitmap rows' summed cardinality AND the decoded
    entry count both equal the deleted-row count the oracle derives
    relationally.

    Scale: this is why Delta/Iceberg ship bitmap DVs — a billion-row
    file's trickle deletes cost O(rows/8) bytes once, not O(deleted x
    16) parquet rows per commit, and the scan-side cost is one byte
    probe instead of an O(deleted) hash-join build
    (tests/test_dv_bitmap.py pins the size bound)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapdvbm_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    snap.delete_where_mor(spark, root, "n_chars % 5 = 0")
    snap.delete_where_mor(spark, root, "doc_id % 7 = 0")
    head = (
        snap.read(spark, root)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("agg"),
        )
        .select(
            F.concat(F.lit("src_"), F.col("source")).alias("metric"),
            "n", "agg",
        )
    )
    ptr = snap.dv_map(root)
    card_sum = (
        snap._read_dv_bitmaps(spark, root, ptr)
        .agg(F.coalesce(F.sum("card"), F.lit(0)).cast("long").alias("n"))
    )
    decoded = snap.dv_entries(spark, root).agg(
        F.count(F.lit(1)).cast("long").alias("agg")
    )
    meta = card_sum.crossJoin(decoded).select(
        F.lit("dv_positions").alias("metric"), "n", "agg"
    )
    return head.unionByName(meta)


@register(
    "table_merge_skipping",
    oracle="""
    WITH merged AS (
        SELECT doc_id,
               CASE WHEN doc_id BETWEEN 40 AND 59 THEN n_chars * 2 + 1
                    ELSE n_chars END AS n_chars
        FROM documents
    )
    SELECT 'band_' || CAST(doc_id // 63 AS VARCHAR) AS metric,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS agg
    FROM merged GROUP BY doc_id // 63
    UNION ALL
    SELECT 'skip_proof', CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    """,
)
def table_merge_skipping(spark, sf_dir):
    """Write-side stats file skipping for MERGE (VERDICT r12 #7): on a
    key-clustered table (band = doc_id DIV 63 as a partition column, so
    each file's recorded doc_id min/max range is disjoint per band) a
    narrow-key MERGE consults `merge_candidate_files` — min/max stats
    bounds from ONE small aggregation over the source key set, plus the
    bloom index when present — and probes only files that can contain a
    source key. The 'skip_proof' row pins both halves live: n=1 ⇔ the
    candidate set was STRICTLY smaller than the live set, agg=1 ⇔ every
    file the merge actually rewrote was inside the candidate set (no
    false negatives); the band rows pin the relational result.

    Scale: this is Delta's MERGE source-range pushdown — a trickle
    upsert on a key-clustered 100 TB table finds its matched files from
    log metadata instead of scanning the corpus; the hit-detection scan
    drops from O(table) to O(candidate files)."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapmskip_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.expr("doc_id DIV 63").alias("band")
    )
    _snap_create(spark, root, d, partition_by=["band"])
    live0 = snap.live_files(root)
    src = d.filter("doc_id BETWEEN 40 AND 59").withColumn(
        "n_chars", F.col("n_chars") * 2 + 1
    )
    keys = src.select("doc_id").distinct()
    cand = set(snap.merge_candidate_files(spark, root, keys, ["doc_id"]))
    v = snap.merge_into(spark, root, src, ["doc_id"])
    rewritten = set(live0) - set(snap.live_files(root, v))
    head = (
        snap.read(spark, root)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("agg"),
        )
        .select(
            F.concat(F.lit("band_"), F.col("band").cast("string")).alias(
                "metric"
            ),
            "n", "agg",
        )
    )
    meta = spark.createDataFrame(
        [(
            "skip_proof",
            1 if len(cand) < len(live0) else 0,
            1 if rewritten <= cand else 0,
        )],
        "metric string, n long, agg long",
    )
    return head.unionByName(meta)


@register(
    "table_sql_insert",
    oracle="""
    WITH base AS (
        SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 3 = 0
    ),
    ins_sel AS (
        SELECT doc_id + 1000000 AS doc_id, source, n_chars + 1 AS n_chars
        FROM documents WHERE doc_id % 10 = 0
    ),
    ins_val AS (
        SELECT * FROM (VALUES (9000001, 'manual', 11),
                              (9000002, 'manual', 22))
               AS t(doc_id, source, n_chars)
    ),
    all_rows AS (
        SELECT * FROM base
        UNION ALL SELECT * FROM ins_sel
        UNION ALL SELECT * FROM ins_val
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM all_rows GROUP BY source
    """,
)
def table_sql_insert(spark, sf_dir):
    """SQL DML front-end, INSERT (completing the statement family of
    VERDICT r12 #2): ``INSERT INTO ... SELECT`` (positional mapping,
    the source a temp view queried through spark.sql — the reference's
    all-SQL ingestion shape) and ``INSERT INTO ... VALUES`` (bare
    literals assignment-cast to the pinned column types, ANSI
    semantics) both route to the append commit, which owns schema
    checks, DEFAULT fill and generated columns. Two commits, then
    per-source stats over the head read.

    Scale: appends are the one DML whose lost commit race rebases
    trivially (writer-private files, nothing removed) — the SQL layer
    inherits that via max_retries untouched."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import execute_dml

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapsqli_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    d.createOrReplaceTempView("sqlins_docs")
    execute_dml(
        spark,
        """INSERT INTO docs
           SELECT doc_id + 1000000, source, n_chars + 1
           FROM sqlins_docs WHERE doc_id % 10 = 0""",
        {"docs": root},
    )
    execute_dml(
        spark,
        "INSERT INTO docs VALUES (9000001, 'manual', 11), "
        "(9000002, 'manual', 22)",
        {"docs": root},
    )
    return (
        snap.read(spark, root)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


@register(
    "table_sql_select",
    oracle="""
    WITH base AS (
        SELECT source, n_chars FROM documents WHERE doc_id % 3 = 0
    ),
    kept AS (SELECT * FROM base WHERE (n_chars % 2 = 0) IS NOT TRUE),
    h AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS h_n,
               CAST(SUM(n_chars) AS BIGINT) AS h_chars
        FROM kept GROUP BY source
    ),
    v0 AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS v0_n
        FROM base GROUP BY source
    )
    SELECT h.source, h.h_n, h.h_chars, v0.v0_n
    FROM h JOIN v0 ON h.source = v0.source
    """,
)
def table_sql_select(spark, sf_dir):
    """SQL SELECT front-end with time travel (the READ half of the
    all-SQL surface; the DML half is table_sql_merge/update/delete/
    insert): one statement joins the HEAD read against ``VERSION AS OF
    0`` of the same snapshot table through `read_sql` — table names
    bound to DV-aware snapshot reads as temp views, Spark SQL owning
    every query semantic, quote-aware so literals never rewrite. The
    preceding COW DELETE also runs through the SQL front-end, so the
    whole key is statements end-to-end, the reference's exact usage
    shape (SURVEY §1.1).

    Scale: binding is driver-side string work; the physical scans are
    snapshots.read's (log-resolved live files, bitmap-DV probe), so
    partition/stats pruning and every Catalyst pushdown apply
    unchanged."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        execute_dml,
        read_sql,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapsqls_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    execute_dml(spark, "DELETE FROM docs WHERE n_chars % 2 = 0",
                {"docs": root})
    return read_sql(
        spark,
        """SELECT h.source, h.h_n, h.h_chars, v0.v0_n
           FROM (SELECT source, COUNT(*) AS h_n,
                        SUM(n_chars) AS h_chars
                 FROM docs GROUP BY source) h
           JOIN (SELECT source, COUNT(*) AS v0_n
                 FROM docs VERSION AS OF 0 GROUP BY source) v0
             ON h.source = v0.source""",
        {"docs": root},
    ).select(
        "source",
        F.col("h_n").cast("long").alias("h_n"),
        F.col("h_chars").cast("long").alias("h_chars"),
        F.col("v0_n").cast("long").alias("v0_n"),
    )


@register(
    "table_sql_timetravel",
    oracle="""
    WITH base AS (
        SELECT source, n_chars FROM documents WHERE doc_id % 3 = 0
    ),
    kept AS (SELECT * FROM base WHERE (n_chars % 2 = 0) IS NOT TRUE),
    v0 AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS v0_n
        FROM base GROUP BY source
    ),
    h AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS h_n
        FROM kept GROUP BY source
    )
    SELECT v0.source, v0.v0_n AS ts_v0_n, v0.v0_n, h.h_n AS ts_head_n
    FROM v0 JOIN h ON v0.source = h.source
    """,
)
def table_sql_timetravel(spark, sf_dir):
    """Both SQL time-travel forms against the SAME pinned snapshots
    (VERDICT r13 #2): the statement reads ``TIMESTAMP AS OF`` at the
    v0 commit's instant alongside ``VERSION AS OF 0`` — the ts_v0_n
    column hash-equals v0_n, proving the timestamp resolver
    (`snapshots.version_as_of`: newest commit at-or-before, commit-log
    epoch-ms clock) lands on exactly the version pin — plus a second
    TIMESTAMP AS OF at the head commit's instant (post-DELETE counts).
    Commit timestamps are pinned deterministically (100 s / 200 s
    epoch) the way Delta's own time-travel tests do, so the key never
    races the wall clock. Malformed-literal refusal is pinned by
    tests/test_sql_dml.py::test_read_sql_timestamp_as_of.

    Scale: resolution is one driver-side pass over the commit log's
    recorded timestamps (O(commits), no data I/O); the reads that run
    are ordinary pinned-version snapshot scans."""
    import json
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        execute_dml,
        read_sql,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapsqltt_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    execute_dml(spark, "DELETE FROM docs WHERE n_chars % 2 = 0",
                {"docs": root})
    for v, ts in ((0, 100_000), (1, 200_000)):
        p = snap._commit_path(root, v)
        with open(p, encoding="utf-8") as fh:
            c = json.load(fh)
        c["ts"] = ts
        tmp = p + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(c, fh)
        os.replace(tmp, p)
    return read_sql(
        spark,
        """SELECT v0.source, ts0.ts_v0_n, v0.v0_n, tsh.ts_head_n
           FROM (SELECT source, COUNT(*) AS v0_n
                 FROM docs VERSION AS OF 0 GROUP BY source) v0
           JOIN (SELECT source, COUNT(*) AS ts_v0_n
                 FROM docs TIMESTAMP AS OF '1970-01-01 00:02:30'
                 GROUP BY source) ts0
             ON v0.source = ts0.source
           JOIN (SELECT source, COUNT(*) AS ts_head_n
                 FROM docs TIMESTAMP AS OF '1970-01-01 00:03:20'
                 GROUP BY source) tsh
             ON v0.source = tsh.source""",
        {"docs": root},
    ).select(
        "source",
        F.col("ts_v0_n").cast("long").alias("ts_v0_n"),
        F.col("v0_n").cast("long").alias("v0_n"),
        F.col("ts_head_n").cast("long").alias("ts_head_n"),
    )


@register(
    "table_sql_ddl",
    oracle="""
    WITH rows_all AS (
        SELECT source, n_chars, NULL AS tag
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT source, n_chars, 'new'
        FROM documents WHERE doc_id % 3 = 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(CASE WHEN tag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS legacy_null,
           CAST(SUM(CASE WHEN tag = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS tagged
    FROM rows_all GROUP BY source
    """,
)
def table_sql_ddl(spark, sf_dir):
    """SQL DDL front-end end-to-end (VERDICT r13 #4 — the LAST SQL
    asymmetry vs the reference's all-SQL client): the table is built
    ENTIRELY from SQL strings — CREATE TABLE with typed columns and a
    hashbucket partition transform, INSERT INTO ... SELECT, ALTER TABLE
    ADD COLUMN (a metadata-only commit: pre-DDL files null-fill the new
    column at scan time, which the legacy_null column pins), a second
    column-list INSERT under the evolved schema, and ADD CONSTRAINT
    CHECK (validated against existing rows before publishing). Every
    statement routes to the existing metadata/data commit writers —
    the SQL layer is driver-side syntax only. DDL-vs-Python-API
    hash-equality and the refusal matrix are pinned by
    tests/test_sql_ddl.py.

    Scale: CREATE/ALTER are O(1) JSON commits; ADD COLUMN on a 100 TB
    table rewrites zero bytes (Delta's ALTER TABLE rule). Reference
    parity: the reference creates and evolves its schema through
    SQLAlchemy DDL (README.md:15-18); this is that surface on the
    transactional snapshot format."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.sql_ddl import (
        execute_ddl,
    )
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        execute_dml,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapddl_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    d.createOrReplaceTempView("ddl_docs_src")
    t = {"docs": root}
    execute_ddl(
        spark,
        """CREATE OR REPLACE TABLE docs (doc_id BIGINT, source STRING,
                                         n_chars BIGINT)
           PARTITIONED BY (hashbucket(8, doc_id))""",
        t)
    execute_dml(
        spark,
        "INSERT INTO docs SELECT doc_id, source, n_chars "
        "FROM ddl_docs_src WHERE doc_id % 3 = 0",
        t)
    execute_ddl(spark, "ALTER TABLE docs ADD COLUMN tag STRING", t)
    execute_dml(
        spark,
        "INSERT INTO docs (doc_id, source, n_chars, tag) "
        "SELECT doc_id, source, n_chars, 'new' "
        "FROM ddl_docs_src WHERE doc_id % 3 = 1",
        t)
    execute_ddl(
        spark, "ALTER TABLE docs ADD CONSTRAINT chars_pos "
               "CHECK (n_chars >= 0)", t)
    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap

    return snap.read(spark, root).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("chars"),
        F.sum(F.when(F.col("tag").isNull(), 1).otherwise(0))
        .cast("long").alias("legacy_null"),
        F.sum(F.when(F.col("tag") == "new", 1).otherwise(0))
        .cast("long").alias("tagged"),
    )


@register(
    "table_insert_overwrite",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id % 2 = 0
    ),
    regen_en AS (                     -- the replaceWhere batch
        SELECT doc_id + 1000000 AS doc_id, lang, source,
               n_chars * 2 AS n_chars
        FROM base WHERE lang = 'en' AND doc_id % 10 = 0
    ),
    after_rw AS (                     -- delete-matching + append ≡ one commit
        SELECT * FROM base WHERE (lang = 'en') IS NOT TRUE
        UNION ALL SELECT * FROM regen_en
    ),
    dyn_de AS (                       -- the dynamic-partition batch
        SELECT doc_id + 2000000 AS doc_id, lang, source,
               n_chars + 7 AS n_chars
        FROM base WHERE lang = 'de' AND doc_id % 4 = 0
    ),
    after_dyn AS (                    -- only partitions the batch LANDS IN
        -- are replaced (mirrors the engine: an empty batch touches no
        -- partition and removes nothing — r15 review, latent divergence
        -- at SFs where dyn_de selects zero rows)
        SELECT * FROM after_rw
        WHERE lang NOT IN (SELECT lang FROM dyn_de)
        UNION ALL SELECT * FROM dyn_de
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM after_dyn GROUP BY lang
    """,
)
def table_insert_overwrite(spark, sf_dir):
    """INSERT OVERWRITE / replaceWhere / dynamic partition overwrite
    (VERDICT r14 #2) end-to-end on a lang-partitioned snapshot table:
    (1) the Delta SQL form `INSERT INTO t REPLACE WHERE lang = 'en'
    <query>` regenerates the 'en' slice as ONE commit — delete-matching
    + append equivalence is exactly what the oracle replays; (2) the
    Python API's dynamic mode replaces the 'de' partition because
    that's the only partition the second batch lands in, resolved from
    the log's recorded partition values with zero data I/O. Reference
    tie: the pipelines regenerate whole summary CSVs per run
    (generate_decisions_summaries.py:120) — regenerate-a-slice is this
    operator.

    Scale: the removal side is log metadata (dynamic) or a
    predicate-selected COW rewrite (replaceWhere); untouched partitions
    move by log reference — nothing snapshot-sized shuffles."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        execute_dml,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapiow_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    base = d.filter("doc_id % 2 = 0")
    _snap_create(spark, root, base.repartition(4), partition_by=["lang"])
    base.createOrReplaceTempView("iow_docs")
    execute_dml(
        spark,
        """INSERT INTO t REPLACE WHERE lang = 'en'
           SELECT doc_id + 1000000, lang, source, n_chars * 2
           FROM iow_docs WHERE lang = 'en' AND doc_id % 10 = 0""",
        {"t": root},
    )
    dyn = base.filter("lang = 'de' AND doc_id % 4 = 0").select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "lang", "source",
        (F.col("n_chars") + 7).alias("n_chars"),
    )
    snap.insert_overwrite(spark, root, dyn, dynamic_partitions=True)
    return (
        snap.read(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


@register(
    "table_copy_into",
    oracle="""
    WITH batch1 AS (
        SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 = 0
    ),
    batch2 AS (
        SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 3 = 1
    ),
    loaded AS (                       -- batch1 loads ONCE despite two runs
        SELECT * FROM batch1 UNION ALL SELECT * FROM batch2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM loaded GROUP BY lang
    """,
)
def table_copy_into(spark, sf_dir):
    """COPY INTO idempotent file ingestion (VERDICT r14 #3): batch1 is
    COPY'd TWICE — the per-file load ledger (an index artifact committed
    atomically WITH the data) makes the second run a no-op, so the
    oracle is the single-load union. batch2 lands through the SQL form
    and loads only its own new files. The double-run-equals-single-run
    equivalence IS the checked projection.

    Scale: the ledger diff is a driver-side directory walk against
    O(ingested files) metadata; only new files are read — the
    incremental crawl-ingest loop at any corpus size."""
    import os
    import shutil

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap
    from unfccc_documents_database_sandbox_spark.sources.sql_ddl import (
        execute_ddl,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapci_{tag}")
    land = os.path.join(repo_root, ".csv_tmp", f"snapci_land_{tag}")
    if os.path.exists(land):
        shutil.rmtree(land)

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    _snap_create(spark, root, d.limit(0))
    d.filter("doc_id % 3 = 0").coalesce(2).write.parquet(
        os.path.join(land, "b1"))
    snap.copy_into(spark, root, land)
    snap.copy_into(spark, root, land)  # idempotent: bit-exact no-op
    d.filter("doc_id % 3 = 1").coalesce(2).write.parquet(
        os.path.join(land, "b2"))
    execute_ddl(spark, f"COPY INTO t FROM '{land}'", {"t": root})
    return (
        snap.read(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


@register(
    "table_sql_dml_subquery",
    oracle="""
    WITH base AS (
        SELECT doc_id, source, lang, n_chars FROM documents
        WHERE doc_id % 3 = 0
    ),
    hot AS (  -- the DELETE's IN subquery: sources with heavy corpora
        SELECT source FROM base
        GROUP BY source HAVING SUM(n_chars) > 6000
    ),
    after_del AS (
        SELECT * FROM base
        WHERE NOT (source IN (SELECT source FROM hot) AND n_chars % 2 = 0)
    ),
    big AS (  -- the UPDATE's IN subquery over the POST-DELETE state
        SELECT doc_id FROM after_del WHERE n_chars > 400
    ),
    after_upd AS (
        SELECT doc_id, source,
               CASE WHEN doc_id IN (SELECT doc_id FROM big)
                    THEN 'xl' ELSE lang END AS lang,
               CASE WHEN doc_id IN (SELECT doc_id FROM big)
                    THEN n_chars + 1000 ELSE n_chars END AS n_chars
        FROM after_del
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM after_upd GROUP BY source, lang
    """,
)
def table_sql_dml_subquery(spark, sf_dir):
    """SQL DML front-end, subquery predicates (r15): ``DELETE FROM t
    WHERE col IN (SELECT ...) AND extra`` and ``UPDATE t SET ... WHERE
    col IN (SELECT ...)`` lower onto the MERGE machinery — the subquery
    (bound through read_sql, so it can reference snapshot tables,
    INCLUDING the statement's own target reading a pinned snapshot)
    becomes a distinct non-null merge source, the remaining conjuncts
    become the WHEN MATCHED condition, and no NOT MATCHED clause exists
    (DML never inserts). Semi-join semantics coincide with IN for the
    positive matches that drive deletes/updates: NULL keys never match,
    so they are never touched — Delta's subquery-DML behavior.

    The DELETE here is self-referential (the subquery aggregates the
    target itself) and carries an extra conjunct; the UPDATE's subquery
    sees the post-DELETE snapshot — ordering is part of the contract.

    Scale: the lowered MERGE inherits merge_into's source-keyed file
    skipping (X192) — a DML whose subquery selects few keys rewrites
    few files, where a naive `delete_where` scan-and-filter would still
    enumerate every file's hit set."""
    import os

    from unfccc_documents_database_sandbox_spark.sources import snapshots as snap
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import execute_dml

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    root = os.path.join(repo_root, ".csv_tmp", f"snapsqlsub_{tag}")

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    _snap_create(spark, root, d.filter("doc_id % 3 = 0").repartition(3))
    execute_dml(
        spark,
        """DELETE FROM docs
           WHERE source IN (SELECT source FROM docs
                            GROUP BY source HAVING SUM(n_chars) > 6000)
             AND n_chars % 2 = 0""",
        {"docs": root},
    )
    execute_dml(
        spark,
        """UPDATE docs SET lang = 'xl', n_chars = n_chars + 1000
           WHERE doc_id IN (SELECT doc_id FROM docs WHERE n_chars > 400)""",
        {"docs": root},
    )
    return (
        snap.read(spark, root)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )
