"""Relational core: scans, filters, joins, aggregations, sorts, set ops.

Each entry cites the reference behavior it re-expresses (SURVEY.md §2).
All plans are pure DataFrame API — Catalyst handles pushdown, pruning,
join strategy (broadcast vs sort-merge), and partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.catalog import list_tables, load_table, register_views
from unfccc_documents_database_sandbox_spark.operators.assembly import (
    BLOCKS_CTE,
    WAREHOUSE_ORACLE_SQL,
    assemble_doc_text,
    assemble_from_warehouse,
    blocks_from_documents,
    warehouse_tables_from_documents,
)
from unfccc_documents_database_sandbox_spark.registry import register

# money-as-cents: round(x*100) is one deterministic IEEE op per row, then an
# exact BIGINT sum — immune to FP summation-order differences between engines.
def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


CENTS_SQL = "CAST(ROUND({col} * 100, 0) AS BIGINT)"

# DuckDB returns HUGEINT (int128) for SUM over integers, which its pandas
# bridge renders as float64 — diverging from Spark's int64 even when the
# values are identical. Every oracle SUM over an integer expression must be
# wrapped in an outer CAST(... AS BIGINT) (verified failure mode in r01:
# agg_sum_global / agg_group_stats / join_bridge hash mismatches).
SUM_CENTS_SQL = "CAST(SUM(" + CENTS_SQL + ") AS BIGINT)"


# --- S1/S3: scans & catalog ---------------------------------------------------


@register("scan_full", oracle="SELECT r_regionkey, r_name FROM region")
def scan_full(spark, sf_dir):
    """S1 full table scan (reference: select(Decision) full scan,
    generate_decisions_summaries.py:37-43)."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "csv_roundtrip",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source,
           CAST(n_chars AS VARCHAR) AS n_chars
    FROM documents
    """,
)
def csv_roundtrip(spark, sf_dir):
    """S4 CSV sink exercised end-to-end (reference: to_csv('decision_
    summaries.csv', utf-8), generate_decisions_summaries.py:120): write a
    documents projection as a headered CSV directory, read it back, and
    oracle-check the round-tripped values. Columns are compared as strings
    — that is what a CSV round-trip preserves."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.io import write_csv

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # per-sf output dir: the returned read is LAZY, so a same-process build
    # at another SF must not clobber this one's data before it is collected
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = os.path.join(repo_root, ".csv_tmp", f"documents_roundtrip_{tag}")
    cols = ["doc_id", "lang", "source", "n_chars"]
    write_csv(load_table(spark, sf_dir, "documents").select(*cols), out)
    return spark.read.option("header", True).csv(out).select(*cols)


@register(
    "json_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    """,
)
def json_roundtrip(spark, sf_dir):
    """S4-completion: JSON-Lines sink + source exercised end-to-end — the
    de-facto interchange format for training-data pipelines. Write a
    documents projection as newline-delimited JSON, read it back with an
    EXPLICIT schema (schema inference would re-scan the data and can widen
    types), and oracle-check the round-tripped values. Unlike the CSV
    round-trip, JSONL preserves types, so the oracle compares native
    ints/strings, not strings."""
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    # per-sf output dir: the returned read is LAZY, so a same-process build
    # at another SF must not clobber this one's data before it is collected
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = os.path.join(repo_root, ".csv_tmp", f"documents_jsonl_{tag}")
    cols = ["doc_id", "lang", "source", "n_chars"]
    src = load_table(spark, sf_dir, "documents").select(*cols)
    src.write.mode("overwrite").json(out)
    return spark.read.schema(src.schema).json(out).select(*cols)


@register(
    "source_orc",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    """,
)
def source_orc(spark, sf_dir):
    """S4-completion: ORC sink + source round-trip — the second columnar
    format Spark ships natively (vectorized reader, stripe-level min/max
    stats and predicate pushdown, the same scan-pruning story as parquet).
    Write a documents projection as ORC, read it back, oracle-check the
    values — proving the engine's source/sink surface is format-plural,
    not parquet-only."""
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    # per-sf output dir: the returned read is LAZY, so a same-process build
    # at another SF must not clobber this one's data before it is collected
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = os.path.join(repo_root, ".csv_tmp", f"documents_orc_{tag}")
    cols = ["doc_id", "lang", "source", "n_chars"]
    src = load_table(spark, sf_dir, "documents").select(*cols)
    src.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(*cols)


@register(
    "docx_ingest",
    oracle="""
    SELECT * FROM (VALUES
        ('a.docx', '1.' || chr(9) || 'Scope of work' || chr(10) ||
                   'Parties shall cooperate' || chr(10) ||
                   'alpha|beta' || chr(10)),
        ('b.docx', '(a)' || chr(9) || 'Definitions' || chr(10) ||
                   'Annex follows' || chr(10))
    ) AS t(file_name, doc_text)
    """,
)
def docx_ingest(spark, sf_dir):
    """S5 DOCX ingestion end-to-end (reference front door: abstract-docx
    DOCX → block tree, requirements.txt:1): build real OOXML payloads with
    the stdlib writer, land them as files, read through the binaryFile
    source, parse to ordered block rows (stdlib zip+XML — sources/docx.py),
    and assemble the document text with the exact reference semantics.
    Fixture content is fixed, so the expected output is a VALUES literal —
    r03 upgrades the key from rows-only to hash-checked by keying the
    output on the file basename (the r02 path-hash doc_id was opaque to an
    oracle). The parser and assembly are also golden-tested in
    tests/test_sources.py."""
    import os

    from unfccc_documents_database_sandbox_spark.operators.assembly import (
        assemble_from_warehouse,
    )
    from unfccc_documents_database_sandbox_spark.sources.docx import make_docx
    from unfccc_documents_database_sandbox_spark.sources.io import (
        parse_docx_blocks,
        read_binary_docs,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    docs_dir = os.path.join(repo_root, ".csv_tmp", "docx_ingest")
    os.makedirs(docs_dir, exist_ok=True)
    fixtures = {
        "a.docx": make_docx(
            ["1. Scope of work", "Parties shall cooperate", ""],
            tables=[["alpha", "beta"]],
        ),
        "b.docx": make_docx(["(a) Definitions", "Annex follows"]),
    }
    for name, payload in fixtures.items():
        with open(os.path.join(docs_dir, name), "wb") as fh:
            fh.write(payload)

    blocks = parse_docx_blocks(read_binary_docs(spark, docs_dir))
    b = blocks.select(
        F.xxhash64("path").alias("doc_id"),
        F.xxhash64("path", F.col("seq").cast("string")).alias("block_id"),
        "seq",
        "numbering",
        "text",
        "caption",
        "cells_text",
    )
    paragraphs = b.filter(F.col("text").isNotNull()).select("block_id", "text")
    tables = b.filter(F.col("cells_text").isNotNull()).select(
        "block_id", "caption", "cells_text"
    )
    assembled = assemble_from_warehouse(
        b.select("block_id", "doc_id", "seq", "numbering"), paragraphs, tables
    )
    names = blocks.select(
        F.xxhash64("path").alias("doc_id"),
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
    ).distinct()
    return assembled.join(names, "doc_id").select("file_name", "doc_text")


@register(
    "xlsx_ingest",
    oracle="""
    SELECT * FROM (VALUES
        ('annex.xlsx',  'Data',    'A1', CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'region'),
        ('annex.xlsx',  'Data',    'B1', CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'tonnes'),
        ('annex.xlsx',  'Data',    'A2', CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'north'),
        ('annex.xlsx',  'Data',    'B2', CAST(2 AS BIGINT), CAST(2 AS BIGINT), '1.5'),
        ('report.xlsx', 'Summary', 'A1', CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'item'),
        ('report.xlsx', 'Summary', 'B1', CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'qty'),
        ('report.xlsx', 'Summary', 'A2', CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'widget'),
        ('report.xlsx', 'Summary', 'B2', CAST(2 AS BIGINT), CAST(2 AS BIGINT), '3'),
        ('report.xlsx', 'Notes',   'A1', CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'item'),
        ('report.xlsx', 'Notes',   'B1', CAST(1 AS BIGINT), CAST(2 AS BIGINT), 'final')
    ) AS t(file_name, sheet_name, cell_ref, row_num, col_num, value)
    """,
)
def xlsx_ingest(spark, sf_dir):
    """S5 XLSX ingestion end-to-end, the spreadsheet sibling of docx_ingest
    (the reference pins openpyxl — reference decisions-summaries/
    requirements.txt:44): build real OOXML workbooks with the stdlib writer
    (multi-sheet, sharedStrings-interned text, numeric cells), land them as
    files, read through the binaryFile source, and parse to flat cell rows
    with the stdlib zip+XML parser (sources/xlsx.py). Fixture content is
    fixed, so the expected output is a VALUES literal — hash-checked, like
    docx_ingest. 'item' appears on both report.xlsx sheets to exercise
    shared-string interning across sheets. Parser also golden-tested in
    tests/test_sources.py."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.io import read_binary_docs
    from unfccc_documents_database_sandbox_spark.sources.xlsx import (
        make_xlsx,
        xlsx_to_cells,
    )

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    docs_dir = os.path.join(repo_root, ".csv_tmp", "xlsx_ingest")
    os.makedirs(docs_dir, exist_ok=True)
    fixtures = {
        "report.xlsx": make_xlsx(
            {
                "Summary": [["item", "qty"], ["widget", 3]],
                "Notes": [["item", "final"]],
            }
        ),
        "annex.xlsx": make_xlsx({"Data": [["region", "tonnes"], ["north", 1.5]]}),
    }
    for name, payload in fixtures.items():
        with open(os.path.join(docs_dir, name), "wb") as fh:
            fh.write(payload)

    cells = xlsx_to_cells(read_binary_docs(spark, docs_dir))
    return cells.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        "sheet_name",
        "cell_ref",
        "row_num",
        "col_num",
        "value",
    )


@register(
    "xml_ingest",
    oracle="""
    SELECT * FROM (VALUES
        ('a.xml', CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS BIGINT),
         'decision', '{"body":"COP","symbol":"1/CP.21"}', CAST(NULL AS VARCHAR)),
        ('a.xml', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         'title', '{}', 'Adoption of the Paris Agreement'),
        ('a.xml', CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         'paragraph', '{"num":"1"}', 'Decides to adopt the agreement'),
        ('a.xml', CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         'paragraph', '{"num":"2"}', 'Requests the secretariat'),
        ('b.xml', CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS BIGINT),
         'report', '{}', CAST(NULL AS VARCHAR)),
        ('b.xml', CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT),
         'section', '{"id":"s1"}', 'Annex text')
    ) AS t(file_name, seq, parent_seq, depth, tag, attrs, text)
    """,
)
def xml_ingest(spark, sf_dir):
    """S5 bare-XML ingestion, the third lxml-pinned path of the reference
    (decisions-summaries/requirements.txt:35; DOCX and XLSX are the ZIP+XML
    siblings, VERDICT r10 #4): land fixed XML documents, read them through
    the binaryFile source, and shred each element tree to relational rows
    (seq/parent_seq/depth/tag/sorted-JSON attrs/text — sources/xmlsrc.py,
    stdlib ElementTree in Arrow batches). One fixture carries attributes
    and nesting, the other a namespace (tags read by local name). Fixture
    content is fixed, so the expected output is a VALUES literal —
    hash-checked like docx_ingest/xlsx_ingest; parser ordering, namespace
    stripping, and the permissive-corrupt contract are golden-tested in
    tests/test_sources.py."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.io import read_binary_docs
    from unfccc_documents_database_sandbox_spark.sources.xmlsrc import xml_to_rows

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    docs_dir = os.path.join(repo_root, ".csv_tmp", "xml_ingest")
    os.makedirs(docs_dir, exist_ok=True)
    fixtures = {
        "a.xml": (
            '<decision symbol="1/CP.21" body="COP">\n'
            "  <title>Adoption of the Paris Agreement</title>\n"
            '  <paragraph num="1">Decides to adopt the agreement</paragraph>\n'
            '  <paragraph num="2">Requests the secretariat</paragraph>\n'
            "</decision>"
        ),
        "b.xml": (
            '<d:report xmlns:d="http://example.org/doc">'
            '<d:section id="s1">Annex text</d:section></d:report>'
        ),
    }
    for name, payload in fixtures.items():
        with open(os.path.join(docs_dir, name), "w", encoding="utf-8") as fh:
            fh.write(payload)

    rows = xml_to_rows(read_binary_docs(spark, docs_dir))
    return rows.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        "seq", "parent_seq", "depth", "tag", "attrs", "text",
    )


@register("catalog_tables", oracle=None, tags=("rows-only",))
def catalog_tables(spark, sf_dir):
    """S3 catalog introspection (reference: probe.py:6-7
    inspect(engine).get_table_names()). Rows-only: DuckDB's catalog differs."""
    register_views(spark, sf_dir)
    return list_tables(spark)


# --- P1-P4: projection / filters / CASE --------------------------------------


@register(
    "project_columns",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def project_columns(spark, sf_dir):
    """P1 column projection → parquet reads only 3 of 6 columns (column
    pruning; the reference ORM hydrates full rows — SURVEY.md §4)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "filter_or_eq",
    oracle="""
    SELECT doc_id, lang, source FROM documents WHERE lang IN ('en', 'es')
    """,
)
def filter_or_eq(spark, sf_dir):
    """P2 disjunctive equality filter (reference: or_(Body.symbol == 'SBI',
    Body.symbol == 'SBSTA'), generate_conclusions_summaries.py:44-49).
    IN-list is pushed down to the parquet scan."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "es"))
        .select("doc_id", "lang", "source")
    )


@register(
    "filter_notnull",
    oracle="""
    SELECT event_id, NULLIF(event_type, 'error') AS et
    FROM events WHERE NULLIF(event_type, 'error') IS NOT NULL
    """,
)
def filter_notnull(spark, sf_dir):
    """P3 null/truthiness predicate (reference: `if block.paragraph:` /
    `if block.numbering:`, generate_decisions_summaries.py:50-51)."""
    ev = load_table(spark, sf_dir, "events")
    et = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select("event_id", et.alias("et")).filter(F.col("et").isNotNull())


@register(
    "case_when_block",
    oracle=f"""
    WITH {BLOCKS_CTE}
    SELECT doc_id, seq,
           CASE WHEN seq % 11 = 0 THEN 'empty'
                WHEN seq % 7  = 0 THEN 'table'
                ELSE 'paragraph'
           END AS block_type
    FROM blocks
    """,
)
def case_when_block(spark, sf_dir):
    """P4 tagged-union CASE dispatch (reference: paragraph-vs-table `elif`,
    generate_decisions_summaries.py:50-57) over the derived blocks."""
    blocks = blocks_from_documents(load_table(spark, sf_dir, "documents"))
    block_type = (
        F.when(F.col("seq") % 11 == 0, F.lit("empty"))
        .when(F.col("seq") % 7 == 0, F.lit("table"))
        .otherwise(F.lit("paragraph"))
    )
    return blocks.select("doc_id", "seq", block_type.alias("block_type"))


# --- J1-J5: joins --------------------------------------------------------------


@register(
    "join_inner_fk",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_inner_fk(spark, sf_dir):
    """J1 inner FK equi-join (reference: select(Document).join(Document.body),
    generate_conclusions_summaries.py:38-39). nation/region are broadcast —
    at 100 TB the fact side never shuffles for dim joins."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "join_left_nullable",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left_nullable(spark, sf_dir):
    """J3 left outer join with nullable payload (reference: Block.paragraph /
    Block.table hydrated as None, generate_decisions_summaries.py:50-57)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_child_collect",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           string_agg(CAST(l.l_linenumber AS VARCHAR), ',' ORDER BY l.l_linenumber)
               AS line_seq,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def join_child_collect(spark, sf_dir):
    """J2 eager ordered 1:N child load (reference: selectinload chain,
    generate_decisions_summaries.py:39-42). The ORM's batched IN-selects are
    an N+1 workaround — in Spark it is one join + one grouped ordered
    collect; order is explicit via array_sort, never row order."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    joined = o.join(l, o.o_orderkey == l.l_orderkey).select(
        "o_orderkey", "o_orderstatus", "l_linenumber"
    )
    ordered = F.array_sort(F.collect_list(F.struct("l_linenumber")))
    return joined.groupBy("o_orderkey", "o_orderstatus").agg(
        F.concat_ws(
            ",", F.transform(ordered, lambda x: x["l_linenumber"].cast("string"))
        ).alias("line_seq"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "join_bridge",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
           SUM(l.l_quantity) AS sum_qty,
           {SUM_CENTS_SQL.format(col='p.p_retailprice')} AS retail_cents
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY o.o_orderkey
    """,
)
def join_bridge(spark, sf_dir):
    """J4 bridge-table M:N join (reference: Decision → DecisionBlockMap →
    Block, generate_decisions_summaries.py:40-41,47). lineitem plays the
    bridge; part is broadcast."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("o_orderkey")
        .agg(
            F.countDistinct("p_brand").cast("long").alias("n_brands"),
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(_cents("p_retailprice")).alias("retail_cents"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi(spark, sf_dir):
    """J5 left-semi join (north star: dedup/diff building block)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_anti(spark, sf_dir):
    """J5 left-anti join: customers with no large (>300k) order. The r01/r02
    form anti-joined on bare FK membership, which this corpus's referential
    integrity makes vacuously empty — green on a 0-row match. The filtered
    right side keeps the identical plan shape (filter pushed below the anti
    join) while making the evidence non-trivial (30 rows at sf0.01)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- A1/A3-A6: aggregations ----------------------------------------------------


@register(
    "agg_doc_text",
    oracle=f"""
    WITH {BLOCKS_CTE},
    frags AS (
        SELECT doc_id, seq,
               CASE WHEN seq % 11 = 0 THEN ''
                    WHEN seq % 7  = 0 THEN '[T] ' || word || chr(10)
                    WHEN seq % 3  = 0 THEN CAST(seq AS VARCHAR) || '.' || chr(9) || word || chr(10)
                    ELSE word || chr(10)
               END AS fragment
        FROM blocks
    )
    SELECT doc_id,
           string_agg(fragment, '' ORDER BY seq) AS doc_text,
           CAST(COUNT(*) AS BIGINT) AS n_blocks
    FROM frags
    GROUP BY doc_id
    """,
)
def agg_doc_text(spark, sf_dir):
    """A1 — THE flagship: per-document ordered text assembly (reference:
    the Python block loop, generate_decisions_summaries.py:45-59), as one
    shuffle + codegen'd expressions. See operators/assembly.py."""
    docs = load_table(spark, sf_dir, "documents")
    return assemble_doc_text(blocks_from_documents(docs))


@register(
    "agg_doc_text_warehouse",
    oracle=WAREHOUSE_ORACLE_SQL.format(blocks_cte=BLOCKS_CTE),
)
def agg_doc_text_warehouse(spark, sf_dir):
    """A1 over warehouse-shaped Block/Paragraph/Table tables with the
    reference's EXACT whitespace semantics (generate_decisions_summaries.py
    :50-57): truthiness on raw numbering/caption (' ' is truthy → bare
    tab/newline), strip only in output, cells_text never stripped,
    paragraph wins over table. Tables derived deterministically from
    documents (operators/assembly.py::warehouse_tables_from_documents) so
    this core semantic claim is driver-checked, not just pytest-checked."""
    docs = load_table(spark, sf_dir, "documents")
    block, paragraph, table_payload = warehouse_tables_from_documents(docs)
    return assemble_from_warehouse(block, paragraph, table_payload)


@register(
    "agg_sum_global",
    oracle=f"""
    SELECT {SUM_CENTS_SQL.format(col='l_extendedprice')} AS revenue_cents,
           SUM(l_quantity) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
)
def agg_sum_global(spark, sf_dir):
    """A3 global scalar aggregate (reference: cost accumulator `cost +=
    cb.total_cost`, generate_decisions_summaries.py:105-109). Partial
    (map-side) aggregation is automatic."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.sum(_cents("l_extendedprice")).alias("revenue_cents"),
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@register(
    "agg_group_stats",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(l_quantity) AS sum_qty,
           {SUM_CENTS_SQL.format(col='l_extendedprice')} AS revenue_cents,
           ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_stats(spark, sf_dir):
    """A4 grouped count/sum/avg/min/max — TPC-H Q1-shaped pricing summary.
    avg is exact-sum / exact-count (one division), not a float running avg."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(_cents("l_extendedprice")).alias("revenue_cents"),
        F.round(F.sum("l_quantity") / F.count(F.lit(1)), 6).alias("avg_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register("agg_approx_distinct", oracle=None, tags=("rows-only",))
def agg_approx_distinct(spark, sf_dir):
    """A5 approximate distinct (HLL++) — the 100 TB path where exact
    COUNT(DISTINCT) would shuffle every key. Approx → rows-only check."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders")
    )


@register(
    "udtf_explode_blocks",
    oracle=f"WITH {BLOCKS_CTE} SELECT doc_id, seq, word FROM blocks",
)
def udtf_explode_blocks(spark, sf_dir):
    """U6 UDTF shape: 1 document row → N ordered block rows — the inverse
    of A1 (reference upstream: abstract-docx DOCX→block parse,
    requirements.txt:1). posexplode keeps the ordinal."""
    return blocks_from_documents(load_table(spark, sf_dir, "documents"))


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark, sf_dir):
    """A6 hierarchical rollup (region → nation → grand total)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    ).select(
        F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
        F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
        "n_customers",
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    """A6 cube: all grouping-set combinations of (returnflag, linestatus)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT source,
           CAST(COUNT(*) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
           CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
           CAST(COUNT(*) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
           CAST(COUNT(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
           CAST(COUNT(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh
    FROM documents GROUP BY source
    """,
)
def agg_pivot(spark, sf_dir):
    """A6-adjacent pivot (wide crosstab): documents per source x lang.
    Pivot values are given explicitly — without them Spark runs an extra
    distinct job just to discover the columns, and the output schema
    becomes data-dependent (both wrong at scale). Empty cells are 0, not
    NULL, to match COUNT FILTER semantics."""
    d = load_table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    wide = d.groupBy("source").pivot("lang", langs).count()
    return wide.select(
        "source",
        *[F.coalesce(F.col(l), F.lit(0)).cast("long").alias(l) for l in langs],
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.25) AS p25_cents,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.50) AS p50_cents,
           quantile_cont(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 0.75) AS p75_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """A4-adjacent exact percentiles (linear interpolation). Cross-engine
    exactness by construction: the input is integer cents and the quantiles
    are dyadic (k/4), so the interpolation lower*(1-d)+higher*d (Spark) and
    lower+(higher-lower)*d (DuckDB) are both exact multiples of 0.25 — no
    last-ulp divergence. Non-dyadic quantiles over raw doubles would NOT
    hash-match across engines. (At 100 TB you'd reach for approx_percentile;
    exact percentile shuffles every group value to one reducer.)"""
    l = load_table(spark, sf_dir, "lineitem")
    cents = _cents("l_extendedprice")
    return l.groupBy("l_returnflag").agg(
        F.percentile(cents, F.lit(0.25)).alias("p25_cents"),
        F.percentile(cents, F.lit(0.50)).alias("p50_cents"),
        F.percentile(cents, F.lit(0.75)).alias("p75_cents"),
    )


@register(
    "sample_hash_mod",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE (doc_id * 2654435761) % 4294967296 < 429496730
    """,
)
def sample_hash_mod(spark, sf_dir):
    """Deterministic ~10% sample via multiplicative (Knuth) hashing on the
    key — reproducible across engines, runs, and partition layouts, unlike
    df.sample() whose output depends on partition seeds. The predicate
    evaluates inside the scan stage's codegen (no extra pass); being
    arithmetic, it can't use parquet row-group stats — only the IsNotNull
    residual pushes — which is the expected trade for hash uniformity."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    return d.filter(bucket < 429496730).select("doc_id", "lang", "source")


@register(
    "sample_weighted",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    WHERE ((doc_id * 2654435761) % 4294967296) * 2000
          < LEAST(n_chars, 2000) * 4294967296
    GROUP BY source
    """,
)
def sample_weighted(spark, sf_dir):
    """Per-row WEIGHTED Bernoulli sampling, deterministic: accept doc i
    with probability p_i = min(1, n_chars/2000) — longer documents kept
    proportionally more often, the quality/length-weighted downsampling
    every corpus-mixing recipe needs (sample_hash_mod is the uniform
    special case, corpus_upsample the >1x repetition mirror). The coin is
    the same engine-portable Knuth hash, compared INTEGER-exactly:
    accept iff hash * 2000 < min(n_chars, 2000) * 2^32 — all bigint
    products well under 2^63, so the Spark and DuckDB predicates agree
    bit-for-bit on every row (no double division anywhere). Grouped
    per-source acceptance stats make the key hash-checkable.

    Scale: a stateless scan-stage predicate — no shuffle, no RNG state,
    reproducible under retries/repartitioning (the df.sample() caveat),
    and the acceptance decision for any row is recomputable by any
    engine auditing the sample."""
    d = load_table(spark, sf_dir, "documents")
    coin = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    accept = coin * F.lit(2000) < (
        F.least(F.col("n_chars"), F.lit(2000)) * F.lit(4294967296)
    )
    return (
        d.filter(accept)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


@register("agg_hll_partitioned", oracle=None, tags=("rows-only",))
def agg_hll_partitioned(spark, sf_dir):
    """A5-completion: MERGEABLE distinct-count sketches (Datasketches HLL)
    — the pattern behind every 100 TB pre-aggregated rollup table: build
    one sketch per partition key (here: per language), store/ship the
    sketch bytes, and answer the global question by UNIONING sketches
    instead of re-scanning data. Emits each language's estimate plus the
    union-of-sketches global estimate on every row; a correctness anchor —
    the union estimate must be consistent across groupings — is asserted
    in tests/test_functions.py. Approximate by construction → rows-only."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.hll_sketch_agg(F.col("text"), 12).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    # union-of-sketches as a whole-frame window over the per-language rows:
    # the sketch aggregation runs ONCE (a two-branch plan — per-lang agg
    # feeding a separate global agg + crossJoin — would re-scan documents
    # and rebuild every sketch, defeating the pattern's point)
    whole = Window.partitionBy()
    return per_lang.select(
        "lang",
        "n_docs",
        F.hll_sketch_estimate("sketch").cast("long").alias("lang_distinct"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch").over(whole))
        .cast("long")
        .alias("global_distinct"),
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def sample_stratified(spark, sf_dir):
    """Stratified EXACT-N sampling: exactly 20 documents per language,
    chosen by multiplicative-hash order (deterministic across engines,
    runs, and partition layouts — df.sampleBy gives approximate fractions
    and partition-seed-dependent membership). The eval-set carving
    companion to corpus_mix's fractional mixing: one shuffle on the
    stratum key; at 100 TB the window is per-stratum top-N, which AQE
    handles unless a single stratum dominates (then pre-aggregate with a
    TakeOrdered per salted sub-stratum and re-rank the N·salt survivors)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    hash_order = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("lang").orderBy(hash_order.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "corpus_mix",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE (doc_id * 2654435761) % 4294967296 <
          CASE WHEN lang = 'en' THEN 2147483648
               WHEN lang = 'es' THEN 1288490188
               ELSE 429496730 END
    """,
)
def corpus_mix(spark, sf_dir):
    """Weighted corpus mixing — THE training-data composition operator:
    keep 50% of English, 30% of Spanish, 10% of everything else, via the
    same multiplicative-hash bucket as sample_hash_mod with a per-language
    threshold. Deterministic (hash of the key, not partition RNG), single
    scan, no shuffle; re-weighting a 100 TB mixture is a threshold change,
    not a re-shard."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    threshold = (
        F.when(F.col("lang") == "en", F.lit(2147483648))
        .when(F.col("lang") == "es", F.lit(1288490188))
        .otherwise(F.lit(429496730))
    )
    return d.filter(bucket < threshold).select("doc_id", "lang")


@register("agg_approx_percentiles", oracle=None, tags=("rows-only",))
def agg_approx_percentiles(spark, sf_dir):
    """A5-adjacent: approx_percentile (Greenwald-Khanna sketch) — the
    100 TB path where exact percentiles (agg_percentiles) would shuffle
    every group value to one reducer. Approximate → rows-only check; the
    exact twin is the oracle-backed agg_percentiles.

    One sketch per group (a single percentile_approx over the quantile
    list), scalarized at the output boundary with element_at: the driver's
    pandas canonicalization cannot hash list cells (r01 array_ops / r02
    this-key hard error) — arrays stay inside the plan, scalars leave it."""
    l = load_table(spark, sf_dir, "lineitem")
    approx = F.percentile_approx(_cents("l_extendedprice"), [0.25, 0.5, 0.75], 10000)
    return l.groupBy("l_returnflag").agg(
        F.element_at(approx, 1).alias("p25_cents"),
        F.element_at(approx, 2).alias("p50_cents"),
        F.element_at(approx, 3).alias("p75_cents"),
    )


# --- O2-O6: sorts / limits / set ops -------------------------------------------


@register(
    "sort_global",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    """,
)
def sort_global(spark, sf_dir):
    """O2 global sort (range-partitioned exchange in Spark — scales out;
    value-hash compare is order-insensitive but the plan exercises the sort)."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    )


@register(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def limit_n(spark, sf_dir):
    """O3 deterministic head-N (reference: early `break` subset runs,
    generate_conclusions_summaries.py:111). Ordered limit → TakeOrderedAndProject
    (no full sort materialization)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "set_ops",
    oracle="""
    SELECT 'union' AS op, key_id FROM (
        SELECT doc_id AS key_id FROM documents WHERE lang = 'en'
        UNION
        SELECT doc_id FROM documents WHERE source = 'src0'
    )
    UNION ALL
    SELECT 'except' AS op, key_id FROM (
        SELECT doc_id AS key_id FROM documents
        EXCEPT ALL
        SELECT doc_id FROM documents WHERE lang = 'en'
    )
    UNION ALL
    SELECT 'intersect' AS op, key_id FROM (
        SELECT o_custkey AS key_id FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def set_ops(spark, sf_dir):
    """O5 set-operation trio as one tagged union (consolidated from the
    r01-green set_union / set_except / set_intersect keys per VERDICT r02 #2
    — all three set operators stay in the plan and the oracle under one
    registry key, each branch tagged by an `op` literal):

    - distinct UNION (the natural composition of the reference's two
      parallel pipelines — decisions + conclusions summaries)
    - EXCEPT ALL (multiset difference)
    - INTERSECT (customers having both fulfilled and open orders)
    """
    d = load_table(spark, sf_dir, "documents")
    o = load_table(spark, sf_dir, "orders")
    union_part = (
        d.filter(F.col("lang") == "en")
        .select(F.col("doc_id").alias("key_id"))
        .unionByName(
            d.filter(F.col("source") == "src0").select(
                F.col("doc_id").alias("key_id")
            )
        )
        .distinct()
    )
    except_part = d.select(F.col("doc_id").alias("key_id")).exceptAll(
        d.filter(F.col("lang") == "en").select(F.col("doc_id").alias("key_id"))
    )
    intersect_part = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("key_id"))
        .intersect(
            o.filter(F.col("o_orderstatus") == "O").select(
                F.col("o_custkey").alias("key_id")
            )
        )
    )
    return (
        union_part.select(F.lit("union").alias("op"), "key_id")
        .unionByName(except_part.select(F.lit("except").alias("op"), "key_id"))
        .unionByName(intersect_part.select(F.lit("intersect").alias("op"), "key_id"))
    )


@register(
    "join_skew_salted",
    oracle=f"""
    SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           {SUM_CENTS_SQL.format(col='c.c_acctbal')} AS acctbal_cents
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_skew_salted(spark, sf_dir):
    """Skew-mitigated join: nation replicated 8×, each customer row salted
    by its own key hash — a hot nation's rows spread over 8 reducers. The
    oracle is the UNSALTED join: salting must not change results."""
    from unfccc_documents_database_sandbox_spark.operators.skew import salted_join

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    joined = salted_join(c, n, on=["c_nationkey"], salt_on=["c_custkey"], salt=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(_cents("c_acctbal")).alias("acctbal_cents"),
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_acctbal, o.n_open_orders
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) c
    FULL OUTER JOIN (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_open_orders
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def join_full_outer(spark, sf_dir):
    """J3-completion: FULL OUTER join — both null sides exercised (rich
    customers without open orders, open-order customers below the balance
    cut). One shuffle per side on the join key; at scale identical to the
    left-outer plan shape plus null-extension on both sides."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_open_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "n_open_orders",
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
)
def agg_unpivot(spark, sf_dir):
    """A6-completion: UNPIVOT/melt — wide measure columns to long
    (key, measure, value) rows, the inverse of agg_pivot. Spark's stack()
    emits all four rows per input row in one narrow pass (no shuffle, no
    4× re-scan — the oracle's UNION ALL re-reads the table per measure;
    Catalyst's unpivot does not). Values are per-row doubles (exact)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax)"
        ).alias("measure", "value"),
    )


@register(
    "merge_upsert",
    oracle="""
    WITH upd AS (
        SELECT doc_id, 'patched' AS source, CAST(n_chars + 1000 AS BIGINT) AS n_chars
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 1000000, 'new', CAST(42 AS BIGINT)
        FROM documents WHERE doc_id % 25 = 0
    )
    SELECT doc_id, source, n_chars FROM upd
    UNION ALL
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM upd)
    """,
)
def merge_upsert(spark, sf_dir):
    """Warehouse MERGE (upsert): apply an update set to a base table —
    matched keys take the update row, unmatched updates insert, everything
    else carries over. Executed the way a Delta/Iceberg MERGE physically
    runs: one keyed anti-join of base against the update keys plus a
    union — a single shuffle on the merge key, no row-at-a-time logic.
    The update set is derived deterministically from the base (10% patched
    rows, 4% inserts) so both engines see identical inputs."""
    d = load_table(spark, sf_dir, "documents")
    patched = d.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.lit("patched").alias("source"),
        (F.col("n_chars") + 1000).cast("long").alias("n_chars"),
    )
    inserts = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("new").alias("source"),
        F.lit(42).cast("long").alias("n_chars"),
    )
    upd = patched.unionByName(inserts)
    kept = d.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    ).join(upd.select("doc_id"), "doc_id", "left_anti")
    return upd.unionByName(kept)


# one bucketed-table build per (session, sf_dir): the write is join_bucketed's
# index-build input, not part of the measured query
_BUCKETED_WRITTEN: set[tuple[object, str]] = set()


@register(
    "join_bucketed",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {SUM_CENTS_SQL.format(col='l.l_extendedprice')} AS price_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
    """,
)
def join_bucketed(spark, sf_dir):
    """Co-located fact-fact join through BUCKETED managed tables: both
    sides written bucketBy(8, o_orderkey) sortBy the key, then joined and
    aggregated ON the bucket key. Because data is pre-partitioned by
    bucket, the join needs no Exchange on either side and the following
    per-key aggregation reuses the same distribution — at 100 TB this
    turns the recurring fact-fact join + rollup from the dominant shuffle
    into a per-bucket local merge (shuffle-free plan asserted with
    broadcast disabled in tests/test_scale.py; the oracle is the plain
    unbucketed join — the layout must not change results). Tables are
    (re)written per session: the in-memory catalog dies with the session,
    and the write is the index-build cost a real deployment pays once."""
    import os

    from unfccc_documents_database_sandbox_spark.sources.io import write_bucketed

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_orders, t_lineitem = f"orders_b_{tag}", f"lineitem_b_{tag}"
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if (spark, sf_dir) not in _BUCKETED_WRITTEN:
        for t, df in ((t_orders, orders), (t_lineitem, lineitem)):
            # EXTERNAL tables at an explicit repo-anchored path: the
            # caller's session has a cwd-relative spark-warehouse, and the
            # driver's cwd is not ours to assume. Drop any stale catalog
            # entry first (overwrite of an external table re-uses the
            # location; a stale MANAGED entry from an old layout would
            # collide).
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            write_bucketed(
                df, t, "o_orderkey", 8, sort_by="o_orderkey",
                path=os.path.join(repo_root, ".csv_tmp", t),
            )
        _BUCKETED_WRITTEN.add((spark, sf_dir))
    ob, lb = spark.table(t_orders), spark.table(t_lineitem)
    return (
        ob.join(lb, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(_cents("l_extendedprice")).alias("price_cents"),
        )
    )


# one partitioned-layout write per (process, sf_dir): the fact copy is input
# infrastructure for join_dpp, not part of the measured query
_DPP_WRITTEN: set[str] = set()


@register(
    "join_dpp",
    oracle="""
    WITH d AS (
        SELECT DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
        FROM events ORDER BY day LIMIT 2
    )
    SELECT e.event_id, e.user_id,
           strftime(CAST(e.ts AS TIMESTAMP), '%Y-%m-%d') AS day
    FROM events e
    JOIN d ON strftime(CAST(e.ts AS TIMESTAMP), '%Y-%m-%d') = d.day
    """,
)
def join_dpp(spark, sf_dir):
    """Dynamic partition pruning, registered (VERDICT r02 #7 — previously
    only pytest-asserted): events re-laid-out partitioned-by-day (the
    standard fact layout for a 100 TB event store), then joined to a
    filtered day dim. Catalyst inserts a DynamicPruningSubquery on the fact
    scan, so only the dim-selected partition directories are read — the
    mechanism that makes dim-filtered scans of a partitioned fact
    affordable. Plan asserted in tests/test_scale.py::
    test_join_dpp_key_plan_prunes; the dim keeps the 2 earliest days via a
    row_number filter (no driver-side collect)."""
    import os

    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    fact_dir = os.path.join(
        repo_root, ".csv_tmp", f"events_by_day_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    if fact_dir not in _DPP_WRITTEN:
        ev.write.partitionBy("day").mode("overwrite").parquet(fact_dir)
        _DPP_WRITTEN.add(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = (
        fact.select("day")
        .distinct()
        .withColumn("rk", F.row_number().over(Window.orderBy("day")))
        .filter(F.col("rk") <= 2)
        .select("day")
    )
    return fact.join(dim, "day").select("event_id", "user_id", "day")


@register(
    "source_schema_evolution",
    oracle="""
    SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 1
    """,
)
def source_schema_evolution(spark, sf_dir):
    """S-ext schema evolution on read: two parquet batches written at
    different schema versions (v1: doc_id+lang; v2 adds n_chars) live in
    one dataset directory; mergeSchema=true reconciles them into the union
    schema with NULLs for the column v1 predates. This is the 100 TB
    warehouse reality — a column added in month 8 must not invalidate
    months 1-7 — and merge-on-read is what makes old data readable without
    a rewrite. The oracle restates the evolution as a UNION ALL with a
    typed NULL fill."""
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = os.path.join(repo_root, ".csv_tmp", f"documents_evolved_{tag}")
    d = load_table(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars")
    v1.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", out)
        .parquet(os.path.join(out, "batch=1"), os.path.join(out, "batch=2"))
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "source_hive_partitioned",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE lang IN ('de', 'en')
    GROUP BY lang, source
    """,
)
def source_hive_partitioned(spark, sf_dir):
    """S-ext Hive-partitioned dataset layout: the corpus is WRITTEN as
    lang=<v>/ directory partitions (df.write.partitionBy — the layout
    every crawl/warehouse dump uses) and read back through Spark's
    partition DISCOVERY: the `lang` column is recovered from directory
    names, never stored in the parquet, and the `lang IN ('de','en')`
    predicate prunes whole directories at PLANNING time — the scan node
    shows it under PartitionFilters (directories outside the filter are
    never listed into tasks), while `source` stays an ordinary pushed
    parquet filter. The oracle replays the filter+rollup over the raw
    rows, so hash-green proves discovery recovered the partition values
    exactly (string round-trip included).

    Scale: partition pruning is THE first-order scan optimization at
    100 TB — a lang-partitioned corpus read with a two-language filter
    does I/O proportional to those two directories, independent of
    corpus size. (The snapshot table format reimplements this on its
    own commit log — table_partition_prune; this key pins Spark's NATIVE
    directory-based path.)"""
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    out = os.path.join(repo_root, ".csv_tmp", f"documents_hive_{tag}")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "lang"
    )
    (d.write.mode("overwrite").partitionBy("lang").parquet(out))
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("lang").isin("de", "en"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "agg_argext_bitwise",
    oracle="""
    WITH e AS (
        SELECT event_type, event_id, user_id,
               CAST(ROUND(value * 1000000) AS BIGINT) * 100000000 + event_id
                   AS ordkey
        FROM events
    )
    SELECT event_type,
           CAST(arg_max(event_id, ordkey) AS BIGINT) AS top_event_id,
           CAST(arg_min(event_id, ordkey) AS BIGINT) AS low_event_id,
           CAST(bit_or(1 << (user_id % 8)) AS BIGINT) AS presence_bitmap,
           CAST(bit_xor(user_id) AS BIGINT) AS parity,
           CAST(bit_and(user_id) AS BIGINT) AS common_bits
    FROM e GROUP BY event_type
    """,
)
def agg_argext_bitwise(spark, sf_dir):
    """Argmax/argmin + bitwise aggregate surface (the A-family functions no
    other key exercises): per event type, the event id carrying the
    extreme value via max_by/min_by, plus bit_or/bit_xor/bit_and rollups
    (presence bitmap over user slots, xor parity, common bit mask).

    Determinism: max_by ties are undefined order in BOTH engines, so the
    ordering argument is a single exact integer — micro-scaled value
    (ROUND(value*1e6), the cents precedent from window_funcs) widened by
    1e8 plus the unique event_id as tiebreak. No struct ordering: DuckDB's
    arg_max can't take one, an orderable scalar keeps the twins aligned.

    Scale shape: one map-side-combinable shuffle on event_type; every
    aggregate here combines associatively (bitwise ops and keyed max are
    semigroups), so partial aggregation does the heavy lifting.

    Fixture contract (ordkey bounds): round(value*1e6)*1e8 + event_id is
    bigint-exact only while |value| < 92,233 (else the *1e8 widen wraps in
    non-ANSI Spark where DuckDB would raise) and event_id < 1e8 (else the
    tiebreak bleeds into the value bucket). The events fixture generates
    value in [0, 1000) and event_id < 1e7, two+ orders inside both bounds;
    widening either column past them requires re-deriving the scales."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "user_id",
        (
            F.round(F.col("value") * 1_000_000).cast("long") * 100_000_000
            + F.col("event_id")
        ).alias("ordkey"),
    )
    return e.groupBy("event_type").agg(
        F.max_by("event_id", "ordkey").cast("long").alias("top_event_id"),
        F.min_by("event_id", "ordkey").cast("long").alias("low_event_id"),
        F.bit_or(
            F.expr("CAST(shiftleft(1, CAST(user_id % 8 AS INT)) AS BIGINT)")
        ).alias("presence_bitmap"),
        F.bit_xor("user_id").cast("long").alias("parity"),
        F.bit_and("user_id").cast("long").alias("common_bits"),
    )


@register(
    "udtf_python_segments",
    oracle="""
    WITH segs AS (
        SELECT doc_id,
               UNNEST(string_split(text, '.')) AS seg,
               GENERATE_SUBSCRIPTS(string_split(text, '.'), 1) AS ord
        FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(LENGTH(seg)) AS BIGINT) AS total_seg_chars,
           CAST(SUM(ord * LENGTH(seg)) AS BIGINT) AS order_checksum
    FROM segs GROUP BY doc_id
    """,
)
def udtf_python_segments(spark, sf_dir):
    """U6 as a REAL Python UDTF (Spark 4 @udtf — class-based table
    function, LATERAL-correlated per input row), complementing
    udtf_explode_blocks which deliberately stays on JVM posexplode: this
    key exercises the API surface itself — yield-per-row fan-out, lateral
    correlation in SQL text — on a sentence-ish '.'-split of every
    document, rolled up per doc with an order checksum (SUM(ordinal *
    segment length)) so the oracle catches any dropped, reordered, or
    re-split segment. The oracle replays the split relationally
    (string_split + unnest with ordinals; Python's str.split and DuckDB's
    string_split agree on empty segments).

    Hot-path note (registry discipline): a Python UDTF is row-at-a-time
    Python — the SLOW path; when built-ins can express the fan-out
    (posexplode/split), they win by 10-100x and udtf_explode_blocks is
    that twin. Use a UDTF only when per-row logic genuinely needs Python;
    at 100 TB the fan-out still parallelizes per input partition and
    never touches the driver."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="seq int, seg string")
    class SplitSegs:
        def eval(self, text: str):
            # NULL text yields NOTHING, so the lateral (inner) join drops
            # the doc — matching the oracle's UNNEST(string_split(NULL))
            # zero-row semantics (r08 ADVICE #2: `(text or '').split` would
            # emit one empty segment and diverge on a nullable corpus).
            if text is None:
                return
            for i, seg in enumerate(text.split(".")):
                yield (i, seg)

    spark.udtf.register("udtf_split_segs", SplitSegs)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_segs_in")
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_segs,
               CAST(SUM(LENGTH(s.seg)) AS BIGINT) AS total_seg_chars,
               CAST(SUM((s.seq + 1) * LENGTH(s.seg)) AS BIGINT)
                   AS order_checksum
        FROM udtf_segs_in d, LATERAL udtf_split_segs(d.text) s
        GROUP BY d.doc_id
        """
    )


@register(
    "udtf_polymorphic",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_o_orderkey,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_o_custkey
    FROM orders GROUP BY o_orderstatus
    """,
)
def udtf_polymorphic(spark, sf_dir):
    """U6 POLYMORPHIC UDTF (Spark 4 `analyze()` — VERDICT r10 #6): the
    output schema is not declared, it is DERIVED from the input table at
    plan time. `sum_numeric_cols(TABLE(...) PARTITION BY <keys>)` inspects
    the TABLE argument's StructType in its static analyze(): string
    columns pass through as grouping keys, every integral column c
    becomes a `sum_c` BIGINT — so the same UDTF body serves ANY table
    shape (the schema-generic aggregation helper every warehouse-tools
    team writes once). The resolved field lists travel from analyze() to
    the executors inside an AnalyzeResult SUBCLASS (the documented
    side-channel into __init__), so eval never re-guesses column order.
    The oracle replays it as a plain GROUP BY.

    Hot-path note (r12 — VERDICT r11 #6 resolved by MEASUREMENT): the
    suggested Arrow-optimized serializer (useArrow=True) was
    implemented, pinned bit-equal to the pickle path
    (tests/test_functions.py cross-serializer test), and benchmarked —
    and for THIS UDTF shape it is ~4x SLOWER (12.9 s vs 3.2 s at
    sf0.1): Arrow batching amortizes over many yielded rows per eval,
    but an aggregating UDTF makes 150k one-row eval calls and emits one
    terminate row per partition, so per-call Arrow conversion is pure
    overhead. The key therefore stays on the pickle serializer, the
    documented slow-path API pin; the 10-100x production twin for any
    FIXED schema remains the JVM groupBy. Scale: PARTITION BY shuffles
    once on the grouping keys; each partition aggregates streamingly in
    eval/terminate (O(1) state per numeric column)."""
    from unfccc_documents_database_sandbox_spark.functions.udtfs import (
        make_sum_numeric_cols_udtf,
    )

    spark.udtf.register("sum_numeric_cols", make_sum_numeric_cols_udtf())
    load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_custkey"
    ).createOrReplaceTempView("udtf_poly_in")
    return spark.sql(
        """
        SELECT * FROM sum_numeric_cols(
            TABLE(SELECT * FROM udtf_poly_in) PARTITION BY o_orderstatus)
        """
    )
