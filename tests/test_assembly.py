"""Golden-output tests for the document-assembly operator (A1) over
warehouse-shaped fixtures — the exact whitespace semantics of the reference
(generate_decisions_summaries.py:50-57; FIXTURES.md §B golden rules):

- paragraph block: trim(numbering) + "\\t" if numbering is truthy (non-null,
  non-empty — whitespace-only IS truthy, like Python's `if block.numbering:`,
  and yields a bare tab), then trim(text) + "\\n"
- table block: trim(caption) + "\\n" if caption truthy (same rule), then
  cells_text + "\\n" (cells NOT trimmed)
- empty block: contributes nothing
- paragraph wins when both payloads exist (the reference's `elif`)
- output depends only on seq, never on input row order
"""

from __future__ import annotations

import pytest

from unfccc_documents_database_sandbox_spark.operators.assembly import (
    assemble_from_warehouse,
)
from unfccc_documents_database_sandbox_spark.schemas import BLOCK, PARAGRAPH, TABLE_PAYLOAD


@pytest.fixture(scope="module")
def warehouse(spark):
    # doc 1: numbered paragraph, plain paragraph (whitespace-padded),
    #        table with caption, empty block
    # doc 2: whitespace-numbering paragraph (truthy -> bare tab), table
    #        without caption, block with BOTH payloads (paragraph must win)
    blocks = spark.createDataFrame(
        [
            (10, 1, 2, None, "paragraph"),     # out-of-seq insert order on purpose
            (11, 1, 1, "1.", "paragraph"),
            (12, 1, 3, None, "table"),
            (13, 1, 4, None, "empty"),
            (20, 2, 1, "  ", "paragraph"),
            (21, 2, 2, None, "table"),
            (22, 2, 3, "(a)", "paragraph"),
        ],
        BLOCK,
    )
    paragraphs = spark.createDataFrame(
        [
            (11, "First para."),
            (10, "  padded text  "),
            (20, "blank numbering"),
            (22, "both payloads"),
        ],
        PARAGRAPH,
    )
    tables = spark.createDataFrame(
        [
            (12, " Caption ", "c1|c2 "),
            (21, None, "x|y"),
            (22, "ignored", "ignored-cells"),  # same block also has a paragraph
        ],
        TABLE_PAYLOAD,
    )
    return blocks, paragraphs, tables


def test_golden_assembly(spark, warehouse):
    blocks, paragraphs, tables = warehouse
    out = {
        r["doc_id"]: r["doc_text"]
        for r in assemble_from_warehouse(blocks, paragraphs, tables).collect()
    }
    # numbering+tab, trimmed para, trimmed caption, raw (untrimmed) cells
    assert out[1] == "1.\tFirst para.\npadded text\nCaption\nc1|c2 \n"
    # whitespace-only numbering is truthy (reference `if block.numbering:`)
    # -> strips to '' but still emits the tab; captionless table emits cells
    # only; paragraph beats table on block 22
    assert out[2] == "\tblank numbering\nx|y\n(a)\tboth payloads\n"


def test_row_order_invariance(spark, warehouse):
    blocks, paragraphs, tables = warehouse
    shuffled = blocks.orderBy("numbering")  # scramble input order
    a = {r["doc_id"]: r["doc_text"] for r in assemble_from_warehouse(blocks, paragraphs, tables).collect()}
    b = {r["doc_id"]: r["doc_text"] for r in assemble_from_warehouse(shuffled, paragraphs, tables).collect()}
    assert a == b


def test_length_invariant(spark, warehouse):
    """Property: output length = sum of fragment lengths (no lost/extra chars)."""
    blocks, paragraphs, tables = warehouse
    out = assemble_from_warehouse(blocks, paragraphs, tables).collect()
    # doc 1 fragments: "1.\tFirst para.\n" (15) + "padded text\n" (12)
    #                + "Caption\nc1|c2 \n" (15) + "" = 42
    doc1 = next(r for r in out if r["doc_id"] == 1)
    assert len(doc1["doc_text"]) == 42
