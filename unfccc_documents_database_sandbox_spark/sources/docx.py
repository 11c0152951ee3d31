"""DOCX → ordered block rows (S5) — a real, dependency-free implementation.

The reference ingests DOCX through `abstract-docx` into the hierarchical
Block model (requirements.txt:1; SURVEY.md §1.2). A .docx file is a zip
archive whose `word/document.xml` holds the body as a sequence of
`<w:p>` (paragraph) and `<w:tbl>` (table) elements — parseable with the
stdlib (zipfile + xml.etree), no lxml/python-docx needed.

Spark shape: binaryFile source → mapInPandas parser → Block-schema rows
(path, seq, numbering, block_type, text/caption/cells_text). Each Arrow
batch parses its documents independently → embarrassingly parallel across
executors; a 100 TB corpus of DOCX shards linearly.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

from pyspark.sql import DataFrame
from pyspark.sql import types as T

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

BLOCK_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("numbering", T.StringType()),
        T.StructField("block_type", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("cells_text", T.StringType()),
    ]
)

_NUMBERING_RE = re.compile(r"^\s*(\d+[\.\)]|\([a-z]+\)|[ivxlc]+\.)\s+")


def parse_docx_bytes(payload: bytes) -> list[dict]:
    """One DOCX binary → ordered block dicts (paragraph/table union)."""
    blocks: list[dict] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ElementTree.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{W_NS}body")
    if body is None:
        return blocks
    seq = 0
    for el in body:
        if el.tag == f"{W_NS}p":
            text = "".join(t.text or "" for t in el.iter(f"{W_NS}t"))
            if not text.strip():
                blocks.append(
                    {"seq": seq, "numbering": None, "block_type": "empty",
                     "text": None, "caption": None, "cells_text": None}
                )
            else:
                m = _NUMBERING_RE.match(text)
                numbering = m.group(1) if m else None
                body_text = text[m.end():] if m else text
                blocks.append(
                    {"seq": seq, "numbering": numbering, "block_type": "paragraph",
                     "text": body_text, "caption": None, "cells_text": None}
                )
        elif el.tag == f"{W_NS}tbl":
            cells = [
                "".join(t.text or "" for t in tc.iter(f"{W_NS}t"))
                for tc in el.iter(f"{W_NS}tc")
            ]
            blocks.append(
                {"seq": seq, "numbering": None, "block_type": "table",
                 "text": None, "caption": None, "cells_text": "|".join(cells)}
            )
        else:
            continue
        seq += 1
    return blocks


def docx_to_blocks(binary_docs: DataFrame, permissive: bool = False) -> DataFrame:
    """binaryFile rows (path, content) → Block-schema rows, in Arrow batches.

    ``permissive=True`` skips corrupt documents instead of failing the job
    (one row with block_type='_corrupt' and the error in ``text`` — same
    contract as xlsx_to_cells; a single bad file must not kill a 100 TB
    ingest). Default stays strict/FAILFAST."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for path, payload in zip(pdf["path"], pdf["content"]):
                try:
                    blocks = parse_docx_bytes(bytes(payload))
                except Exception as exc:
                    if not permissive:
                        raise
                    out.append(
                        {
                            "path": path,
                            "seq": None,
                            "numbering": None,
                            "block_type": "_corrupt",
                            "text": f"{type(exc).__name__}: {exc}"[:200],
                            "caption": None,
                            "cells_text": None,
                        }
                    )
                    continue
                for b in blocks:
                    out.append({"path": path, **b})
            yield pd.DataFrame(
                out, columns=[f.name for f in BLOCK_ROWS_SCHEMA.fields]
            )

    return binary_docs.select("path", "content").mapInPandas(
        parse, BLOCK_ROWS_SCHEMA
    )


def make_docx(paragraphs: list[str], tables: list[list[str]] | None = None) -> bytes:
    """Build a minimal valid .docx in memory (test fixture helper)."""
    parts = []
    for p in paragraphs:
        parts.append(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>")
    for tbl in tables or []:
        cells = "".join(
            f"<w:tc><w:p><w:r><w:t>{c}</w:t></w:r></w:p></w:tc>" for c in tbl
        )
        parts.append(f"<w:tbl><w:tr>{cells}</w:tr></w:tbl>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{''.join(parts)}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()
