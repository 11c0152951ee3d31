"""Bare-XML → ordered element rows (S5 sibling) — dependency-free.

The reference pins lxml (decisions-summaries/requirements.txt:35) for its
document pipeline; DOCX and XLSX (both ZIP+XML containers) are covered by
sources/docx.py and sources/xlsx.py, and this module completes the third
lxml use case: a bare ``.xml`` document read straight into rows. The
stdlib parser (xml.etree.ElementTree) is sufficient — no external
dependency, same discipline as the siblings.

Row model: one row per ELEMENT in document order, carrying enough
structure to rebuild the tree (seq/parent_seq/depth), the tag, the
attributes as a deterministic JSON object (keys sorted), and the
element's own text (stripped). This is the generic "shred XML to a
table" shape every engine ships (SQL Server's OPENXML, Snowflake's
LATERAL FLATTEN over PARSE_XML): downstream queries join parent/child
rows relationally instead of walking a DOM.

Spark shape: binaryFile source → mapInPandas parser → XML_ROWS_SCHEMA.
Each Arrow batch parses its documents independently — embarrassingly
parallel across executors; a 100 TB corpus of XML shards linearly, and
the parser never materializes more than one document's tree at a time.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from xml.etree import ElementTree

from pyspark.sql import DataFrame
from pyspark.sql import types as T

XML_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("parent_seq", T.LongType()),
        T.StructField("depth", T.LongType()),
        T.StructField("tag", T.StringType()),
        T.StructField("attrs", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _strip_ns(tag: str) -> str:
    """`{uri}local` → `local` (namespace URIs stay available in attrs of
    the root via xmlns, but tags read relationally by local name)."""
    return tag.rsplit("}", 1)[-1]


def parse_xml_bytes(payload: bytes) -> list[dict]:
    """One XML binary → element rows in document order (pre-order walk).

    seq numbers elements 0..n-1 in document order; parent_seq is None
    for the root. attrs is a JSON object with SORTED keys (deterministic
    across engines/runs); text is the element's own stripped text or
    None when empty/whitespace."""
    root = ElementTree.fromstring(payload)
    rows: list[dict] = []

    def walk(el, parent_seq: int | None, depth: int) -> None:
        seq = len(rows)
        text = (el.text or "").strip() or None
        rows.append(
            {
                "seq": seq,
                "parent_seq": parent_seq,
                "depth": depth,
                "tag": _strip_ns(el.tag),
                "attrs": json.dumps(
                    {_strip_ns(k): v for k, v in sorted(el.attrib.items())},
                    sort_keys=True, separators=(",", ":"),
                ),
                "text": text,
            }
        )
        for child in el:
            walk(child, seq, depth + 1)

    walk(root, None, 0)
    return rows


def xml_to_rows(binary_docs: DataFrame, permissive: bool = False) -> DataFrame:
    """binaryFile rows (path, content) → element rows, in Arrow batches.

    ``permissive=True`` skips malformed documents instead of failing the
    job (one row with tag='_corrupt' and the error in ``text`` — the
    docx_to_blocks/xlsx_to_cells contract; one bad file must not kill a
    100 TB ingest). Default stays strict/FAILFAST."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for path, payload in zip(pdf["path"], pdf["content"]):
                try:
                    rows = parse_xml_bytes(bytes(payload))
                except Exception as exc:
                    if not permissive:
                        raise
                    out.append(
                        {
                            "path": path,
                            "seq": None,
                            "parent_seq": None,
                            "depth": None,
                            "tag": "_corrupt",
                            "attrs": None,
                            "text": f"{type(exc).__name__}: {exc}"[:200],
                        }
                    )
                    continue
                for r in rows:
                    out.append({"path": path, **r})
            yield pd.DataFrame(
                out, columns=[f.name for f in XML_ROWS_SCHEMA.fields]
            )

    return binary_docs.select("path", "content").mapInPandas(
        parse, XML_ROWS_SCHEMA
    )
