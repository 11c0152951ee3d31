"""XLSX → cell rows (S5 sibling) — a real, dependency-free implementation.

The reference pins `openpyxl` (reference decisions-summaries/
requirements.txt:44), implying a spreadsheet ingest path beside the DOCX
one. An .xlsx file is a zip archive: `xl/workbook.xml` names the sheets,
`xl/_rels/workbook.xml.rels` maps each sheet to its worksheet part,
`xl/sharedStrings.xml` interns string cell values, and each
`xl/worksheets/sheetN.xml` holds `<sheetData>` rows of `<c>` cells — all
parseable with the stdlib (zipfile + xml.etree), no openpyxl needed.

Spark shape mirrors sources/docx.py: binaryFile source → mapInPandas parser
→ flat cell rows (path, sheet, row, col, value). Each Arrow batch parses
its workbooks independently → embarrassingly parallel across executors.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree

from pyspark.sql import DataFrame
from pyspark.sql import types as T

S_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PKG_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

CELL_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("sheet_idx", T.LongType()),
        T.StructField("sheet_name", T.StringType()),
        T.StructField("row_num", T.LongType()),
        T.StructField("col_num", T.LongType()),
        T.StructField("cell_ref", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

_REF_RE = re.compile(r"^([A-Z]+)(\d+)$")


def _col_to_num(letters: str) -> int:
    """A → 1, Z → 26, AA → 27 (base-26 bijective numeration)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


def _si_text(si: ElementTree.Element) -> str:
    """A sharedStrings <si> is either one <t> or rich-text runs <r><t>."""
    return "".join(t.text or "" for t in si.iter(f"{S_NS}t"))


def parse_xlsx_bytes(payload: bytes) -> list[dict]:
    """One XLSX binary → flat cell dicts, in sheet/row/col order."""
    cells: list[dict] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = set(zf.namelist())
        workbook = ElementTree.fromstring(zf.read("xl/workbook.xml"))
        # r:id → worksheet part, from the workbook relationships
        rels: dict[str, str] = {}
        if "xl/_rels/workbook.xml.rels" in names:
            rel_root = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            for rel in rel_root.iter(f"{PKG_NS}Relationship"):
                target = rel.get("Target", "").lstrip("/")
                if not target.startswith("xl/"):
                    target = f"xl/{target}"
                rels[rel.get("Id", "")] = target
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sst = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [_si_text(si) for si in sst.iter(f"{S_NS}si")]

        for sheet_idx, sheet in enumerate(workbook.iter(f"{S_NS}sheet"), start=1):
            sheet_name = sheet.get("name", f"sheet{sheet_idx}")
            part = rels.get(sheet.get(f"{R_NS}id", ""))
            if part is None:  # no rels part: fall back to conventional naming
                part = f"xl/worksheets/sheet{sheet_idx}.xml"
            if part not in names:
                continue
            ws = ElementTree.fromstring(zf.read(part))
            for row in ws.iter(f"{S_NS}row"):
                for pos, c in enumerate(row.iter(f"{S_NS}c"), start=1):
                    ref = c.get("r")
                    m = _REF_RE.match(ref) if ref else None
                    if m:
                        col_num, row_num = _col_to_num(m.group(1)), int(m.group(2))
                    else:  # refs are optional in OOXML; fall back to position
                        col_num, row_num = pos, int(row.get("r", 0))
                        ref = f"C{col_num}R{row_num}"
                    ctype = c.get("t", "n")
                    if ctype == "inlineStr":
                        is_el = c.find(f"{S_NS}is")
                        value = _si_text(is_el) if is_el is not None else None
                    else:
                        v = c.find(f"{S_NS}v")
                        if v is None:
                            continue  # empty cell
                        raw = v.text or ""
                        value = shared[int(raw)] if ctype == "s" else raw
                    cells.append(
                        {
                            "sheet_idx": sheet_idx,
                            "sheet_name": sheet_name,
                            "row_num": row_num,
                            "col_num": col_num,
                            "cell_ref": ref,
                            "value": value,
                        }
                    )
    return cells


def xlsx_to_cells(binary_docs: DataFrame, permissive: bool = False) -> DataFrame:
    """binaryFile rows (path, content) → cell rows, in Arrow batches.

    ``permissive=True`` is the production-ingest mode: a corrupt workbook
    (truncated zip, malformed XML) is skipped instead of failing the whole
    job — at 100 TB a single bad file must not kill a multi-hour ingest —
    and surfaces as one row with sheet_name='_corrupt' and the error text
    in ``value`` (the same book-keeping role as Spark's own
    columnNameOfCorruptRecord in PERMISSIVE JSON/CSV parsing), so bad
    inputs are countable and re-drivable downstream. Default stays strict:
    fail fast, matching FAILFAST semantics."""
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[dict] = []
            for path, payload in zip(pdf["path"], pdf["content"]):
                try:
                    cells = parse_xlsx_bytes(bytes(payload))
                except Exception as exc:
                    if not permissive:
                        raise
                    out.append(
                        {
                            "path": path,
                            "sheet_idx": None,
                            "sheet_name": "_corrupt",
                            "row_num": None,
                            "col_num": None,
                            "cell_ref": None,
                            "value": f"{type(exc).__name__}: {exc}"[:200],
                        }
                    )
                    continue
                for c in cells:
                    out.append({"path": path, **c})
            yield pd.DataFrame(
                out, columns=[f.name for f in CELL_ROWS_SCHEMA.fields]
            )

    return binary_docs.select("path", "content").mapInPandas(
        parse, CELL_ROWS_SCHEMA
    )


def _num_to_col(n: int) -> str:
    letters = ""
    while n > 0:
        n, rem = divmod(n - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def make_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """Build a minimal valid .xlsx in memory (test fixture helper).
    Strings go through sharedStrings (the path real writers use); ints and
    floats are written as native numeric cells."""
    shared: list[str] = []

    def sst_idx(s: str) -> int:
        try:
            return shared.index(s)
        except ValueError:
            shared.append(s)
            return len(shared) - 1

    sheet_xmls: list[str] = []
    for rows in sheets.values():
        row_parts = []
        for r, row in enumerate(rows, start=1):
            cell_parts = []
            for c, val in enumerate(row, start=1):
                ref = f"{_num_to_col(c)}{r}"
                if isinstance(val, str):
                    cell_parts.append(
                        f'<c r="{ref}" t="s"><v>{sst_idx(val)}</v></c>'
                    )
                else:
                    cell_parts.append(f'<c r="{ref}"><v>{val}</v></c>')
            row_parts.append(f'<row r="{r}">{"".join(cell_parts)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(row_parts)}</sheetData></worksheet>'
        )

    sheet_tags = "".join(
        f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>'
        for i, name in enumerate(sheets, start=1)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    rels = "".join(
        f'<Relationship Id="rId{i}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i}.xml"/>'
        for i in range(1, len(sheets) + 1)
    )
    workbook_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{rels}</Relationships>"
    )
    sst_items = "".join(f"<si><t>{s}</t></si>" for s in shared)
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">{sst_items}</sst>'
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", workbook_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_xmls, start=1):
            zf.writestr(f"xl/worksheets/sheet{i}.xml", xml)
    return buf.getvalue()
