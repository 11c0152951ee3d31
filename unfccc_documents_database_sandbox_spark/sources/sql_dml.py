"""SQL DML front-end for the snapshot table format (VERDICT r12 #2).

The reference pushes ALL relational work through SQL strings — its whole
surface is psycopg2/SQLAlchemy statements (SURVEY §1.1;
/root/reference/README.md:15-18) — while this engine's transactional
table format exposed only the Python API (`snapshots.merge_into`,
`update_where`, `delete_where`). This module closes that asymmetry with
a THIN statement parser: `MERGE INTO` / `UPDATE` / `DELETE` SQL strings
route to the existing commit-log DML, which keeps every transactional
guarantee (atomic commits, constraint checks, typed change feed,
conflict matrix) because the SQL layer is pure syntax — zero new write
paths.

Grammar (documented refusals for everything else):

    DELETE FROM <table> [WHERE <cond>]
    UPDATE <table> SET col = expr [, ...] [WHERE <cond>]
        -- <cond> may contain ONE `col IN (SELECT ...)` conjunct: the
        -- statement lowers onto MERGE (semi-join semantics; the
        -- subquery binds snapshot tables, including the target)
    INSERT INTO <table> [(col, ...)] VALUES (...), ... | <SELECT/WITH query>
        -- positional column mapping (SQL semantics); append's write
        -- rules own schema checks, DEFAULT fill and generated columns;
        -- the SELECT runs through read_sql, so it may reference other
        -- registered snapshot tables (time travel included)
    INSERT OVERWRITE <table> [(col, ...)] VALUES ... | <SELECT/WITH query>
        -- full-table atomic overwrite (snapshots.insert_overwrite)
    INSERT INTO <table> [(col, ...)] REPLACE WHERE <pred> <query>
        -- Delta's replaceWhere: delete-matching + insert as ONE commit;
        -- incoming rows outside the predicate refuse
    MERGE INTO <table> [AS] t
        USING (<subquery>) | <view-or-source-or-snapshot-table> [AS] s
        -- the subquery runs through read_sql (snapshot tables bind);
        -- a bare registered snapshot-table name reads its head
        ON t.k = s.k [AND t.k2 = s.k2 ...]          -- equi-keys only
        [WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = e, ...]
        [WHEN MATCHED [AND <cond>] THEN DELETE]
        [WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN INSERT *]
        [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE
                                                     | UPDATE SET c = e, ...]

Arbitrary aliases are accepted and rewritten to the engine's canonical
``t.``/``s.`` qualifiers. The parser is deliberately not a full SQL
grammar: it tokenizes at paren-depth 0 outside string literals (so
nested CASE WHEN / function calls / quoted text inside expressions pass
through verbatim to Spark, which owns expression semantics) and raises
``DmlSyntaxError`` for anything outside the surface above — non-equi ON
conditions, MERGE INSERT with column lists or VALUES (the merge schema
contract is INSERT *), multiple by-source clauses — rather than
guessing.

``mode="mor"`` routes to the merge-on-read writers (`delete_where_mor`,
`update_where_mor`, `merge_into_mor`); since r14 the MoR MERGE carries
the SAME clause matrix as the COW path (ordered conditioned WHEN
MATCHED, conditional INSERT, NOT MATCHED BY SOURCE — VERDICT r13 #3),
so every statement this grammar accepts runs under either mode.

Scale: the front-end adds zero execution cost — strings are parsed on
the driver once; the physical work is exactly the Python API's
(broadcast-semi hit-file discovery, file-bounded rewrites / DV appends).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unfccc_documents_database_sandbox_spark.sources import snapshots as snap


class DmlSyntaxError(ValueError):
    """Statement outside the supported DML surface (see module docstring)."""


_IDENT = r"[A-Za-z_][A-Za-z_0-9]*"


_CASE = re.compile(r"\bCASE\b", re.IGNORECASE)
_END = re.compile(r"\bEND\b", re.IGNORECASE)


def _top_level_matches(s: str, pattern: re.Pattern) -> list[re.Match]:
    """All matches of ``pattern`` at nesting depth 0: outside parens,
    outside string literals ('' escapes a quote, SQL-style), and outside
    CASE...END blocks (whose WHEN/THEN/ELSE belong to the expression, not
    the statement)."""
    out: list[re.Match] = []
    depth, in_str, i, n = 0, False, 0, len(s)
    while i < n:
        c = s[i]
        if in_str:
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
            i += 1
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if i == 0 or not re.match(r"[\w$]", s[i - 1]):
            mc = _CASE.match(s, i)
            if mc:
                depth += 1
                i = mc.end()
                continue
            me = _END.match(s, i)
            if me and depth > 0:
                depth -= 1
                i = me.end()
                continue
        if depth == 0:
            m = pattern.match(s, i)
            if m and m.end() > i:
                out.append(m)
                i = m.end()
                continue
        i += 1
    return out


def _split_top(s: str, keyword: str) -> list[str]:
    """Split ``s`` on top-level occurrences of a keyword (word-bounded,
    case-insensitive) or a literal separator like ','; returns the
    segments WITHOUT the keyword."""
    if keyword.isalpha():
        pat = re.compile(rf"\b{keyword}\b", re.IGNORECASE)
    else:
        pat = re.compile(re.escape(keyword))
    cuts = _top_level_matches(s, pat)
    if not cuts:
        return [s]
    parts, prev = [], 0
    for m in cuts:
        parts.append(s[prev:m.start()])
        prev = m.end()
    parts.append(s[prev:])
    return parts


def _find_top(s: str, keyword: str) -> re.Match | None:
    """First top-level occurrence of a word-bounded keyword."""
    ms = _top_level_matches(s, re.compile(rf"\b{keyword}\b", re.IGNORECASE))
    return ms[0] if ms else None


def _replace_quals(s: str, mapping: dict[str, str]) -> str:
    """Rewrite ``alias.`` qualifiers to canonical ones OUTSIDE string
    literals (two-phase via NUL placeholders so swapping t<->s is safe)."""
    tmp: dict[str, str] = {a: f"\x00{i}\x00." for i, a in enumerate(mapping)}
    out: list[str] = []
    depth_unused, in_str, i, n = 0, False, 0, len(s)
    pats = {
        a: re.compile(rf"\b{re.escape(a)}\s*\.", re.IGNORECASE)
        for a in mapping
    }
    while i < n:
        c = s[i]
        if in_str:
            out.append(c)
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":
                    out.append(s[i + 1])
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
            out.append(c)
            i += 1
            continue
        hit = None
        for a, pat in pats.items():
            m = pat.match(s, i)
            # a qualifier is ident-dot NOT preceded by ident or dot
            if m and (i == 0 or not re.match(r"[\w.$]", s[i - 1])):
                hit = (a, m)
                break
        if hit:
            out.append(tmp[hit[0]])
            i = hit[1].end()
            continue
        out.append(c)
        i += 1
    res = "".join(out)
    for idx, a in enumerate(mapping):
        res = res.replace(f"\x00{idx}\x00.", mapping[a] + ".")
    return res


def _strip_qual(expr: str, allowed: str, forbidden: str, ctx: str) -> str:
    """Drop the one legal qualifier from a single-sided clause expression
    (the engine evaluates by-source SETs against the bare old row and
    insert conditions against the bare source row); refuse the other.
    Quote-aware like `_replace_quals` (r13 ADVICE low): an alias-dot
    sequence inside a string literal — e.g. a literal ``'s.x'`` — is
    data, not a qualifier, so it is neither refused nor rewritten."""
    pat_bad = re.compile(rf"\b{re.escape(forbidden)}\s*\.", re.IGNORECASE)
    pat_ok = re.compile(rf"\b{re.escape(allowed)}\s*\.", re.IGNORECASE)
    out: list[str] = []
    in_str, i, n = False, 0, len(expr)
    while i < n:
        c = expr[i]
        if in_str:
            out.append(c)
            if c == "'":
                if i + 1 < n and expr[i + 1] == "'":
                    out.append(expr[i + 1])
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
            out.append(c)
            i += 1
            continue
        if i == 0 or not re.match(r"[\w.$]", expr[i - 1]):
            if pat_bad.match(expr, i):
                raise DmlSyntaxError(
                    f"{ctx} may reference only the {allowed}-side row; "
                    f"found a '{forbidden}.' qualifier in {expr!r}")
            m = pat_ok.match(expr, i)
            if m:
                i = m.end()
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _parse_assignments(text: str, ctx: str) -> dict[str, str]:
    """``col = expr [, ...]`` with top-level comma/first-= splitting."""
    out: dict[str, str] = {}
    for item in _split_top(text, ","):
        m = re.match(rf"^\s*({_IDENT})\s*=\s*(.+?)\s*$", item, re.DOTALL)
        if not m:
            raise DmlSyntaxError(
                f"{ctx}: expected 'column = expression', got {item!r}")
        col, expr = m.group(1), m.group(2)
        if col in out:
            raise DmlSyntaxError(f"{ctx}: column {col!r} SET twice")
        out[col] = expr
    return out


def _require_table(name: str, tables: dict[str, str]) -> str:
    if name not in tables:
        raise DmlSyntaxError(
            f"unknown snapshot table {name!r}; registered: {sorted(tables)}")
    return tables[name]


def _parse_on_keys(cond: str, t_alias: str, s_alias: str) -> list[str]:
    """ON must be a conjunction of cross-side same-name equi-predicates —
    exactly what `merge_into(key_cols=...)` expresses. Anything else is a
    refusal, not a guess."""
    keys: list[str] = []
    for conj in _split_top(cond, "AND"):
        m = re.match(
            rf"^\s*\(?\s*({_IDENT})\s*\.\s*({_IDENT})\s*=\s*"
            rf"({_IDENT})\s*\.\s*({_IDENT})\s*\)?\s*$",
            conj, re.DOTALL)
        if not m:
            raise DmlSyntaxError(
                "MERGE ON supports only conjunctions of "
                "'t.col = s.col' equi-predicates (merge keys); got "
                f"{conj.strip()!r}")
        a1, c1, a2, c2 = m.groups()
        sides = {a1.lower(): c1, a2.lower(): c2}
        if set(sides) != {t_alias.lower(), s_alias.lower()}:
            raise DmlSyntaxError(
                f"MERGE ON conjunct {conj.strip()!r} must compare the "
                f"target ({t_alias}) to the source ({s_alias})")
        if sides[t_alias.lower()] != sides[s_alias.lower()]:
            raise DmlSyntaxError(
                "MERGE ON key columns must have the same name on both "
                f"sides (the key_cols contract); got {conj.strip()!r}")
        keys.append(sides[t_alias.lower()])
    return keys


def _parse_alias(text: str, default: str, what: str) -> tuple[str, str]:
    """``<name> [AS] [alias]`` → (name, alias)."""
    m = re.match(
        rf"^\s*({_IDENT})\s*(?:\bAS\b\s*)?({_IDENT})?\s*$",
        text, re.IGNORECASE | re.DOTALL)
    if not m:
        raise DmlSyntaxError(f"cannot parse {what} reference {text!r}")
    name, alias = m.group(1), m.group(2)
    if alias and alias.upper() == "AS":
        raise DmlSyntaxError(f"dangling AS in {what} reference {text!r}")
    return name, (alias or default)


def _resolve_source(
    spark: SparkSession, text: str, sources: dict[str, DataFrame] | None,
    tables: dict[str, str] | None = None,
) -> tuple[DataFrame, str]:
    """USING operand: a parenthesized subquery (run through `read_sql`
    with the statement's own table mapping, so it can SELECT from
    registered snapshot tables — time travel included — as well as
    temp views), a name in ``sources``, a registered snapshot table
    name (head read), or a catalog/temp-view name."""
    text = text.strip()
    if text.startswith("("):
        # ( subquery ) [AS] alias
        depth, in_str, end = 0, False, -1
        for i, c in enumerate(text):
            if in_str:
                in_str = c != "'"
                continue
            if c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end < 0:
            raise DmlSyntaxError(f"unbalanced parens in USING {text!r}")
        sub, rest = text[1:end], text[end + 1:]
        m = re.match(rf"^\s*(?:\bAS\b\s*)?({_IDENT})?\s*$", rest,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise DmlSyntaxError(f"cannot parse USING alias in {rest!r}")
        return read_sql(spark, sub, tables or {}), (m.group(1) or "s")
    name, alias = _parse_alias(text, "s", "USING")
    if sources and name in sources:
        return sources[name], alias
    if tables and name in tables:
        from unfccc_documents_database_sandbox_spark.sources import (
            snapshots as _snap,
        )

        return _snap.read(spark, tables[name]), alias
    return spark.table(name), alias


_CLASSIC_UPSERT = object()  # sentinel: plain matched-replace semantics


def _parse_merge(
    spark: SparkSession, sql: str, tables: dict[str, str],
    sources: dict[str, DataFrame] | None,
) -> dict:
    m_into = re.match(r"^\s*MERGE\s+INTO\b", sql, re.IGNORECASE)
    m_using = _find_top(sql, "USING")
    m_on = _find_top(sql, "ON")
    whens = _split_top(sql, "WHEN")
    if not (m_into and m_using and m_on):
        raise DmlSyntaxError("MERGE requires INTO ... USING ... ON ...")
    if len(whens) < 2:
        raise DmlSyntaxError("MERGE requires at least one WHEN clause")
    if _find_top(sql, "VALUES"):
        raise DmlSyntaxError(
            "MERGE INSERT supports only 'INSERT *' (the merge schema "
            "contract); column lists / VALUES are refused")
    tgt_name, t_alias = _parse_alias(
        sql[m_into.end():m_using.start()], "t", "MERGE INTO")
    root = _require_table(tgt_name, tables)
    source, s_alias = _resolve_source(
        spark, sql[m_using.end():m_on.start()], sources, tables)
    if t_alias.lower() == s_alias.lower():
        raise DmlSyntaxError(
            f"target and source aliases must differ, both {t_alias!r}")
    # ON condition runs to the first top-level WHEN
    first_when = _find_top(sql[m_on.end():], "WHEN")
    on_cond = sql[m_on.end():m_on.end() + first_when.start()]
    key_cols = _parse_on_keys(on_cond, t_alias, s_alias)

    quals = {t_alias: "t", s_alias: "s"}
    matched: list[dict] = []
    insert_cond: str | None | object = _CLASSIC_UPSERT  # no insert clause yet
    by_source: dict | None = None
    seen_insert = False
    for clause in whens[1:]:
        clause = clause.strip()
        m_then = _find_top(clause, "THEN")
        if not m_then:
            raise DmlSyntaxError(f"WHEN clause missing THEN: {clause!r}")
        head, action = clause[:m_then.start()], clause[m_then.end():].strip()
        head_n = re.sub(r"\s+", " ", head).strip()
        hu = head_n.upper()
        cond: str | None = None
        m_and = _find_top(head, "AND")
        if m_and:
            cond = head[m_and.end():].strip()
            hu = re.sub(r"\s+", " ", head[:m_and.start()]).strip().upper()
        if hu == "MATCHED":
            cond_c = _replace_quals(cond, quals) if cond else None
            au = re.sub(r"\s+", " ", action).strip()
            if re.match(r"^UPDATE\s+SET\s+\*$", au, re.IGNORECASE):
                matched.append(
                    {"action": "update", "condition": cond_c, "set": None})
            elif re.match(r"^UPDATE\s+SET\b", au, re.IGNORECASE):
                body = re.sub(r"^UPDATE\s+SET\b", "", action.strip(),
                              flags=re.IGNORECASE)
                sets = {
                    c: _replace_quals(e, quals)
                    for c, e in _parse_assignments(body, "WHEN MATCHED").items()
                }
                matched.append(
                    {"action": "update", "condition": cond_c, "set": sets})
            elif au.upper() == "DELETE":
                matched.append({"action": "delete", "condition": cond_c})
            else:
                raise DmlSyntaxError(
                    f"WHEN MATCHED supports UPDATE SET .../DELETE; got "
                    f"{action!r}")
        elif hu in ("NOT MATCHED", "NOT MATCHED BY TARGET"):
            if seen_insert:
                raise DmlSyntaxError("multiple WHEN NOT MATCHED clauses")
            seen_insert = True
            if not re.match(r"^INSERT\s*\*$", action.strip(), re.IGNORECASE):
                raise DmlSyntaxError(
                    "WHEN NOT MATCHED supports only 'INSERT *'; got "
                    f"{action!r}")
            insert_cond = (
                _strip_qual(_replace_quals(cond, quals), "s", "t",
                            "WHEN NOT MATCHED condition")
                if cond else None
            )
        elif hu == "NOT MATCHED BY SOURCE":
            if by_source is not None:
                raise DmlSyntaxError(
                    "multiple WHEN NOT MATCHED BY SOURCE clauses")
            cond_t = (
                _strip_qual(_replace_quals(cond, quals), "t", "s",
                            "WHEN NOT MATCHED BY SOURCE condition")
                if cond else None
            )
            au = action.strip()
            if au.upper() == "DELETE":
                by_source = {"kind": "delete", "condition": cond_t,
                             "set": None}
            elif re.match(r"^UPDATE\s+SET\b", au, re.IGNORECASE):
                body = re.sub(r"^UPDATE\s+SET\b", "", au, flags=re.IGNORECASE)
                sets = {
                    c: _strip_qual(_replace_quals(e, quals), "t", "s",
                                   "by-source SET")
                    for c, e in _parse_assignments(
                        body, "WHEN NOT MATCHED BY SOURCE").items()
                }
                by_source = {"kind": "update", "condition": cond_t,
                             "set": sets}
            else:
                raise DmlSyntaxError(
                    "WHEN NOT MATCHED BY SOURCE supports DELETE / "
                    f"UPDATE SET ...; got {action!r}")
        else:
            raise DmlSyntaxError(f"unsupported WHEN clause head {head!r}")
    return {
        "root": root, "source": source, "key_cols": key_cols,
        "matched": matched, "insert_cond": insert_cond,
        "by_source": by_source,
    }


def _extract_in_subquery(cond: str):
    """Detect ONE top-level ``<col> IN (SELECT|WITH ...)`` conjunct in a
    DELETE/UPDATE predicate. Returns (col, subquery_sql, extra_cond) or
    None when the predicate has no subquery (the plain path). The key
    must be a bare column — it becomes the merge key of the lowered
    MERGE (Delta's own subquery-DML support has the same shape: the
    rewrite is a semi-join, so positive-match semantics coincide with
    IN: NULL keys on either side never match, hence never delete)."""
    conjuncts = _split_top(cond, "AND")
    hits: list[tuple[str, str]] = []
    rest: list[str] = []
    pat = re.compile(
        rf"^\s*({_IDENT})\s+IN\s*\((.*)\)\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    for seg in conjuncts:
        m = pat.match(seg)
        if m and re.match(r"^\s*(SELECT|WITH)\b", m.group(2),
                          re.IGNORECASE):
            hits.append((m.group(1), m.group(2).strip()))
        else:
            rest.append(seg.strip())
    # r16 (ADVICE r15): a subquery the extractor did NOT claim must be
    # refused with a typed error NAMING the unsupported shape — falling
    # through to delete_where/update_where would die inside F.expr with
    # an opaque AnalysisException (the module's documented-refusal
    # discipline). Anything subquery-shaped lives inside parens, so one
    # scan of the unclaimed segments suffices.
    sub_pat = re.compile(r"\(\s*(SELECT|WITH)\b", re.IGNORECASE)
    leftover = [seg for seg in rest if sub_pat.search(seg)]
    if leftover:
        seg = leftover[0]
        if re.search(rf"{_IDENT}\s+NOT\s+IN\s*\(\s*(SELECT|WITH)\b",
                     seg, re.IGNORECASE):
            shape = ("`col NOT IN (SELECT ...)` — NULL semantics make "
                     "NOT IN a different operation (a single NULL in "
                     "the subquery matches nothing); rewrite as a "
                     "MERGE WHEN NOT MATCHED BY SOURCE or pre-filter "
                     "the keys")
        elif _top_level_matches(cond, re.compile(r"\bOR\b",
                                                 re.IGNORECASE)):
            shape = ("an OR-combined IN (SELECT ...) — only a "
                     "top-level AND conjunct can become the lowered "
                     "MERGE key")
        elif re.search(r"\bEXISTS\s*\(\s*(SELECT|WITH)\b", seg,
                       re.IGNORECASE):
            # r17 (ADVICE r16): name EXISTS explicitly instead of
            # mislabelling it a non-bare-column IN key
            shape = ("`EXISTS (SELECT ...)` — correlated EXISTS is not "
                     "lowered; rewrite as `col IN (SELECT key ...)` on "
                     "the correlation key")
        elif re.search(r"(=|<>|!=|<=|>=|<|>)\s*\(\s*(SELECT|WITH)\b",
                       seg, re.IGNORECASE):
            shape = (f"a scalar-subquery comparison ({seg.strip()[:80]}) "
                     "— comparisons against (SELECT ...) are not lowered; "
                     "compute the scalar first and inline it")
        elif re.search(r"\bIN\s*\(\s*(SELECT|WITH)\b", seg,
                       re.IGNORECASE):
            shape = ("a non-bare-column IN key (e.g. expr(col) IN "
                     "(SELECT ...)) — the subquery key must be a bare "
                     "column to become the merge key")
        else:
            shape = f"an unsupported subquery conjunct: {seg.strip()[:120]}"
        raise DmlSyntaxError(
            f"unsupported subquery shape in DML predicate: {shape}")
    if not hits:
        return None
    if _top_level_matches(cond, re.compile(r"\bBETWEEN\b",
                                           re.IGNORECASE)):
        # a top-level BETWEEN's own AND would be split as a conjunct
        # separator and corrupt the rebuilt matched-condition — refuse
        # with the fix instead of silently mangling the predicate
        raise DmlSyntaxError(
            "a top-level BETWEEN cannot be combined with an IN "
            "(SELECT ...) conjunct — parenthesize it: "
            "(col BETWEEN lo AND hi)")
    if len(hits) > 1:
        raise DmlSyntaxError(
            "at most one `col IN (SELECT ...)` conjunct is supported "
            f"per statement, found {len(hits)}")
    col, sub = hits[0]
    extra = " AND ".join(f"({r})" for r in rest) if rest else None
    return col, sub, extra


def _dml_in_subquery(
    spark, kind: str, root: str, cond: str, sets, tables,
    mode: str, txn, max_retries: int,
):
    """Lower ``DELETE/UPDATE ... WHERE col IN (<subquery>) [AND extra]``
    onto the MERGE machinery: the subquery (run through `read_sql`, so
    it may reference snapshot tables — including the TARGET itself,
    which reads a pinned snapshot) becomes the distinct non-null merge
    source keyed on ``col``; the statement's remaining conjuncts become
    the WHEN MATCHED condition; no NOT MATCHED clause (a lowered DML
    never inserts). Returns the committed version, or None when the
    predicate has no subquery."""
    found = _extract_in_subquery(cond)
    if found is None:
        return None
    col, sub, extra = found
    src = read_sql(spark, sub, tables)
    if len(src.columns) != 1:
        raise DmlSyntaxError(
            "IN subquery must project exactly one column, got "
            f"{src.columns}")
    src = src.toDF(col).where(F.col(col).isNotNull()).distinct()
    merge_fn = snap.merge_into_mor if mode == "mor" else snap.merge_into
    if kind == "delete":
        clause = {"action": "delete", "condition": extra}
    else:
        clause = {"action": "update", "condition": extra, "set": sets}
    return merge_fn(
        spark, root, src, [col], txn=txn,
        matched_clauses=[clause],
        not_matched_condition="false",
        max_retries=max_retries)


def execute_dml(
    spark: SparkSession,
    sql: str,
    tables: dict[str, str],
    *,
    sources: dict[str, DataFrame] | None = None,
    mode: str = "cow",
    txn: dict | None = None,
    max_retries: int = 0,
) -> int:
    """Parse ONE DML statement and run it against the snapshot format.

    ``tables`` maps statement table names to snapshot roots; ``sources``
    optionally maps MERGE USING names to DataFrames (unlisted names fall
    back to ``spark.table`` — temp views — and a parenthesized USING
    subquery runs through ``spark.sql``). ``mode`` picks the write
    strategy: ``"cow"`` (copy-on-write rewrites) or ``"mor"``
    (merge-on-read deletion vectors + appends). Returns the committed
    version. Everything transactional — atomicity, constraints, change
    feed, conflict retries via ``max_retries`` — is the underlying
    Python API's; this layer is syntax only."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    stmt = sql.strip().rstrip(";").strip()
    kw = stmt.split(None, 1)[0].upper() if stmt else ""
    if kw == "DELETE":
        m = re.match(
            rf"^DELETE\s+FROM\s+({_IDENT})\s*(.*)$", stmt,
            re.IGNORECASE | re.DOTALL)
        if not m:
            raise DmlSyntaxError(f"cannot parse DELETE statement: {stmt!r}")
        root = _require_table(m.group(1), tables)
        rest = m.group(2).strip()
        cond = "true"
        if rest:
            mw = re.match(r"^WHERE\b(.*)$", rest, re.IGNORECASE | re.DOTALL)
            if not mw:
                raise DmlSyntaxError(
                    f"unexpected trailing text after DELETE: {rest!r}")
            cond = mw.group(1).strip()
        lowered = _dml_in_subquery(
            spark, "delete", root, cond, None, tables, mode, txn,
            max_retries)
        if lowered is not None:
            return lowered
        fn = snap.delete_where_mor if mode == "mor" else snap.delete_where
        return fn(spark, root, cond, max_retries=max_retries)
    if kw == "UPDATE":
        m = re.match(rf"^UPDATE\s+({_IDENT})\s+SET\b(.*)$", stmt,
                     re.IGNORECASE | re.DOTALL)
        if not m:
            raise DmlSyntaxError(f"cannot parse UPDATE statement: {stmt!r}")
        root = _require_table(m.group(1), tables)
        body = m.group(2)
        mw = _find_top(body, "WHERE")
        cond = body[mw.end():].strip() if mw else "true"
        sets = _parse_assignments(
            body[:mw.start()] if mw else body, "UPDATE SET")
        lowered = _dml_in_subquery(
            spark, "update", root, cond, sets, tables, mode, txn,
            max_retries)
        if lowered is not None:
            return lowered
        fn = snap.update_where_mor if mode == "mor" else snap.update_where
        return fn(spark, root, cond, sets, max_retries=max_retries)
    if kw == "INSERT":
        m = re.match(
            rf"^INSERT\s+(INTO|OVERWRITE)\s+({_IDENT})\s*(\([^)]*\))?\s*(.+)$",
            stmt, re.IGNORECASE | re.DOTALL)
        if not m:
            raise DmlSyntaxError(f"cannot parse INSERT statement: {stmt!r}")
        overwrite = m.group(1).upper() == "OVERWRITE"
        root = _require_table(m.group(2), tables)
        col_list = None
        if m.group(3):
            col_list = [c.strip() for c in m.group(3)[1:-1].split(",")]
            if not all(re.fullmatch(_IDENT, c) for c in col_list):
                raise DmlSyntaxError(
                    f"bad INSERT column list {m.group(3)!r}")
        body = m.group(4).strip()
        replace_where = None
        mrw = re.match(r"^REPLACE\s+WHERE\b(.*)$", body,
                       re.IGNORECASE | re.DOTALL)
        if mrw:
            # Delta's `INSERT INTO t REPLACE WHERE <pred> <query>`: the
            # predicate runs to the top-level start of the query
            if overwrite:
                raise DmlSyntaxError(
                    "REPLACE WHERE belongs to INSERT INTO (the Delta "
                    "form); INSERT OVERWRITE already replaces the "
                    "whole table")
            rest = mrw.group(1)
            mq = None
            for qkw in ("SELECT", "WITH", "VALUES"):
                cand = _find_top(rest, qkw)
                if cand is not None and (mq is None
                                         or cand.start() < mq.start()):
                    mq = cand
            if mq is None or not rest[:mq.start()].strip():
                raise DmlSyntaxError(
                    "REPLACE WHERE needs a predicate followed by a "
                    "VALUES list or SELECT/WITH query")
            replace_where = rest[:mq.start()].strip()
            body = rest[mq.start():].strip()
        head_kw = body.split(None, 1)[0].upper() if body else ""
        if head_kw == "VALUES":
            # VALUES rows evaluate through spark.sql (Spark owns literal
            # typing); the synthetic colN names are replaced positionally
            df = spark.sql(f"SELECT * FROM ({body})")
        elif head_kw in ("SELECT", "WITH"):
            # through read_sql with the statement's own table mapping:
            # an INSERT may SELECT from registered snapshot tables
            # (self-reference time travel included) as well as views
            df = read_sql(spark, body, tables)
        else:
            raise DmlSyntaxError(
                "INSERT INTO supports a VALUES list or a SELECT/WITH "
                f"query; got {body.split(None, 1)[0]!r}")
        # SQL INSERT maps columns by POSITION onto the column list (or
        # the full table schema) and assigns with an implicit cast to
        # the column type (ANSI assignment semantics — a bare VALUES
        # integer literal types as INT but lands in a BIGINT column);
        # append's write rules then own the remaining schema checks,
        # defaults, and generated columns
        schema = snap.table_schema(root)
        types = {f.name: f.dataType for f in schema}
        target = col_list or [f.name for f in schema]
        unknown = [c for c in target if c not in types]
        if unknown:
            raise DmlSyntaxError(f"INSERT column list names unknown "
                                 f"columns {unknown}")
        if len(df.columns) != len(target):
            raise DmlSyntaxError(
                f"INSERT supplies {len(df.columns)} columns but the "
                f"target list has {len(target)}: {target}")
        df = df.toDF(*target).select(
            *[F.col(c).cast(types[c]).alias(c) for c in target]
        )
        if overwrite or replace_where is not None:
            return snap.insert_overwrite(
                spark, root, df, replace_where=replace_where,
                max_retries=max_retries)
        return snap.append(spark, root, df, max_retries=max_retries)
    if kw == "MERGE":
        p = _parse_merge(spark, stmt, tables, sources)
        matched, insert_cond = p["matched"], p["insert_cond"]
        by_source = p["by_source"]
        classic = (
            matched == [{"action": "update", "condition": None, "set": None}]
            and insert_cond is None and by_source is None
        )
        merge_fn = snap.merge_into_mor if mode == "mor" else snap.merge_into
        if classic:
            return merge_fn(
                spark, p["root"], p["source"], p["key_cols"],
                txn=txn, max_retries=max_retries)
        kwargs: dict = {}
        if not matched:
            # SQL with no WHEN MATCHED clause leaves matched rows carried:
            # a never-TRUE clause expresses that in merge_into's model
            matched = [{"action": "update", "condition": "false",
                        "set": None}]
        kwargs["matched_clauses"] = matched
        # no INSERT clause = insert nothing (vs merge_into's default
        # insert-all); a never-TRUE condition expresses that
        if insert_cond is _CLASSIC_UPSERT:
            kwargs["not_matched_condition"] = "false"
        elif insert_cond is not None:
            kwargs["not_matched_condition"] = insert_cond
        if by_source is not None:
            kwargs["not_matched_by_source"] = by_source["kind"]
            if by_source["condition"] is not None:
                kwargs["not_matched_by_source_condition"] = (
                    by_source["condition"])
            if by_source["set"] is not None:
                kwargs["not_matched_by_source_set"] = by_source["set"]
        return merge_fn(
            spark, p["root"], p["source"], p["key_cols"],
            txn=txn, max_retries=max_retries, **kwargs)
    raise DmlSyntaxError(
        f"unsupported statement {kw!r}: this front-end handles MERGE "
        "INTO / UPDATE / DELETE / INSERT INTO over snapshot tables "
        "(SELECT belongs to spark.sql)")


def read_sql(
    spark: SparkSession,
    sql: str,
    tables: dict[str, str],
) -> DataFrame:
    """SELECT front-end over snapshot tables — the READ half of the
    reference's all-SQL surface (the DML half is `execute_dml`). Every
    occurrence of a registered table name in a FROM/JOIN position —
    optionally with Delta-style time travel, ``<table> VERSION AS OF
    <n>`` or ``<table> TIMESTAMP AS OF '<utc timestamp>'`` (resolved
    through the commit log's recorded epoch-ms timestamps, newest
    commit at-or-before wins — `snapshots.version_as_of`) — is bound
    to a snapshot read (`snapshots.read`, DV-aware, pinned-schema)
    registered as a session-unique temp view, and the rewritten
    statement runs through ``spark.sql``, which owns ALL query
    semantics. Names inside string literals are never rewritten (the
    statement scanner is quote-aware); unregistered names pass through
    untouched, so snapshot tables join freely against ordinary temp
    views. A malformed timestamp literal is a refusal, not a guess.
    The temp views are dropped once ``spark.sql`` has ANALYZED the
    statement (analysis binds the scan into the returned plan), so
    repeated querying does not leak catalog entries.

    Scale: binding is driver-side string work; the scan that runs is
    exactly `snapshots.read`'s (log-resolved live files, bitmap-DV
    probe, stats-typed schema), so Catalyst sees a plain relation and
    every pushdown applies."""
    import uuid

    def _first_outside_quotes(s: str, pat: re.Pattern) -> re.Match | None:
        """Table refs live at ANY paren depth (subqueries are normal
        SQL) — only string literals shield a name here, unlike the
        statement-clause scanner above."""
        in_str, i, n = False, 0, len(s)
        while i < n:
            c = s[i]
            if in_str:
                if c == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        i += 2
                        continue
                    in_str = False
                i += 1
                continue
            if c == "'":
                in_str = True
                i += 1
                continue
            m = pat.match(s, i)
            if m:
                return m
            i += 1
        return None

    m_hist = re.match(
        rf"^\s*DESCRIBE\s+HISTORY\s+({_IDENT})\s*;?\s*$", sql,
        re.IGNORECASE)
    if m_hist:
        # Delta's DESCRIBE HISTORY: the commit log as a metadata table
        # (newest first) — pure driver-side log reads, zero data I/O.
        root = _require_table(m_hist.group(1), tables)
        rows = [
            (int(h["version"]), h["operation"], bool(h["data_change"]),
             bool(h["schema_change"]), bool(h["deletion_vector"]),
             bool(h["change_data"]))
            for h in snap.history(root)
        ]
        return spark.createDataFrame(
            rows,
            "version long, operation string, data_change boolean, "
            "schema_change boolean, deletion_vector boolean, "
            "change_data boolean")

    def _ts_ms(lit: str) -> int:
        """A quoted timestamp literal -> epoch ms (UTC — the clock the
        commit log records). ISO date or date-time; refuse otherwise."""
        from datetime import datetime, timezone

        try:
            dt = datetime.fromisoformat(lit)
        except ValueError:
            raise DmlSyntaxError(
                f"cannot parse TIMESTAMP AS OF literal {lit!r} — expected "
                "an ISO timestamp like '2026-08-16 12:00:00' (UTC)"
            ) from None
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)

    out = sql
    views: list[str] = []
    for name in sorted(tables, key=len, reverse=True):
        root = tables[name]
        pat = re.compile(
            rf"\b(FROM|JOIN)\s+{re.escape(name)}\b"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+)\b"
            rf"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']*)')?",
            re.IGNORECASE,
        )
        while True:
            m = _first_outside_quotes(out, pat)
            if m is None:
                break
            if m.group(2):
                version = int(m.group(2))
            elif m.group(3) is not None:
                version = snap.version_as_of(root, _ts_ms(m.group(3)))
            else:
                version = None
            view = f"snap_{uuid.uuid4().hex[:12]}"
            snap.read(spark, root, version).createOrReplaceTempView(view)
            views.append(view)
            out = out[:m.start()] + f"{m.group(1)} {view}" + out[m.end():]
    try:
        return spark.sql(out)
    finally:
        # analysis already bound each scan into the returned plan; the
        # uuid views would otherwise accumulate for the session's life
        for v in views:
            spark.catalog.dropTempView(v)
