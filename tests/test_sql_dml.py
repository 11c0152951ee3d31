"""SQL DML front-end (sources/sql_dml.py — VERDICT r12 #2): MERGE INTO /
UPDATE / DELETE statements routed to the snapshot format's transactional
writers. Each behavioral test pins the SQL path against the equivalent
Python-API call on a twin table (same fixture, same commit sequence —
byte-equal results prove the front-end is pure syntax), plus refusal
tests for everything outside the documented surface."""

from __future__ import annotations

import pytest

from unfccc_documents_database_sandbox_spark.sources import snapshots as snap
from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
    DmlSyntaxError,
    execute_dml,
)


def _rows(spark, root):
    return sorted(
        tuple(r) for r in snap.read(spark, root).collect()
    )


@pytest.fixture()
def pair(spark, tmp_path):
    """Two identical snapshot tables: one driven by SQL, one by the
    Python API (the parity twin)."""
    df = spark.createDataFrame(
        [(i, i * 10, "live") for i in range(20)],
        "id long, score long, status string",
    )
    roots = []
    for name in ("sql_side", "py_side"):
        root = str(tmp_path / name)
        snap.create(spark, root, df.repartition(3))
        roots.append(root)
    return roots


def test_delete_matches_python_twin(spark, pair):
    sql_root, py_root = pair
    v = execute_dml(spark, "DELETE FROM tbl WHERE id % 3 = 0",
                    {"tbl": sql_root})
    snap.delete_where(spark, py_root, "id % 3 = 0")
    assert v == 1
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    assert all(t[0] % 3 != 0 for t in _rows(spark, sql_root))


def test_delete_without_where_deletes_all(spark, pair):
    sql_root, _ = pair
    execute_dml(spark, "DELETE FROM tbl", {"tbl": sql_root})
    assert snap.read(spark, sql_root).count() == 0


def test_update_matches_python_twin(spark, pair):
    sql_root, py_root = pair
    stmt = ("UPDATE tbl SET score = score + 5, status = 'bumped' "
            "WHERE id >= 10")
    execute_dml(spark, stmt, {"tbl": sql_root})
    snap.update_where(spark, py_root, "id >= 10",
                      {"score": "score + 5", "status": "'bumped'"})
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[15] == (15, 155, "bumped") and got[5] == (5, 50, "live")


def test_update_set_with_case_when(spark, pair):
    """CASE WHEN inside a SET expression must NOT confuse the top-level
    WHEN/THEN scanner (CASE...END nesting)."""
    sql_root, py_root = pair
    expr = "CASE WHEN score > 100 THEN 'hi' ELSE 'lo' END"
    execute_dml(spark, f"UPDATE tbl SET status = {expr}", {"tbl": sql_root})
    snap.update_where(spark, py_root, "true", {"status": expr})
    assert _rows(spark, sql_root) == _rows(spark, py_root)


def test_merge_classic_upsert(spark, pair):
    sql_root, py_root = pair
    src = spark.createDataFrame(
        [(5, 999, "upd"), (100, 1, "new")],
        "id long, score long, status string")
    src.createOrReplaceTempView("changes_v")
    v = execute_dml(
        spark,
        """MERGE INTO tbl AS t USING changes_v AS s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        {"tbl": sql_root})
    snap.merge_into(spark, py_root, src, ["id"])
    assert v == 1
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[5] == (5, 999, "upd") and got[100] == (100, 1, "new")


def test_merge_subquery_source_and_aliases(spark, pair):
    """USING (subquery) runs through spark.sql; arbitrary aliases are
    rewritten to the engine's canonical t./s. qualifiers."""
    sql_root, py_root = pair
    base = spark.createDataFrame(
        [(5, 999, "upd"), (6, 998, "drop-me"), (100, 1, "new")],
        "id long, score long, status string")
    base.createOrReplaceTempView("raw_changes_v")
    execute_dml(
        spark,
        """MERGE INTO tbl AS target
           USING (SELECT * FROM raw_changes_v WHERE status <> 'drop-me')
                 AS delta
           ON target.id = delta.id
           WHEN MATCHED AND delta.score > target.score
               THEN UPDATE SET score = delta.score + target.score,
                               status = 'merged'
           WHEN NOT MATCHED THEN INSERT *""",
        {"tbl": sql_root})
    snap.merge_into(
        spark, py_root, base.filter("status <> 'drop-me'"), ["id"],
        matched_clauses=[{"action": "update",
                          "condition": "s.score > t.score",
                          "set": {"score": "s.score + t.score",
                                  "status": "'merged'"}}],
    )
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[5] == (5, 1049, "merged")
    # id=6's source row was filtered by the subquery: base row carried
    assert got[6] == (6, 60, "live") and got[100] == (100, 1, "new")


def test_merge_clause_matrix(spark, pair):
    """Ordered conditioned WHEN MATCHED clauses + conditional INSERT +
    WHEN NOT MATCHED BY SOURCE UPDATE — the full Delta clause surface in
    one statement, hash-equal to the Python clause list."""
    sql_root, py_root = pair
    src = spark.createDataFrame(
        [(0, 7, "s"), (3, 8, "s"), (6, 9, "s"), (30, 2, "s"), (31, 3, "s")],
        "id long, score long, status string")
    stmt = """
        MERGE INTO tbl t USING src s ON t.id = s.id
        WHEN MATCHED AND s.score % 2 = 1 THEN
            UPDATE SET score = s.score * 100, status = 'odd'
        WHEN MATCHED AND s.score % 2 = 0 THEN DELETE
        WHEN NOT MATCHED AND score > 2 THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND id < 5 THEN
            UPDATE SET status = 'stale', score = -score
    """
    execute_dml(spark, stmt, {"tbl": sql_root}, sources={"src": src})
    snap.merge_into(
        spark, py_root, src, ["id"],
        matched_clauses=[
            {"action": "update", "condition": "s.score % 2 = 1",
             "set": {"score": "s.score * 100", "status": "'odd'"}},
            {"action": "delete", "condition": "s.score % 2 = 0"},
        ],
        not_matched_condition="score > 2",
        not_matched_by_source="update",
        not_matched_by_source_condition="id < 5",
        not_matched_by_source_set={"status": "'stale'", "score": "-score"},
    )
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[0] == (0, 700, "odd")        # clause 1 (odd source score)
    assert 3 not in got                      # clause 2 delete (score 8? no:
    # id=3 score=8 even -> DELETE; id=6 score=9 odd -> update
    assert got[6] == (6, 900, "odd")
    assert got[31] == (31, 3, "s") and 30 not in got  # conditional insert
    assert got[1] == (1, -10, "stale")       # by-source update, id<5
    assert got[10] == (10, 100, "live")      # unmatched, id>=5: carried


def test_merge_matched_only_no_insert(spark, pair):
    """No WHEN NOT MATCHED clause = unmatched source rows are NOT
    inserted (SQL semantics; merge_into's default would insert them)."""
    sql_root, _ = pair
    src = spark.createDataFrame([(5, 1, "x"), (500, 1, "x")],
                                "id long, score long, status string")
    execute_dml(
        spark,
        """MERGE INTO tbl t USING src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET status = 'touched'""",
        {"tbl": sql_root}, sources={"src": src})
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[5][2] == "touched" and 500 not in got
    assert len(got) == 20


def test_merge_by_source_delete_sync(spark, pair):
    sql_root, py_root = pair
    src = spark.createDataFrame(
        [(i, i * 10, "live") for i in range(0, 20, 2)],
        "id long, score long, status string")
    execute_dml(
        spark,
        """MERGE INTO tbl t USING src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        {"tbl": sql_root}, sources={"src": src})
    snap.merge_into(spark, py_root, src, ["id"],
                    not_matched_by_source="delete")
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    assert [t[0] for t in _rows(spark, sql_root)] == list(range(0, 20, 2))


def test_merge_mor_classic(spark, pair):
    """mode='mor' routes the classic upsert to merge_into_mor (zero data
    files rewritten)."""
    sql_root, py_root = pair
    files_before = set(snap.live_files(sql_root, 0))
    src = spark.createDataFrame([(5, 999, "upd"), (100, 1, "new")],
                                "id long, score long, status string")
    execute_dml(
        spark,
        """MERGE INTO tbl t USING src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        {"tbl": sql_root}, sources={"src": src}, mode="mor")
    snap.merge_into_mor(spark, py_root, src, ["id"])
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    # MoR: every original data file is still live (DVs + appends only)
    assert files_before <= set(snap.live_files(sql_root))


def test_merge_mor_full_clause_matrix_matches_cow(spark, pair):
    """VERDICT r13 #3: mode='mor' carries the SAME clause matrix as COW —
    one statement with ordered conditioned WHEN MATCHED clauses,
    conditional INSERT, and NOT MATCHED BY SOURCE UPDATE runs under both
    modes with identical table contents, while the MoR side rewrites
    ZERO pre-existing data files (DVs + appends only)."""
    sql_root, py_root = pair
    files_before = set(snap.live_files(sql_root, 0))
    src = spark.createDataFrame(
        [(0, 7, "s"), (3, 8, "s"), (6, 9, "s"), (30, 2, "s"), (31, 3, "s")],
        "id long, score long, status string")
    stmt = """
        MERGE INTO tbl t USING src s ON t.id = s.id
        WHEN MATCHED AND s.score % 2 = 1 THEN
            UPDATE SET score = s.score * 100, status = 'odd'
        WHEN MATCHED AND s.score % 2 = 0 THEN DELETE
        WHEN NOT MATCHED AND score > 2 THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND id < 5 THEN
            UPDATE SET status = 'stale', score = -score
    """
    execute_dml(spark, stmt, {"tbl": sql_root}, sources={"src": src},
                mode="mor")
    execute_dml(spark, stmt, {"tbl": py_root}, sources={"src": src},
                mode="cow")
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    assert files_before <= set(snap.live_files(sql_root)), (
        "MoR clause merge rewrote a pre-existing file")
    assert snap.dv_map(sql_root), "no deletion vectors assigned"
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[0] == (0, 700, "odd") and 3 not in got
    assert got[6] == (6, 900, "odd")
    assert got[31] == (31, 3, "s") and 30 not in got
    assert got[1] == (1, -10, "stale")
    assert got[10] == (10, 100, "live")


def test_mor_update_delete_route(spark, pair):
    sql_root, py_root = pair
    execute_dml(spark, "UPDATE tbl SET score = -1 WHERE id = 3",
                {"tbl": sql_root}, mode="mor")
    snap.update_where_mor(spark, py_root, "id = 3", {"score": "-1"})
    execute_dml(spark, "DELETE FROM tbl WHERE id = 4", {"tbl": sql_root},
                mode="mor")
    snap.delete_where_mor(spark, py_root, "id = 4")
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    assert set(snap.live_files(sql_root, 0)) <= set(snap.live_files(sql_root))


def test_string_literals_survive_parsing(spark, pair):
    """Keywords and qualifiers inside string literals pass through
    verbatim (the scanner is quote-aware)."""
    sql_root, _ = pair
    execute_dml(
        spark,
        "UPDATE tbl SET status = 'WHEN t.THEN (x' WHERE id = 1",
        {"tbl": sql_root})
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[1][2] == "WHEN t.THEN (x"


@pytest.mark.parametrize(
    "stmt,msg",
    [
        ("SELECT * FROM tbl", "unsupported statement"),
        ("DELETE FROM nope WHERE id = 1", "unknown snapshot table"),
        ("MERGE INTO tbl t USING src s ON t.id = s.id", "WHEN clause"),
        ("MERGE INTO tbl t USING src s ON t.id > s.id "
         "WHEN MATCHED THEN DELETE", "equi-predicates"),
        ("MERGE INTO tbl t USING src s ON t.id = s.other "
         "WHEN MATCHED THEN DELETE", "same name"),
        ("MERGE INTO tbl t USING src s ON t.id = s.id "
         "WHEN NOT MATCHED THEN INSERT (id) VALUES (1)", "INSERT"),
        ("MERGE INTO tbl t USING src t ON t.id = t.id "
         "WHEN MATCHED THEN DELETE", "aliases must differ"),
        ("MERGE INTO tbl t USING src s ON t.id = s.id "
         "WHEN MATCHED THEN TRUNCATE", "UPDATE SET"),
        ("MERGE INTO tbl t USING src s ON t.id = s.id "
         "WHEN NOT MATCHED BY SOURCE AND s.score > 0 THEN DELETE",
         "only the t-side"),
        ("MERGE INTO tbl t USING src s ON t.id = s.id "
         "WHEN NOT MATCHED AND t.score > 0 THEN INSERT *",
         "only the s-side"),
        ("MERGE INTO tbl t USING src s ON t.id = s.id "
         "WHEN NOT MATCHED BY SOURCE THEN DELETE "
         "WHEN NOT MATCHED BY SOURCE THEN DELETE", "multiple"),
        ("UPDATE tbl SET = 5", "column = expression"),
        ("UPDATE tbl SET score = 1, score = 2", "SET twice"),
    ],
)
def test_refusals(spark, pair, stmt, msg):
    sql_root, _ = pair
    src = spark.createDataFrame([(1, 1, "x")],
                                "id long, score long, status string")
    with pytest.raises(DmlSyntaxError, match=msg):
        execute_dml(spark, stmt, {"tbl": sql_root}, sources={"src": src})


def test_merge_txn_and_feed_parity(spark, pair):
    """The SQL path inherits the typed change feed — feed rows equal the
    Python twin's, clause by clause."""
    sql_root, py_root = pair
    src = spark.createDataFrame([(0, 7, "s"), (30, 2, "s")],
                                "id long, score long, status string")
    v1 = execute_dml(
        spark,
        """MERGE INTO tbl t USING src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET score = s.score
           WHEN NOT MATCHED THEN INSERT *""",
        {"tbl": sql_root}, sources={"src": src})
    v2 = snap.merge_into(
        spark, py_root, src, ["id"],
        matched_clauses=[{"action": "update", "condition": None,
                          "set": {"score": "s.score"}}])
    feed_sql = sorted(
        (r["_change_type"], r["id"]) for r in
        snap.changes(spark, sql_root, v1 - 1, v1,
                     classify_updates=True).collect())
    feed_py = sorted(
        (r["_change_type"], r["id"]) for r in
        snap.changes(spark, py_root, v2 - 1, v2,
                     classify_updates=True).collect())
    assert feed_sql == feed_py
    assert ("insert", 30) in feed_sql
    assert ("update_postimage", 0) in feed_sql


def test_insert_values_and_select(spark, pair):
    """INSERT INTO ... VALUES and ... SELECT both route to append with
    positional column mapping; the Python twin is a plain append."""
    sql_root, py_root = pair
    execute_dml(
        spark,
        "INSERT INTO tbl VALUES (100, 1000, 'v'), (101, 1010, 'v')",
        {"tbl": sql_root})
    snap.append(spark, py_root, spark.createDataFrame(
        [(100, 1000, "v"), (101, 1010, "v")],
        "id long, score long, status string"))
    base = spark.createDataFrame([(200, 1, "s")],
                                 "id long, score long, status string")
    base.createOrReplaceTempView("ins_src_v")
    execute_dml(
        spark,
        "INSERT INTO tbl SELECT id, score * 2, status FROM ins_src_v",
        {"tbl": sql_root})
    snap.append(spark, py_root, spark.sql(
        "SELECT id, score * 2 AS score, status FROM ins_src_v"))
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[100] == (100, 1000, "v") and got[200] == (200, 2, "s")


def test_insert_column_list_positional(spark, tmp_path):
    """A column list reorders positionally; a DEFAULT column omitted
    from the list is filled by append's write rules."""
    import pytest as _pytest

    root = str(tmp_path / "insdef")
    df = spark.createDataFrame([(1, 10, "live")],
                               "id long, score long, status string")
    snap.create(spark, root, df, default_cols={"status": "'live'"})
    execute_dml(
        spark,
        "INSERT INTO tbl (score, id) VALUES (70, 7)",
        {"tbl": root})
    got = {r.id: (r.score, r.status)
           for r in snap.read(spark, root).collect()}
    assert got[7] == (70, "live")
    with _pytest.raises(DmlSyntaxError, match="supplies 2 columns"):
        execute_dml(spark, "INSERT INTO tbl (id) VALUES (1, 2)",
                    {"tbl": root})
    with _pytest.raises(DmlSyntaxError, match="VALUES list or a SELECT"):
        execute_dml(spark, "INSERT INTO tbl TABLE other", {"tbl": root})


def test_read_sql_select_and_time_travel(spark, pair):
    """read_sql binds snapshot tables (head and VERSION AS OF) into one
    spark.sql statement; quote-aware and alias-friendly."""
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        read_sql,
    )

    sql_root, _ = pair
    snap.delete_where(spark, sql_root, "id % 2 = 0")
    got = read_sql(
        spark,
        """SELECT h.cnt AS head_n, v0.cnt AS v0_n
           FROM (SELECT COUNT(*) AS cnt FROM tbl) h
           CROSS JOIN (SELECT COUNT(*) AS cnt
                       FROM tbl VERSION AS OF 0) v0""",
        {"tbl": sql_root},
    ).collect()[0]
    assert (got.head_n, got.v0_n) == (10, 20)
    # joins against ordinary temp views; literals never rewritten
    spark.createDataFrame([(1, "x")], "id long, tagv string") \
        .createOrReplaceTempView("plain_v")
    rows = read_sql(
        spark,
        "SELECT t.id, p.tagv, 'FROM tbl' AS lit FROM tbl t "
        "JOIN plain_v p ON t.id = p.id",
        {"tbl": sql_root},
    ).collect()
    assert len(rows) == 1 and rows[0].lit == "FROM tbl"


def test_read_sql_timestamp_as_of(spark, pair):
    """VERDICT r13 #2: TIMESTAMP AS OF resolves through the commit log's
    recorded epoch-ms timestamps and hash-equals the VERSION AS OF read
    of the same pinned snapshot; a malformed literal is a refusal."""
    import json
    import os

    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        read_sql,
    )

    sql_root, _ = pair
    snap.delete_where(spark, sql_root, "id % 2 = 0")  # v1
    # pin deterministic commit timestamps (v0 @ 100s, v1 @ 200s epoch)
    for v, ts in ((0, 100_000), (1, 200_000)):
        p = snap._commit_path(sql_root, v)
        with open(p, encoding="utf-8") as fh:
            c = json.load(fh)
        c["ts"] = ts
        tmp = p + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(c, fh)
        os.replace(tmp, p)
    by_ts = sorted(
        tuple(r) for r in read_sql(
            spark,
            "SELECT * FROM tbl TIMESTAMP AS OF '1970-01-01 00:02:30'",
            {"tbl": sql_root},
        ).collect()
    )
    by_v = sorted(
        tuple(r) for r in read_sql(
            spark, "SELECT * FROM tbl VERSION AS OF 0", {"tbl": sql_root}
        ).collect()
    )
    assert by_ts == by_v and len(by_ts) == 20  # 150s -> newest <= is v0
    head = read_sql(
        spark,
        "SELECT * FROM tbl TIMESTAMP AS OF '1970-01-01 00:03:20'",
        {"tbl": sql_root},
    ).count()
    assert head == 10  # 200s -> v1
    with pytest.raises(DmlSyntaxError, match="cannot parse TIMESTAMP"):
        read_sql(spark, "SELECT * FROM tbl TIMESTAMP AS OF 'yesterdayish'",
                 {"tbl": sql_root})
    with pytest.raises(ValueError, match="no commit at or before"):
        read_sql(spark,
                 "SELECT * FROM tbl TIMESTAMP AS OF '1970-01-01 00:00:01'",
                 {"tbl": sql_root})


def test_read_sql_drops_its_temp_views(spark, pair):
    """r13 ADVICE low: the uuid-named binding views are dropped once the
    statement is analyzed — repeated querying leaks no catalog entries,
    and the returned DataFrame stays usable after the drop."""
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        read_sql,
    )

    sql_root, _ = pair

    def snap_views():
        return {t.name for t in spark.catalog.listTables()
                if t.name.startswith("snap_")}

    before = snap_views()
    df = read_sql(spark, "SELECT COUNT(*) AS n FROM tbl", {"tbl": sql_root})
    assert snap_views() == before, "binding views leaked"
    assert df.collect()[0].n == 20  # plan survives the view drop
    # and a refused statement cleans up too
    with pytest.raises(Exception):
        read_sql(spark, "SELECT definitely not sql FROM FROM tbl",
                 {"tbl": sql_root})
    assert snap_views() == before


def test_strip_qual_is_quote_aware():
    """r13 ADVICE low: alias-dot sequences inside string literals are
    data — neither refused (forbidden side) nor rewritten (allowed
    side); escaped quotes ('') stay inside the literal."""
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        _strip_qual,
    )

    assert _strip_qual("concat(s.x, 't.lit')", "s", "t", "ctx") \
        == "concat(x, 't.lit')"
    assert _strip_qual("'s.kept' || t.c", "t", "s", "ctx") \
        == "'s.kept' || c"
    assert _strip_qual("'it''s. t.' || t.c", "t", "s", "ctx") \
        == "'it''s. t.' || c"
    with pytest.raises(DmlSyntaxError, match="only the s-side"):
        _strip_qual("t.c + s.x", "s", "t", "ctx")


def test_by_source_condition_with_alias_literal(spark, pair):
    """End-to-end: a by-source condition containing a literal that LOOKS
    like a source qualifier ('s.x') must parse and run, not be refused."""
    sql_root, py_root = pair
    src = spark.createDataFrame(
        [(2, 20, "live"), (99, 1, "new")],
        "id long, score long, status string")
    src.createOrReplaceTempView("bysrc_lit")
    execute_dml(
        spark,
        "MERGE INTO tbl t USING bysrc_lit s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND t.status != 's.x' THEN "
        "UPDATE SET status = 's.x'",
        {"tbl": sql_root},
    )
    snap.merge_into(
        spark, py_root, src, ["id"],
        matched_clauses=[{"action": "update", "condition": None,
                          "set": None}],
        not_matched_by_source="update",
        not_matched_by_source_condition="status != 's.x'",
        not_matched_by_source_set={"status": "'s.x'"},
    )
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    got = {t[0]: t for t in _rows(spark, sql_root)}
    assert got[2] == (2, 20, "live") and got[99] == (99, 1, "new")
    assert got[3] == (3, 30, "s.x")


def test_inner_queries_bind_snapshot_tables(spark, pair, tmp_path):
    """Composability: INSERT INTO ... SELECT, MERGE USING (subquery) and
    a bare USING name may all reference REGISTERED SNAPSHOT TABLES
    (time travel included) — the inner query runs through read_sql with
    the statement's own table mapping, not bare spark.sql."""
    sql_root, other_root = pair
    t = {"tbl": sql_root, "other": other_root}
    # other: keep only ids >= 15, at head; v0 keeps all 20
    execute_dml(spark, "DELETE FROM other WHERE id < 15", t)
    # INSERT selecting from ANOTHER snapshot table, with time travel
    execute_dml(
        spark,
        "INSERT INTO tbl SELECT id + 100, score, status "
        "FROM other VERSION AS OF 0 WHERE id < 3", t)
    got = {r[0] for r in _rows(spark, sql_root)}
    assert {100, 101, 102} <= got and len(got) == 23
    # MERGE USING a subquery over a snapshot table
    execute_dml(
        spark,
        "MERGE INTO tbl t USING (SELECT id, score * 2 AS score, "
        "'merged' AS status FROM other) s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *", t)
    rows = {r[0]: r for r in _rows(spark, sql_root)}
    assert rows[15] == (15, 300, "merged")
    # MERGE USING a bare snapshot-table name (head read)
    execute_dml(
        spark,
        "MERGE INTO tbl t USING other s ON t.id = s.id "
        "WHEN MATCHED THEN DELETE", t)
    assert all(not (15 <= k < 20) for k in
               {r[0] for r in _rows(spark, sql_root)})


def test_ctas_from_snapshot_table(spark, tmp_path):
    """CREATE TABLE ... AS SELECT may read registered snapshot tables."""
    from unfccc_documents_database_sandbox_spark.sources.sql_ddl import (
        execute_ddl,
    )

    src_root = str(tmp_path / "csrc")
    dst_root = str(tmp_path / "cdst")
    t = {"src": src_root, "dst": dst_root}
    snap.create(spark, src_root,
                spark.createDataFrame([(i, i * 2) for i in range(10)],
                                      "id long, v long"))
    snap.delete_where(spark, src_root, "id >= 5")
    execute_ddl(
        spark,
        "CREATE TABLE dst AS SELECT id, v FROM src VERSION AS OF 0 "
        "WHERE id % 2 = 0", t)
    assert _rows(spark, dst_root) == [(0, 0), (2, 4), (4, 8), (6, 12),
                                      (8, 16)]


def test_insert_overwrite_sql_grammar(spark, tmp_path):
    """INSERT OVERWRITE / REPLACE WHERE statement forms: predicate
    parsing stops at the top-level query keyword, subqueries inside the
    predicate pass through, and the malformed spellings refuse."""
    root = str(tmp_path / "iog")
    t = {"t": root}
    snap.create(spark, root,
                spark.createDataFrame([(i, i % 2) for i in range(10)],
                                      "id long, grp long"))
    # predicate containing a parenthesized subquery parses intact
    execute_dml(
        spark,
        "INSERT INTO t REPLACE WHERE grp IN (SELECT 1) "
        "VALUES (100, 1), (101, 1)", t)
    got = sorted(tuple(r) for r in snap.read(spark, root).collect())
    assert got == [(0, 0), (2, 0), (4, 0), (6, 0), (8, 0),
                   (100, 1), (101, 1)]
    # OVERWRITE with a column list maps positionally
    execute_dml(spark, "INSERT OVERWRITE t (grp, id) VALUES (7, 1)", t)
    assert [tuple(r) for r in snap.read(spark, root).collect()] == [(1, 7)]
    with pytest.raises(DmlSyntaxError, match="REPLACE WHERE belongs"):
        execute_dml(spark,
                    "INSERT OVERWRITE t REPLACE WHERE grp = 1 "
                    "VALUES (1, 1)", t)
    with pytest.raises(DmlSyntaxError, match="needs a predicate"):
        execute_dml(spark, "INSERT INTO t REPLACE WHERE VALUES (1, 1)", t)


# --- IN-subquery predicates (r15): DELETE/UPDATE lower onto MERGE ---


def test_delete_in_subquery_matches_python_twin(spark, pair):
    sql_root, py_root = pair
    v = execute_dml(
        spark,
        """DELETE FROM tbl
           WHERE id IN (SELECT id FROM tbl WHERE score >= 100)
             AND status = 'live'""",
        {"tbl": sql_root},
    )
    snap.delete_where(spark, py_root, "score >= 100 AND status = 'live'")
    assert v == 1
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    assert all(t[1] < 100 for t in _rows(spark, sql_root))


def test_update_in_subquery_cow_and_mor_agree(spark, pair):
    sql_root, py_root = pair
    stmt = """UPDATE tbl SET score = score + 1000, status = 'hot'
              WHERE id IN (SELECT id FROM tbl WHERE score % 30 = 0)"""
    execute_dml(spark, stmt, {"tbl": sql_root})
    execute_dml(spark, stmt, {"tbl": py_root}, mode="mor")
    assert _rows(spark, sql_root) == _rows(spark, py_root)
    assert any(t[2] == "hot" for t in _rows(spark, sql_root))


def test_delete_in_subquery_against_other_table(spark, pair, tmp_path):
    """The subquery may reference a DIFFERENT snapshot table."""
    sql_root, _ = pair
    other = str(tmp_path / "other")
    snap.create(
        spark, other,
        spark.createDataFrame([(3,), (7,), (99,)], "id long"),
    )
    execute_dml(
        spark,
        "DELETE FROM tbl WHERE id IN (SELECT id FROM victims)",
        {"tbl": sql_root, "victims": other},
    )
    kept = {t[0] for t in _rows(spark, sql_root)}
    assert kept == set(range(20)) - {3, 7}  # 99 matches nothing


def test_in_subquery_null_keys_never_match(spark, tmp_path):
    root = str(tmp_path / "t")
    snap.create(
        spark, root,
        spark.createDataFrame(
            [(None, "a"), (1, "b"), (2, "c")], "id long, tag string"
        ),
    )
    execute_dml(
        spark,
        "DELETE FROM tbl WHERE id IN (SELECT id FROM tbl WHERE tag = 'b')",
        {"tbl": root},
    )
    # the NULL-id row survives (IN with a NULL key is never TRUE)
    tags = sorted(r["tag"] for r in snap.read(spark, root).collect())
    assert tags == ["a", "c"]


def test_in_subquery_refusals(spark, pair):
    sql_root, _ = pair
    with pytest.raises(DmlSyntaxError, match="at most one"):
        execute_dml(
            spark,
            """DELETE FROM tbl
               WHERE id IN (SELECT id FROM tbl)
                 AND score IN (SELECT score FROM tbl)""",
            {"tbl": sql_root},
        )
    with pytest.raises(DmlSyntaxError, match="exactly one column"):
        execute_dml(
            spark,
            "DELETE FROM tbl WHERE id IN (SELECT id, score FROM tbl)",
            {"tbl": sql_root},
        )


def test_plain_in_list_still_routes_to_delete_where(spark, pair):
    """A literal IN list is NOT a subquery — the plain path handles it."""
    sql_root, _ = pair
    execute_dml(spark, "DELETE FROM tbl WHERE id IN (1, 2, 3)",
                {"tbl": sql_root})
    assert {t[0] for t in _rows(spark, sql_root)} == set(range(20)) - {1, 2, 3}


def test_in_subquery_top_level_between_refused(spark, pair):
    """A bare BETWEEN's own AND would corrupt the conjunct split —
    refused with the parenthesize hint; the parenthesized form works."""
    sql_root, _ = pair
    with pytest.raises(DmlSyntaxError, match="BETWEEN"):
        execute_dml(
            spark,
            """DELETE FROM tbl WHERE score BETWEEN 0 AND 50
               AND id IN (SELECT id FROM tbl)""",
            {"tbl": sql_root},
        )
    execute_dml(
        spark,
        """DELETE FROM tbl WHERE (score BETWEEN 0 AND 50)
           AND id IN (SELECT id FROM tbl)""",
        {"tbl": sql_root},
    )
    assert all(t[1] > 50 for t in _rows(spark, sql_root))


def test_unclaimed_subquery_shapes_refused_with_typed_error(spark, pair):
    """r16 (ADVICE r15): subquery shapes the lowering does NOT support
    must refuse with a DmlSyntaxError NAMING the shape — previously
    they fell through to delete_where/update_where and died inside
    F.expr with an opaque AnalysisException."""
    sql_root, _ = pair
    with pytest.raises(DmlSyntaxError, match="NOT IN"):
        execute_dml(
            spark,
            "DELETE FROM tbl WHERE id NOT IN (SELECT id FROM tbl "
            "WHERE score >= 100)",
            {"tbl": sql_root},
        )
    with pytest.raises(DmlSyntaxError, match="OR-combined"):
        execute_dml(
            spark,
            "DELETE FROM tbl WHERE status = 'dead' OR id IN "
            "(SELECT id FROM tbl WHERE score >= 100)",
            {"tbl": sql_root},
        )
    with pytest.raises(DmlSyntaxError, match="non-bare-column"):
        execute_dml(
            spark,
            "DELETE FROM tbl WHERE abs(id) IN (SELECT id FROM tbl)",
            {"tbl": sql_root},
        )
    with pytest.raises(DmlSyntaxError, match="non-bare-column"):
        execute_dml(
            spark,
            "UPDATE tbl SET score = 0 WHERE id + 1 IN "
            "(SELECT id FROM tbl) AND status = 'live'",
            {"tbl": sql_root},
        )
    # r17 (ADVICE r16): EXISTS and scalar-subquery conjuncts get their
    # own named diagnostics instead of the misleading non-bare-IN label
    with pytest.raises(DmlSyntaxError, match="EXISTS"):
        execute_dml(
            spark,
            "DELETE FROM tbl WHERE EXISTS (SELECT 1 FROM tbl t2 "
            "WHERE t2.score >= 100)",
            {"tbl": sql_root},
        )
    with pytest.raises(DmlSyntaxError, match="scalar-subquery"):
        execute_dml(
            spark,
            "DELETE FROM tbl WHERE score > (SELECT AVG(score) FROM tbl)",
            {"tbl": sql_root},
        )
    # the table is untouched by all six refusals
    assert len(_rows(spark, sql_root)) == 20
