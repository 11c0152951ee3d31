"""SQL DDL front-end (sources/sql_ddl.py — VERDICT r13 #4): CREATE
TABLE / ALTER TABLE statements routed to the snapshot format's
metadata-commit writers. Behavioral tests pin the DDL path against the
equivalent Python-API calls on a twin table (byte-equal results prove
the front-end is pure syntax) plus refusal tests for everything outside
the documented grammar."""

from __future__ import annotations

import pytest

from unfccc_documents_database_sandbox_spark.sources import snapshots as snap
from unfccc_documents_database_sandbox_spark.sources.sql_ddl import execute_ddl
from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
    DmlSyntaxError,
    execute_dml,
)


def _rows(spark, root, version=None):
    return sorted(tuple(r) for r in snap.read(spark, root, version).collect())


def test_create_table_matches_python_twin(spark, tmp_path):
    ddl_root = str(tmp_path / "ddl")
    py_root = str(tmp_path / "py")
    v = execute_ddl(
        spark,
        "CREATE TABLE t (id BIGINT, amount DECIMAL(13,4), name STRING)",
        {"t": ddl_root})
    assert v == 0
    df = spark.createDataFrame(
        [], "id bigint, amount decimal(13,4), name string")
    snap.create(spark, py_root, df)
    assert snap.table_schema(ddl_root) == snap.table_schema(py_root)
    assert snap.read(spark, ddl_root).count() == 0
    # first INSERT through the DML front-end lands files normally
    execute_dml(
        spark,
        "INSERT INTO t VALUES (1, 10.5, 'a'), (2, CAST(NULL AS "
        "DECIMAL(13,4)), 'b')",
        {"t": ddl_root})
    got = _rows(spark, ddl_root)
    assert len(got) == 2 and got[0][0] == 1


def test_create_table_partitioned_by_transforms(spark, tmp_path):
    root = str(tmp_path / "ddlp")
    execute_ddl(
        spark,
        """CREATE TABLE t (id BIGINT, ts TIMESTAMP, grp STRING)
           PARTITIONED BY (grp, truncate(100, id))""",
        {"t": root})
    spec = snap._read_state(root)["partition_by"]
    assert [(s["source"], s["transform"], s["param"]) for s in spec] == [
        ("grp", "identity", None), ("id", "truncate", 100)]
    execute_dml(
        spark,
        "INSERT INTO t VALUES (5, TIMESTAMP '2026-01-01 00:00:00', 'a'), "
        "(250, TIMESTAMP '2026-01-02 00:00:00', 'b')",
        {"t": root})
    # generated-partition pruning metadata recorded per file
    parts = snap.partition_values(root)
    assert parts and all("grp" in p for p in parts.values())
    assert snap.read(spark, root).count() == 2


def test_alter_add_column_null_fills_and_time_travels(spark, tmp_path):
    ddl_root = str(tmp_path / "ddla")
    py_root = str(tmp_path / "pya")
    base = spark.createDataFrame([(i, i * 10) for i in range(6)],
                                 "id long, v long")
    for root in (ddl_root, py_root):
        snap.create(spark, root, base.coalesce(1))
    v = execute_ddl(spark, "ALTER TABLE t ADD COLUMN tag STRING",
                    {"t": ddl_root})
    snap.add_column(py_root, "tag", "string")
    assert snap.table_schema(ddl_root) == snap.table_schema(py_root)
    execute_dml(
        spark,
        "INSERT INTO t VALUES (100, 1, 'new')", {"t": ddl_root})
    got = {r.id: r.tag for r in snap.read(spark, ddl_root).collect()}
    assert got[100] == "new" and got[0] is None  # old files null-fill
    # time travel below the DDL keeps the two-column era
    assert [f.name for f in snap.read(spark, ddl_root, v - 1).schema] == [
        "id", "v"]


def test_alter_rename_and_drop_column(spark, tmp_path):
    ddl_root = str(tmp_path / "ddlr")
    py_root = str(tmp_path / "pyr")
    base = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    for root in (ddl_root, py_root):
        snap.create(spark, root, base.coalesce(1))
        snap.enable_column_mapping(root)
    execute_ddl(spark, "ALTER TABLE t RENAME COLUMN b TO bb",
                {"t": ddl_root})
    execute_ddl(spark, "ALTER TABLE t DROP COLUMN c", {"t": ddl_root})
    snap.rename_column(py_root, "b", "bb")
    snap.drop_column(py_root, "c")
    assert snap.table_schema(ddl_root) == snap.table_schema(py_root)
    assert _rows(spark, ddl_root) == _rows(spark, py_root) == [(1, 2)]


def test_alter_column_type_widening_and_constraints(spark, tmp_path):
    root = str(tmp_path / "ddlw")
    snap.create(spark, root,
                spark.createDataFrame([(1, 5)], "id int, v int"))
    execute_ddl(spark, "ALTER TABLE t ALTER COLUMN v TYPE BIGINT",
                {"t": root})
    assert dict(
        (f.name, f.dataType.simpleString())
        for f in snap.table_schema(root)) == {"id": "int", "v": "bigint"}
    execute_ddl(spark, "ALTER TABLE t ADD CONSTRAINT pos CHECK (v >= 0)",
                {"t": root})
    with pytest.raises(ValueError, match="pos"):
        execute_dml(spark, "INSERT INTO t VALUES (2, -1)", {"t": root})
    execute_ddl(spark, "ALTER TABLE t DROP CONSTRAINT pos", {"t": root})
    execute_dml(spark, "INSERT INTO t VALUES (2, -1)", {"t": root})
    assert snap.read(spark, root).count() == 2
    with pytest.raises(ValueError, match="wid"):
        execute_ddl(spark, "ALTER TABLE t ALTER COLUMN v TYPE INT",
                    {"t": root})  # narrowing refuses


def test_ddl_refusals(spark, tmp_path):
    root = str(tmp_path / "ddlref")
    with pytest.raises(DmlSyntaxError, match="unknown snapshot table"):
        execute_ddl(spark, "CREATE TABLE nope (a INT)", {"t": root})
    with pytest.raises(DmlSyntaxError, match="cannot parse type"):
        execute_ddl(spark, "CREATE TABLE t (a NOTATYPE)", {"t": root})
    with pytest.raises(DmlSyntaxError, match="PARTITIONED BY item"):
        execute_ddl(
            spark,
            "CREATE TABLE t (a INT) PARTITIONED BY (years(a))",
            {"t": root})
    execute_ddl(spark, "CREATE TABLE t (a INT)", {"t": root})
    with pytest.raises(DmlSyntaxError, match="unsupported ALTER TABLE"):
        execute_ddl(spark, "ALTER TABLE t SET TBLPROPERTIES (x = 1)",
                    {"t": root})
    with pytest.raises(DmlSyntaxError, match="unsupported DDL"):
        execute_ddl(spark, "TRUNCATE TABLE t", {"t": root})
    with pytest.raises(ValueError, match="already exists"):
        execute_ddl(spark, "ALTER TABLE t ADD COLUMN a INT", {"t": root})


def test_ctas_and_utility_statements(spark, tmp_path):
    """CTAS takes its schema from the query and lands rows in commit 0;
    OPTIMIZE / VACUUM / ANALYZE TABLE route to compact / vacuum /
    analyze_table."""
    root = str(tmp_path / "ctas")
    spark.createDataFrame(
        [(i, i % 4, f"s{i}") for i in range(400)],
        "id long, grp long, s string",
    ).createOrReplaceTempView("ctas_src")
    v = execute_ddl(
        spark,
        "CREATE TABLE t PARTITIONED BY (grp) AS "
        "SELECT id, grp, s FROM ctas_src WHERE id % 2 = 0",
        {"t": root})
    assert v == 0
    assert snap.read(spark, root).count() == 200
    spec = snap._read_state(root)["partition_by"]
    assert [s["source"] for s in spec] == ["grp"]
    # a few commits so OPTIMIZE/VACUUM have work
    for k in range(3):
        execute_dml(spark,
                    f"INSERT INTO t SELECT id + {1000 * (k + 1)}, grp, s "
                    "FROM ctas_src WHERE id % 2 = 1",
                    {"t": root})
    n_files_before = len(snap.live_files(root))
    execute_ddl(spark, "OPTIMIZE t ZORDER BY (id) MAX FILES 2", {"t": root})
    # partitioned layout: the floor is one file per live partition (4)
    assert len(snap.live_files(root)) <= 4 < n_files_before
    assert snap.read(spark, root).count() == 800
    execute_ddl(spark, "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS id",
                {"t": root})
    st = snap.analyzed_stats(root)
    assert st["rows"] == 800 and st["cols"]["id"]["ndv"] == 800
    assert "grp" not in st["cols"]
    execute_ddl(spark, "VACUUM t RETAIN 1 VERSIONS", {"t": root})
    assert snap.read(spark, root).count() == 800  # head untouched
    with pytest.raises(DmlSyntaxError, match="bad ZORDER"):
        execute_ddl(spark, "OPTIMIZE t ZORDER BY (id + 1)", {"t": root})
    # r14 ADVICE: a bare VACUUM must not silently destroy all history —
    # the SQL surface requires an explicit RETAIN clause
    with pytest.raises(DmlSyntaxError, match="RETAIN"):
        execute_ddl(spark, "VACUUM t", {"t": root})


def test_create_or_replace_is_idempotent(spark, tmp_path):
    """CREATE TABLE refuses an existing root; CREATE OR REPLACE
    overwrites it (Delta's CREATE OR REPLACE TABLE) — both forms."""
    root = str(tmp_path / "corp")
    execute_ddl(spark, "CREATE TABLE t (a INT)", {"t": root})
    with pytest.raises(FileExistsError, match="overwrite"):
        execute_ddl(spark, "CREATE TABLE t (a INT)", {"t": root})
    execute_ddl(spark, "CREATE OR REPLACE TABLE t (a INT, b INT)",
                {"t": root})
    assert [f.name for f in snap.table_schema(root)] == ["a", "b"]
    spark.createDataFrame([(1,)], "x int").createOrReplaceTempView("corp_v")
    execute_ddl(spark, "CREATE OR REPLACE TABLE t AS SELECT x FROM corp_v",
                {"t": root})
    assert _rows(spark, root) == [(1,)]


def test_shallow_clone_and_restore_sql(spark, tmp_path):
    """CREATE TABLE ... SHALLOW CLONE forks zero-copy (optionally at a
    pinned version); RESTORE TABLE rolls the log forward to an old
    state — both as SQL statements routed to clone/restore."""
    src_root = str(tmp_path / "src")
    clone_root = str(tmp_path / "cl")
    t = {"src": src_root, "cl": clone_root}
    execute_ddl(spark, "CREATE TABLE src (id BIGINT, v BIGINT)", t)
    execute_dml(spark, "INSERT INTO src VALUES (1, 10), (2, 20), (3, 30)",
                t)  # v1
    execute_dml(spark, "DELETE FROM src WHERE id = 2", t)  # v2
    # clone pinned at v1: sees all three rows, independent of src's v2
    execute_ddl(spark, "CREATE TABLE cl SHALLOW CLONE src VERSION AS OF 1",
                t)
    assert _rows(spark, clone_root) == [(1, 10), (2, 20), (3, 30)]
    assert _rows(spark, src_root) == [(1, 10), (3, 30)]
    # writes to the clone never touch the source
    execute_dml(spark, "DELETE FROM cl WHERE id = 3", t)
    assert _rows(spark, clone_root) == [(1, 10), (2, 20)]
    assert _rows(spark, src_root) == [(1, 10), (3, 30)]
    # restore the source to v1: forward commit, old state
    v = execute_ddl(spark, "RESTORE TABLE src TO VERSION AS OF 1", t)
    assert v == 3
    assert _rows(spark, src_root) == [(1, 10), (2, 20), (3, 30)]
    # and time travel still sees the deleted era
    assert _rows(spark, src_root, 2) == [(1, 10), (3, 30)]
    with pytest.raises(DmlSyntaxError, match="unsupported DDL"):
        execute_ddl(spark, "RESTORE TABLE src", t)
