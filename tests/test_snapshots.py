"""Snapshot/commit-log table format invariants (sources/snapshots.py) —
the transactional properties the hash-green table_snapshot_read row can't
express on its own: version immutability under later commits, copy-on-write
file hygiene, optimistic-concurrency conflict, NULL-predicate DELETE
semantics, and pinned-schema reads."""

from __future__ import annotations

import os

import pytest

from unfccc_documents_database_sandbox_spark.sources import snapshots as snap


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"row{i}", "de" if i % 4 == 0 else "en") for i in range(20)],
        "id long, payload string, lang string",
    )
    snap.create(spark, root, df.filter("id < 10"))
    snap.append(spark, root, df.filter("id >= 10"))
    return root


def test_time_travel_is_immutable(spark, table):
    """A reader pinned to v0 sees exactly v0's rows no matter how many
    commits land afterwards — old versions' files are never rewritten."""
    v0_before = sorted(r.id for r in snap.read(spark, table, 0).collect())
    files_before = snap.live_files(table, 0)
    snap.delete_where(spark, table, "lang = 'de'")
    assert snap.latest_version(table) == 2
    assert sorted(r.id for r in snap.read(spark, table, 0).collect()) == v0_before
    assert snap.live_files(table, 0) == files_before
    # the removed payload files still exist on disk (logical removal only)
    for f in files_before:
        assert os.path.exists(os.path.join(table, f))


def test_cow_delete_rewrites_only_hit_files(spark, table):
    """DELETE removes exactly the predicate-TRUE rows; the head read drops
    them while the pre-delete snapshot still has them."""
    n_de = snap.read(spark, table).filter("lang = 'de'").count()
    assert n_de > 0
    v = snap.delete_where(spark, table, "lang = 'de'")
    head = snap.read(spark, table)
    assert head.filter("lang = 'de'").count() == 0
    assert head.count() == 20 - n_de
    assert snap.read(spark, table, v - 1).filter("lang = 'de'").count() == n_de


def test_delete_null_predicate_rows_are_kept(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates NULL are
    NOT deleted (NOT(cond) would silently drop them)."""
    root = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, "de"), (2, None), (3, "en")], "id long, lang string"
    )
    snap.create(spark, root, df)
    snap.delete_where(spark, root, "lang = 'de'")
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [2, 3]


def test_noop_delete_commits_empty(spark, table):
    """A delete matching nothing still advances HEAD (an auditable no-op
    commit) and carries every file forward."""
    before = snap.live_files(table)
    v = snap.delete_where(spark, table, "lang = 'xx'")
    assert snap.live_files(table, v) == before
    assert snap.read(spark, table).count() == 20


def test_concurrent_commit_conflict_raises(spark, table):
    """Two writers racing to the same version: the atomic create-if-absent
    makes exactly one win; the loser must rebase and retry."""
    head = snap.latest_version(table)
    snap._write_commit(table, head + 1, [], [])
    with pytest.raises(FileExistsError):
        snap._write_commit(table, head + 1, [], [])


def test_reads_use_pinned_schema(spark, table):
    """Every read resolves the schema from commit 0 — no inference drift."""
    got = snap.read(spark, table).schema
    assert [f.name for f in got] == ["id", "payload", "lang"]
    assert snap.table_schema(table) == got


def test_log_gap_is_corruption(spark, table):
    """A missing intermediate commit file must fail loudly, not silently
    skip a version during replay."""
    head = snap.latest_version(table)
    snap._write_commit(table, head + 1, [], [])
    os.remove(snap._commit_path(table, head + 1))
    snap._write_commit(table, head + 2, [], [])
    with pytest.raises(ValueError, match="commit log gap"):
        snap.live_files(table)


def test_merge_into_upserts_atomically(spark, table):
    """MERGE: matched keys replaced, unmatched inserted, one commit; only
    files containing matched keys are rewritten (COW), and the pre-merge
    snapshot still reads the old values."""
    src = spark.createDataFrame(
        [(3, "UPDATED", "fr"), (99, "NEW", "fr")],
        "id long, payload string, lang string",
    )
    head_before = snap.latest_version(table)
    v = snap.merge_into(spark, table, src, ["id"])
    assert v == head_before + 1
    head = snap.read(spark, table)
    assert head.count() == 21  # 20 originals + 1 insert
    got = {r.id: (r.payload, r.lang) for r in head.collect()}
    assert got[3] == ("UPDATED", "fr")
    assert got[99] == ("NEW", "fr")
    assert got[7] == ("row7", "en")  # untouched row carried forward
    # pre-merge snapshot unchanged
    old = {r.id: r.payload for r in snap.read(spark, table, v - 1).collect()}
    assert old[3] == "row3" and 99 not in old


def test_merge_into_no_match_is_pure_insert(spark, table):
    src = spark.createDataFrame(
        [(100, "A", "en"), (101, "B", "en")], "id long, payload string, lang string"
    )
    before = snap.live_files(table)
    v = snap.merge_into(spark, table, src, ["id"])
    # nothing removed: pure append commit
    assert set(before) <= set(snap.live_files(table, v))
    assert snap.read(spark, table).count() == 22


def test_compact_preserves_contents_and_shrinks_files(spark, table):
    """OPTIMIZE: same rows, fewer live files, one commit; pinned readers of
    the pre-compaction version still see the old layout."""
    rows_before = sorted(
        (r.id, r.payload, r.lang) for r in snap.read(spark, table).collect()
    )
    files_before = snap.live_files(table)
    v = snap.compact(spark, table, max_files=1)
    files_after = snap.live_files(table, v)
    assert len(files_after) == 1
    assert not set(files_after) & set(files_before)
    rows_after = sorted(
        (r.id, r.payload, r.lang) for r in snap.read(spark, table, v).collect()
    )
    assert rows_after == rows_before
    assert snap.live_files(table, v - 1) == files_before
