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


def test_append_schema_mismatch_raises(spark, table):
    """append must fail loudly on a mismatched schema instead of writing
    parquet a pinned-schema read would silently truncate (r07 ADVICE #3)."""
    extra = spark.createDataFrame(
        [(1, "x", "en", 9.9)], "id long, payload string, lang string, score double"
    )
    with pytest.raises(ValueError, match="extra=\\['score'\\]"):
        snap.append(spark, table, extra)
    missing = spark.createDataFrame([(1, "x")], "id long, payload string")
    with pytest.raises(ValueError, match="missing=\\['lang'\\]"):
        snap.append(spark, table, missing)
    retyped = spark.createDataFrame(
        [(1, "x", "en")], "id int, payload string, lang string"
    )
    with pytest.raises(ValueError, match="retyped=\\['id'\\]"):
        snap.append(spark, table, retyped)
    # column ORDER is not significant: same cols reordered appends fine
    ok = spark.createDataFrame(
        [("en", 50, "row50")], "lang string, id long, payload string"
    )
    v = snap.append(spark, table, ok)
    got = snap.read(spark, table, v).filter("id = 50").collect()
    assert [(r.id, r.payload, r.lang) for r in got] == [(50, "row50", "en")]


def test_evolve_schema_null_fills_history(spark, table):
    """Additive evolution: old files null-fill the new column at scan time,
    the new rows carry values, and time travel below the evolution commit
    keeps the OLD schema (era-accurate table_schema)."""
    widened = spark.createDataFrame(
        [(200, "w", "en", 0.5)],
        "id long, payload string, lang string, score double",
    )
    head_before = snap.latest_version(table)
    v = snap.evolve_schema(spark, table, widened)
    assert v == head_before + 1
    head = snap.read(spark, table)
    assert [f.name for f in head.schema] == ["id", "payload", "lang", "score"]
    rows = {r.id: r.score for r in head.collect()}
    assert rows[200] == 0.5
    assert all(rows[i] is None for i in range(20))  # history null-filled
    # pre-evolution time travel: old schema, old rows
    old = snap.read(spark, table, head_before)
    assert [f.name for f in old.schema] == ["id", "payload", "lang"]
    assert old.count() == 20
    # drops/retypes rejected
    with pytest.raises(ValueError, match="additive-only"):
        snap.evolve_schema(spark, table, spark.createDataFrame(
            [(1, "x")], "id long, payload string"
        ))
    # post-evolution appends enforce the NEW schema
    with pytest.raises(ValueError, match="missing=\\['score'\\]"):
        snap.append(spark, table, spark.createDataFrame(
            [(1, "x", "en")], "id long, payload string, lang string"
        ))


def test_widen_column_type_is_metadata_only_and_exact(spark, tmp_path):
    """VERDICT r10 #3 (Delta type widening): retyping int→long,
    float→double, decimal(5,2)→decimal(10,4) is ONE metadata commit each
    — zero files rewritten; the head scan reads the narrow-era files
    under the wide schema bit-exactly via Spark 4's parquet type
    promotions, post-widening appends carry values the narrow types
    could not, and time travel keeps the narrow era."""
    from decimal import Decimal

    from pyspark.sql.types import (
        DecimalType, DoubleType, LongType, IntegerType,
    )

    root = str(tmp_path / "widen")
    df = spark.createDataFrame(
        [(i, float(i) + 0.5, Decimal(f"{i}.25")) for i in range(4)],
        "id int, x float, m decimal(5,2)",
    )
    snap.create(spark, root, df)
    files_v0 = set(snap.live_files(root))
    snap.widen_column_type(root, "id", "long")
    snap.widen_column_type(root, "x", DoubleType())
    v = snap.widen_column_type(root, "m", "decimal(10,4)")
    assert set(snap.live_files(root)) == files_v0  # nothing rewritten
    sch = snap.table_schema(root)
    assert isinstance(sch["id"].dataType, LongType)
    assert isinstance(sch["x"].dataType, DoubleType)
    assert sch["m"].dataType == DecimalType(10, 4)
    got = {r.id: (r.x, r.m) for r in snap.read(spark, root).collect()}
    assert got[3] == (3.5, Decimal("3.2500"))  # old files, widened, exact
    # the wide type now admits values the narrow era could not hold
    snap.append(spark, root, spark.createDataFrame(
        [(2**40, 1e300, Decimal("123456.0625"))],
        "id long, x double, m decimal(10,4)"))
    assert snap.read(spark, root).filter(f"id = {2**40}").count() == 1
    # time travel below the widening keeps the narrow era
    old = snap.read(spark, root, v - 3)
    assert isinstance(old.schema["id"].dataType, IntegerType)
    assert old.count() == 4
    # a narrow-era writer must now fail loudly, not silently narrow
    with pytest.raises(ValueError, match="retyped"):
        snap.append(spark, root, spark.createDataFrame(
            [(5, 1.5, Decimal("1.25"))], "id int, x float, m decimal(5,2)"))


def test_widen_column_type_refuses_narrowing_and_lossy(spark, tmp_path):
    """The reverse direction genuinely requires a rewrite, so every lossy
    retype refuses: long→int, double→float, decimal scale shrink,
    decimal integer-digit shrink, and cross-kind retypes."""
    from decimal import Decimal

    root = str(tmp_path / "narrow")
    df = spark.createDataFrame(
        [(1, 2.0, Decimal("1.2500"), "s")],
        "id long, x double, m decimal(10,4), t string",
    )
    snap.create(spark, root, df)
    for col, bad in [("id", "int"), ("x", "float"), ("m", "decimal(10,2)"),
                     ("m", "decimal(8,4)"), ("t", "long"), ("id", "string"),
                     ("id", "double"), ("m", "decimal(10,4)")]:
        with pytest.raises(ValueError, match="not a lossless widening"):
            snap.widen_column_type(root, col, bad)
    with pytest.raises(ValueError, match="no such column"):
        snap.widen_column_type(root, "nope", "long")
    # widening is a METADATA commit: it conflicts with every concurrent
    # writer in the conflict matrix, like any schema change
    c = snap._load_commit(
        root, snap.widen_column_type(root, "m", "decimal(12,4)"))
    assert "schema" in c and not c.get("add") and not c.get("remove")


def test_merge_duplicate_source_keys_raise(spark, table):
    """Delta-MERGE semantics: multiple source rows matching one target key
    is an error, not a silent duplicate insert (r07 ADVICE #4)."""
    dup = spark.createDataFrame(
        [(3, "A", "en"), (3, "B", "en")], "id long, payload string, lang string"
    )
    head = snap.latest_version(table)
    with pytest.raises(ValueError, match="duplicate keys"):
        snap.merge_into(spark, table, dup, ["id"])
    assert snap.latest_version(table) == head  # nothing committed


def test_merge_sync_deletes_unmatched_and_feed_is_o_diff(spark, table):
    """VERDICT r10 #2: WHEN NOT MATCHED BY SOURCE THEN DELETE — a
    full-source merge makes the table EQUAL the source (like an
    overwrite) in ONE commit, while the typed change feed carries only
    the actual diff: unchanged matched rows cancel in the add/remove
    exceptAll, so they emit NO change rows."""
    # source = new truth: id 3 updated, id 99 new, ids 0..9 except 3
    # unchanged, ids 10..19 ABSENT (to be synced out)
    src = spark.createDataFrame(
        [(i, f"row{i}", "de" if i % 4 == 0 else "en") for i in range(10)
         if i != 3]
        + [(3, "UPDATED", "fr"), (99, "NEW", "fr")],
        "id long, payload string, lang string",
    )
    v = snap.merge_into(spark, table, src, ["id"],
                        not_matched_by_source="delete")
    got = {r.id: (r.payload, r.lang) for r in snap.read(spark, table).collect()}
    want = {r.id: (r.payload, r.lang) for r in src.collect()}
    assert got == want  # result == overwrite-with-source
    feed = snap.changes(spark, table, v - 1, v, classify_updates=True)
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r._change_type, []).append(r.id)
    assert sorted(by_type.pop("delete")) == list(range(10, 20))
    assert by_type.pop("insert") == [99]
    assert by_type.pop("update_preimage") == [3]
    assert by_type.pop("update_postimage") == [3]
    assert not by_type  # ids 0..9 (minus 3) emitted NOTHING: O(diff)
    # pre-merge snapshot untouched
    assert snap.read(spark, table, v - 1).count() == 20


def test_merge_sync_condition_null_keeps_row(spark, tmp_path):
    """whenNotMatchedBySource(condition): only unmatched rows where the
    predicate is TRUE are deleted — FALSE **or NULL** keeps the row, and
    only files holding a matched or deletable row are rewritten."""
    root = str(tmp_path / "msc")
    df = spark.createDataFrame(
        [(1, 5, "keep-false"), (2, None, "keep-null"), (3, 50, "del-true"),
         (4, 7, "matched")],
        "id long, score long, note string",
    )
    snap.create(spark, root, df)
    src = spark.createDataFrame([(4, 7, "matched-upd")],
                                "id long, score long, note string")
    snap.merge_into(spark, root, src, ["id"],
                    not_matched_by_source="delete",
                    not_matched_by_source_condition="score > 10")
    got = {r.id: r.note for r in snap.read(spark, root).collect()}
    assert got == {1: "keep-false", 2: "keep-null", 4: "matched-upd"}
    with pytest.raises(ValueError, match="requires"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source_condition="score > 10")
    with pytest.raises(ValueError, match="must be None"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source="upsert")


def test_merge_mark_stale_updates_unmatched_rows(spark, tmp_path):
    """VERDICT r11 #2: WHEN NOT MATCHED BY SOURCE THEN UPDATE SET — the
    mark-stale sync. Unmatched target rows get the SET applied (gated by
    the condition: TRUE updates, FALSE or NULL keeps), matched rows are
    replaced by source, and the result equals the two-statement
    UPDATE-then-MERGE. All SET expressions see the PRE-update row
    simultaneously."""
    root = str(tmp_path / "mstale")
    df = spark.createDataFrame(
        [(1, 10, "live", 0), (2, None, "live", 0), (3, 30, "live", 0),
         (4, 40, "live", 0)],
        "id long, score long, status string, gen long",
    )
    snap.create(spark, root, df)
    src = spark.createDataFrame([(4, 44, "live", 1)],
                                "id long, score long, status string, gen long")
    v = snap.merge_into(
        spark, root, src, ["id"],
        not_matched_by_source="update",
        not_matched_by_source_condition="score > 5",
        # simultaneous-SET: `gen` references `score`, which is itself
        # being SET — it must see the OLD score, not -1
        not_matched_by_source_set={"status": "'stale'",
                                   "score": "-1",
                                   "gen": "score + 100"},
    )
    got = {r.id: (r.score, r.status, r.gen)
           for r in snap.read(spark, root).collect()}
    assert got == {
        1: (-1, "stale", 110),   # condition TRUE -> updated, gen saw old 10
        2: (None, "live", 0),    # condition NULL -> untouched
        3: (-1, "stale", 130),   # condition TRUE -> updated
        4: (44, "live", 1),      # matched -> replaced by source
    }
    # pre-merge snapshot untouched
    assert {r.status for r in snap.read(spark, root, v - 1).collect()} == \
        {"live"}


def test_merge_mark_stale_feed_and_row_ids(spark, tmp_path):
    """Clause composition: by-source updates keep the target row's stable
    id, and the typed change feed classifies them as
    update_preimage/update_postimage (old/new copies share the commit's
    merge keys); untouched unmatched rows in rewritten files cancel and
    emit nothing."""
    root = str(tmp_path / "mstalerid")
    df = spark.createDataFrame(
        [(i, "live") for i in range(5)], "id long, status string")
    snap.create(spark, root, df.coalesce(1), row_tracking=True)
    rid0 = {r.id: r._row_id
            for r in snap.read_with_row_ids(spark, root).collect()}
    src = spark.createDataFrame([(0, "live-upd"), (9, "new")],
                                "id long, status string")
    v = snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source="update",
                        not_matched_by_source_condition="id >= 3",
                        not_matched_by_source_set={"status": "'stale'"})
    rows = {r.id: r for r in snap.read_with_row_ids(spark, root).collect()}
    assert {i: rows[i].status for i in sorted(rows)} == {
        0: "live-upd", 1: "live", 2: "live", 3: "stale", 4: "stale",
        9: "new"}
    # ids preserved for matched-update AND by-source-update rows
    for i in (0, 1, 2, 3, 4):
        assert rows[i]._row_id == rid0[i], f"row {i} renumbered"
    assert rows[9]._row_id not in set(rid0.values())
    feed = snap.changes(spark, root, v - 1, v, classify_updates=True)
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r._change_type, []).append(r.id)
    assert by_type.pop("insert") == [9]
    assert sorted(by_type.pop("update_preimage")) == [0, 3, 4]
    assert sorted(by_type.pop("update_postimage")) == [0, 3, 4]
    assert not by_type  # ids 1, 2 carried verbatim: zero feed rows


def test_merge_mark_stale_refusals_and_constraints(spark, tmp_path):
    """The UPDATE form's guard rails: SET requires the 'update' clause,
    'update' requires a SET, merge keys and unknown columns cannot be
    SET, and a SET that violates a table constraint aborts the commit."""
    root = str(tmp_path / "mstaleref")
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    snap.create(spark, root, df,
                check_constraints={"v_nonneg": "v >= 0 OR v = -1"})
    src = spark.createDataFrame([(1, 11)], "id long, v long")
    head = snap.latest_version(root)
    with pytest.raises(ValueError, match="requires.*_set"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source="update")
    with pytest.raises(ValueError, match="not_matched_by_source='update'"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source_set={"v": "-1"})
    with pytest.raises(ValueError, match="merge key"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source="update",
                        not_matched_by_source_set={"id": "id + 1000"})
    with pytest.raises(ValueError, match="unknown columns"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source="update",
                        not_matched_by_source_set={"nope": "1"})
    with pytest.raises(ValueError, match="v_nonneg"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source="update",
                        not_matched_by_source_set={"v": "-99"})
    assert snap.latest_version(root) == head  # nothing committed


def test_merge_sync_preserves_row_ids_and_composes_with_evolve(
        spark, tmp_path):
    """Clause interaction: one commit can update (keeping the target's
    stable row id), insert (minting a fresh id), sync-delete (the id
    vanishes), AND evolve the schema additively."""
    root = str(tmp_path / "msr")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(6)], "id long, v long")
    snap.create(spark, root, df, row_tracking=True)
    rid0 = {r.id: r._row_id
            for r in snap.read_with_row_ids(spark, root).collect()}
    src = spark.createDataFrame(
        [(0, 999, "a"), (1, 10, "b"), (100, 1, "c")],
        "id long, v long, extra string")
    snap.merge_into(spark, root, src, ["id"], evolve=True,
                    not_matched_by_source="delete")
    rows = {r.id: r for r in
            snap.read_with_row_ids(spark, root).collect()}
    assert sorted(rows) == [0, 1, 100]
    assert rows[0]._row_id == rid0[0] and rows[1]._row_id == rid0[1]
    assert rows[100]._row_id not in set(rid0.values())
    assert rows[0].extra == "a" and rows[0].v == 999
    # ids 2..5 synced out; the schema gained `extra` in the same commit
    assert [f.name for f in snap.table_schema(root)] == ["id", "v", "extra"]


def test_merge_sync_conflict_classification(spark, monkeypatch, tmp_path):
    """Conflict matrix: a sync merge is a REWRITE of every file holding a
    matched or deletable row — racing it against a delete of the same
    file raises ConcurrentWriteConflict (same-file rule), retries or
    not."""
    root = str(tmp_path / "msx")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "id long, v long")
    snap.create(spark, root, df.coalesce(1))  # one file: guaranteed overlap
    src = spark.createDataFrame([(1, 111)], "id long, v long")
    fired = _race(monkeypatch, "merge",
                  lambda: snap.delete_where(spark, root, "id = 7"))
    with pytest.raises(snap.ConcurrentWriteConflict, match="same files"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source="delete", max_retries=3)
    assert fired["done"]
    # the winner's delete stands; the loser published nothing
    assert sorted(r.id for r in snap.read(spark, root).collect()) == \
        list(range(7))


def test_racing_writers_never_mix_part_files(spark, table):
    """Per-writer payload dirs (r07 ADVICE #1): a writer that wrote parquet
    but crashed before committing leaves an orphan dir that (a) is invisible
    to every read, (b) never wedges a later writer's commit, and (c) is
    reclaimed by vacuum."""
    # simulate the crashed writer: payload written, no commit
    orphan_dir = snap._new_payload_dir(table)
    spark.createDataFrame(
        [(999, "GHOST", "xx")], "id long, payload string, lang string"
    ).write.parquet(orphan_dir)
    orphan_files = snap._dir_files(table, orphan_dir)
    assert orphan_files
    # a healthy writer commits the same version the crashed one wanted
    v = snap.append(spark, table, spark.createDataFrame(
        [(21, "row21", "en")], "id long, payload string, lang string"
    ))
    live = set(snap.live_files(table, v))
    assert not live & set(orphan_files)  # phantom rows can't leak in
    assert snap.read(spark, table).filter("id = 999").count() == 0
    deleted = snap.vacuum(table, retain_versions=100)  # retain all versions
    assert set(orphan_files) <= set(deleted)
    assert snap.read(spark, table).count() == 21


def test_vacuum_reclaims_unreferenced_files(spark, table):
    """VACUUM deletes files referenced by no retained version; HEAD reads
    survive, time travel to reclaimed versions fails at scan."""
    snap.delete_where(spark, table, "lang = 'de'")
    snap.compact(spark, table, max_files=1)
    head = snap.latest_version(table)
    head_rows = sorted(r.id for r in snap.read(spark, table).collect())
    pre_compact_files = snap.live_files(table, head - 1)
    deleted = snap.vacuum(table, retain_versions=1)
    assert set(pre_compact_files) <= set(deleted)  # old layout reclaimed
    for f in deleted:
        assert not os.path.exists(os.path.join(table, f))
    assert sorted(r.id for r in snap.read(spark, table).collect()) == head_rows
    with pytest.raises(Exception):  # noqa: B017 — scan on reclaimed files
        snap.read(spark, table, 0).collect()
    # log retained for audit
    assert snap.latest_version(table) == head


def test_unicode_table_root_roundtrip(spark, tmp_path):
    """input_file_name returns a percent-encoded URI; delete/merge must
    unquote it or roots with spaces / non-ASCII KeyError (r07 ADVICE #2)."""
    root = str(tmp_path / "täble dir" / "tbl")
    df = spark.createDataFrame(
        [(1, "a", "de"), (2, "b", "en")], "id long, payload string, lang string"
    )
    snap.create(spark, root, df)
    snap.delete_where(spark, root, "lang = 'de'")
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [2]
    src = spark.createDataFrame(
        [(2, "B2", "en"), (3, "c", "fr")], "id long, payload string, lang string"
    )
    snap.merge_into(spark, root, src, ["id"])
    got = {r.id: r.payload for r in snap.read(spark, root).collect()}
    assert got == {2: "B2", 3: "c"}


def test_txn_stamped_merge_is_idempotent(spark, table):
    """The foreachBatch exactly-once pattern: a MERGE stamped with a
    Delta-style txn {app, id} is visible in applied_txns(), so a restarted
    writer re-delivering the same batch skips it instead of double-applying."""
    src = spark.createDataFrame(
        [(3, "TXN", "fr")], "id long, payload string, lang string"
    )
    app = "test_app"
    assert snap.applied_txns(table, app) == set()
    snap.merge_into(spark, table, src, ["id"], txn={"app": app, "id": 0})
    assert snap.applied_txns(table, app) == {0}
    # the writer's re-delivery guard: batch 0 seen -> skip; batch 1 applies
    if 0 not in snap.applied_txns(table, app):
        snap.merge_into(spark, table, src, ["id"], txn={"app": app, "id": 0})
    head = snap.latest_version(table)
    snap.merge_into(spark, table, src, ["id"], txn={"app": app, "id": 1})
    assert snap.applied_txns(table, app) == {0, 1}
    assert snap.latest_version(table) == head + 1
    # another app's txns are invisible to this one
    assert snap.applied_txns(table, "other_app") == set()


def test_stats_pruning_skips_files_and_preserves_answers(spark, tmp_path):
    """Data skipping: on a range-clustered table the pruned file list is a
    strict subset of the live set, and read_pruned == read().filter() —
    including after appends and a COW delete rewrite the stats for."""
    root = str(tmp_path / "stats")
    df = spark.createDataFrame(
        [(i, f"p{i}", i % 7) for i in range(200)], "id long, payload string, grp long"
    )
    snap.create(spark, root, df.repartitionByRange(8, "id"))
    assert len(snap.live_files(root)) == 8
    pf = snap.pruned_files(root, {"id": (50, 74)})
    assert 0 < len(pf) < 8  # real skipping, not all-files
    got = sorted(r.id for r in snap.read_pruned(spark, root, {"id": (50, 74)}).collect())
    assert got == list(range(50, 75))
    # append outside the range adds files that prune away again
    snap.append(spark, root, spark.createDataFrame(
        [(1000, "x", 0)], "id long, payload string, grp long"
    ))
    assert len(snap.pruned_files(root, {"id": (50, 74)})) == len(pf)
    # COW delete rewrites hit files; rewritten files carry fresh stats
    snap.delete_where(spark, root, "id = 60")
    got = sorted(r.id for r in snap.read_pruned(spark, root, {"id": (50, 74)}).collect())
    assert got == [i for i in range(50, 75) if i != 60]
    # open-ended bounds
    hi = sorted(r.id for r in snap.read_pruned(spark, root, {"id": (900, None)}).collect())
    assert hi == [1000]


def test_stats_prune_adversarial_layouts_never_wrong(spark, tmp_path):
    """Pruning must degrade to scanning, never to wrong answers: interleaved
    (non-clustered) files prune nothing but still answer exactly; all-NULL
    stats columns prune the file for range predicates (NULL never matches);
    string-range pruning works on lexicographic bounds."""
    root = str(tmp_path / "adv")
    # two interleaved files: both span [0, 99] -> no file prunable
    a = spark.createDataFrame([(i, "a") for i in range(0, 100, 2)], "id long, s string")
    b = spark.createDataFrame([(i, "b") for i in range(1, 100, 2)], "id long, s string")
    snap.create(spark, root, a.coalesce(1))
    snap.append(spark, root, b.coalesce(1))
    assert len(snap.pruned_files(root, {"id": (10, 19)})) == len(snap.live_files(root))
    got = sorted(r.id for r in snap.read_pruned(spark, root, {"id": (10, 19)}).collect())
    assert got == list(range(10, 20))
    # all-NULL column: file is pruned for any range on it
    root2 = str(tmp_path / "nulls")
    snap.create(spark, root2, spark.createDataFrame(
        [(None, "x"), (None, "y")], "id long, s string"
    ))
    assert snap.pruned_files(root2, {"id": (0, 10)}) == []
    assert snap.read_pruned(spark, root2, {"id": (0, 10)}).count() == 0
    # string bounds
    assert snap.read_pruned(spark, root2, {"s": ("x", "x")}).count() == 1


def test_checkpoint_replay_is_equivalent_and_survives_expiry(spark, table):
    """Delta's _last_checkpoint pattern: a checkpoint consolidates live set,
    schema, stats, and txn stamps; replay from it equals full replay, and
    after expire_log drops the old commit JSON, HEAD reads still work while
    time travel below the checkpoint fails loudly."""
    snap.merge_into(
        spark, table,
        spark.createDataFrame([(3, "CK", "fr")], "id long, payload string, lang string"),
        ["id"], txn={"app": "ckapp", "id": 7},
    )
    snap.delete_where(spark, table, "lang = 'de'")
    head = snap.latest_version(table)
    want_live = snap.live_files(table)
    want_schema = snap.table_schema(table)
    want_stats = snap.file_stats(table)
    want_rows = sorted((r.id, r.payload) for r in snap.read(spark, table).collect())

    ck = snap.checkpoint(table)
    assert ck == head
    # post-checkpoint commits replay on top of it
    v = snap.append(spark, table, spark.createDataFrame(
        [(500, "post", "en")], "id long, payload string, lang string"
    ))
    assert snap.latest_version(table) == v
    # state at the checkpointed version: identical through the checkpoint
    assert snap.live_files(table, head) == want_live
    assert snap.table_schema(table, head) == want_schema
    assert snap.file_stats(table, head) == want_stats
    assert snap.applied_txns(table, "ckapp") == {7}

    deleted = snap.expire_log(table)
    assert deleted == [f"{i:08d}.json" for i in range(head + 1)]
    # HEAD and checkpoint-version reads still resolve
    assert snap.read(spark, table).filter("id = 500").count() == 1
    assert sorted(
        (r.id, r.payload) for r in snap.read(spark, table, head).collect()
    ) == want_rows
    assert snap.applied_txns(table, "ckapp") == {7}  # txns survive expiry
    # pre-checkpoint time travel is gone, loudly
    with pytest.raises(ValueError, match="predates the oldest checkpoint"):
        snap.live_files(table, head - 1)


def test_gap_detection_survives_checkpointing(spark, table):
    """A missing commit file BETWEEN the checkpoint and the requested
    version is still protocol corruption, not a silent skip."""
    snap.checkpoint(table)
    head = snap.latest_version(table)
    snap._write_commit(table, head + 1, [], [])
    snap._write_commit(table, head + 2, [], [])
    os.remove(snap._commit_path(table, head + 1))
    with pytest.raises(ValueError, match="commit log gap"):
        snap.live_files(table)


def test_zorder_compaction_makes_stats_selective_on_both_dims(spark, tmp_path):
    """OPTIMIZE ZORDER: after z-ordered compaction, per-file stats prune on
    BOTH listed columns; the x-only clustered layout prunes nothing for a
    pure-y range. Contents stay identical."""
    root = str(tmp_path / "z")
    rows = [(x, y, x * 100 + y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long, v long")
    snap.create(spark, root, df.repartitionByRange(4, "x"))
    n_before = len(snap.live_files(root))
    # x-clustered: a pure-y range cannot skip any file
    assert len(snap.pruned_files(root, {"y": (0, 3)})) == n_before
    v = snap.compact(spark, root, max_files=4, zorder_by=["x", "y"])
    files = snap.live_files(root, v)
    assert len(files) == 4
    # z-ordered: both single-dim ranges now skip files
    assert len(snap.pruned_files(root, {"y": (0, 3)})) < len(files)
    assert len(snap.pruned_files(root, {"x": (0, 3)})) < len(files)
    # and answers are exact on a 2-D box
    got = sorted(
        (r.x, r.y) for r in
        snap.read_pruned(spark, root, {"x": (2, 5), "y": (10, 13)}).collect()
    )
    assert got == sorted((x, y) for x in range(2, 6) for y in range(10, 14))
    rows_after = sorted((r.x, r.y, r.v) for r in snap.read(spark, root).collect())
    assert rows_after == sorted(rows)


def _feed(spark, root, since, to=None):
    rows = snap.changes(spark, root, since, to).collect()
    return sorted(
        (r._commit_version, r._change_type, r.id) for r in rows
    )


def test_changes_appends_are_pure_inserts(spark, table):
    """The (v0, v2] feed of an append-only history is exactly the appended
    rows as inserts — no deletes, no diff work."""
    assert _feed(spark, table, 0) == [
        (1, "insert", i) for i in range(10, 20)
    ]


def test_changes_cow_delete_emits_exactly_the_deleted_rows(spark, table):
    """A COW delete's rewritten files carry the surviving rows through —
    the feed cancels them and emits only the predicate rows as deletes."""
    v = snap.delete_where(spark, table, "lang = 'de'")
    assert _feed(spark, table, v - 1, v) == [
        (v, "delete", i) for i in range(0, 20, 4)
    ]


def test_changes_merge_emits_delete_insert_pairs(spark, table):
    """An updating MERGE surfaces each updated row as its old-row delete +
    new-row insert pair; unmatched source rows are pure inserts."""
    src = spark.createDataFrame(
        [(3, "patched", "en"), (99, "fresh", "fr")],
        "id long, payload string, lang string",
    )
    v = snap.merge_into(spark, table, src, ["id"])
    feed = snap.changes(spark, table, v - 1, v)
    got = sorted(
        (r._change_type, r.id, r.payload) for r in feed.collect()
    )
    assert got == [
        ("delete", 3, "row3"),
        ("insert", 3, "patched"),
        ("insert", 99, "fresh"),
    ]


def test_changes_skips_data_change_false_commits(spark, table):
    """OPTIMIZE rearranges files without changing rows: its commit carries
    data_change=false and contributes nothing to the feed."""
    v = snap.compact(spark, table, max_files=1)
    assert snap.changes(spark, table, v - 1, v).count() == 0
    # and the full feed across the compaction equals the pre-compaction feed
    assert _feed(spark, table, 0) == [
        (1, "insert", i) for i in range(10, 20)
    ]


def test_changes_null_fill_under_evolved_schema(spark, table):
    """The feed reads every era under the schema as of to_version: rows
    changed before an additive evolution null-fill the new column."""
    evolved = spark.createDataFrame(
        [(100, "new", "en", 7)], "id long, payload string, lang string, score long"
    )
    snap.evolve_schema(spark, table, evolved)
    feed = snap.changes(spark, table, 0)
    assert "score" in feed.columns
    by_id = {r.id: r.score for r in feed.collect()}
    assert by_id[100] == 7
    assert all(by_id[i] is None for i in range(10, 20))


def test_changes_expired_log_raises(spark, table):
    """Once expire_log drops a commit below a checkpoint, a feed range
    covering it is not reconstructible and must raise — not silently
    return a partial feed."""
    snap.checkpoint(table)
    snap.expire_log(table)
    with pytest.raises(ValueError, match="expired"):
        snap.changes(spark, table, 0)


def test_changes_range_validation(spark, table):
    with pytest.raises(ValueError, match="out of bounds"):
        snap.changes(spark, table, 0, 99)
    assert snap.changes(spark, table, 1).count() == 0  # empty (HEAD, HEAD]


def test_cdf_replication_folds_to_head(spark, table):
    """The replication invariant the feed exists for: v0's rows plus the
    folded (v0, HEAD] feed — inserts added, deletes removed, as
    multisets — reproduces exactly the HEAD snapshot, across a delete,
    a compaction (skipped), and an updating merge."""
    snap.delete_where(spark, table, "lang = 'de'")
    snap.compact(spark, table, max_files=1)
    src = spark.createDataFrame(
        [(3, "patched", "en"), (99, "fresh", "fr")],
        "id long, payload string, lang string",
    )
    snap.merge_into(spark, table, src, ["id"])

    cols = ["id", "payload", "lang"]
    v0 = snap.read(spark, table, 0).select(cols)
    feed = snap.changes(spark, table, 0)
    ins = feed.filter("_change_type = 'insert'").select(cols)
    dels = feed.filter("_change_type = 'delete'").select(cols)
    replica = v0.unionByName(ins).exceptAll(dels)
    head = snap.read(spark, table).select(cols)
    assert replica.exceptAll(head).count() == 0
    assert head.exceptAll(replica).count() == 0
    assert replica.count() == head.count()


def test_cdf_randomized_operation_soak(spark, tmp_path):
    """Seeded random op sequences (append / COW delete / updating merge /
    compact) against the table, then the replication fold: v0 + feed must
    equal HEAD whatever the interleaving — including no-op deletes,
    merges re-inserting previously deleted ids, and mid-sequence
    compactions the feed must skip."""
    import random

    rnd = random.Random(8)
    root = str(tmp_path / "soak")

    def mk(ids, tag):
        return spark.createDataFrame(
            [(i, f"{tag}{i}", f"l{i % 3}") for i in ids],
            "id long, payload string, lang string",
        )

    snap.create(spark, root, mk(range(10), "p"))
    next_id = 10
    for step in range(6):
        op = rnd.choice(["append", "delete", "merge", "compact"])
        if op == "append":
            snap.append(spark, root, mk(range(next_id, next_id + 4), "a"))
            next_id += 4
        elif op == "delete":
            snap.delete_where(
                spark, root, f"id % {rnd.randint(2, 5)} = {rnd.randint(0, 1)}"
            )
        elif op == "merge":
            ids = rnd.sample(range(next_id), 3)
            snap.merge_into(spark, root, mk(ids, f"m{step}_"), ["id"])
        else:
            snap.compact(spark, root, max_files=2)

    cols = ["id", "payload", "lang"]
    v0 = snap.read(spark, root, 0).select(cols)
    feed = snap.changes(spark, root, 0)
    replica = (
        v0.unionByName(feed.filter("_change_type = 'insert'").select(cols))
        .exceptAll(feed.filter("_change_type = 'delete'").select(cols))
    )
    head = snap.read(spark, root).select(cols)
    assert replica.exceptAll(head).count() == 0
    assert head.exceptAll(replica).count() == 0


def test_append_retry_rebases_past_conflicts(spark, table, monkeypatch):
    """An append that loses the O_EXCL race (simulated by a stale HEAD
    resolution on its first attempt) re-publishes its already-written
    payload at the next free version without rewriting parquet; with
    retries exhausted the conflict still raises."""
    head = snap.latest_version(table)
    # a racing winner has already taken head+1
    snap._write_commit(table, head + 1, [], [])
    df = spark.createDataFrame(
        [(100, "r", "en")], "id long, payload string, lang string"
    )
    orig = snap.latest_version
    calls = {"n": 0}

    def stale_once(root):
        calls["n"] += 1
        return head if calls["n"] == 1 else orig(root)

    # no retries + stale HEAD -> the loser surfaces the conflict
    monkeypatch.setattr(snap, "latest_version", lambda root: head)
    with pytest.raises(FileExistsError):
        snap.append(spark, table, df, max_retries=0)

    # one retry resolves the REAL head and lands at head+2
    monkeypatch.setattr(snap, "latest_version", stale_once)
    v = snap.append(spark, table, df, max_retries=1)
    monkeypatch.setattr(snap, "latest_version", orig)
    assert v == head + 2
    assert snap.read(spark, table).filter("id = 100").count() == 1


def test_append_rebase_revalidates_schema_after_lost_race(spark, table):
    """r08 ADVICE #1: if the racing winner was evolve_schema, a retried
    append must NOT re-publish its pre-evolution payload into the
    post-evolution era (reads would silently null-fill) — the rebase
    re-validates against the new HEAD schema and raises."""
    from pyspark.sql import functions as F

    head = snap.latest_version(table)
    df = spark.createDataFrame(
        [(200, "r", "en")], "id long, payload string, lang string"
    )
    # simulate losing the race to an evolve_schema winner: the conflicting
    # schema-bearing commit lands AFTER the append's entry validation but
    # before its O_EXCL attempt (planted inside the loop's first HEAD
    # resolution), so the append targets head+1, loses the race there, and
    # the rebase must see the era changed under it
    evolved = snap.read(spark, table).withColumn(
        "extra", F.lit(1).cast("long")
    )
    schema_json = evolved.schema.json()
    import unittest.mock as mock

    orig = snap.latest_version
    calls = {"n": 0}

    def stale_once(root):
        calls["n"] += 1
        if calls["n"] == 1:
            snap._write_commit(table, head + 1, [], [],
                               schema_json=schema_json)
            return head
        return orig(root)

    with mock.patch.object(snap, "latest_version", side_effect=stale_once):
        with pytest.raises(ValueError, match="append \\(rebase\\)"):
            snap.append(spark, table, df, max_retries=2)


def test_changes_after_vacuum_raises_protocol_error(spark, table):
    """A feed range whose payload files were reclaimed by VACUUM must
    raise the protocol-level retention error, not a raw scan failure."""
    snap.delete_where(spark, table, "lang = 'de'")
    snap.vacuum(table, retain_versions=1)
    with pytest.raises(ValueError, match="VACUUM"):
        snap.changes(spark, table, 0).count()


# ---------------------------------------------------------------------------
# Merge-on-read DELETE (deletion vectors) — VERDICT r08 #2


def test_mor_delete_rewrites_no_data_files(spark, table):
    """A MOR delete commits a deletion vector and leaves every data file
    in place: the live set is unchanged, the head read drops exactly the
    predicate rows, and time travel still sees them."""
    files_before = snap.live_files(table)
    n_de = snap.read(spark, table).filter("lang = 'de'").count()
    assert n_de > 0
    v = snap.delete_where_mor(spark, table, "lang = 'de'")
    assert snap.live_files(table) == files_before  # nothing rewritten
    assert snap.dv_map(table)  # a DV now covers the hit files
    head = snap.read(spark, table)
    assert head.filter("lang = 'de'").count() == 0
    assert head.count() == 20 - n_de
    assert snap.read(spark, table, v - 1).filter("lang = 'de'").count() == n_de


def test_mor_delete_null_predicate_rows_are_kept(spark, tmp_path):
    """Same SQL DELETE semantics as the COW path: predicate-NULL rows are
    kept, not deleted."""
    root = str(tmp_path / "mor_nulls")
    df = spark.createDataFrame(
        [(1, "de"), (2, None), (3, "en")], "id long, lang string"
    )
    snap.create(spark, root, df)
    snap.delete_where_mor(spark, root, "lang = 'de'")
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [2, 3]


def test_mor_second_delete_supersedes_with_union(spark, table):
    """A second MOR delete touching already-DV'd files writes a SUPERSET
    vector: the new parts alone cover both deletes (readers never need
    the superseded parts), and the old pointer is replaced."""
    snap.delete_where_mor(spark, table, "lang = 'de'")
    dv1 = snap.dv_map(table)
    snap.delete_where_mor(spark, table, "id % 5 = 1")
    dv2 = snap.dv_map(table)
    # every file re-targeted by the second delete points at NEW parts
    for f, parts in dv2.items():
        if f in dv1 and parts != dv1[f]:
            assert not set(parts) & set(dv1[f])
    head = snap.read(spark, table)
    got = sorted(r.id for r in head.collect())
    want = [i for i in range(20) if not (i % 4 == 0 or i % 5 == 1)]
    assert got == want


def test_mor_then_compact_drops_rows_and_retires_dv(spark, table):
    """OPTIMIZE after a MOR delete physically drops the DV'd rows; the
    compacted files carry no DV, and VACUUM then reclaims the orphaned
    DV parts from disk."""
    snap.delete_where_mor(spark, table, "lang = 'de'")
    dv_parts = sorted({p for ps in snap.dv_map(table).values() for p in ps})
    assert dv_parts
    want = sorted(r.id for r in snap.read(spark, table).collect())
    snap.compact(spark, table, max_files=1)
    assert snap.dv_map(table) == {}
    assert sorted(r.id for r in snap.read(spark, table).collect()) == want
    deleted = snap.vacuum(table, retain_versions=1)
    for p in dv_parts:
        assert p in deleted
        assert not os.path.exists(os.path.join(table, p))


def test_mor_vacuum_retains_dv_of_retained_versions(spark, table):
    """VACUUM keeps the DV parts a retained version still points to — a
    retained MOR snapshot must stay readable."""
    snap.delete_where_mor(spark, table, "lang = 'de'")
    want = sorted(r.id for r in snap.read(spark, table).collect())
    snap.append(spark, table, snap.read(spark, table).limit(0))  # head+1
    snap.vacuum(table, retain_versions=2)
    assert sorted(r.id for r in snap.read(spark, table).collect()) == want


def test_mor_changes_feed_cdf_and_derived_agree(spark, tmp_path):
    """The MOR delete's feed rows are exact either way: read from the
    commit's change-data files (cdf=True) or derived from the DV delta
    (cdf=False) — both equal the predicate rows."""
    def build(cdf):
        root = str(tmp_path / f"morfeed_{cdf}")
        df = spark.createDataFrame(
            [(i, f"r{i}", "de" if i % 4 == 0 else "en") for i in range(20)],
            "id long, payload string, lang string",
        )
        snap.create(spark, root, df.repartition(3))
        snap.delete_where_mor(spark, root, "lang = 'de'", cdf=cdf)
        snap.delete_where_mor(spark, root, "id % 5 = 1", cdf=cdf)
        return snap.changes(spark, root, 0)

    for cdf in (True, False):
        feed = build(cdf)
        v1 = feed.filter("_commit_version = 1")
        assert set(r.id for r in v1.collect()) == {0, 4, 8, 12, 16}
        assert set(r._change_type for r in v1.collect()) == {"delete"}
        v2 = feed.filter("_commit_version = 2")
        # id%5=1 minus the already-deleted id 16 (DV'd rows never re-emit)
        assert set(r.id for r in v2.collect()) == {1, 6, 11}


def test_mor_then_cow_feed_never_resurrects_deleted_rows(spark, table):
    """A COW rewrite AFTER a MOR delete diffs its remove-side under the
    pre-commit DVs: rows the DV already deleted must not resurface in the
    COW commit's feed (as either inserts or deletes)."""
    snap.delete_where_mor(spark, table, "lang = 'de'")  # v2: ids 0,4,..,16
    snap.delete_where(spark, table, "id < 3")           # v3 COW: ids 1,2
    feed = snap.changes(spark, table, 1)
    v3 = [(r.id, r._change_type) for r in
          feed.filter("_commit_version = 3").collect()]
    assert sorted(v3) == [(1, "delete"), (2, "delete")]
    # replication invariant still folds: v1 + feed == HEAD
    head_ids = sorted(r.id for r in snap.read(spark, table).collect())
    assert head_ids == [i for i in range(3, 20) if i % 4 != 0]


def test_mor_read_pruned_applies_dv(spark, tmp_path):
    """Stats pruning composes with deletion vectors: the pruned read must
    still anti-join the DV."""
    root = str(tmp_path / "morprune")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "id long, val long"
    )
    snap.create(spark, root, df.repartitionByRange(4, "id"))
    snap.delete_where_mor(spark, root, "id BETWEEN 10 AND 19")
    got = snap.read_pruned(spark, root, {"id": (5, 30)})
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(5, 31) if not 10 <= i <= 19
    ]


def test_merge_never_resurrects_mor_deleted_row(spark, table):
    """MERGE key matching runs on the DV-aware scan: a key whose only row
    was MOR-deleted is an INSERT (new row), not an update of the dead
    row — and the dead row stays dead."""
    snap.delete_where_mor(spark, table, "id = 3")
    src = spark.createDataFrame(
        [(3, "NEW", "fr")], "id long, payload string, lang string"
    )
    snap.merge_into(spark, table, src, ["id"])
    rows = snap.read(spark, table).filter("id = 3").collect()
    assert [(r.payload, r.lang) for r in rows] == [("NEW", "fr")]


def test_mor_checkpoint_carries_dv(spark, table):
    """Checkpoint + log expiry preserve DV state: the replay from the
    checkpoint still applies the deletion vector."""
    snap.delete_where_mor(spark, table, "lang = 'de'")
    want = sorted(r.id for r in snap.read(spark, table).collect())
    snap.checkpoint(table)
    snap.expire_log(table)
    assert sorted(r.id for r in snap.read(spark, table).collect()) == want
    assert snap.dv_map(table)


def test_mor_noop_delete_commits_empty(spark, table):
    """A MOR delete matching nothing publishes an empty commit (version
    advances, no DV)."""
    head = snap.latest_version(table)
    v = snap.delete_where_mor(spark, table, "lang = 'xx'")
    assert v == head + 1
    assert snap.dv_map(table) == {}
    assert snap.read(spark, table).count() == 20


# ---------------------------------------------------------------------------
# Partition-aware commits + log-level partition pruning — VERDICT r08 #3


@pytest.fixture()
def ptable(spark, tmp_path):
    root = str(tmp_path / "ptbl")
    df = spark.createDataFrame(
        [(i, ["de", "en", "fr"][i % 3], i * 10) for i in range(30)],
        "id long, lang string, val long",
    )
    snap.create(spark, root, df, partition_by=["lang"])
    return root


def test_partitioned_layout_and_values_in_log(spark, ptable):
    """Every payload file lives under a Hive-style partition dir, its
    partition value rides in the log, and the partition column's data
    stays INSIDE the file (the duplicated-column write trick), so
    file-list reads need no basePath reconstruction."""
    pv = snap.partition_values(ptable)
    assert pv and all(set(v) == {"lang"} for v in pv.values())
    for f, v in pv.items():
        assert f"__p_0={v['lang']}" in f
    got = snap.read(spark, ptable)
    assert got.columns == ["id", "lang", "val"]
    assert got.count() == 30


def test_partition_prune_opens_only_the_partition(spark, ptable):
    """A partition-equality predicate resolves to exactly that
    partition's files from the log alone — the Delta/Iceberg
    partition-pruning tier, ahead of per-file stats."""
    pf = snap.pruned_files(ptable, {"lang": ("en", "en")})
    assert pf and all("__p_0=en" in f for f in pf)
    n_live = len(snap.live_files(ptable))
    assert len(pf) < n_live
    got = snap.read_pruned(spark, ptable, {"lang": ("en", "en")})
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(30) if i % 3 == 1
    ]


def test_partition_prune_composes_with_stats(spark, ptable):
    """Partition pruning and min/max stats compose: a (partition, range)
    conjunction prunes on both tiers and still answers exactly."""
    from pyspark.sql import functions as F

    snap.append(
        spark, ptable,
        snap.read(spark, ptable).withColumn("id", F.col("id") + 100),
    )
    got = snap.read_pruned(spark, ptable, {"lang": ("de", "de"), "id": (0, 9)})
    assert sorted(r.id for r in got.collect()) == [0, 3, 6, 9]


def test_partitioned_writers_preserve_layout(spark, ptable):
    """append / COW delete / MERGE / OPTIMIZE on a partitioned table all
    write partition-dir payloads and record partition values — pruning
    keeps working across the table's whole life."""
    from pyspark.sql import functions as F

    df2 = snap.read(spark, ptable).withColumn("id", F.col("id") + 100)
    snap.append(spark, ptable, df2)
    snap.delete_where(spark, ptable, "id % 2 = 0 AND lang = 'en'")
    src = spark.createDataFrame(
        [(1, "en", 999), (500, "fr", 5000)], "id long, lang string, val long"
    )
    snap.merge_into(spark, ptable, src, ["id"])
    snap.compact(spark, ptable, max_files=2, zorder_by=["id"])
    pv = snap.partition_values(ptable)
    assert set(pv) == set(snap.live_files(ptable))  # every file has values
    for lang in ("de", "en", "fr"):
        pf = snap.pruned_files(ptable, {"lang": (lang, lang)})
        assert pf and all(f"__p_0={lang}" in f for f in pf)
    got = {r.id: r.val for r in
           snap.read_pruned(spark, ptable, {"lang": ("en", "en")}).collect()}
    assert got[1] == 999
    fr = snap.read_pruned(spark, ptable, {"lang": ("fr", "fr")})
    assert fr.filter("id = 500").count() == 1


def test_partitioned_compact_one_file_per_partition(spark, ptable):
    """OPTIMIZE preserves partition boundaries: after compaction each
    partition's rows live in exactly one file under that partition's
    dir (never a mixed file)."""
    snap.compact(spark, ptable, max_files=4)
    pv = snap.partition_values(ptable)
    by_lang = {}
    for f, v in pv.items():
        by_lang.setdefault(v["lang"], []).append(f)
    assert set(by_lang) == {"de", "en", "fr"}
    for lang, fs in by_lang.items():
        assert len(fs) == 1, f"{lang}: {fs}"
    assert snap.read(spark, ptable).count() == 30


def test_partitioned_mor_delete_and_feed(spark, ptable):
    """Deletion vectors compose with partitioned layouts (the renamed
    unique file names keep row lineage exact), and the change feed stays
    row-exact."""
    snap.delete_where_mor(spark, ptable, "lang = 'fr' AND id < 10")
    assert snap.live_files(ptable) == snap.live_files(ptable, 0)
    got = snap.read_pruned(spark, ptable, {"lang": ("fr", "fr")})
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(10, 30) if i % 3 == 2
    ]
    feed = snap.changes(spark, ptable, 0)
    dels = feed.filter("_change_type = 'delete'")
    assert sorted(r.id for r in dels.collect()) == [2, 5, 8]


def test_partition_null_values_prune_under_ranges(spark, tmp_path):
    """A NULL partition (the Hive sentinel dir) never satisfies a range
    predicate — pruned, like all-NULL stats; an unbounded read still
    returns its rows."""
    root = str(tmp_path / "pnull")
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "de")], "id long, lang string"
    )
    snap.create(spark, root, df, partition_by=["lang"])
    pf = snap.pruned_files(root, {"lang": ("aa", "zz")})
    assert all("__HIVE_DEFAULT_PARTITION__" not in f for f in pf)
    assert snap.read(spark, root).count() == 3
    got = snap.read_pruned(spark, root, {"lang": ("de", "en")})
    assert sorted(r.id for r in got.collect()) == [1, 3]


def test_partition_values_survive_checkpoint(spark, ptable):
    """Checkpoint + log expiry carry the partition spec and per-file
    values — pruning keeps working from the checkpoint alone."""
    snap.checkpoint(ptable)
    snap.expire_log(ptable)
    pf = snap.pruned_files(ptable, {"lang": ("de", "de")})
    assert pf and all("__p_0=de" in f for f in pf)
    got = snap.read_pruned(spark, ptable, {"lang": ("de", "de")})
    assert got.count() == 10


def test_partition_special_chars_roundtrip(spark, tmp_path):
    """Hive-escaped partition values (spaces, colons, percents) parse
    back exactly and stay pruneable."""
    root = str(tmp_path / "pesc")
    df = spark.createDataFrame(
        [(1, "en US:x"), (2, "de%20y"), (3, "fr")], "id long, lang string"
    )
    snap.create(spark, root, df, partition_by=["lang"])
    vals = {v["lang"] for v in snap.partition_values(root).values()}
    assert vals == {"en US:x", "de%20y", "fr"}
    got = snap.read_pruned(spark, root, {"lang": ("en US:x", "en US:x")})
    assert [r.id for r in got.collect()] == [1]
    assert snap.read(spark, root).count() == 3


def test_create_rejects_unknown_partition_column(spark, tmp_path):
    root = str(tmp_path / "pbad")
    df = spark.createDataFrame([(1, "en")], "id long, lang string")
    with pytest.raises(ValueError, match="partition_by"):
        snap.create(spark, root, df, partition_by=["nope"])


# ---------------------------------------------------------------------------
# CDF update classification — VERDICT r08 #5


def test_changes_classify_updates_merge_pairs(spark, table):
    """classify_updates=True relabels a MERGE commit's matched
    delete+insert pairs as update_preimage/update_postimage; a pure
    insert through the same MERGE stays 'insert', and non-merge commits
    are untouched."""
    src = spark.createDataFrame(
        [(3, "UPDATED", "fr"), (99, "NEW", "fr")],
        "id long, payload string, lang string",
    )
    v = snap.merge_into(spark, table, src, ["id"])
    feed = snap.changes(spark, table, v - 1, classify_updates=True)
    got = sorted((r.id, r._change_type) for r in feed.collect())
    assert got == [
        (3, "update_postimage"), (3, "update_preimage"), (99, "insert"),
    ]
    pre = feed.filter("_change_type = 'update_preimage'").collect()[0]
    post = feed.filter("_change_type = 'update_postimage'").collect()[0]
    assert pre.payload == "row3" and post.payload == "UPDATED"
    # default two-type feed unchanged
    plain = snap.changes(spark, table, v - 1)
    assert sorted(set(r._change_type for r in plain.collect())) == [
        "delete", "insert",
    ]


def test_changes_classify_leaves_cow_delete_alone(spark, table):
    """A COW DELETE commit has no merge keys: classification never
    invents update pairs out of coincidental row overlap."""
    v = snap.delete_where(spark, table, "lang = 'de'")
    feed = snap.changes(spark, table, v - 1, classify_updates=True)
    assert set(r._change_type for r in feed.collect()) == {"delete"}


# ---------------------------------------------------------------------------
# RESTORE + DESCRIBE HISTORY


def test_restore_rolls_back_live_set_and_dv(spark, table):
    """RESTORE publishes one forward commit whose post-state equals the
    target version — across a COW delete AND a MOR deletion vector — by
    log reference only (no payload copied), and the bad era stays
    time-travelable."""
    snap.delete_where(spark, table, "lang = 'de'")      # v2
    snap.delete_where_mor(spark, table, "id % 5 = 1")   # v3
    files_v3 = snap.live_files(table)
    v = snap.restore(spark, table, 1)
    assert v == 4
    assert sorted(r.id for r in snap.read(spark, table).collect()) == list(
        range(20)
    )
    assert snap.dv_map(table) == {}  # DV rolled back with the state
    # the rolled-back era still reads exactly
    assert sorted(r.id for r in snap.read(spark, table, 3).collect()) == [
        i for i in range(20) if i % 4 != 0 and i % 5 != 1
    ]
    # restoring forward to the pre-restore HEAD state also works
    snap.restore(spark, table, 3)
    assert snap.live_files(table) == files_v3
    assert snap.dv_map(table) != {}


def test_restore_feed_keeps_replication_invariant(spark, table):
    """v0 + the change feed folds to HEAD across a restore (the restore's
    change-data files carry the exact row diff, including DV-rollback
    re-inserts no file diff could see)."""
    from collections import Counter

    snap.delete_where_mor(spark, table, "lang = 'de'")
    snap.restore(spark, table, 1)
    cnt: Counter = Counter()
    for r in snap.changes(spark, table, 0).collect():
        cnt[r.id] += 1 if r._change_type == "insert" else -1
    for r in snap.read(spark, table, 0).collect():
        cnt[r.id] += 1
    fold = sorted(i for i, n in cnt.items() for _ in range(n))
    head = sorted(r.id for r in snap.read(spark, table).collect())
    assert fold == head == list(range(20))


def test_restore_to_vacuumed_version_raises(spark, table):
    snap.delete_where(spark, table, "lang = 'de'")
    snap.vacuum(table, retain_versions=1)
    with pytest.raises(ValueError, match="VACUUM"):
        snap.restore(spark, table, 1)


def test_history_records_operation_trail(spark, table):
    """history() surfaces the operation audit trail newest-first from
    log metadata alone."""
    snap.delete_where_mor(spark, table, "lang = 'de'")
    snap.compact(spark, table, max_files=1)
    h = snap.history(table)
    assert [x["version"] for x in h] == [3, 2, 1, 0]
    assert [x["operation"] for x in h] == [
        "optimize", "delete_mor", "append", "create",
    ]
    assert h[0]["data_change"] is False
    assert h[1]["deletion_vector"] and h[1]["change_data"]
    assert h[3]["schema_change"]


# ---------------------------------------------------------------------------
# UPDATE


def test_update_where_cow_semantics(spark, table):
    """UPDATE rewrites only matching files, applies SET to exactly the
    predicate-TRUE rows, casts to the pinned type, and leaves the old
    era readable."""
    v = snap.update_where(
        spark, table, "lang = 'de'", {"payload": "concat(payload, '!')"}
    )
    head = {r.id: r.payload for r in snap.read(spark, table).collect()}
    assert head[0] == "row0!" and head[4] == "row4!"
    assert head[1] == "row1"  # untouched
    old = {r.id: r.payload for r in snap.read(spark, table, v - 1).collect()}
    assert old[0] == "row0"
    assert snap.history(table)[0]["operation"] == "update"


def test_update_where_null_predicate_rows_untouched(spark, tmp_path):
    root = str(tmp_path / "updnull")
    df = spark.createDataFrame(
        [(1, "de", 10), (2, None, 20), (3, "en", 30)],
        "id long, lang string, val long",
    )
    snap.create(spark, root, df)
    snap.update_where(spark, root, "lang = 'de'", {"val": "val + 1"})
    got = {r.id: r.val for r in snap.read(spark, root).collect()}
    assert got == {1: 11, 2: 20, 3: 30}


def test_update_feed_emits_native_update_types(spark, table):
    """The UPDATE's change-data files carry update_preimage/postimage
    pairs — the feed reads them directly (no classification needed) and
    the replication fold still holds (pre/post count as -1/+1)."""
    from collections import Counter

    v = snap.update_where(
        spark, table, "id % 7 = 0", {"payload": "upper(payload)"}
    )
    feed = snap.changes(spark, table, v - 1)
    got = sorted((r.id, r._change_type, r.payload) for r in feed.collect())
    want = sorted(
        [(i, "update_preimage", f"row{i}") for i in range(0, 20, 7)]
        + [(i, "update_postimage", f"ROW{i}") for i in range(0, 20, 7)]
    )
    assert got == want
    # fold: preimage removes the old row, postimage inserts the new one
    cnt: Counter = Counter()
    for r in snap.changes(spark, table, 0).collect():
        sign = 1 if r._change_type in ("insert", "update_postimage") else -1
        cnt[(r.id, r.payload)] += sign
    for r in snap.read(spark, table, 0).collect():
        cnt[(r.id, r.payload)] += 1
    fold = sorted(k for k, n in cnt.items() for _ in range(n))
    head = sorted(
        (r.id, r.payload) for r in snap.read(spark, table).collect()
    )
    assert fold == head


def test_update_unknown_column_raises(spark, table):
    with pytest.raises(ValueError, match="unknown columns"):
        snap.update_where(spark, table, "id = 1", {"nope": "1"})


def test_update_respects_deletion_vectors(spark, table):
    """MOR-deleted rows can neither match an UPDATE nor resurface in its
    rewrite."""
    snap.delete_where_mor(spark, table, "id = 4")
    snap.update_where(spark, table, "lang = 'de'", {"payload": "'X'"})
    got = snap.read(spark, table)
    assert got.filter("id = 4").count() == 0
    assert {r.id for r in got.filter("payload = 'X'").collect()} == {
        0, 8, 12, 16,
    }


# ---------------------------------------------------------------------------
# Per-file Bloom-filter index (point-lookup pruning)


@pytest.fixture()
def btable(spark, tmp_path):
    root = str(tmp_path / "btbl")
    df = spark.createDataFrame(
        [(i, f"body {i * 37}", i * 10) for i in range(200)],
        "id long, text string, val long",
    )
    snap.create(spark, root, df.repartition(8), bloom_cols=["text"])
    return root


def test_bloom_never_false_negative(spark, btable):
    """Every present value survives the Bloom prune — false positives
    cost a wasted file read; a false negative would be a wrong answer,
    so the invariant is exhaustively checked."""
    for i in range(0, 200, 13):
        v = f"body {i * 37}"
        got = snap.read_point(spark, btable, "text", v).collect()
        assert [(r.id, r.val) for r in got] == [(i, i * 10)]


def test_bloom_prunes_most_files_on_point_lookup(spark, btable):
    n_live = len(snap.live_files(btable))
    pf = snap.bloom_pruned_files(spark, btable, "text", "body 1850")
    assert len(pf) < n_live  # the point of the index
    # an absent value prunes to (almost) nothing and answers empty
    assert snap.read_point(spark, btable, "text", "zzz absent").count() == 0


def test_bloom_follows_appends_merges_and_checkpoint(spark, btable):
    """Every writer computes blooms for its new files; checkpoint + log
    expiry carry them."""
    extra = spark.createDataFrame(
        [(999, "needle", 1)], "id long, text string, val long"
    )
    snap.append(spark, btable, extra)
    assert [r.id for r in
            snap.read_point(spark, btable, "text", "needle").collect()] == [999]
    src = spark.createDataFrame(
        [(999, "renamed", 2)], "id long, text string, val long"
    )
    snap.merge_into(spark, btable, src, ["id"])
    assert snap.read_point(spark, btable, "text", "needle").count() == 0
    assert [r.val for r in
            snap.read_point(spark, btable, "text", "renamed").collect()] == [2]
    snap.checkpoint(btable)
    snap.expire_log(btable)
    assert [r.val for r in
            snap.read_point(spark, btable, "text", "renamed").collect()] == [2]


def test_bloom_composes_with_deletion_vectors(spark, btable):
    """read_point scans DV-aware: a MOR-deleted row is gone even though
    its file's bloom still matches."""
    snap.delete_where_mor(spark, btable, "id = 50")
    assert snap.read_point(spark, btable, "text", "body 1850").count() == 0


def test_bloom_null_probe_scans_everything(spark, btable):
    """A NULL probe can never bloom-prune (equality never matches NULL):
    every live file is kept and the residual filter answers empty."""
    pf = snap.bloom_pruned_files(spark, btable, "text", None)
    assert pf == snap.live_files(btable)


def test_bloom_unindexed_column_degrades_to_scan(spark, btable):
    pf = snap.bloom_pruned_files(spark, btable, "val", 500)
    assert pf == snap.live_files(btable)
    assert snap.read_point(spark, btable, "val", 500).count() == 1


# ---------------------------------------------------------------------------
# Incremental OPTIMIZE (small-file-only compaction)


def test_incremental_optimize_rewrites_only_small_files(spark, tmp_path):
    """compact(small_only_below=N) coalesces only files under the
    row-count threshold (recorded by every commit); big files are
    carried by log reference — repeated OPTIMIZE is O(new small files)."""
    root = str(tmp_path / "incopt")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "id long, val long"
    )
    snap.create(spark, root, df.coalesce(1))          # one 100-row file
    for k in range(3):                                 # three 1-row files
        snap.append(
            spark, root,
            spark.createDataFrame([(1000 + k, k)], "id long, val long"),
        )
    big = [f for f, n in snap.file_rows(root).items() if n == 100]
    assert len(big) == 1
    want = sorted(r.id for r in snap.read(spark, root).collect())
    v = snap.compact(spark, root, max_files=1, small_only_below=50)
    after = snap.live_files(root, v)
    assert big[0] in after                 # the big file was NOT rewritten
    assert len(after) == 2                 # big + one coalesced small file
    assert sorted(r.id for r in snap.read(spark, root).collect()) == want
    # second pass: nothing small left -> auditable no-op
    v2 = snap.compact(spark, root, max_files=1, small_only_below=50)
    assert snap.live_files(root, v2) == after
    assert snap.history(root)[0]["operation"] == "optimize"
    assert snap.history(root)[0]["data_change"] is False


def test_incremental_optimize_rewrites_dv_files(spark, tmp_path):
    """A file carrying a deletion vector counts as small regardless of
    its recorded rows — the rewrite materializes the delete and retires
    the DV."""
    root = str(tmp_path / "incoptdv")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "id long, val long"
    )
    snap.create(spark, root, df.coalesce(1))
    snap.delete_where_mor(spark, root, "id < 5")
    assert snap.dv_map(root)
    snap.compact(spark, root, max_files=1, small_only_below=10)
    assert snap.dv_map(root) == {}
    assert snap.read(spark, root).count() == 95


# ---------------------------------------------------------------------------
# TIMESTAMP AS OF


def test_timestamp_time_travel(spark, table):
    """Every commit records its wall-clock ts; TIMESTAMP AS OF resolves
    the newest commit at or before the instant and reads that snapshot;
    a pre-table timestamp raises."""
    import time

    ts = snap.commit_timestamps(table)
    assert sorted(ts) == [0, 1]
    time.sleep(0.01)
    between = int(time.time() * 1000)
    time.sleep(0.01)
    snap.delete_where(spark, table, "lang = 'de'")
    assert snap.version_as_of(table, between) == 1
    got = snap.read_timestamp_as_of(spark, table, between)
    assert got.count() == 20  # pre-delete era
    now = int(time.time() * 1000) + 1000
    assert snap.read_timestamp_as_of(spark, table, now).count() == 15
    with pytest.raises(ValueError, match="no commit at or before"):
        snap.version_as_of(table, min(ts.values()) - 10_000)


# ---------------------------------------------------------------------------
# Full-DML randomized protocol soak (round 9 surface)


def test_full_dml_randomized_soak_against_python_model(spark, tmp_path):
    """Seeded random sequences over the WHOLE round-9 DML alphabet —
    append, COW delete, MOR delete (cdf on/off), UPDATE, MERGE,
    incremental/zorder OPTIMIZE, RESTORE — checked two ways after every
    sequence: (1) the head read equals an independently-maintained
    pure-Python model of the table, and (2) v0 + the change feed folds
    to HEAD (update pre/postimages counting -1/+1). Restores replay the
    model from its own history snapshots."""
    import random

    for seed in (3, 11):
        rnd = random.Random(seed)
        root = str(tmp_path / f"dmlsoak{seed}")

        def mk(rows):
            return spark.createDataFrame(
                [(i, p, v) for i, p, v in rows],
                "id long, payload string, val long",
            )

        model = {i: (f"p{i}", i * 10) for i in range(12)}
        snap.create(
            spark, root, mk([(i, *model[i]) for i in sorted(model)])
        )
        history = [dict(model)]
        next_id = 12
        for step in range(8):
            op = rnd.choice(
                ["append", "delete", "mor", "update", "merge",
                 "optimize", "restore"]
            )
            if op == "append":
                rows = [(next_id + j, f"a{step}_{j}", j) for j in range(3)]
                snap.append(spark, root, mk(rows))
                for i, p, v in rows:
                    model[i] = (p, v)
                next_id += 3
            elif op == "delete":
                m = rnd.randint(2, 5)
                snap.delete_where(spark, root, f"id % {m} = 0")
                model = {i: r for i, r in model.items() if i % m != 0}
            elif op == "mor":
                m = rnd.randint(2, 5)
                snap.delete_where_mor(
                    spark, root, f"val % {m} = 1", cdf=rnd.random() < 0.5
                )
                model = {i: r for i, r in model.items() if r[1] % m != 1}
            elif op == "update":
                m = rnd.randint(2, 4)
                snap.update_where(
                    spark, root, f"id % {m} = 1",
                    {"val": "val + 1000", "payload": "concat(payload, 'u')"},
                )
                model = {
                    i: ((p + "u", v + 1000) if i % m == 1 else (p, v))
                    for i, (p, v) in model.items()
                }
            elif op == "merge":
                pool = sorted(model) or [0]
                ids = sorted({rnd.choice(pool), next_id})
                rows = [(i, f"m{step}_{i}", i) for i in ids]
                snap.merge_into(spark, root, mk(rows), ["id"])
                for i, p, v in rows:
                    model[i] = (p, v)
                next_id += 1
            elif op == "optimize":
                if rnd.random() < 0.5:
                    snap.compact(spark, root, max_files=2,
                                 small_only_below=5)
                else:
                    snap.compact(spark, root, max_files=2,
                                 zorder_by=["id"])
            else:  # restore
                target = rnd.randrange(len(history))
                snap.restore(spark, root, target_version := target)
                model = dict(history[target_version])
            history.append(dict(model))

        got = {
            r.id: (r.payload, r.val)
            for r in snap.read(spark, root).collect()
        }
        assert got == model, f"seed {seed}: head != model"

        # replication fold across the full mixed feed
        from collections import Counter

        cnt: Counter = Counter()
        for r in snap.changes(spark, root, 0).collect():
            sign = (
                1 if r._change_type in ("insert", "update_postimage") else -1
            )
            cnt[(r.id, r.payload, r.val)] += sign
        for r in snap.read(spark, root, 0).collect():
            cnt[(r.id, r.payload, r.val)] += 1
        fold = sorted(k for k, n in cnt.items() for _ in range(n))
        head = sorted(
            (r.id, r.payload, r.val)
            for r in snap.read(spark, root).collect()
        )
        assert fold == head, f"seed {seed}: fold != head"


def test_zorder_three_columns_clusters_all_dims(spark, tmp_path):
    """N-column OPTIMIZE ZORDER (Morton interleave across n dims): after
    clustering on three columns, a range predicate on EACH of them
    prunes files via stats — and contents are preserved exactly."""
    root = str(tmp_path / "z3")
    rows = [
        (i, (i * 7) % 100, (i * 13) % 100, (i * 29) % 100)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    snap.create(spark, root, df.repartition(6))
    want = sorted(r.id for r in snap.read(spark, root).collect())
    snap.compact(spark, root, max_files=8, zorder_by=["a", "b", "c"])
    assert sorted(r.id for r in snap.read(spark, root).collect()) == want
    n_live = len(snap.live_files(root))
    for col in ("a", "b", "c"):
        pf = snap.pruned_files(root, {col: (0, 10)})
        assert len(pf) < n_live, f"no pruning on {col}"
    with pytest.raises(ValueError, match="at most 4"):
        snap.compact(spark, root, zorder_by=["a", "b", "c", "id", "id"])


# ---------------------------------------------------------------------------
# CHECK constraints


def test_check_constraints_enforced_on_every_writer(spark, tmp_path):
    """CHECK constraints (SQL semantics: only FALSE violates, NULL
    passes) reject violating appends, merges, and updates by name; valid
    writes pass; drop re-opens the gate."""
    root = str(tmp_path / "cons")
    df = spark.createDataFrame(
        [(1, "en", 10), (2, None, 20)], "id long, lang string, val long"
    )
    snap.create(spark, root, df, check_constraints={"pos_val": "val > 0"})
    # NULL lang passes a lang constraint added later only if rows comply
    snap.add_constraint(spark, root, "lang_known",
                        "lang IN ('en', 'de')")  # NULL passes (SQL CHECK)
    ok = spark.createDataFrame([(3, "de", 5)], "id long, lang string, val long")
    snap.append(spark, root, ok)
    bad_val = spark.createDataFrame(
        [(4, "en", -1)], "id long, lang string, val long"
    )
    with pytest.raises(ValueError, match="pos_val"):
        snap.append(spark, root, bad_val)
    bad_lang = spark.createDataFrame(
        [(5, "xx", 1)], "id long, lang string, val long"
    )
    with pytest.raises(ValueError, match="lang_known"):
        snap.merge_into(spark, root, bad_lang, ["id"])
    with pytest.raises(ValueError, match="pos_val"):
        snap.update_where(spark, root, "id = 1", {"val": "-5"})
    # an update that falsifies its own predicate still validates
    with pytest.raises(ValueError, match="pos_val"):
        snap.update_where(spark, root, "val = 10", {"val": "val - 100"})
    snap.drop_constraint(root, "pos_val")
    snap.append(spark, root, bad_val)  # gate re-opened
    assert snap.read(spark, root).filter("val = -1").count() == 1
    assert list(snap.constraints(root)) == ["lang_known"]


def test_add_constraint_rejects_violating_existing_rows(spark, tmp_path):
    """ADD CONSTRAINT validates the current table first — existing
    violations reject the constraint, not the data (Delta's contract)."""
    root = str(tmp_path / "consx")
    df = spark.createDataFrame([(1, -5)], "id long, val long")
    snap.create(spark, root, df)
    with pytest.raises(ValueError, match="existing rows"):
        snap.add_constraint(spark, root, "pos", "val > 0")
    assert snap.constraints(root) == {}


def test_constraints_survive_checkpoint(spark, tmp_path):
    root = str(tmp_path / "consck")
    df = spark.createDataFrame([(1, 5)], "id long, val long")
    snap.create(spark, root, df, check_constraints={"pos": "val > 0"})
    snap.checkpoint(root)
    snap.expire_log(root)
    with pytest.raises(ValueError, match="pos"):
        snap.append(
            spark, root, spark.createDataFrame([(2, -1)], "id long, val long")
        )
    assert snap.constraints(root) == {"pos": "val > 0"}


# ---------------------------------------------------------------------------
# Generated partition transforms (hidden partitioning)


def test_generated_truncate_partition_prunes_source_ranges(spark, tmp_path):
    """An integer truncate transform buckets by floor-division; bounds on
    the raw SOURCE column map through the transform and prune files,
    with the residual filter keeping rows exact; OPTIMIZE preserves the
    derived layout."""
    root = str(tmp_path / "gpt")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(400)], "id long, val long"
    )
    snap.create(
        spark, root, df,
        partition_by=[{"source": "id", "transform": "truncate",
                       "param": 100}],
    )
    pf = snap.pruned_files(root, {"id": (120, 180)})
    assert pf and all("__p_0=1" in f for f in pf)
    got = snap.read_pruned(spark, root, {"id": (120, 180)})
    assert sorted(r.id for r in got.collect()) == list(range(120, 181))
    snap.compact(spark, root, max_files=2)
    pf2 = snap.pruned_files(root, {"id": (0, 99)})
    assert pf2 and all("__p_0=0" in f for f in pf2)
    assert snap.read(spark, root).count() == 400


def test_generated_day_partition_prunes_timestamp_ranges(spark, tmp_path):
    """The day transform hides a date partition behind the raw timestamp
    column (Iceberg's hidden partitioning): ts bounds open only the
    covered days' files and rows stay microsecond-exact; the generated
    name is also directly boundable (file-level)."""
    import datetime

    root = str(tmp_path / "gpd")
    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 5, 6, 30), i)
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v long")
    snap.create(
        spark, root, df,
        partition_by=[{"source": "ts", "transform": "day", "name": "day"}],
    )
    pf = snap.pruned_files(
        root, {"ts": ("2024-01-02 00:00:00", "2024-01-03 23:59:59")}
    )
    assert pf and all(
        "__p_0=2024-01-02" in f or "__p_0=2024-01-03" in f for f in pf
    )
    got = snap.read_pruned(
        spark, root, {"ts": ("2024-01-02 00:00:00", "2024-01-03 23:59:59")}
    )
    assert sorted(r.id for r in got.collect()) == sorted(
        i for i in range(50) if 1 <= i % 5 <= 2
    )
    pf2 = snap.pruned_files(root, {"day": ("2024-01-04", "2024-01-04")})
    assert pf2 and all("__p_0=2024-01-04" in f for f in pf2)


def test_generated_partition_unknown_transform_raises(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown partition transform"):
        snap.create(
            spark, str(tmp_path / "gpbad"), df,
            partition_by=[{"source": "id", "transform": "hour"}],
        )


# ---------------------------------------------------------------------------
# Protocol versioning


def test_future_reader_protocol_refuses_to_read(spark, table):
    """A table whose log demands a NEWER reader protocol (written by a
    future engine) must refuse loudly — misreading an unknown feature
    silently is the one unforgivable failure mode. Like Delta, the
    upgrade gates the WHOLE table (resolving any snapshot means
    replaying a log whose newer actions this reader can't interpret)."""
    head = snap.latest_version(table)
    # current tables stamp the supported requirement at create
    assert snap._read_state(table, head)["protocol"]["reader"] in (
        1, snap._READER_VERSION,
    )
    snap._write_commit(table, head + 1, [], [],
                       protocol={"reader": snap._READER_VERSION + 1})
    with pytest.raises(ValueError, match="requires reader protocol"):
        snap.read(spark, table)
    with pytest.raises(ValueError, match="requires reader protocol"):
        snap.changes(spark, table, 0)
    with pytest.raises(ValueError, match="requires reader protocol"):
        snap.read(spark, table, head)  # time travel replays the log too


# ---------------------------------------------------------------------------
# Column mapping (rename / drop without rewrite)


@pytest.fixture()
def mtable(spark, tmp_path):
    root = str(tmp_path / "mtbl")
    df = spark.createDataFrame(
        [(i, f"t{i}", i * 10) for i in range(40)],
        "id long, txt string, val long",
    )
    snap.create(spark, root, df.repartition(3), column_mapping=True,
                bloom_cols=["txt"])
    return root


def test_rename_column_is_metadata_only(spark, mtable):
    """RENAME changes the logical name in one metadata commit: zero
    files rewritten, values intact, stats AND bloom pruning keep
    working (they key on the stable physical name)."""
    files = snap.live_files(mtable)
    snap.rename_column(mtable, "val", "amount")
    assert snap.live_files(mtable) == files
    got = snap.read(spark, mtable)
    assert got.columns == ["id", "txt", "amount"]
    assert [r.amount for r in got.filter("id = 3").collect()] == [30]
    # stats tier still prunes under the NEW logical name
    assert len(snap.pruned_files(mtable, {"amount": (0, 50)})) <= len(files)
    got2 = snap.read_pruned(spark, mtable, {"amount": (100, 150)})
    assert sorted(r.id for r in got2.collect()) == list(range(10, 16))
    # bloom index survives renaming its own column
    snap.rename_column(mtable, "txt", "body")
    assert [r.id for r in
            snap.read_point(spark, mtable, "body", "t7").collect()] == [7]


def test_drop_column_never_resurrects(spark, mtable):
    """DROP is metadata-only; re-adding the same logical name later gets
    a fresh physical id, so the dropped data never resurrects — while
    time travel below the drop still reads the old values."""
    snap.drop_column(mtable, "val")
    assert snap.read(spark, mtable).columns == ["id", "txt"]
    v_drop = snap.latest_version(mtable)
    snap.evolve_schema(
        spark, mtable,
        spark.createDataFrame([(200, "x", 7)],
                              "id long, txt string, val long"),
    )
    got = {r.id: r.val for r in
           snap.read(spark, mtable).filter("id IN (3, 200)").collect()}
    assert got == {3: None, 200: 7}
    old = snap.read(spark, mtable, v_drop - 1)
    assert [r.val for r in old.filter("id = 3").collect()] == [30]


def test_mapped_table_full_dml_and_feed(spark, mtable):
    """The whole DML alphabet works on a mapped table after a rename,
    and the change feed reads every era under the end schema."""
    snap.rename_column(mtable, "val", "amount")
    snap.delete_where_mor(spark, mtable, "id % 7 = 0")
    snap.update_where(spark, mtable, "id = 3", {"amount": "amount + 5"})
    src = spark.createDataFrame(
        [(3, "M", 99)], "id long, txt string, amount long"
    )
    snap.merge_into(spark, mtable, src, ["id"])
    assert [r.amount for r in
            snap.read(spark, mtable).filter("id = 3").collect()] == [99]
    feed = snap.changes(spark, mtable, 0)
    assert "amount" in feed.columns
    assert feed.filter("_change_type = 'update_preimage'").count() == 1
    snap.compact(spark, mtable, max_files=1)
    assert snap.read(spark, mtable).count() == 34  # 40 - 6 MOR-deleted


def test_enable_column_mapping_on_existing_table(spark, table):
    """enable_column_mapping pins physical := current logical for the
    files already on disk; renames work from then on."""
    snap.enable_column_mapping(table)
    snap.rename_column(table, "payload", "body")
    got = snap.read(spark, table)
    assert got.columns == ["id", "body", "lang"]
    assert got.filter("body = 'row3'").count() == 1
    with pytest.raises(ValueError, match="already enabled"):
        snap.enable_column_mapping(table)


def test_rename_requires_mapping_and_guards(spark, table, tmp_path):
    with pytest.raises(ValueError, match="requires column mapping"):
        snap.rename_column(table, "payload", "body")
    root = str(tmp_path / "guard")
    df = spark.createDataFrame([(1, 5)], "id long, val long")
    snap.create(spark, root, df, column_mapping=True,
                check_constraints={"pos": "val > 0"})
    with pytest.raises(ValueError, match="CHECK constraint"):
        snap.rename_column(root, "val", "v2")
    with pytest.raises(ValueError, match="CHECK constraint"):
        snap.drop_column(root, "val")
    with pytest.raises(ValueError, match="already exists"):
        snap.rename_column(root, "id", "val")
    one = str(tmp_path / "one")
    snap.create(spark, one, spark.createDataFrame([(1,)], "id long"),
                column_mapping=True)
    with pytest.raises(ValueError, match="only column"):
        snap.drop_column(one, "id")


def test_vacuum_time_retention_protects_recent_versions(spark, table):
    """vacuum(retain_ms=...) unions wall-clock retention with the
    count-based one: versions committed inside the window keep their
    files even when retain_versions alone would sweep them."""
    snap.delete_where(spark, table, "lang = 'de'")
    # everything here committed milliseconds ago: a 1-hour window
    # retains every version, so nothing is reclaimed
    assert snap.vacuum(table, retain_versions=1,
                       retain_ms=3600_000) == []
    assert snap.read(spark, table, 0).count() == 10  # v0 still readable
    # with no time window the count-based sweep reclaims as before
    deleted = snap.vacuum(table, retain_versions=1)
    assert deleted


# ---------------------------------------------------------------- CLONE


def test_clone_is_a_zero_copy_fork(spark, table, tmp_path):
    """SHALLOW CLONE copies zero data bytes: the clone's v0 references the
    source's payload files absolutely, reads equal the source as of the
    fork, and the clone's own data/ dir starts empty."""
    dst = str(tmp_path / "fork")
    snap.clone(table, dst)
    assert sorted(r.id for r in snap.read(spark, dst).collect()) == list(range(20))
    assert all(os.path.isabs(f) for f in snap.live_files(dst))
    walked = [
        fn for _, _, fns in os.walk(os.path.join(dst, "data")) for fn in fns
    ]
    assert walked == []


def test_clone_of_version_forks_history(spark, table, tmp_path):
    """clone(version=N) forks the AS-OF state, not HEAD — and later source
    commits never leak into the clone (independence, source→clone)."""
    snap.delete_where(spark, table, "lang = 'de'")  # v2
    dst = str(tmp_path / "fork")
    snap.clone(table, dst, version=1)  # pre-delete era
    assert snap.read(spark, dst).filter("lang = 'de'").count() == 5
    snap.delete_where(spark, table, "id >= 15")  # source diverges further
    assert snap.read(spark, dst).count() == 20


def test_clone_writes_never_touch_the_source(spark, table, tmp_path):
    """Independence, clone→source: the clone's COW delete drops absolute
    log references and writes clone-local files; the source's payloads,
    log, and reads are bit-identical afterwards."""
    dst = str(tmp_path / "fork")
    snap.clone(table, dst)
    src_files = snap.live_files(table)
    snap.delete_where(spark, dst, "id % 2 = 0")
    assert snap.live_files(table) == src_files
    assert snap.read(spark, table).count() == 20
    assert snap.read(spark, dst).count() == 10
    # the clone's rewrite landed under ITS data dir
    assert any(not os.path.isabs(f) for f in snap.live_files(dst))


def test_clone_carries_deletion_vectors(spark, table, tmp_path):
    """A source MOR delete's DV applies verbatim to the clone (basenames
    are the row identity), and a clone-side MOR delete supersedes into
    clone-local DV parts without touching the source's."""
    snap.delete_where_mor(spark, table, "lang = 'de'")
    dst = str(tmp_path / "fork")
    snap.clone(table, dst)
    assert snap.read(spark, dst).filter("lang = 'de'").count() == 0
    src_dv = snap.dv_map(table)
    snap.delete_where_mor(spark, dst, "id >= 18")
    assert snap.read(spark, dst).count() == 20 - 5 - 2
    assert snap.dv_map(table) == src_dv
    # the source never sees the clone's extra deletes
    assert snap.read(spark, table).count() == 15


def test_clone_vacuum_cannot_reclaim_source_files(spark, table, tmp_path):
    """vacuum on a diverged clone sweeps only clone-local files: absolute
    source references are outside its data/ walk by construction."""
    dst = str(tmp_path / "fork")
    snap.clone(table, dst)
    snap.delete_where(spark, dst, "id < 10")  # drops an abs reference
    deleted = snap.vacuum(dst, retain_versions=1)
    assert all(not os.path.isabs(p) for p in deleted)
    assert snap.read(spark, table).count() == 20  # source intact


def test_source_vacuum_breaks_then_compaction_heals_the_clone(spark, table, tmp_path):
    """The documented shallow-clone hazard: the SOURCE's vacuum does not
    know about clones, so reclaiming the forked era breaks the clone's
    reads — until OPTIMIZE localizes the clone's payloads, after which
    the clone survives any source-side reclamation."""
    dst = str(tmp_path / "fork")
    snap.clone(table, dst)
    snap.delete_where(spark, table, "id < 10")
    reclaimed = snap.vacuum(table, retain_versions=1)
    assert reclaimed  # v0/v1 payload files actually went away
    with pytest.raises(Exception):
        snap.read(spark, dst).collect()
    # heal: re-clone from the surviving source, localize, then vacuum again
    dst2 = str(tmp_path / "fork2")
    snap.clone(table, dst2)
    snap.compact(spark, dst2, max_files=1)  # clone-local payloads now
    snap.delete_where(spark, table, "id >= 18")
    snap.vacuum(table, retain_versions=1)
    assert snap.read(spark, dst2).count() == 10  # post-first-delete era


def test_clone_of_clone_passes_absolute_references_through(spark, table, tmp_path):
    """Clone-of-clone: already-absolute grandparent references survive a
    second clone unchanged (no double-prefixing)."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    snap.clone(table, a)
    snap.delete_where_mor(spark, a, "id = 0")
    snap.clone(a, b)
    assert snap.read(spark, b).count() == 19
    assert sorted(snap.live_files(b)) == sorted(snap.live_files(a, 1))


def test_clone_carries_schema_constraints_and_partitions(spark, tmp_path):
    """The clone enforces the source's CHECK constraints, keeps its
    partition spec (log-level pruning works on absolute references), and
    starts with NO transaction stamps (a different sink's ledger)."""
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en") for i in range(10)],
        "id long, lang string",
    )
    snap.create(spark, src, df, partition_by=["lang"],
                check_constraints={"pos_id": "id >= 0"})
    dst = str(tmp_path / "dst")
    snap.clone(src, dst)
    with pytest.raises(ValueError, match="pos_id"):
        snap.append(spark, dst, spark.createDataFrame(
            [(-1, "en")], "id long, lang string"))
    pruned = snap.pruned_files(dst, {"lang": ("de", "de")})
    assert pruned and all("=de" in f for f in pruned)
    assert len(pruned) < len(snap.live_files(dst))
    assert snap.applied_txns(dst, "any") == set()


def test_clone_version_bounds_raise(spark, table, tmp_path):
    with pytest.raises(ValueError, match="not in"):
        snap.clone(table, str(tmp_path / "x"), version=99)


# ------------------------------------------------- MERGE schema evolution


def test_merge_evolve_adds_column_in_one_commit(spark, table):
    """merge_into(evolve=True) with source-only columns evolves the schema
    IN the merge commit: matched rows carry the new value, survivors and
    historical files null-fill, pre-merge versions keep the old schema."""
    src = spark.createDataFrame(
        [(5, "ROW5", "en", 1.5), (99, "NEW", "fr", 9.9)],
        "id long, payload string, lang string, score double",
    )
    v = snap.merge_into(spark, table, src, ["id"], evolve=True)
    head = snap.read(spark, table)
    assert head.columns == ["id", "payload", "lang", "score"]
    byid = {r.id: r for r in head.collect()}
    assert byid[5].payload == "ROW5" and byid[5].score == 1.5
    assert byid[99].score == 9.9
    assert all(byid[i].score is None for i in range(20) if i != 5)
    assert snap.read(spark, table, v - 1).columns == ["id", "payload", "lang"]


def test_merge_evolve_feed_classifies_across_the_schema_change(spark, table):
    """The typed change feed reads an evolving MERGE's diff under the new
    schema: the preimage null-fills the new column, the postimage carries
    it, and unmatched source rows stay plain inserts."""
    src = spark.createDataFrame(
        [(5, "ROW5", "en", 1.5), (99, "NEW", "fr", 9.9)],
        "id long, payload string, lang string, score double",
    )
    v = snap.merge_into(spark, table, src, ["id"], evolve=True)
    got = sorted(
        (r.id, r._change_type, r.score)
        for r in snap.changes(spark, table, v - 1, v,
                              classify_updates=True).collect()
    )
    assert got == [
        (5, "update_postimage", 1.5),
        (5, "update_preimage", None),
        (99, "insert", 9.9),
    ]


def test_merge_evolve_rejects_non_additive_and_new_keys(spark, table):
    """evolve=True keeps the evolve_schema discipline: a missing or
    retyped pinned column raises, and the merge keys must be pinned."""
    with pytest.raises(ValueError, match="additive-only"):
        snap.merge_into(
            spark, table,
            spark.createDataFrame([(1, 2)], "id long, payload long"),
            ["id"], evolve=True,
        )
    with pytest.raises(ValueError, match="additive-only"):
        snap.merge_into(
            spark, table,
            spark.createDataFrame([(1,)], "id long"), ["id"], evolve=True,
        )
    with pytest.raises(ValueError, match="must be pinned"):
        snap.merge_into(
            spark, table,
            spark.createDataFrame(
                [(1, "x", "en", 0.5)],
                "id long, payload string, lang string, score double",
            ),
            ["score"], evolve=True,
        )


def test_merge_evolve_without_new_columns_is_a_plain_merge(spark, table):
    """evolve=True with a schema-identical source commits NO schema action
    (history shows a plain merge; replay cost unchanged)."""
    src = spark.createDataFrame(
        [(5, "ROW5", "en")], "id long, payload string, lang string"
    )
    v = snap.merge_into(spark, table, src, ["id"], evolve=True)
    import json

    with open(os.path.join(table, "_log", f"{v:08d}.json")) as fh:
        assert "schema" not in json.load(fh)


def test_merge_evolve_on_mapped_table_gets_fresh_physical_ids(spark, tmp_path):
    """On a column-mapped table the evolved column gets a fresh physical
    id, and a subsequent rename of it is one metadata commit."""
    root = str(tmp_path / "mapped")
    snap.create(
        spark, root,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        column_mapping=True,
    )
    snap.merge_into(
        spark, root,
        spark.createDataFrame([(3, "c", 30)], "id long, v string, w long"),
        ["id"], evolve=True,
    )
    sch = snap.table_schema(root)
    phys = {f.name: f.metadata.get("physical") for f in sch.fields}
    assert phys["w"] and phys["w"].startswith("c-")
    snap.rename_column(root, "w", "weight")
    got = {r.id: r.weight for r in snap.read(spark, root).collect()}
    assert got == {1: None, 2: None, 3: 30}


# ----------------------------------------------------------- ROW TRACKING


@pytest.fixture()
def tracked(spark, tmp_path):
    root = str(tmp_path / "tracked")
    df = spark.createDataFrame(
        [(i, f"row{i}", "de" if i % 4 == 0 else "en") for i in range(20)],
        "id long, payload string, lang string",
    )
    snap.create(spark, root, df.repartition(3), row_tracking=True)
    return root


def _rids(spark, root, version=None):
    return {
        r.id: r._row_id
        for r in snap.read_with_row_ids(spark, root, version).collect()
    }


def test_row_ids_are_dense_and_unique_at_create(spark, tracked):
    """v0 assigns ids 0..N-1: contiguous per-file base ranges from the
    stats pass's row counts, zero bytes stored in the data files."""
    ids = _rids(spark, tracked)
    assert sorted(ids.values()) == list(range(20))
    walked = snap.live_files(tracked)
    # no materialized column in fresh files: bases ride in the log
    st = snap._read_state(tracked)
    assert set(st["row_bases"]) == set(walked)


def test_row_ids_survive_every_rewrite(spark, tracked):
    """The tracking contract: COW delete, UPDATE, OPTIMIZE (which
    materializes ids into the rewritten files) and MOR delete never
    renumber a surviving row."""
    before = _rids(spark, tracked)
    snap.delete_where(spark, tracked, "lang = 'de'")
    snap.update_where(spark, tracked, "id = 1", {"payload": "'UPD'"})
    snap.compact(spark, tracked, max_files=1)
    snap.delete_where_mor(spark, tracked, "id = 7")
    after = _rids(spark, tracked)
    assert set(after) == {i for i in range(20) if i % 4 != 0 and i != 7}
    assert all(after[i] == before[i] for i in after)


def test_row_ids_append_and_merge_mint_fresh_ids(spark, tracked):
    """Fresh rows (append / merge-insert) take ids above the high
    watermark; a matched MERGE key KEEPS the replaced row's id (it is an
    UPDATE, matching the typed change feed's classification)."""
    before = _rids(spark, tracked)
    snap.append(spark, tracked, spark.createDataFrame(
        [(100, "x", "fr")], "id long, payload string, lang string"))
    src = spark.createDataFrame(
        [(2, "M2", "en"), (500, "NEW", "fr")],
        "id long, payload string, lang string",
    )
    snap.merge_into(spark, tracked, src, ["id"])
    after = _rids(spark, tracked)
    assert after[2] == before[2]                      # matched: kept
    assert after[100] == 20                           # append: watermark
    assert after[500] > max(before.values())          # insert: fresh
    assert len(set(after.values())) == len(after)     # unique table-wide


def test_row_ids_time_travel_is_era_accurate(spark, tracked):
    """Ids are stable ACROSS eras: a v0 read after rewrites shows the
    original ids, and surviving rows carry the same id at HEAD."""
    v0 = _rids(spark, tracked, 0)
    snap.delete_where(spark, tracked, "lang = 'de'")
    snap.compact(spark, tracked, max_files=1)
    assert _rids(spark, tracked, 0) == v0
    head = _rids(spark, tracked)
    assert all(head[i] == v0[i] for i in head)


def test_row_ids_survive_checkpoint_restore_and_clone(spark, tracked, tmp_path):
    """Bases and the watermark ride in checkpoints (including bases of
    REMOVED files, which RESTORE re-references) and in clones."""
    v0 = _rids(spark, tracked, 0)
    snap.delete_where(spark, tracked, "lang = 'de'")
    snap.checkpoint(tracked)
    snap.expire_log(tracked)
    head = _rids(spark, tracked)
    assert all(head[i] == v0[i] for i in head)
    dst = str(tmp_path / "fork")
    snap.clone(tracked, dst)
    assert _rids(spark, dst) == head
    # fresh ids in the clone continue above the carried watermark
    snap.append(spark, dst, spark.createDataFrame(
        [(200, "c", "fr")], "id long, payload string, lang string"))
    assert _rids(spark, dst)[200] == 20


def test_row_ids_restore_rolls_ids_back_exactly(spark, tracked):
    """RESTORE re-references pre-rewrite files; their logged bases must
    still resolve (state retains bases for removed files)."""
    v0 = _rids(spark, tracked, 0)
    snap.delete_where(spark, tracked, "lang = 'de'")
    snap.restore(spark, tracked, 0)
    assert _rids(spark, tracked) == v0


def test_row_ids_require_opt_in_and_hide_from_plain_reads(spark, tracked, table):
    """Plain reads never see the id machinery; untracked tables raise."""
    assert snap.read(spark, tracked).columns == ["id", "payload", "lang"]
    with pytest.raises(ValueError, match="row tracking"):
        snap.read_with_row_ids(spark, table)


# ------------------------------------------------------------------ TAGS


def test_tags_resolve_and_are_immutable(spark, table):
    """A tag pins a version by name; re-tagging an existing name raises
    (delete_tag + tag is the explicit re-point)."""
    snap.tag(table, "baseline", version=0)
    snap.delete_where(spark, table, "lang = 'de'")
    assert snap.tag(table, "clean") == 2  # HEAD default
    assert snap.tags(table) == {"baseline": 0, "clean": 2}
    assert snap.read_tag(spark, table, "baseline").count() == 10
    assert snap.read_tag(spark, table, "clean").count() == 15
    with pytest.raises(FileExistsError):
        snap.tag(table, "baseline", version=1)
    snap.delete_tag(table, "baseline")
    snap.tag(table, "baseline", version=1)
    assert snap.tags(table)["baseline"] == 1
    with pytest.raises(ValueError, match="no such tag"):
        snap.read_tag(spark, table, "nope")
    with pytest.raises(ValueError, match="invalid tag name"):
        snap.tag(table, "../escape")


def test_tagged_versions_survive_vacuum(spark, table):
    """VACUUM retains a tagged version's files no matter how tight the
    count window is; deleting the tag releases them."""
    snap.tag(table, "keepme", version=0)
    v0_files = set(snap.live_files(table, 0))
    snap.delete_where(spark, table, "lang = 'de'")
    snap.compact(spark, table, max_files=1)
    swept = snap.vacuum(table, retain_versions=1)
    assert not v0_files & set(swept)  # the tagged era survives
    assert snap.read_tag(spark, table, "keepme").count() == 10
    snap.delete_tag(table, "keepme")
    assert v0_files & set(snap.vacuum(table, retain_versions=1))
    with pytest.raises(Exception):
        snap.read(spark, table, 0).collect()


def test_expire_log_refuses_to_strand_a_tag(spark, table):
    """Log retention must not break a tag: expiring commits below the
    newest checkpoint raises while a tag points into the dropped era."""
    snap.tag(table, "old", version=0)
    snap.delete_where(spark, table, "lang = 'de'")
    snap.checkpoint(table)
    with pytest.raises(ValueError, match="strand"):
        snap.expire_log(table)
    snap.delete_tag(table, "old")
    assert snap.expire_log(table)


# ------------------------------------------------------ NULL-COUNT SKIPPING


def test_null_count_pruning_skips_files(spark, tmp_path):
    """IS [NOT] NULL data skipping on the per-file null counts: a file
    with zero nulls never opens for IS NULL, an all-null file never opens
    for IS NOT NULL, and answers equal the unpruned filter exactly."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(i, i * 10 if i % 3 == 0 else None) for i in range(30)],
        "id long, score long",
    )
    # cluster rows so null/non-null land in different files
    snap.create(
        spark, root,
        df.repartition(2, (F.col("id") % 3 == 0).cast("int")),
    )
    live = snap.live_files(root)
    nn = snap.pruned_files(root, not_null=["score"])
    inn = snap.pruned_files(root, is_null=["score"])
    assert len(nn) < len(live) and len(inn) < len(live)
    got_nn = sorted(
        r.id for r in snap.read_pruned(spark, root,
                                       not_null=["score"]).collect()
    )
    assert got_nn == [i for i in range(30) if i % 3 == 0]
    got_in = sorted(
        r.id for r in snap.read_pruned(spark, root,
                                       is_null=["score"]).collect()
    )
    assert got_in == [i for i in range(30) if i % 3 != 0]
    # composes with range bounds
    both = snap.read_pruned(spark, root, {"id": (0, 14)},
                            not_null=["score"])
    assert sorted(r.id for r in both.collect()) == [0, 3, 6, 9, 12]


def test_null_count_pruning_tolerates_legacy_stats(spark, tmp_path):
    """Pre-nullcount-era commits hold 2-element [min, max] stats; the
    NULL tiers must keep (never wrongly prune) such files."""
    import json as _json

    root = str(tmp_path / "legacy")
    df = spark.createDataFrame(
        [(1, None), (2, 20)], "id long, score long"
    )
    snap.create(spark, root, df.coalesce(1))
    # rewrite commit 0's stats to the legacy 2-element form
    p = os.path.join(root, "_log", "00000000.json")
    with open(p, encoding="utf-8") as fh:
        c = _json.load(fh)
    for per_file in c["stats"].values():
        for k, v in per_file.items():
            if isinstance(v, list):
                per_file[k] = v[:2]
    os.remove(p)
    with open(p, "w", encoding="utf-8") as fh:
        _json.dump(c, fh)
    assert snap.pruned_files(root, is_null=["score"]) == snap.live_files(root)
    assert snap.read_pruned(spark, root, is_null=["score"]).count() == 1


# --------------------------------------------------- PARTITION EVOLUTION


def test_partition_evolution_prunes_each_era_under_its_spec(spark, tmp_path):
    """evolve_partition_spec switches the layout for FUTURE writes only:
    old files keep pruning on their own spec, new files on the new one,
    and read answers never change."""
    from pyspark.sql import functions as F  # noqa: F401

    root = str(tmp_path / "pevo")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en", i * 10) for i in range(40)],
        "id long, lang string, chars long",
    )
    snap.create(spark, root, df.filter("id < 20").repartition(2),
                partition_by=["lang"])
    snap.evolve_partition_spec(
        root, [{"source": "id", "transform": "truncate", "param": 10}]
    )
    snap.append(spark, root, df.filter("id >= 20").repartition(2))
    live = snap.live_files(root)
    # old era: lang=en files skipped for a de-only bound
    pl = snap.pruned_files(root, {"lang": ("de", "de")})
    assert len(pl) < len(live)
    assert not [f for f in pl if "=en" in f]
    # new era: only the id DIV 10 = 3 bucket opens (old era pruned by
    # id stats as well — its files hold id < 20)
    pi = snap.pruned_files(root, {"id": (30, 35)})
    assert pi and all("__p_0=3" in f for f in pi)
    got = sorted(
        r.id for r in snap.read_pruned(spark, root, {"id": (30, 35)}).collect()
    )
    assert got == list(range(30, 36))


def test_partition_evolution_optimize_migrates_layout(spark, tmp_path):
    """OPTIMIZE after a spec change rewrites everything into the CURRENT
    layout (Iceberg's lazy migration) bit-identically."""
    root = str(tmp_path / "pevo2")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en") for i in range(20)],
        "id long, lang string",
    )
    snap.create(spark, root, df, partition_by=["lang"])
    snap.evolve_partition_spec(
        root, [{"source": "id", "transform": "truncate", "param": 5}]
    )
    snap.compact(spark, root, max_files=1)
    assert sorted(r.id for r in snap.read(spark, root).collect()) == list(range(20))
    # every live file now lives in the new bucket layout
    assert all("__p_0=" in f for f in snap.live_files(root))
    pi = snap.pruned_files(root, {"id": (5, 9)})
    assert pi and all("__p_0=1" in f for f in pi)


def test_partition_evolution_survives_checkpoint_expiry(spark, tmp_path):
    """The per-era spec union rides in checkpoints, so old-era pruning
    still works after the original spec's commit JSON is expired."""
    root = str(tmp_path / "pevo3")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en") for i in range(20)],
        "id long, lang string",
    )
    snap.create(spark, root, df, partition_by=["lang"])
    snap.evolve_partition_spec(root, [])  # un-partition future writes
    snap.append(spark, root, spark.createDataFrame(
        [(100, "fr")], "id long, lang string"))
    snap.checkpoint(root)
    snap.expire_log(root)
    pl = snap.pruned_files(root, {"lang": ("de", "de")})
    assert not [f for f in pl if "=en" in f]
    assert len(pl) < len(snap.live_files(root))


def test_partition_evolution_rejects_unknown_sources(spark, tmp_path):
    root = str(tmp_path / "pevo4")
    snap.create(spark, root, spark.createDataFrame(
        [(1, "a")], "id long, v string"))
    with pytest.raises(ValueError, match="not in schema"):
        snap.evolve_partition_spec(root, ["nope"])


# ----------------------------------------------------------- MOR UPDATE


def test_update_mor_rewrites_nothing(spark, table):
    """Merge-on-read UPDATE: originals stay live (DV'd), postimages
    append, answers match the COW update exactly."""
    files0 = set(snap.live_files(table))
    v = snap.update_where_mor(spark, table, "id % 4 = 0",
                              {"payload": "upper(payload)"})
    assert files0 <= set(snap.live_files(table))
    rows = {r.id: r.payload for r in snap.read(spark, table).collect()}
    assert len(rows) == 20
    assert all(rows[i] == f"ROW{i}" for i in range(0, 20, 4))
    assert all(rows[i] == f"row{i}" for i in range(20) if i % 4)
    # exact typed feed, no diffing
    ch = sorted(
        (r.id, r._change_type)
        for r in snap.changes(spark, table, v - 1, v).collect()
    )
    assert ch == sorted(
        [(i, "update_preimage") for i in range(0, 20, 4)]
        + [(i, "update_postimage") for i in range(0, 20, 4)]
    )
    # time travel is untouched; a second update supersedes the DV
    assert snap.read(spark, table, v - 1).filter(
        "payload = 'ROW0'").count() == 0
    snap.update_where_mor(spark, table, "id = 0", {"payload": "'zero'"})
    rows2 = {r.id: r.payload for r in snap.read(spark, table).collect()}
    assert rows2[0] == "zero" and rows2[4] == "ROW4" and len(rows2) == 20


def test_update_mor_null_predicate_and_guards(spark, tmp_path):
    """Predicate-NULL rows are not updated; unknown SET columns raise;
    constraints validate the postimage."""
    root = str(tmp_path / "umor")
    df = spark.createDataFrame(
        [(1, "de", 5), (2, None, 6), (3, "en", 7)],
        "id long, lang string, v long",
    )
    snap.create(spark, root, df, check_constraints={"pos_v": "v >= 0"})
    snap.update_where_mor(spark, root, "lang = 'de'", {"v": "v + 1"})
    assert {r.id: r.v for r in snap.read(spark, root).collect()} == \
        {1: 6, 2: 6, 3: 7}
    with pytest.raises(ValueError, match="unknown columns"):
        snap.update_where_mor(spark, root, "TRUE", {"nope": "1"})
    with pytest.raises(ValueError, match="pos_v"):
        snap.update_where_mor(spark, root, "id = 3", {"v": "-1"})


def test_update_mor_preserves_row_ids_and_compacts_away(spark, tmp_path):
    """Row tracking: the appended postimages materialize the matched
    rows' ids; OPTIMIZE folds the DVs and keeps everything stable."""
    root = str(tmp_path / "umor_rid")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(12)], "id long, v long"
    )
    snap.create(spark, root, df.repartition(2), row_tracking=True)
    before = {
        r.id: r._row_id
        for r in snap.read_with_row_ids(spark, root).collect()
    }
    snap.update_where_mor(spark, root, "id % 3 = 0", {"v": "v + 1"})
    snap.compact(spark, root, max_files=1)
    after = {
        r.id: r._row_id
        for r in snap.read_with_row_ids(spark, root).collect()
    }
    assert after == before
    assert snap.dv_map(root) == {}


# ---------------------------------------------------------------------------
# r09 ADVICE fixes: truncate-prune sign handling, create() overwrite guard,
# reserved internal column names
# ---------------------------------------------------------------------------


def test_truncate_prune_negative_values(spark, tmp_path):
    """r09 ADVICE #1: Spark DIV truncates toward zero while Python //
    floors — a negative probe bound must map to the bucket the writer
    recorded, or pruning silently drops matching rows."""
    root = str(tmp_path / "trunc_neg")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(-10, 11)], "k long, payload string"
    )
    snap.create(
        spark, root, df.repartition(1),
        partition_by=[{"name": "kb", "transform": "truncate",
                       "source": "k", "param": 2}],
    )
    # every point probe must keep the file holding that key
    for lo in range(-10, 11):
        kept = snap.pruned_files(root, {"k": (lo, lo)})
        got = {
            r.k
            for r in snap._scan_files(
                spark, root, kept, snap.table_schema(root), {}
            ).collect()
        }
        assert lo in got, f"pruned away the file containing k={lo}"
    # and range probes spanning zero keep all matching rows
    rows = snap.read_pruned(spark, root, {"k": (-7, -3)}).filter(
        "k BETWEEN -7 AND -3"
    )
    assert sorted(r.k for r in rows.collect()) == [-7, -6, -5, -4, -3]


def test_create_refuses_to_overwrite_existing_table(spark, tmp_path):
    """r09 ADVICE #3: CREATE over an existing _log raises unless
    overwrite=True is explicit (Delta's CREATE contract)."""
    root = str(tmp_path / "guard")
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    snap.create(spark, root, df)
    with pytest.raises(FileExistsError, match="already exists"):
        snap.create(spark, root, df)
    # the refused attempt destroyed nothing
    assert snap.read(spark, root).count() == 1
    snap.create(spark, root, df.union(df), overwrite=True)
    assert snap.read(spark, root).count() == 2


def test_reserved_column_names_rejected(spark, tmp_path):
    """r09 ADVICE #4: protocol-internal column names (__nrows, __rid,
    __src, __pos, __p_<i>, _change_type) fail loudly at every
    schema-setting path instead of corrupting stats/lineage/CDF."""
    root = str(tmp_path / "resv")
    for bad in ("__nrows", "__rid", "__src", "__pos", "__p_0",
                "_change_type"):
        df = spark.createDataFrame([(1, 2)], f"id long, `{bad}` long")
        with pytest.raises(ValueError, match="reserved"):
            snap.create(spark, root, df)
    ok = spark.createDataFrame([(1, 2)], "id long, v long")
    snap.create(spark, root, ok)
    with pytest.raises(ValueError, match="reserved"):
        snap.evolve_schema(
            spark, root,
            spark.createDataFrame([(1, 2, 3)], "id long, v long, `__src` long"),
        )
    with pytest.raises(ValueError, match="reserved"):
        snap.merge_into(
            spark, root,
            spark.createDataFrame([(1, 2, 3)], "id long, v long, `__pos` long"),
            ["id"], evolve=True,
        )


# ---------------------------------------------------------------------------
# VERDICT r09 #2: the concurrent-writer conflict matrix — lost races rebase
# iff the winners are logically non-conflicting (disjoint files, no metadata)
# ---------------------------------------------------------------------------


def _race(monkeypatch, loser_op: str, winner):
    """Deterministic commit race: the FIRST _write_commit carrying
    ``loser_op`` first lets ``winner()`` publish (stealing the version
    number), then proceeds — so the loser loses the O_EXCL race exactly
    once and its retry/conflict path runs."""
    orig = snap._write_commit
    fired = {"done": False}

    def racy(root, version, add, remove, **kw):
        if not fired["done"] and kw.get("op") == loser_op:
            fired["done"] = True
            winner()
        return orig(root, version, add, remove, **kw)

    monkeypatch.setattr(snap, "_write_commit", racy)
    return fired


def test_concurrent_append_vs_delete_both_commit(spark, monkeypatch, tmp_path):
    """append ∥ DELETE: the append wins the race; the delete's rebase sees
    a disjoint-file data commit and re-publishes — both land, final state
    is append's rows minus the deleted ones (WriteSerializable)."""
    root = str(tmp_path / "c1")
    df = spark.createDataFrame(
        [(i, "de" if i < 4 else "en") for i in range(10)],
        "id long, lang string",
    )
    snap.create(spark, root, df)
    extra = spark.createDataFrame([(100, "fr"), (101, "fr")],
                                  "id long, lang string")
    fired = _race(monkeypatch, "delete",
                  lambda: snap.append(spark, root, extra))
    v = snap.delete_where(spark, root, "lang = 'de'", max_retries=1)
    assert fired["done"] and v == 2  # append took v1, delete rebased to v2
    got = sorted(r.id for r in snap.read(spark, root).collect())
    assert got == [4, 5, 6, 7, 8, 9, 100, 101]
    assert [h["operation"] for h in snap.history(root)] == \
        ["delete", "append", "create"]


def test_concurrent_delete_delete_same_file_raises(spark, monkeypatch, tmp_path):
    """DELETE ∥ DELETE touching the same file: the loser's rewrite was
    derived from a superseded copy — ConcurrentWriteConflict, retries or
    not (Delta's ConcurrentDeleteDelete)."""
    root = str(tmp_path / "c2")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en") for i in range(10)],
        "id long, lang string",
    )
    snap.create(spark, root, df.coalesce(1))  # one file: guaranteed overlap
    fired = _race(monkeypatch, "delete",
                  lambda: snap.delete_where(spark, root, "id = 1"))
    with pytest.raises(snap.ConcurrentWriteConflict, match="same files"):
        snap.delete_where(spark, root, "lang = 'de'", max_retries=3)
    assert fired["done"]
    # the winner's delete stands; the loser published nothing
    got = sorted(r.id for r in snap.read(spark, root).collect())
    assert got == [0, 2, 3, 4, 5, 6, 7, 8, 9]


def test_concurrent_optimize_vs_append_rebases(spark, monkeypatch, tmp_path):
    """OPTIMIZE ∥ append (Delta's dataChange=false rule): the compaction
    only rearranges files the append didn't touch — rebase, both land."""
    root = str(tmp_path / "c3")
    df = spark.createDataFrame([(i,) for i in range(20)], "id long")
    snap.create(spark, root, df.repartition(6))
    extra = spark.createDataFrame([(100,)], "id long")
    fired = _race(monkeypatch, "optimize",
                  lambda: snap.append(spark, root, extra))
    v = snap.compact(spark, root, max_files=1, max_retries=1)
    assert fired["done"] and v == 2
    got = sorted(r.id for r in snap.read(spark, root).collect())
    assert got == sorted(list(range(20)) + [100])
    # the change feed skips the rebased OPTIMIZE (data_change=False held)
    assert [h["operation"] for h in snap.history(root)] == \
        ["optimize", "append", "create"]


def test_concurrent_partition_disjoint_dml_both_commit(spark, monkeypatch, tmp_path):
    """DELETE in partition A ∥ MOR-UPDATE in partition B: disjoint live
    files → both commit (the partition row of the conflict matrix)."""
    root = str(tmp_path / "c4")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en", i * 10) for i in range(10)],
        "id long, lang string, v long",
    )
    snap.create(spark, root, df, partition_by=["lang"])
    fired = _race(
        monkeypatch, "update_mor",
        lambda: snap.delete_where(spark, root, "lang = 'de' AND id = 0"))
    v = snap.update_where_mor(spark, root, "lang = 'en' AND id = 1",
                              {"v": "v + 1"}, max_retries=1)
    assert fired["done"] and v == 2
    rows = {r.id: r.v for r in snap.read(spark, root).collect()}
    assert 0 not in rows and rows[1] == 11 and len(rows) == 9


def test_concurrent_metadata_change_raises(spark, monkeypatch, tmp_path):
    """Any metadata commit (constraint/schema/spec) conflicts with every
    concurrent writer — the loser validated against superseded metadata."""
    root = str(tmp_path / "c5")
    df = spark.createDataFrame([(i, i * 2) for i in range(8)],
                               "id long, v long")
    snap.create(spark, root, df)
    fired = _race(monkeypatch, "delete",
                  lambda: snap.add_constraint(spark, root, "pos_v", "v >= 0"))
    with pytest.raises(snap.ConcurrentWriteConflict, match="metadata"):
        snap.delete_where(spark, root, "id = 3", max_retries=3)
    assert fired["done"]


def test_concurrent_mor_delete_vs_append_rebases(spark, monkeypatch, tmp_path):
    """MOR DELETE ∥ append: the DV references only pre-existing files —
    disjoint from the append's fresh ones → rebase, and the DV still
    kills exactly the matched rows."""
    root = str(tmp_path / "c6")
    df = spark.createDataFrame(
        [(i, "de" if i % 4 == 0 else "en") for i in range(12)],
        "id long, lang string",
    )
    snap.create(spark, root, df)
    extra = spark.createDataFrame([(100, "en")], "id long, lang string")
    fired = _race(monkeypatch, "delete_mor",
                  lambda: snap.append(spark, root, extra))
    v = snap.delete_where_mor(spark, root, "lang = 'de'", max_retries=1)
    assert fired["done"] and v == 2
    got = sorted(r.id for r in snap.read(spark, root).collect())
    assert got == [1, 2, 3, 5, 6, 7, 9, 10, 11, 100]
    # replication invariant: v0 + feed == HEAD still folds through the race
    ch = snap.changes(spark, root, 1, 2)
    assert ch.filter("_change_type = 'delete'").count() == 3


def test_concurrent_threaded_disjoint_writers_soak(spark, tmp_path):
    """A real (threaded) interleaving: one appender and one per-partition
    MOR deleter race on live O_EXCL commits with retries; every commit
    lands and the final state is order-independent (the append's rows
    never match the delete predicates)."""
    import threading

    root = str(tmp_path / "soak")
    df = spark.createDataFrame(
        [(i, ["de", "en", "fr"][i % 3]) for i in range(30)],
        "id long, lang string",
    )
    snap.create(spark, root, df, partition_by=["lang"])
    errs = []

    def appender():
        try:
            for k in range(3):
                snap.append(
                    spark, root,
                    spark.createDataFrame([(1000 + k, "xx")],
                                          "id long, lang string"),
                    max_retries=8)
        except Exception as ex:  # pragma: no cover - surfaced below
            errs.append(ex)

    def deleter():
        try:
            for lang in ("de", "fr"):
                snap.delete_where_mor(spark, root, f"lang = '{lang}'",
                                      max_retries=8)
        except Exception as ex:  # pragma: no cover - surfaced below
            errs.append(ex)

    ts = [threading.Thread(target=appender), threading.Thread(target=deleter)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = sorted(r.id for r in snap.read(spark, root).collect())
    expect = sorted([i for i in range(30) if i % 3 == 1] + [1000, 1001, 1002])
    assert got == expect
    assert snap.latest_version(root) == 5  # create + 3 appends + 2 deletes


# ---------------------------------------------------------------------------
# VERDICT r09 #3: writable branches — write-audit-publish with fast-forward
# merge, rebase merge, cherry-pick, and retention integration
# ---------------------------------------------------------------------------


@pytest.fixture()
def brtable(spark, tmp_path):
    root = str(tmp_path / "btbl")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en", i * 10) for i in range(8)],
        "id long, lang string, v long",
    )
    snap.create(spark, root, df.repartition(2))
    return root


def _ids(spark, root):
    return sorted(r.id for r in snap.read(spark, root).collect())


def test_branch_writes_are_isolated_and_ff_merge_publishes(spark, brtable):
    """Write-audit-publish: branch commits are invisible to main until a
    fast-forward merge publishes the chain; afterwards the merged chain
    IS main's history and the change feed replays identically."""
    base = snap.create_branch(brtable, "audit")
    broot = snap.branch_root(brtable, "audit")
    extra = spark.createDataFrame([(100, "fr", 1), (101, "fr", 2)],
                                  "id long, lang string, v long")
    snap.append(spark, broot, extra)
    snap.delete_where(spark, broot, "id = 0")
    # isolation: main unchanged, branch sees both commits
    assert _ids(spark, brtable) == list(range(8))
    assert _ids(spark, broot) == [1, 2, 3, 4, 5, 6, 7, 100, 101]
    assert snap.latest_version(brtable) == base == 0
    assert snap.branches(brtable) == {"audit": {"base": 0, "head": 2}}
    # audit the branch, then publish: fast-forward (main never moved)
    feed_before = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in snap.changes(spark, broot, 0, 2).collect()
    )
    head = snap.merge_branch(spark, brtable, "audit")
    assert head == 2
    assert _ids(spark, brtable) == [1, 2, 3, 4, 5, 6, 7, 100, 101]
    assert snap.branches(brtable) == {}
    feed_after = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in snap.changes(spark, brtable, 0, 2).collect()
    )
    assert {t[1] for t in feed_after} == {"insert", "delete"}
    assert feed_after == feed_before
    assert [h["operation"] for h in snap.history(brtable)] == \
        ["delete", "append", "create"]


def test_branch_merge_rebases_past_disjoint_main_commits(spark, brtable):
    """Main advances while the branch is open: the merge renumbers the
    branch chain after main's head when every pairing is disjoint."""
    snap.create_branch(brtable, "wip")
    broot = snap.branch_root(brtable, "wip")
    snap.append(spark, broot,
                spark.createDataFrame([(100, "fr", 1)],
                                      "id long, lang string, v long"))
    # main moves on independently (fresh files — disjoint)
    snap.append(spark, brtable,
                spark.createDataFrame([(200, "zh", 2)],
                                      "id long, lang string, v long"))
    head = snap.merge_branch(spark, brtable, "wip")
    assert head == 2
    assert _ids(spark, brtable) == list(range(8)) + [100, 200]


def test_branch_merge_same_file_conflict_raises(spark, tmp_path):
    """Branch and main both rewrote the same base file: the merge must
    raise, publish nothing, and leave the branch intact."""
    root = str(tmp_path / "conf")
    df = spark.createDataFrame(
        [(i, "x", i * 10) for i in range(8)], "id long, lang string, v long")
    snap.create(spark, root, df.coalesce(1))  # one file: guaranteed overlap
    snap.create_branch(root, "risky")
    broot = snap.branch_root(root, "risky")
    snap.delete_where(spark, broot, "id = 1")
    snap.delete_where(spark, root, "id = 3")
    with pytest.raises(snap.ConcurrentWriteConflict, match="same files"):
        snap.merge_branch(spark, root, "risky", max_retries=3)
    assert "risky" in snap.branches(root)
    assert _ids(spark, root) == [0, 1, 2, 4, 5, 6, 7]  # main's own delete only


def test_branch_metadata_commit_merges_only_fast_forward(spark, brtable):
    """A branch that evolved the schema merges only by fast-forward; if
    main advanced, the metadata row of the conflict matrix applies."""
    snap.create_branch(brtable, "schema")
    broot = snap.branch_root(brtable, "schema")
    evolved = spark.createDataFrame(
        [(300, "fr", 5, 9)], "id long, lang string, v long, extra long")
    snap.evolve_schema(spark, broot, evolved)
    snap.append(spark, brtable,
                spark.createDataFrame([(200, "zh", 2)],
                                      "id long, lang string, v long"))
    with pytest.raises(snap.ConcurrentWriteConflict, match="metadata"):
        snap.merge_branch(spark, brtable, "schema", max_retries=3)
    # on a fresh branch with quiet main, the same merge fast-forwards
    snap.delete_branch(brtable, "schema")
    snap.create_branch(brtable, "schema2")
    b2 = snap.branch_root(brtable, "schema2")
    snap.evolve_schema(spark, b2, evolved)
    snap.merge_branch(spark, brtable, "schema2")
    assert "extra" in [f.name for f in snap.table_schema(brtable).fields]
    assert snap.read(spark, brtable).filter("extra = 9").count() == 1


def test_cherry_pick_independent_commit_only(spark, brtable):
    """Cherry-pick publishes one independent branch commit; a commit
    whose files depend on an earlier un-picked one refuses."""
    snap.create_branch(brtable, "picks")
    broot = snap.branch_root(brtable, "picks")
    snap.append(spark, broot,
                spark.createDataFrame([(100, "fr", 1)],
                                      "id long, lang string, v long"))  # v1
    snap.delete_where(spark, broot, "id = 100")  # v2: depends on v1's file
    snap.append(spark, broot,
                spark.createDataFrame([(101, "zh", 2)],
                                      "id long, lang string, v long"))  # v3
    with pytest.raises(snap.ConcurrentWriteConflict, match="depends on"):
        snap.cherry_pick(spark, brtable, "picks", 2)
    v = snap.cherry_pick(spark, brtable, "picks", 3)
    assert v == 1
    assert _ids(spark, brtable) == list(range(8)) + [101]
    # the branch is untouched and still readable (its own v2 delete
    # removed the 100 row on the branch)
    assert _ids(spark, snap.branch_root(brtable, "picks")) == \
        list(range(8)) + [101]


def test_vacuum_and_expire_respect_branches(spark, brtable):
    """VACUUM keeps every file an un-merged branch references (its base
    state and its own adds); expire_log refuses to strand a branch base
    below the newest checkpoint."""
    snap.create_branch(brtable, "keepme")
    broot = snap.branch_root(brtable, "keepme")
    snap.append(spark, broot,
                spark.createDataFrame([(100, "fr", 1)],
                                      "id long, lang string, v long"))
    # main churns: delete + compact, then vacuum HEAD-only
    snap.delete_where(spark, brtable, "id = 0")
    snap.compact(spark, brtable, max_files=1)
    snap.vacuum(brtable, retain_versions=1)
    # the branch still reads: base files + its own append survived
    assert _ids(spark, broot) == list(range(8)) + [100]
    snap.checkpoint(brtable)
    with pytest.raises(ValueError, match="strand branch"):
        snap.expire_log(brtable)
    # merging resolves the stranding — conflict check: branch's append is
    # disjoint from main's delete+compact → rebase merge lands
    snap.merge_branch(spark, brtable, "keepme", max_retries=1)
    assert _ids(spark, brtable) == list(range(1, 8)) + [100]
    assert snap.expire_log(brtable)


def test_branch_merge_remints_row_ids(spark, tmp_path):
    """Both sides minted fresh row ids from the same watermark: the merge
    re-mints the branch commits' bases so ids never collide."""
    root = str(tmp_path / "ridbr")
    df = spark.createDataFrame([(i, i * 2) for i in range(6)],
                               "id long, v long")
    snap.create(spark, root, df, row_tracking=True)
    snap.create_branch(root, "b")
    broot = snap.branch_root(root, "b")
    snap.append(spark, broot,
                spark.createDataFrame([(100, 1), (101, 2)], "id long, v long"))
    snap.append(spark, root,
                spark.createDataFrame([(200, 3), (201, 4)], "id long, v long"))
    snap.merge_branch(spark, root, "b", max_retries=1)
    rows = snap.read_with_row_ids(spark, root).collect()
    rids = [r._row_id for r in rows]
    assert len(rids) == len(set(rids)) == 10
    assert sorted(r.id for r in rows) == [0, 1, 2, 3, 4, 5, 100, 101, 200, 201]


def test_branch_merge_resumes_after_partial_publication(
        spark, brtable, monkeypatch):
    """r10 ADVICE #2: a merge that crashes after publishing part of the
    branch chain must be resumable without republishing — the re-run
    reads the `merged_from` stamps off main's (immutable) commit JSONs,
    skips the branch versions already published (even APPENDs, whose
    _commit_touched() is empty and therefore invisible to the conflict
    check), and publishes only the remainder."""
    snap.create_branch(brtable, "big")
    broot = snap.branch_root(brtable, "big")
    for k in range(3):
        snap.append(spark, broot, spark.createDataFrame(
            [(100 + k, "fr", k)], "id long, lang string, v long"))
    real = snap._publish_raw
    calls = {"n": 0}

    def crashing(root, version, payload):
        real(root, version, payload)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash mid-merge")

    monkeypatch.setattr(snap, "_publish_raw", crashing)
    with pytest.raises(RuntimeError, match="mid-merge"):
        snap.merge_branch(spark, brtable, "big")
    monkeypatch.setattr(snap, "_publish_raw", real)
    # partial state: one branch commit landed on main, ref still present
    assert snap.latest_version(brtable) == 1
    assert "big" in snap.branches(brtable)
    assert _ids(spark, brtable) == list(range(8)) + [100]
    # the re-run completes, publishing ONLY the two remaining commits
    head = snap.merge_branch(spark, brtable, "big")
    assert head == 3
    assert _ids(spark, brtable) == list(range(8)) + [100, 101, 102]
    assert snap.branches(brtable) == {}
    # and a third run is a no-op (the branch is gone)
    with pytest.raises(Exception):
        snap.merge_branch(spark, brtable, "big")


def test_branch_recreated_name_ignores_stale_merge_stamps(
        spark, brtable, monkeypatch):
    """A branch deleted after a partial merge and re-created under the
    SAME name at the SAME base must not match the crashed merge's
    stamps — the fork token differs, so every new-branch commit
    publishes (matching on name+base alone would silently DROP the new
    branch's first commit)."""
    snap.create_branch(brtable, "wap", version=0)
    broot = snap.branch_root(brtable, "wap")
    for k in range(2):
        snap.append(spark, broot, spark.createDataFrame(
            [(100 + k, "fr", k)], "id long, lang string, v long"))
    real = snap._publish_raw
    calls = {"n": 0}

    def crashing(root, version, payload):
        real(root, version, payload)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash mid-merge")

    monkeypatch.setattr(snap, "_publish_raw", crashing)
    with pytest.raises(RuntimeError, match="mid-merge"):
        snap.merge_branch(spark, brtable, "wap")
    monkeypatch.setattr(snap, "_publish_raw", real)
    assert _ids(spark, brtable) == list(range(8)) + [100]
    # operator gives up on the old merge: drop the ref, re-fork at the
    # SAME base under the SAME name, and do new work whose first branch
    # version number (base+1 = 1) collides with the crashed merge's
    # first published bv stamp
    snap.delete_branch(brtable, "wap")
    snap.create_branch(brtable, "wap", version=0)
    broot = snap.branch_root(brtable, "wap")
    snap.append(spark, broot, spark.createDataFrame(
        [(300, "zh", 9)], "id long, lang string, v long"))
    head = snap.merge_branch(spark, brtable, "wap")
    assert head == 2
    assert _ids(spark, brtable) == list(range(8)) + [100, 300]


# ---------------------------------------------------------------------------
# VERDICT r09 #4: persisted ANN index metadata — versioned with the table
# ---------------------------------------------------------------------------


def test_index_persists_time_travels_and_survives_checkpoint(spark, tmp_path):
    root = str(tmp_path / "idx")
    df = spark.createDataFrame([(i, i * 2) for i in range(8)],
                               "id long, v long")
    snap.create(spark, root, df)
    payload = {"cent": [0.1, 0.2], "cb": [[1.0, 2.0], [3.0, 4.0]],
               "params": {"m": 2, "k": 2}}
    v1 = snap.put_index(root, "ivfpq", payload)
    assert v1 == 1
    got = snap.get_index(root, "ivfpq")
    assert got["index"] == payload and got["trained_at"] == 0
    # time travel: no index at v0; a replaced index resolves per version
    with pytest.raises(ValueError, match="no index"):
        snap.get_index(root, "ivfpq", 0)
    snap.append(spark, root, spark.createDataFrame([(100, 1)],
                                                   "id long, v long"))
    payload2 = {**payload, "cent": [0.9, 0.8]}
    v3 = snap.put_index(root, "ivfpq", payload2)
    assert snap.get_index(root, "ivfpq", v1)["index"] == payload
    assert snap.get_index(root, "ivfpq")["index"] == payload2
    assert snap.get_index(root, "ivfpq")["trained_at"] == v3 - 1
    # index commits are skipped by the CDF like OPTIMIZE
    assert snap.changes(spark, root, v3 - 1, v3).count() == 0
    # staleness: rows changed since training = the feed since trained_at
    stale = snap.changes(
        spark, root, snap.get_index(root, "ivfpq")["trained_at"]).count()
    assert stale == 0  # trained at v2 (post-append); nothing after
    # checkpoint + expire: the index state survives via the checkpoint
    snap.checkpoint(root)
    snap.expire_log(root)
    assert snap.get_index(root, "ivfpq")["index"] == payload2


def test_index_vacuum_retention_and_drop(spark, tmp_path):
    root = str(tmp_path / "idxvac")
    df = spark.createDataFrame([(i,) for i in range(6)], "id long")
    snap.create(spark, root, df)
    snap.put_index(root, "a", {"x": 1})
    snap.compact(spark, root, max_files=1)
    snap.vacuum(root, retain_versions=1)
    # the artifact survived HEAD-only vacuum (live index)
    assert snap.get_index(root, "a")["index"] == {"x": 1}
    art = snap.get_index(root, "a")["artifact"]
    snap.drop_index(root, "a")
    with pytest.raises(ValueError, match="no index"):
        snap.get_index(root, "a")
    snap.vacuum(root, retain_versions=1)
    assert not os.path.exists(os.path.join(root, art))  # swept with drop
    # a dropped name can be re-put
    snap.put_index(root, "a", {"x": 2})
    assert snap.get_index(root, "a")["index"] == {"x": 2}


def test_index_does_not_conflict_with_concurrent_dml(spark, monkeypatch, tmp_path):
    """Index commits are advisory: a DML writer losing a race to
    put_index rebases straight past it."""
    root = str(tmp_path / "idxconc")
    df = spark.createDataFrame([(i,) for i in range(6)], "id long")
    snap.create(spark, root, df)
    fired = _race(monkeypatch, "delete",
                  lambda: snap.put_index(root, "b", {"y": 1}))
    v = snap.delete_where(spark, root, "id = 2", max_retries=1)
    assert fired["done"] and v == 2
    assert snap.get_index(root, "b")["index"] == {"y": 1}
    assert sorted(r.id for r in snap.read(spark, root).collect()) == \
        [0, 1, 3, 4, 5]


def test_full_dml_soak_with_racing_appends(spark, tmp_path):
    """The randomized DML soak EXTENDED WITH CONCURRENT INTERLEAVINGS
    (VERDICT r09 #2's done-criterion): each DML/OPTIMIZE step may lose
    its commit race to an injected append (the deterministic `_race`
    harness) and must rebase through the conflict matrix. Semantics
    under WriteSerializable: the racing op's payload was computed
    against the PRE-append snapshot, so the injected row always survives
    the op — the model applies the op first, then adds the injected row.
    After every sequence the head read equals the model and v0 + the
    change feed folds to HEAD."""
    import random

    from collections import Counter

    for seed in (7, 23):
        rnd = random.Random(seed)
        root = str(tmp_path / f"racesoak{seed}")

        def mk(rows):
            return spark.createDataFrame(
                [(i, p, v) for i, p, v in rows],
                "id long, payload string, val long",
            )

        model = {i: (f"p{i}", i * 10) for i in range(12)}
        snap.create(spark, root, mk([(i, *model[i]) for i in sorted(model)]))
        history = [(0, dict(model))]
        next_id = [12]

        def race(op_name, fn):
            """Run fn() with an append stealing its first commit slot."""
            inj = [(next_id[0], "rr", 777)]
            next_id[0] += 1
            orig = snap._write_commit
            fired = {"done": False}

            def racy(r_, version, add, remove, **kw):
                if not fired["done"] and kw.get("op") == op_name:
                    fired["done"] = True
                    snap.append(spark, root, mk(inj))
                return orig(r_, version, add, remove, **kw)

            snap._write_commit = racy
            try:
                fn()
            finally:
                snap._write_commit = orig
            assert fired["done"]
            return inj

        for step in range(8):
            op = rnd.choice(
                ["append", "delete", "mor", "update", "merge",
                 "optimize", "restore"]
            )
            racing = op in ("delete", "mor", "update", "merge",
                            "optimize") and rnd.random() < 0.5
            inj = []
            if op == "append":
                rows = [(next_id[0] + j, f"a{step}_{j}", j) for j in range(3)]
                snap.append(spark, root, mk(rows))
                for i, p, v in rows:
                    model[i] = (p, v)
                next_id[0] += 3
            elif op == "delete":
                m = rnd.randint(2, 5)
                fn = lambda: snap.delete_where(  # noqa: E731
                    spark, root, f"id % {m} = 0", max_retries=4)
                if racing:
                    inj = race("delete", fn)
                else:
                    fn()
                model = {i: r for i, r in model.items() if i % m != 0}
            elif op == "mor":
                m = rnd.randint(2, 5)
                cdf = rnd.random() < 0.5
                fn = lambda: snap.delete_where_mor(  # noqa: E731
                    spark, root, f"val % {m} = 1", cdf=cdf, max_retries=4)
                if racing:
                    inj = race("delete_mor", fn)
                else:
                    fn()
                model = {i: r for i, r in model.items() if r[1] % m != 1}
            elif op == "update":
                m = rnd.randint(2, 4)
                fn = lambda: snap.update_where(  # noqa: E731
                    spark, root, f"id % {m} = 1",
                    {"val": "val + 1000", "payload": "concat(payload, 'u')"},
                    max_retries=4)
                if racing:
                    inj = race("update", fn)
                else:
                    fn()
                model = {
                    i: ((p + "u", v + 1000) if i % m == 1 else (p, v))
                    for i, (p, v) in model.items()
                }
            elif op == "merge":
                pool = sorted(model) or [0]
                ids = sorted({rnd.choice(pool), next_id[0]})
                rows = [(i, f"m{step}_{i}", i) for i in ids]
                next_id[0] += 1
                fn = lambda: snap.merge_into(  # noqa: E731
                    spark, root, mk(rows), ["id"], max_retries=4)
                if racing:
                    inj = race("merge", fn)
                else:
                    fn()
                for i, p, v in rows:
                    model[i] = (p, v)
            elif op == "optimize":
                fn = lambda: snap.compact(  # noqa: E731
                    spark, root, max_files=2, max_retries=4)
                if racing:
                    inj = race("optimize", fn)
                else:
                    fn()
            else:  # restore — never races (no retry support by design)
                v, m = history[rnd.randrange(len(history))]
                snap.restore(spark, root, v)
                model = dict(m)
            # the injected racing append always survives (WriteSerializable)
            for i, p, v in inj:
                model[i] = (p, v)
            history.append((snap.latest_version(root), dict(model)))

        got = {
            r.id: (r.payload, r.val)
            for r in snap.read(spark, root).collect()
        }
        assert got == model, f"seed {seed}: head != model"

        cnt: Counter = Counter()
        for r in snap.changes(spark, root, 0).collect():
            sign = (
                1 if r._change_type in ("insert", "update_postimage") else -1
            )
            cnt[(r.id, r.payload, r.val)] += sign
        for r in snap.read(spark, root, 0).collect():
            cnt[(r.id, r.payload, r.val)] += 1
        fold = sorted(k for k, n in cnt.items() for _ in range(n))
        head = sorted(
            (r.id, r.payload, r.val)
            for r in snap.read(spark, root).collect()
        )
        assert fold == head, f"seed {seed}: fold != head"


def test_writer_protocol_gates_every_writer(spark, tmp_path):
    """Two-sided protocol (Delta's reader+writer versions): a table
    demanding a newer WRITER refuses every commit path of this engine
    while reads keep working; upgrade_protocol only raises requirements
    and never past what the stamper itself supports."""
    root = str(tmp_path / "wproto")
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    snap.create(spark, root, df)
    # fresh tables stamp both sides at this engine's versions
    st = snap._read_state(root)["protocol"]
    assert st == {"reader": snap._READER_VERSION,
                  "writer": snap._WRITER_VERSION}
    with pytest.raises(ValueError, match="does not support"):
        snap.upgrade_protocol(root, writer=snap._WRITER_VERSION + 1)
    # simulate a future engine's stamp (raw commit, like a newer writer)
    snap._write_commit(root, snap.latest_version(root) + 1, [], [],
                       protocol={"reader": 1,
                                 "writer": snap._WRITER_VERSION + 1},
                       op="upgrade_protocol", data_change=False)
    # reads still fine; every writer path refuses
    assert snap.read(spark, root).count() == 2
    extra = spark.createDataFrame([(3, 30)], "id long, v long")
    with pytest.raises(ValueError, match="writer protocol"):
        snap.append(spark, root, extra)
    with pytest.raises(ValueError, match="writer protocol"):
        snap.delete_where(spark, root, "id = 1")
    with pytest.raises(ValueError, match="writer protocol"):
        snap.compact(spark, root)
    with pytest.raises(ValueError, match="writer protocol"):
        snap.put_index(root, "a", {"x": 1})
    with pytest.raises(ValueError, match="writer protocol"):
        snap.add_constraint(spark, root, "c", "v > 0")
    with pytest.raises(ValueError, match="writer protocol"):
        snap.upgrade_protocol(root, writer=1)  # even re-stamping refuses


def test_upgrade_protocol_is_monotone(spark, tmp_path):
    root = str(tmp_path / "wproto2")
    df = spark.createDataFrame([(1, 10)], "id long, v long")
    snap.create(spark, root, df)
    # "lowering" resolves to max(current, requested): a no-op stamp
    v = snap.upgrade_protocol(root, reader=1, writer=1)
    assert snap._read_state(root)["protocol"] == {
        "reader": snap._READER_VERSION, "writer": snap._WRITER_VERSION}
    # still writable afterwards, and history records the commit
    snap.append(spark, root,
                spark.createDataFrame([(2, 20)], "id long, v long"))
    assert snap.read(spark, root).count() == 2
    assert snap.history(root)[1]["operation"] == "upgrade_protocol"
    assert v == 1


def test_hashbucket_partition_point_prunes(spark, tmp_path):
    """Iceberg's bucket transform with a PORTABLE published hash: a
    point predicate prunes to exactly the probed key's bucket (computed
    identically by the Spark writer and the pure-Python probe, negatives
    included); ranges are undecidable and degrade to stats."""
    root = str(tmp_path / "hb")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(-40, 40)], "k long, payload string"
    )
    snap.create(
        spark, root, df.coalesce(1),
        partition_by=[{"name": "kb", "transform": "hashbucket",
                       "source": "k", "param": 8}],
    )
    n_live = len(snap.live_files(root))
    assert n_live == 8  # one file per bucket from the coalesced write
    for probe in (-40, -7, 0, 3, 39):
        kept = snap.pruned_files(root, {"k": (probe, probe)})
        assert len(kept) == 1, f"probe {probe} kept {len(kept)} files"
        got = snap.read_pruned(spark, root, {"k": (probe, probe)}).filter(
            f"k = {probe}"
        )
        assert [r.k for r in got.collect()] == [probe]
    # a RANGE cannot map through a hash: no partition-tier pruning
    assert len(snap.pruned_files(root, {"k": (0, 5)})) == n_live
    # the |key| < 2^31 portability bound is ENFORCED, not advisory
    # (r10 ADVICE #3): beyond it Spark's int64 product wraps while the
    # pure-Python probe's does not, so the writer fails loudly...
    big = spark.createDataFrame([(2**31, "x")], "k long, payload string")
    with pytest.raises(Exception, match=r"\|key\| < 2\^31"):
        snap.append(spark, root, big)
    # ...and an out-of-range PROBE never trusts a wrap-around bucket
    # number: the partition tier abstains, the stats tier (exact
    # min/max, and the writer guard means no file can hold such a key)
    # makes the call — the answer stays exactly the unpruned filter's
    for probe in (2**31, -(2**31)):
        got = snap.read_pruned(spark, root, {"k": (probe, probe)}).filter(
            f"k = {probe}")
        assert got.count() == 0


def test_create_branch_rejects_expired_base(spark, tmp_path):
    """r10 ADVICE #4: a branch may only fork at a REPLAYABLE version.
    After expire_log, versions below the newest checkpoint replay only
    if they are exactly a checkpoint — forking below that floor would
    make every later branch read fail with missing-commit errors, so
    create_branch refuses up front."""
    root = str(tmp_path / "brfloor")
    df = spark.createDataFrame([(i, i * 10) for i in range(6)],
                               "id long, v long")
    snap.create(spark, root, df.filter("id < 2"))            # v0
    snap.append(spark, root, df.filter("id >= 2 AND id < 4"))  # v1
    snap.checkpoint(root)                                    # ck @ v1
    snap.append(spark, root, df.filter("id >= 4"))           # v2
    snap.expire_log(root)  # drops commits v0, v1
    with pytest.raises(ValueError, match="not replayable"):
        snap.create_branch(root, "tooold", version=0)
    # exactly-at-checkpoint and above-the-floor bases still fork fine
    assert snap.create_branch(root, "atck", version=1) == 1
    assert snap.create_branch(root, "athead") == 2
    broot = snap.branch_root(root, "atck")
    assert sorted(r.id for r in snap.read(spark, broot).collect()) == \
        [0, 1, 2, 3]


def test_widen_composes_with_column_mapping_and_checkpoint(spark, tmp_path):
    """Widening on a COLUMN-MAPPED table keeps the physical id (same
    files keep serving the column), composes with rename, and survives a
    checkpoint + expire_log (the widened schema rides in the checkpoint
    state, not only the commit chain)."""
    from pyspark.sql.types import LongType

    root = str(tmp_path / "widenmap")
    df = spark.createDataFrame([(i, i * 10) for i in range(4)],
                               "id int, v long")
    snap.create(spark, root, df, column_mapping=True)
    phys_before = snap.table_schema(root)["id"].metadata.get("physical")
    assert phys_before
    snap.widen_column_type(root, "id", "long")
    sch = snap.table_schema(root)
    assert isinstance(sch["id"].dataType, LongType)
    assert sch["id"].metadata.get("physical") == phys_before
    # rename after widen: data still served from the same physical column
    snap.rename_column(root, "id", "ident")
    assert sorted(r.ident for r in snap.read(spark, root).collect()) == \
        [0, 1, 2, 3]
    # checkpoint consolidates the widened+renamed schema; expire the log
    snap.append(spark, root, spark.createDataFrame(
        [(2**40, 1)], "ident long, v long"))
    snap.checkpoint(root)
    snap.append(spark, root, spark.createDataFrame(
        [(2**41, 2)], "ident long, v long"))
    snap.expire_log(root)
    got = snap.read(spark, root)
    assert isinstance(got.schema["ident"].dataType, LongType)
    assert got.count() == 6


def test_merge_sync_on_partitioned_table_respects_layout(spark, tmp_path):
    """The sync clause composes with Hive-partitioned commits: deletes
    and updates land inside the right partition directories, inserts
    create new partition values, and partition pruning still works on
    the result."""
    root = str(tmp_path / "msp")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en", i * 10) for i in range(8)],
        "id long, lang string, v long",
    )
    snap.create(spark, root, df, partition_by=["lang"])
    src = spark.createDataFrame(
        [(0, "de", 999), (100, "fr", 1)], "id long, lang string, v long")
    snap.merge_into(spark, root, src, ["id"],
                    not_matched_by_source="delete")
    got = {r.id: (r.lang, r.v) for r in snap.read(spark, root).collect()}
    assert got == {0: ("de", 999), 100: ("fr", 1)}
    # partition tier still prunes: the fr probe opens only fr files
    kept = snap.pruned_files(root, {"lang": ("fr", "fr")})
    assert kept and all(
        snap.partition_values(root)[f]["lang"] == "fr" for f in kept)


def test_parquet_checkpoint_roundtrips_full_state(spark, tmp_path):
    """Delta's parquet checkpoint layout (r11): O(files) state as one
    parquet row per file + scalars in a head JSON. A feature-loaded
    table (partitioned, row-tracked, bloom-indexed, constrained, MOR
    deletion vectors) checkpointed as parquet and then LOG-EXPIRED must
    replay bit-identically: reads, DV'd rows, row ids, stats/partition
    pruning, constraint enforcement, and subsequent commits all work
    from the parquet checkpoint alone."""
    root = str(tmp_path / "pqck")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en", i * 10) for i in range(12)],
        "id long, lang string, v long",
    )
    snap.create(spark, root, df, partition_by=["lang"],
                bloom_cols=["id"], row_tracking=True)
    snap.add_constraint(spark, root, "v_pos", "v >= 0")
    snap.delete_where_mor(spark, root, "id = 3")      # live DV
    rid_before = {r.id: r._row_id
                  for r in snap.read_with_row_ids(spark, root).collect()}
    v = snap.checkpoint(root, format="parquet")
    assert os.path.exists(snap._checkpoint_head_path(root, v))
    assert os.path.exists(snap._checkpoint_parquet_path(root, v))
    assert not os.path.exists(snap._checkpoint_path(root, v))
    snap.append(spark, root, spark.createDataFrame(
        [(100, "fr", 5)], "id long, lang string, v long"))
    snap.expire_log(root)  # only the parquet checkpoint remains below v
    got = sorted(r.id for r in snap.read(spark, root).collect())
    assert got == [i for i in range(12) if i != 3] + [100]
    rid_after = {r.id: r._row_id
                 for r in snap.read_with_row_ids(spark, root).collect()}
    assert all(rid_after[i] == rid_before[i] for i in rid_before
               if i != 3)
    # pruning tiers replay from the checkpoint: partition + stats + bloom
    kept = snap.pruned_files(root, {"lang": ("fr", "fr")})
    assert kept and all(
        snap.partition_values(root)[f]["lang"] == "fr" for f in kept)
    assert len(snap.pruned_files(root, {"id": (100, 100)})) < \
        len(snap.live_files(root))
    # constraints survived the consolidation
    with pytest.raises(ValueError, match="v_pos"):
        snap.append(spark, root, spark.createDataFrame(
            [(101, "fr", -1)], "id long, lang string, v long"))
    # duplicate checkpoints at one version refuse, either format
    snap.checkpoint(root)  # json at the new head
    with pytest.raises(FileExistsError):
        snap.checkpoint(root, format="parquet")
    with pytest.raises(ValueError, match="json\\|parquet"):
        snap.checkpoint(root, format="orc")


def test_parquet_checkpoint_crash_seam_and_mixed_formats(spark, tmp_path):
    """The parquet lands before the head JSON: a crash in between leaves
    an orphan parquet and NO checkpoint (the table replays from the
    commit chain as if nothing happened); a retry overwrites the orphan
    and commits. JSON and parquet checkpoints can interleave across a
    table's history — readers pick the newest at-or-below regardless of
    format."""
    root = str(tmp_path / "pqckcrash")
    df = spark.createDataFrame([(i,) for i in range(6)], "id long")
    snap.create(spark, root, df)
    snap.checkpoint(root)                              # json @ v0
    snap.append(spark, root, spark.createDataFrame([(100,)], "id long"))
    # simulated crash: parquet written, head never created
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"file": ["garbage"]}),
                   snap._checkpoint_parquet_path(root, 1))
    assert snap._checkpoint_versions(root) == [0]      # not a checkpoint
    assert sorted(r.id for r in snap.read(spark, root).collect()) == \
        list(range(6)) + [100]
    # the retry overwrites the orphan and lands atomically
    assert snap.checkpoint(root, format="parquet") == 1
    assert snap._checkpoint_versions(root) == [0, 1]
    snap.append(spark, root, spark.createDataFrame([(200,)], "id long"))
    snap.expire_log(root)
    assert sorted(r.id for r in snap.read(spark, root).collect()) == \
        list(range(6)) + [100, 200]
    # both checkpointed eras stay time-travelable across formats: v0
    # replays from the JSON checkpoint, v1 from the parquet one
    assert sorted(r.id for r in snap.read(spark, root, 0).collect()) == \
        list(range(6))
    assert sorted(r.id for r in snap.read(spark, root, 1).collect()) == \
        list(range(6)) + [100]


def test_parquet_checkpoint_gated_on_reader_protocol(spark, tmp_path):
    """The Delta checkpoint-format protocol rule: a reader-2 engine
    cannot SEE `.head.json` checkpoints (it replays the commit chain —
    correct only until expire_log), so writing a parquet checkpoint on a
    table still stamped reader 2 must refuse until the requirement is
    raised. New tables stamp reader >= 3 at create and are unaffected."""
    root = str(tmp_path / "pqgate")
    snap.create(spark, root, spark.createDataFrame([(1,)], "id long"))
    # simulate a table stamped by the reader-2 era engine
    snap._write_commit(root, 1, [], [],
                       protocol={"reader": 2, "writer": 2},
                       op="upgrade_protocol", data_change=False)
    with pytest.raises(ValueError, match="reader protocol >= 3"):
        snap.checkpoint(root, format="parquet")
    snap.upgrade_protocol(root, reader=3)
    assert snap.checkpoint(root, format="parquet") == \
        snap.latest_version(root)
    # json checkpoints never needed the bump (reader-2 engines read them)
    root2 = str(tmp_path / "pqgate2")
    snap.create(spark, root2, spark.createDataFrame([(1,)], "id long"))
    snap.checkpoint(root2)  # fine at any stamp


def test_generated_and_default_columns_derive_and_enforce(spark, tmp_path):
    """VERDICT r11 #5 — GENERATED ALWAYS AS + DEFAULT columns: absent
    generated/default columns derive at write time (create AND append);
    explicit generated values are enforced (mismatch aborts, match
    passes); explicit default values pass through untouched."""
    root = str(tmp_path / "gen")
    df = spark.createDataFrame(
        [(1, 1234), (2, 5678)], "id long, n long")
    snap.create(spark, root, df,
                generated_cols={"bucket": "CAST(n DIV 1000 AS BIGINT)"},
                default_cols={"status": "'live'"})
    got = {r.id: (r.bucket, r.status)
           for r in snap.read(spark, root).collect()}
    assert got == {1: (1, "live"), 2: (5, "live")}
    assert snap.generated_columns(root) == {
        "bucket": "CAST(n DIV 1000 AS BIGINT)"}
    assert snap.default_columns(root) == {"status": "'live'"}
    # append: omitted -> derived/defaulted
    snap.append(spark, root, spark.createDataFrame(
        [(3, 9001)], "id long, n long"))
    # append: explicit CORRECT generated value + explicit default pass
    snap.append(spark, root, spark.createDataFrame(
        [(4, 2500, 2, "bulk")], "id long, n long, bucket long, status string"))
    got = {r.id: (r.bucket, r.status)
           for r in snap.read(spark, root).collect()}
    assert got == {1: (1, "live"), 2: (5, "live"), 3: (9, "live"),
                   4: (2, "bulk")}
    # explicit WRONG generated value aborts before any commit
    head = snap.latest_version(root)
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        snap.append(spark, root, spark.createDataFrame(
            [(5, 100, 77, "live")],
            "id long, n long, bucket long, status string"))
    assert snap.latest_version(root) == head
    # stats are recorded on the generated column -> data skipping works
    pf = snap.pruned_files(root, {"bucket": (100, 200)})
    assert pf == []


def test_generated_columns_gate_updates_and_merge(spark, tmp_path):
    """Generated columns compose with DML: direct SET on a generated
    column refuses (COW and MOR update, and the MERGE by-source UPDATE
    clause); a MERGE source omitting generated/default columns derives
    them; create refuses a column declared both generated and default."""
    root = str(tmp_path / "gendml")
    df = spark.createDataFrame([(1, 1000), (2, 2000)], "id long, n long")
    snap.create(spark, root, df,
                generated_cols={"bucket": "CAST(n DIV 1000 AS BIGINT)"},
                default_cols={"status": "'live'"})
    with pytest.raises(ValueError, match="generated column"):
        snap.update_where(spark, root, "id = 1", {"bucket": "9"})
    with pytest.raises(ValueError, match="generated column"):
        snap.update_where_mor(spark, root, "id = 1", {"bucket": "9"})
    src = spark.createDataFrame([(2, 3500), (9, 9999)], "id long, n long")
    snap.merge_into(spark, root, src, ["id"])
    got = {r.id: (r.n, r.bucket, r.status)
           for r in snap.read(spark, root).collect()}
    assert got == {1: (1000, 1, "live"), 2: (3500, 3, "live"),
                   9: (9999, 9, "live")}
    with pytest.raises(ValueError, match="generated column"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_by_source="update",
                        not_matched_by_source_set={"bucket": "0"})
    with pytest.raises(ValueError, match="both GENERATED and DEFAULT"):
        snap.create(spark, str(tmp_path / "genboth"), df,
                    generated_cols={"x": "n"}, default_cols={"x": "1"})


def test_generated_partition_column_prunes_at_plan_time(spark, tmp_path):
    """A generated column is a legal partition source (Delta's generated
    partition columns): writers never supply it, the layout derives it,
    and partition pruning on it needs zero data I/O."""
    root = str(tmp_path / "genpart")
    df = spark.createDataFrame(
        [(i, i * 1000) for i in range(6)], "id long, n long")
    snap.create(spark, root, df,
                partition_by=["bucket"],
                generated_cols={"bucket": "CAST(n DIV 2000 AS BIGINT)"})
    live = snap.live_files(root)
    assert all("__p_0=" in f for f in live)  # hive-style partition dirs
    pf = snap.pruned_files(root, {"bucket": (2, 2)})
    assert pf and len(pf) < len(live)
    got = {r.id: r.bucket for r in snap.read(spark, root).collect()}
    assert got == {i: (i * 1000) // 2000 for i in range(6)}


def test_merge_matched_clauses_first_true_wins(spark, tmp_path):
    """r12 extension: Delta's full WHEN MATCHED surface — ordered
    conditioned UPDATE/DELETE clauses; the first TRUE condition claims
    the row (FALSE or NULL falls through), unclaimed matched rows are
    carried, SET expressions see both sides via t./s. qualifiers,
    "set": None means UPDATE SET * (the source row), and unmatched
    source rows insert only where not_matched_condition holds."""
    root = str(tmp_path / "mcl")
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, None, "a"), (4, 40, "a"),
         (5, 50, "a")],
        "id long, v long, tag string",
    )
    snap.create(spark, root, df)
    src = spark.createDataFrame(
        [(1, 100, "s"),   # clause 1 fires (s.v > 50): t row, v from s+t
         (2, 30, "s"),    # clause 2 fires (s.v > t.v): DELETE
         (3, 5, "s"),     # clause 1 & 2 conditions NULL (t.v NULL): carried
         (4, 4, "s"),     # no clause true: carried
         (9, 90, "s"),    # unmatched, insert condition v > 50 holds
         (8, 8, "s")],    # unmatched, insert condition fails: dropped
        "id long, v long, tag string",
    )
    snap.merge_into(
        spark, root, src, ["id"],
        matched_clauses=[
            {"action": "update", "condition": "s.v > 50",
             "set": {"v": "s.v + t.v", "tag": "'upd'"}},
            {"action": "delete", "condition": "s.v > t.v"},
        ],
        not_matched_condition="v > 50",
    )
    got = {r.id: (r.v, r.tag) for r in snap.read(spark, root).collect()}
    assert got == {
        1: (110, "upd"),  # updated: s.v + t.v = 100 + 10
        3: (None, "a"),   # NULL condition fell through both clauses
        4: (40, "a"),     # no clause claimed it
        5: (50, "a"),     # never matched (absent from source)
        9: (90, "s"),     # conditional insert
    }  # id 2 deleted; id 8 failed the insert condition


def test_merge_matched_clauses_set_star_rids_and_feed(spark, tmp_path):
    """Clause composition: "set": None replaces with the source row but
    KEEPS the target's stable row id (it is an update, not
    delete+insert), the typed feed classifies update-clause rows as
    update pairs and delete-clause rows as plain deletes, and carried
    rows emit nothing."""
    root = str(tmp_path / "mclrid")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(4)], "id long, v long")
    snap.create(spark, root, df.coalesce(1), row_tracking=True)
    rid0 = {r.id: r._row_id
            for r in snap.read_with_row_ids(spark, root).collect()}
    src = spark.createDataFrame(
        [(0, 999), (1, 11), (2, 22), (7, 70)], "id long, v long")
    v = snap.merge_into(
        spark, root, src, ["id"],
        matched_clauses=[
            {"action": "delete", "condition": "t.id = 1"},
            {"action": "update", "condition": "s.v > 100", "set": None},
        ],
    )
    rows = {r.id: r for r in snap.read_with_row_ids(spark, root).collect()}
    assert {i: rows[i].v for i in sorted(rows)} == {
        0: 999,   # SET * from source
        2: 20,    # matched but unclaimed: carried
        3: 30,    # unmatched target: carried
        7: 70,    # insert (no condition given)
    }
    assert rows[0]._row_id == rid0[0]          # SET * kept the id
    assert rows[2]._row_id == rid0[2]
    assert rows[7]._row_id not in set(rid0.values())
    feed = snap.changes(spark, root, v - 1, v, classify_updates=True)
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r._change_type, []).append(r.id)
    assert by_type.pop("delete") == [1]
    assert by_type.pop("insert") == [7]
    assert by_type.pop("update_preimage") == [0]
    assert by_type.pop("update_postimage") == [0]
    assert not by_type                          # ids 2, 3 emitted nothing


def test_merge_matched_clauses_refusals(spark, tmp_path):
    """Guard rails: empty clause list, unknown action, DELETE with SET,
    SET on a merge key / unknown / generated column, and
    not_matched_condition without clauses all refuse before any
    commit."""
    root = str(tmp_path / "mclref")
    df = spark.createDataFrame([(1, 1000)], "id long, n long")
    snap.create(spark, root, df,
                generated_cols={"bucket": "CAST(n DIV 1000 AS BIGINT)"})
    src = spark.createDataFrame([(1, 2000)], "id long, n long")
    head = snap.latest_version(root)
    with pytest.raises(ValueError, match="non-empty"):
        snap.merge_into(spark, root, src, ["id"], matched_clauses=[])
    with pytest.raises(ValueError, match="action"):
        snap.merge_into(spark, root, src, ["id"],
                        matched_clauses=[{"action": "upsert"}])
    with pytest.raises(ValueError, match="takes no SET"):
        snap.merge_into(spark, root, src, ["id"],
                        matched_clauses=[{"action": "delete",
                                          "set": {"n": "1"}}])
    with pytest.raises(ValueError, match="merge key"):
        snap.merge_into(spark, root, src, ["id"],
                        matched_clauses=[{"action": "update",
                                          "set": {"id": "s.id + 1"}}])
    with pytest.raises(ValueError, match="unknown columns"):
        snap.merge_into(spark, root, src, ["id"],
                        matched_clauses=[{"action": "update",
                                          "set": {"nope": "1"}}])
    with pytest.raises(ValueError, match="generated column"):
        snap.merge_into(spark, root, src, ["id"],
                        matched_clauses=[{"action": "update",
                                          "set": {"bucket": "0"}}])
    with pytest.raises(ValueError, match="requires matched_clauses"):
        snap.merge_into(spark, root, src, ["id"],
                        not_matched_condition="n > 0")
    assert snap.latest_version(root) == head


def test_identity_columns_allocate_contiguous_unique_blocks(spark, tmp_path):
    """r12: GENERATED ALWAYS AS IDENTITY — create allocates ordinals
    0..n-1 mapped to start + step*k, each append continues above the
    high watermark (contiguous blocks, no collisions across commits),
    and the watermark survives state replay. Which row gets which id
    depends on physical partitioning (Delta's contract: unique +
    monotonic, not a deterministic row mapping), so assertions are on
    the allocated SET."""
    root = str(tmp_path / "ident")
    df = spark.createDataFrame([(i,) for i in range(7)], "v long")
    snap.create(spark, root, df.repartition(3),
                identity_cols={"id": {"start": 100, "step": 3}})
    ids0 = sorted(r.id for r in snap.read(spark, root).collect())
    assert ids0 == [100 + 3 * k for k in range(7)]
    snap.append(spark, root,
                spark.createDataFrame([(i,) for i in range(5)], "v long")
                .repartition(2))
    ids1 = sorted(r.id for r in snap.read(spark, root).collect())
    assert ids1 == [100 + 3 * k for k in range(12)]
    assert snap.identity_columns(root) == {
        "id": {"start": 100, "step": 3}}
    # time travel: v0 sees only its own block
    assert sorted(r.id for r in snap.read(spark, root, 0).collect()) == ids0


def test_identity_columns_refusals_and_dml(spark, tmp_path):
    """Identity guard rails: writers cannot supply the column, UPDATE
    cannot SET it, MERGE and evolve_schema refuse on identity tables
    (Delta parity), and COW delete/update carry existing ids
    unchanged."""
    root = str(tmp_path / "identref")
    df = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    snap.create(spark, root, df,
                identity_cols={"id": {"start": 0, "step": 1}})
    with pytest.raises(ValueError, match="cannot supply"):
        snap.append(spark, root, spark.createDataFrame(
            [(9, 99)], "v long, id long"))
    with pytest.raises(ValueError, match="identity column"):
        snap.update_where(spark, root, "v = 1", {"id": "77"})
    with pytest.raises(ValueError, match="identity column"):
        snap.update_where_mor(spark, root, "v = 1", {"id": "77"})
    with pytest.raises(ValueError, match="IDENTITY"):
        snap.merge_into(spark, root,
                        spark.createDataFrame([(5,)], "v long"), ["v"])
    with pytest.raises(ValueError, match="IDENTITY"):
        snap.evolve_schema(spark, root, spark.createDataFrame(
            [(6, 0, "x")], "v long, id long, extra string"))
    before = {r.v: r.id for r in snap.read(spark, root).collect()}
    snap.update_where(spark, root, "v = 2", {"v": "22"})
    snap.delete_where(spark, root, "v = 3")
    after = {r.v: r.id for r in snap.read(spark, root).collect()}
    assert after == {1: before[1], 22: before[2]}  # ids carried by COW
    with pytest.raises(ValueError, match="both IDENTITY and"):
        snap.create(spark, str(tmp_path / "identboth"), df,
                    identity_cols={"x": {}}, default_cols={"x": "1"})


def test_merge_all_three_clause_groups_compose(spark, tmp_path):
    """One MERGE commit can carry the FULL Delta clause matrix: matched
    conditioned clauses, conditional insert, AND the by-source UPDATE —
    each row claimed by exactly one group."""
    root = str(tmp_path / "mall")
    df = spark.createDataFrame(
        [(1, 10, "live"), (2, 20, "live"), (3, 30, "live"),
         (4, 40, "live")],
        "id long, v long, status string",
    )
    snap.create(spark, root, df)
    src = spark.createDataFrame(
        [(1, 100, "s"), (2, 2, "s"), (8, 80, "s"), (9, 9, "s")],
        "id long, v long, status string",
    )
    snap.merge_into(
        spark, root, src, ["id"],
        matched_clauses=[
            {"action": "update", "condition": "s.v > t.v",
             "set": {"v": "s.v", "status": "'upd'"}},
            {"action": "delete"},  # unconditional fallback: s.v <= t.v
        ],
        not_matched_condition="v >= 50",
        not_matched_by_source="update",
        not_matched_by_source_condition="v >= 40",
        not_matched_by_source_set={"status": "'stale'"},
    )
    got = {r.id: (r.v, r.status) for r in snap.read(spark, root).collect()}
    assert got == {
        1: (100, "upd"),    # matched, clause 1 (s.v > t.v)
        3: (30, "live"),    # unmatched-by-source, condition FALSE: kept
        4: (40, "stale"),   # unmatched-by-source, condition TRUE: marked
        8: (80, "s"),       # insert condition v >= 50 holds
    }  # id 2 deleted by clause 2; id 9 failed the insert condition


def test_merge_mor_rewrites_nothing_and_equals_cow(spark, tmp_path):
    """r12 merge-on-read MERGE: the head equals the COW merge's result,
    but NO pre-existing data file is rewritten — the commit only adds
    files and assigns deletion vectors; OPTIMIZE later folds the DVs
    away with contents unchanged."""
    base = [(i, i * 10) for i in range(10)]
    srcr = [(3, 333), (7, 777), (42, 4242)]
    want = {i: v for i, v in base} | {i: v for i, v in srcr}

    mor = str(tmp_path / "mmor")
    snap.create(spark, mor,
                spark.createDataFrame(base, "id long, v long")
                .repartition(4))
    files_before = set(snap.live_files(mor))
    snap.merge_into_mor(spark, mor,
                        spark.createDataFrame(srcr, "id long, v long"),
                        ["id"])
    assert {r.id: r.v for r in snap.read(spark, mor).collect()} == want
    # MoR: every pre-existing file is STILL live (nothing rewritten)
    assert files_before <= set(snap.live_files(mor))
    assert snap.dv_map(mor)  # matched rows are DV'd, not rewritten
    # fold the DVs away; contents identical
    snap.compact(spark, mor, max_files=2)
    assert not snap.dv_map(mor)
    assert {r.id: r.v for r in snap.read(spark, mor).collect()} == want


def test_merge_mor_row_ids_feed_and_refusals(spark, tmp_path):
    """MoR merge composition: replacements keep the target's stable row
    id, inserts mint fresh ids, the commit-time change data types every
    matched row as an update pair (NO unchanged-row cancellation — MoR
    replaces whatever matches) plus plain inserts, and the usual guard
    rails refuse (duplicate source keys, identity tables)."""
    root = str(tmp_path / "mmorrid")
    df = spark.createDataFrame([(i, i * 10) for i in range(5)],
                               "id long, v long")
    snap.create(spark, root, df.coalesce(1), row_tracking=True)
    rid0 = {r.id: r._row_id
            for r in snap.read_with_row_ids(spark, root).collect()}
    src = spark.createDataFrame([(0, 999), (2, 20), (8, 80)],
                                "id long, v long")
    v = snap.merge_into_mor(spark, root, src, ["id"])
    rows = {r.id: r for r in snap.read_with_row_ids(spark, root).collect()}
    assert {i: rows[i].v for i in sorted(rows)} == {
        0: 999, 1: 10, 2: 20, 3: 30, 4: 40, 8: 80}
    for i in (0, 1, 2, 3, 4):
        assert rows[i]._row_id == rid0[i], f"row {i} renumbered"
    assert rows[8]._row_id not in set(rid0.values())
    feed = snap.changes(spark, root, v - 1, v, classify_updates=True)
    by_type = {}
    for r in feed.collect():
        by_type.setdefault(r._change_type, []).append(r.id)
    assert by_type.pop("insert") == [8]
    # id 2 replaced with EQUAL values: still an update pair (MoR rule)
    assert sorted(by_type.pop("update_preimage")) == [0, 2]
    assert sorted(by_type.pop("update_postimage")) == [0, 2]
    assert not by_type
    dup = spark.createDataFrame([(1, 1), (1, 2)], "id long, v long")
    with pytest.raises(ValueError, match="duplicate keys"):
        snap.merge_into_mor(spark, root, dup, ["id"])
    ident = str(tmp_path / "mmorident")
    snap.create(spark, ident, spark.createDataFrame([(1,)], "v long"),
                identity_cols={"uid": {}})
    with pytest.raises(ValueError, match="IDENTITY"):
        snap.merge_into_mor(spark, ident,
                            spark.createDataFrame([(2,)], "v long"), ["v"])


def test_merge_mor_into_empty_and_repeat_merges_supersede(spark, tmp_path):
    """MoR edges: merging into an empty table is a pure insert (no DV);
    a second MoR merge touching the SAME file supersedes its DV (the
    delete_where_mor superset rule) so both updates stick."""
    root = str(tmp_path / "mmor2")
    snap.create(spark, root,
                spark.createDataFrame([], "id long, v long"))
    snap.merge_into_mor(spark, root,
                        spark.createDataFrame([(1, 10), (2, 20)],
                                              "id long, v long"), ["id"])
    assert not snap.dv_map(root)
    snap.merge_into_mor(spark, root,
                        spark.createDataFrame([(1, 11)], "id long, v long"),
                        ["id"])
    snap.merge_into_mor(spark, root,
                        spark.createDataFrame([(2, 22)], "id long, v long"),
                        ["id"])
    assert {r.id: r.v for r in snap.read(spark, root).collect()} == \
        {1: 11, 2: 22}
    # time travel across the MoR chain stays exact
    assert {r.id: r.v for r in snap.read(spark, root, 1).collect()} == \
        {1: 10, 2: 20}


def test_merge_mor_conflict_and_benign_rebase(spark, monkeypatch, tmp_path):
    """MoR merge in the conflict matrix: its DV assignment touches the
    matched files, so racing it against a DELETE of the same file
    raises ConcurrentWriteConflict (same-file rule via the DV entry of
    _commit_touched); racing it against a disjoint APPEND rebases and
    both commits land."""
    root = str(tmp_path / "mmorrace")
    df = spark.createDataFrame([(i, i * 10) for i in range(8)],
                               "id long, v long")
    snap.create(spark, root, df.coalesce(1))  # one file: guaranteed overlap
    src = spark.createDataFrame([(1, 111)], "id long, v long")
    fired = _race(monkeypatch, "merge_mor",
                  lambda: snap.delete_where(spark, root, "id = 7"))
    with pytest.raises(snap.ConcurrentWriteConflict, match="same files"):
        snap.merge_into_mor(spark, root, src, ["id"], max_retries=3)
    assert fired["done"]
    # the winner's delete stands; the loser published nothing
    assert sorted(r.id for r in snap.read(spark, root).collect()) == \
        list(range(7))

    root2 = str(tmp_path / "mmorrace2")
    snap.create(spark, root2, df.coalesce(1))
    extra = spark.createDataFrame([(100, 1000)], "id long, v long")
    fired2 = _race(monkeypatch, "merge_mor",
                   lambda: snap.append(spark, root2, extra))
    snap.merge_into_mor(spark, root2, src, ["id"], max_retries=3)
    assert fired2["done"]
    got = {r.id: r.v for r in snap.read(spark, root2).collect()}
    assert got[1] == 111 and got[100] == 1000  # both commits landed


# --- write-side stats/bloom file skipping for MERGE (VERDICT r12 #7) ------


def test_merge_skipping_prunes_key_clustered_files(spark, tmp_path):
    """On a key-clustered table (range-partitioned files with disjoint
    id ranges) a narrow-key MERGE's candidate set — and therefore its
    rewrite set — is a strict subset of the live files, and the result
    is byte-identical to what a full scan would produce."""
    root = str(tmp_path / "mskip")
    df = spark.createDataFrame(
        [(i, i * 10, "base") for i in range(800)],
        "id long, score long, tag string")
    snap.create(spark, root, df.repartitionByRange(8, "id"))
    live0 = snap.live_files(root)
    assert len(live0) == 8
    src = spark.createDataFrame(
        [(i, -1, "upd") for i in range(100, 110)] + [(900, 1, "new")],
        "id long, score long, tag string")
    keys = src.select("id").distinct()
    cand = snap.merge_candidate_files(spark, root, keys, ["id"])
    assert len(cand) < len(live0), "stats skipping pruned nothing"
    v = snap.merge_into(spark, root, src, ["id"])
    rewritten = set(live0) - set(snap.live_files(root, v))
    assert rewritten and rewritten <= set(cand)
    got = {r.id: (r.score, r.tag) for r in snap.read(spark, root).collect()}
    assert len(got) == 801
    for i in range(100, 110):
        assert got[i] == (-1, "upd")
    assert got[900] == (1, "new") and got[0] == (0, "base")


def test_merge_skipping_bloom_tier_on_unclustered_table(spark, tmp_path):
    """Round-robin layout defeats min/max bounds (every file's id range
    overlaps every key), so pruning must come from the per-file bloom
    index: candidates = only files whose bitmap can contain a source
    key."""
    root = str(tmp_path / "mbloom")
    df = spark.createDataFrame(
        [(f"user_{i}", i) for i in range(400)], "uid string, score long")
    # 8 files, uids striped across all of them -> overlapping ranges is
    # the default for strings too (each file holds user_0..user_399ish)
    snap.create(spark, root, df.repartition(8), bloom_cols=["uid"])
    live0 = snap.live_files(root)
    src = spark.createDataFrame(
        [("user_42", -1)], "uid string, score long")
    cand = snap.merge_candidate_files(
        spark, root, src.select("uid").distinct(), ["uid"])
    assert len(cand) < len(live0), "bloom skipping pruned nothing"
    v = snap.merge_into(spark, root, src, ["uid"])
    rewritten = set(live0) - set(snap.live_files(root, v))
    assert rewritten <= set(cand)
    got = {r.uid: r.score for r in snap.read(spark, root).collect()}
    assert got["user_42"] == -1 and got["user_41"] == 41


def test_merge_skipping_mor_and_degradation(spark, tmp_path):
    """merge_into_mor probes only candidate files (its DV'd file set is
    a subset of the candidates); an all-NULL / unmatched-range source
    degrades safely — no false negatives, a miss is a pure insert."""
    root = str(tmp_path / "mmor")
    df = spark.createDataFrame(
        [(i, i) for i in range(400)], "id long, v long")
    snap.create(spark, root, df.repartitionByRange(4, "id"))
    live0 = snap.live_files(root)
    src = spark.createDataFrame([(5, -5), (7, -7)], "id long, v long")
    v = snap.merge_into_mor(spark, root, src, ["id"])
    dvd = set(snap.dv_map(root))
    cand = set(snap.merge_candidate_files(
        spark, root, src.select("id").distinct(), ["id"], v - 1))
    assert dvd and dvd <= cand and len(cand) < len(live0)
    assert set(live0) <= set(snap.live_files(root))  # MoR: no rewrites
    # out-of-range keys: candidates empty, merge is a pure insert
    far = spark.createDataFrame([(10_000, 1)], "id long, v long")
    assert snap.merge_candidate_files(
        spark, root, far.select("id").distinct(), ["id"]) == []
    snap.merge_into(spark, root, far, ["id"])
    got = {r.id: r.v for r in snap.read(spark, root).collect()}
    assert got[5] == -5 and got[7] == -7 and got[10_000] == 1
    assert len(got) == 401


def test_merge_skipping_overflow_guard_ignores_nulls(spark, tmp_path):
    """r13 ADVICE medium: the bloom tier's ≤1024-key overflow guard must
    count DISTINCT NON-NULL keys — a NULL landing inside the sampled
    rows must not mask the 1025th real key and bloom-prune files that
    hold unsampled keys (a false negative that would turn matched rows
    into duplicate inserts). With >1024 real keys the bloom tier is
    skipped and every range-eligible file stays a candidate."""
    root = str(tmp_path / "mnull")
    df = spark.createDataFrame(
        [(i, i) for i in range(2000)], "id long, v long")
    snap.create(spark, root, df.repartitionByRange(2, "id"),
                bloom_cols=["id"])
    live0 = snap.live_files(root)
    assert len(live0) == 2  # [0..~999], [~1000..1999]
    # 1500 distinct non-null keys spanning both files, plus a NULL row
    keys = spark.createDataFrame(
        [(i,) for i in range(500, 2000)] + [(None,)], "id long")
    cand = snap.merge_candidate_files(spark, root, keys, ["id"])
    assert set(cand) == set(live0), (
        "bloom tier ran on an incomplete >1024-key sample: candidates "
        f"{cand} vs live {live0}")
    # and with a genuinely small key set the bloom tier still prunes
    small = spark.createDataFrame([(5,), (None,)], "id long")
    cand_small = snap.merge_candidate_files(spark, root, small, ["id"])
    assert len(cand_small) == 1


def test_merge_skipping_non_orderable_key_degrades(spark, tmp_path):
    """r13 ADVICE low: a non-orderable key type (map) skips the min/max
    tier instead of failing the whole MERGE with an AnalysisException —
    the docstring's 'non-orderable key types skip tier 1' promise."""
    root = str(tmp_path / "mmap")
    df = spark.createDataFrame([(i, i) for i in range(10)],
                               "id long, v long")
    snap.create(spark, root, df.coalesce(2))
    keys = spark.createDataFrame(
        [({"k": 1},)], "mkey map<string,int>")
    cand = snap.merge_candidate_files(spark, root, keys, ["mkey"])
    assert cand == snap.live_files(root)  # degraded to the full set


def test_merge_mor_clauses_unclaimed_rows_cost_nothing(spark, tmp_path):
    """MoR clause physics: a matched row NO clause claims is neither
    DV-deleted nor re-appended — it stays live in its original file at
    zero write cost (the MoR advantage over COW's carry-rewrite), and
    the typed feed carries nothing for it."""
    from pyspark.sql.functions import count
    root = str(tmp_path / "morun")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "id long, v long")
    snap.create(spark, root, df.repartition(2))
    src = spark.createDataFrame(
        [(1, 111), (2, 222), (500, 5)], "id long, v long")
    # clause claims only odd-keyed matches; id=2's pair is unclaimed
    ver = snap.merge_into_mor(
        spark, root, src, ["id"],
        matched_clauses=[
            {"action": "update", "condition": "s.id % 2 = 1",
             "set": None}],
    )
    got = {r.id: r.v for r in snap.read(spark, root).collect()}
    assert got[1] == 111 and got[2] == 20 and got[500] == 5
    assert len(got) == 101
    # exactly ONE DV position (id=1's old copy); id=2 untouched
    ents = snap.dv_entries(spark, root).collect()
    assert len(ents) == 1
    feed = snap.changes(spark, root, ver - 1, ver, classify_updates=True)
    kinds = {r._change_type: r.cnt for r in feed.groupBy("_change_type")
             .agg(count("*").alias("cnt")).collect()}
    assert kinds == {"update_preimage": 1, "update_postimage": 1,
                     "insert": 1}


def test_merge_mor_clauses_by_source_and_row_ids(spark, tmp_path):
    """MoR by-source clauses: fired unmatched rows DV-delete (+ append
    for the update form) while their stable row ids survive; matched
    update-clause replacements keep the target's id too."""
    root = str(tmp_path / "morbs")
    df = spark.createDataFrame(
        [(i, i * 10, "live") for i in range(40)],
        "id long, v long, tag string")
    from pyspark.sql.functions import count

    snap.create(spark, root, df.repartition(2), row_tracking=True)
    rid0 = {r.id: r._row_id
            for r in snap.read_with_row_ids(spark, root).collect()}
    src = spark.createDataFrame(
        [(4, 1, "s"), (5, 2, "s"), (99, 3, "s")],
        "id long, v long, tag string")
    ver = snap.merge_into_mor(
        spark, root, src, ["id"],
        matched_clauses=[
            {"action": "update", "condition": "s.v = 1",
             "set": {"v": "t.v + s.v", "tag": "'upd'"}},
            {"action": "delete", "condition": "s.v = 2"},
        ],
        not_matched_condition="v > 2",
        not_matched_by_source="update",
        not_matched_by_source_condition="id >= 38",
        not_matched_by_source_set={"tag": "'stale'"},
    )
    got = {r.id: (r.v, r.tag, r._row_id)
           for r in snap.read_with_row_ids(spark, root).collect()}
    assert got[4] == (41, "upd", rid0[4])        # clause-1 update
    assert 5 not in got                           # clause-2 delete
    assert got[99][:2] == (3, "s")                # conditional insert
    assert got[38] == (380, "stale", rid0[38])    # by-source update
    assert got[39] == (390, "stale", rid0[39])
    assert got[37] == (370, "live", rid0[37])     # by-source not fired
    assert len(got) == 40  # 40 - 1 delete + 1 insert
    # feed: 3 update pairs (1 matched + 2 by-source), 1 delete, 1 insert
    feed = snap.changes(spark, root, ver - 1, ver, classify_updates=True)
    kinds = {r._change_type: r.cnt for r in feed.groupBy("_change_type")
             .agg(count("*").alias("cnt")).collect()}
    assert kinds == {"update_preimage": 3, "update_postimage": 3,
                     "delete": 1, "insert": 1}
    # zero-rewrite invariant
    assert set(snap.live_files(root, 0)) <= set(snap.live_files(root))


def test_merge_mor_clauses_equal_cow_and_supersede(spark, tmp_path):
    """The MoR clause matrix hash-equals the COW twin on the same
    commit sequence, including a SECOND clause merge whose DVs must
    supersede the first's (bitmap-OR, each dead position exactly
    once)."""
    df_rows = [(i, i * 10, "live") for i in range(60)]
    roots = {}
    for name in ("mor", "cow"):
        root = str(tmp_path / name)
        snap.create(
            spark, root,
            spark.createDataFrame(df_rows, "id long, v long, tag string")
            .repartition(3))
        roots[name] = root
    fn = {"mor": snap.merge_into_mor, "cow": snap.merge_into}
    for step in range(2):
        src = spark.createDataFrame(
            [(i, step + 1, "s") for i in range(step, 60, 4)]
            + [(100 + step * 2, 9, "s"), (101 + step * 2, 1, "s")],
            "id long, v long, tag string")
        for name, root in roots.items():
            fn[name](
                spark, root, src, ["id"],
                matched_clauses=[
                    {"action": "update", "condition": "t.id % 8 < 4",
                     "set": {"v": "t.v + s.v * 1000"}},
                    {"action": "delete", "condition": "t.id % 8 = 5"},
                ],
                not_matched_condition="v > 2",
                not_matched_by_source="delete",
                not_matched_by_source_condition=f"id = {55 + step}",
            )
    a = sorted(tuple(r) for r in snap.read(spark, roots["mor"]).collect())
    b = sorted(tuple(r) for r in snap.read(spark, roots["cow"]).collect())
    assert a == b
    ents = snap.dv_entries(spark, roots["mor"])
    assert ents.count() == ents.distinct().count()
    assert set(snap.live_files(roots["mor"], 0)) <= set(
        snap.live_files(roots["mor"]))


def test_analyze_table_stats_and_cbo_broadcast(spark, tmp_path):
    """VERDICT r13 #6: ANALYZE TABLE publishes table/column stats into
    the commit log (advisory metadata commit, version-stamped), and
    read_cbo turns the measured size into a broadcast decision even
    with the session estimator disabled — stats-driven planning, not
    thresholds."""
    from pyspark.sql.functions import col

    dim_root = str(tmp_path / "dim")
    fact_root = str(tmp_path / "fact")
    dim = spark.createDataFrame(
        [(i, f"g{i % 3}", None if i % 5 == 0 else i)
         for i in range(100)],
        "id long, grp string, score long")
    snap.create(spark, dim_root, dim.coalesce(1))
    snap.create(
        spark, fact_root,
        spark.range(0, 20_000).select(
            (col("id") % 100).alias("id"), col("id").alias("v")
        ).repartition(4))
    v = snap.analyze_table(spark, dim_root)
    st = snap.analyzed_stats(dim_root)
    assert st["at_version"] == v - 1 and st["rows"] == 100
    assert st["bytes"] > 0
    assert st["cols"]["id"] == {"ndv": 100, "nulls": 0}
    assert st["cols"]["grp"] == {"ndv": 3, "nulls": 0}
    assert st["cols"]["score"] == {"ndv": 80, "nulls": 20}
    # pre-analyze versions see no stats; head sees them
    assert snap.analyzed_stats(dim_root, v - 1) is None
    # refusals
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown columns"):
        snap.analyze_table(spark, dim_root, columns=["nope"])
    # stats survive a checkpoint round-trip
    snap.checkpoint(dim_root)
    assert snap.analyzed_stats(dim_root)["rows"] == 100
    # CBO: with the session estimator disabled, the analyzed small side
    # still broadcasts; the plain read does not
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = snap.read(spark, fact_root)
        cbo_plan = fact.join(
            snap.read_cbo(spark, dim_root), "id"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in cbo_plan
        plain_plan = fact.join(
            snap.read(spark, dim_root), "id"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    # join through the hint is still correct
    n = fact.join(snap.read_cbo(spark, dim_root), "id").count()
    assert n == 20_000
    # r14 ADVICE: stale stats must not broadcast a table that has grown
    # past the threshold since its last ANALYZE — the guard re-sizes the
    # CURRENT live set when at_version != read version
    snap.append(spark, dim_root, spark.range(0, 50_000).select(
        (col("id") + 1000).alias("id"),
        col("id").cast("string").alias("grp"),
        col("id").alias("score")))
    live_bytes = sum(
        os.path.getsize(os.path.join(snap._data_root(dim_root), f))
        for f in snap.live_files(dim_root))
    assert snap.analyzed_stats(dim_root)["bytes"] < live_bytes
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        stale_plan = fact.join(
            snap.read_cbo(spark, dim_root,
                          broadcast_threshold=live_bytes - 1), "id"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in stale_plan
        # a pinned read at the ANALYZE commit itself (no data commit
        # since at_version) still trusts the stats
        at = snap.analyzed_stats(dim_root)["at_version"]
        pinned_plan = fact.join(
            snap.read_cbo(spark, dim_root, at + 1,
                          broadcast_threshold=live_bytes - 1), "id"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in pinned_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_analyze_is_advisory_not_a_conflict(spark, tmp_path):
    """An ANALYZE commit is advisory: a concurrent loser rebasing over
    it must NOT raise ConcurrentWriteConflict (unlike schema/protocol
    metadata commits, which conflict with everything)."""
    root = str(tmp_path / "adv")
    snap.create(spark, root,
                spark.createDataFrame([(1, 1)], "id long, v long"))
    v = snap.analyze_table(spark, root)
    winner = snap._load_commit(root, v)
    assert "analyze" in winner
    # the conflict matrix treats the analyze winner as benign...
    snap._assert_no_conflict("append", set(), winner, v)
    # ...unlike a schema-bearing winner
    snap.add_column(root, "extra", "string")
    meta_winner = snap._load_commit(root, v + 1)
    with _pytest_raises_conflict():
        snap._assert_no_conflict("append", set(), meta_winner, v + 1)
    # and writers layered above see stale-by-design stats
    snap.append(spark, root,
                spark.createDataFrame([(2, 2, "x")],
                                      "id long, v long, extra string"))
    assert snap.read(spark, root).count() == 2
    assert snap.analyzed_stats(root)["rows"] == 1


def _pytest_raises_conflict():
    import pytest as _pytest

    return _pytest.raises(snap.ConcurrentWriteConflict)


def test_merge_mor_clause_matrix_randomized_equivalence(spark, tmp_path):
    """Randomized (fixed-seed) COW-vs-MoR equivalence over the full
    clause matrix: for a spread of clause configurations — conditioned
    updates/deletes in both orders, gated inserts, by-source
    delete/update, with NULL-producing conditions mixed in — the two
    write strategies must land IDENTICAL table contents, and the MoR
    side must never rewrite a pre-existing file."""
    import random

    rng = random.Random(1405)
    for trial in range(6):
        n = rng.randint(20, 60)
        base = [(i, rng.randint(-5, 50), rng.choice(["a", "b", "c"]))
                for i in range(n)]
        src = [(i, rng.randint(-5, 50), "s")
               for i in rng.sample(range(n + 20), rng.randint(5, 25))]
        m1, m2 = rng.randint(2, 4), rng.randint(2, 5)
        clauses = [
            {"action": "update", "condition": f"s.v % {m1} = 0",
             "set": {"v": "t.v + s.v", "tag": "'upd'"}},
            {"action": "delete", "condition": f"s.v % {m2} = 1"},
        ]
        if rng.random() < 0.5:
            clauses.reverse()
        kwargs = {"matched_clauses": clauses}
        if rng.random() < 0.7:
            kwargs["not_matched_condition"] = f"v > {rng.randint(-2, 10)}"
        bs = rng.choice([None, "delete", "update"])
        if bs:
            kwargs["not_matched_by_source"] = bs
            # NULLIF makes the predicate NULL for some rows — FALSE/NULL
            # must both keep the row
            kwargs["not_matched_by_source_condition"] = (
                f"NULLIF(v, {rng.randint(0, 40)}) % 2 = 0")
            if bs == "update":
                kwargs["not_matched_by_source_set"] = {"tag": "'stale'"}
        roots = {}
        for name, fn in (("cow", snap.merge_into),
                         ("mor", snap.merge_into_mor)):
            root = str(tmp_path / f"t{trial}_{name}")
            snap.create(
                spark, root,
                spark.createDataFrame(base, "id long, v long, tag string")
                .repartition(3))
            fn(spark, root,
               spark.createDataFrame(src, "id long, v long, tag string"),
               ["id"], **kwargs)
            roots[name] = root
        a = sorted(tuple(r) for r in snap.read(spark, roots["cow"]).collect())
        b = sorted(tuple(r) for r in snap.read(spark, roots["mor"]).collect())
        assert a == b, f"trial {trial} ({kwargs}): COW != MoR"
        assert set(snap.live_files(roots["mor"], 0)) <= set(
            snap.live_files(roots["mor"])), f"trial {trial}: MoR rewrote"


def test_insert_overwrite_full_and_replace_where(spark, tmp_path):
    """VERDICT r14 #2: INSERT OVERWRITE is ONE atomic commit. Full mode
    truncate-and-loads; replace_where deletes exactly the predicate's
    rows and inserts the batch, copy-on-write (untouched files carry by
    reference), refusing incoming rows outside the predicate; the change
    feed recovers the delete+insert rows from the commit's file diff."""
    root = str(tmp_path / "iow")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)],
        "id long, grp long, s string")
    snap.create(spark, root, df.repartition(3, "grp"))
    # full overwrite: v1 has only the new rows, v0 time-travels intact
    snap.insert_overwrite(spark, root, spark.createDataFrame(
        [(100, 0, "x")], "id long, grp long, s string"))
    assert snap.read(spark, root).count() == 1
    assert snap.read(spark, root, 0).count() == 30
    # restore, then replaceWhere on grp=1
    snap.restore(spark, root, 0)
    base_v = snap.latest_version(root)
    untouched_before = [
        f for f in snap.live_files(root)
        if not any(r.grp == 1 for r in snap._scan_files(
            spark, root, [f], snap.table_schema(root), {}).collect())
    ]
    new = spark.createDataFrame(
        [(200 + i, 1, "r") for i in range(5)],
        "id long, grp long, s string")
    v = snap.insert_overwrite(spark, root, new, replace_where="grp = 1")
    got = snap.read(spark, root)
    assert got.filter("grp = 1").count() == 5
    assert sorted(r.id for r in got.filter("grp = 1").collect()) == \
        [200, 201, 202, 203, 204]
    assert got.filter("grp != 1").count() == 20  # untouched slices
    # files with no matching rows moved by log reference, not rewrite
    assert set(untouched_before) <= set(snap.live_files(root))
    # incoming rows OUTSIDE the predicate refuse (Delta's contract)
    with pytest.raises(ValueError, match="replace_where"):
        snap.insert_overwrite(
            spark, root,
            spark.createDataFrame([(1, 2, "z")],
                                  "id long, grp long, s string"),
            replace_where="grp = 1")
    # CDF of the replaceWhere commit: 10 deletes (old grp=1) + 5 inserts
    ch = snap.changes(spark, root, v - 1, v)
    by_type = {r["_change_type"]: 0 for r in ch.collect()}
    for r in ch.collect():
        by_type[r["_change_type"]] += 1
    assert by_type == {"delete": 10, "insert": 5}
    assert base_v == v - 1


def test_insert_overwrite_dynamic_partitions(spark, tmp_path):
    """Dynamic partition overwrite replaces exactly the partitions the
    incoming batch lands in (resolved from the log's recorded partition
    values — zero data I/O), keeping every other partition; an
    unpartitioned table refuses the mode."""
    root = str(tmp_path / "iowd")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)],
        "id long, grp long, s string")
    snap.create(spark, root, df, partition_by=["grp"])
    new = spark.createDataFrame(
        [(300, 0, "d"), (301, 2, "d")], "id long, grp long, s string")
    snap.insert_overwrite(spark, root, new, dynamic_partitions=True)
    got = snap.read(spark, root)
    assert got.filter("grp = 0").count() == 1
    assert got.filter("grp = 2").count() == 1
    assert got.filter("grp = 1").count() == 10  # untouched partition
    flat = str(tmp_path / "iow_flat")
    snap.create(spark, flat, df)
    with pytest.raises(ValueError, match="partitioned"):
        snap.insert_overwrite(spark, flat, new, dynamic_partitions=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        snap.insert_overwrite(spark, root, new, replace_where="grp = 0",
                              dynamic_partitions=True)


def test_insert_overwrite_conflicts_and_rebases(spark, monkeypatch, tmp_path):
    """The conflict-matrix replaceWhere row: an overwrite whose remove
    set overlaps a racing writer's files raises ConcurrentWriteConflict;
    a disjoint-file append winner rebases cleanly."""
    root = str(tmp_path / "iowc")
    df = spark.createDataFrame(
        [(i, "de" if i % 2 == 0 else "en") for i in range(10)],
        "id long, lang string")
    snap.create(spark, root, df.coalesce(1))  # one file: guaranteed overlap
    new = spark.createDataFrame([(100, "de")], "id long, lang string")
    fired = _race(monkeypatch, "insert_overwrite",
                  lambda: snap.delete_where(spark, root, "id = 1"))
    with pytest.raises(snap.ConcurrentWriteConflict, match="same files"):
        snap.insert_overwrite(spark, root, new, replace_where="lang = 'de'",
                              max_retries=3)
    assert fired["done"]
    # racing APPEND winner (disjoint files): the overwrite must NOT
    # rebase past it — the appended rows would land inside (or beside)
    # the replaced slice the loser's remove list was computed without
    # seeing. Delta raises ConcurrentAppendException here for any append
    # on an unpartitioned table (r15 review fix).
    root2 = str(tmp_path / "iowc2")
    snap.create(spark, root2, df.coalesce(1))
    extra = spark.createDataFrame([(200, "fr")], "id long, lang string")
    fired = _race(monkeypatch, "insert_overwrite",
                  lambda: snap.append(spark, root2, extra))
    with pytest.raises(snap.ConcurrentWriteConflict, match="appended rows"):
        snap.insert_overwrite(spark, root2, new,
                              replace_where="lang = 'de'", max_retries=1)
    assert fired["done"]
    # dynamic partition overwrite ∥ append to an UNTOUCHED partition:
    # the partition-pruned form of the rule — the rebase is safe and
    # both land (Delta's partition-disjoint ConcurrentAppend exemption)
    root3 = str(tmp_path / "iowc3")
    part = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(12)],
        "id long, grp long, s string")
    snap.create(spark, root3, part, partition_by=["grp"])
    dyn = spark.createDataFrame([(300, 0, "d")], "id long, grp long, s string")
    other = spark.createDataFrame([(400, 1, "a")], "id long, grp long, s string")
    fired = _race(monkeypatch, "insert_overwrite",
                  lambda: snap.append(spark, root3, other))
    snap.insert_overwrite(spark, root3, dyn, dynamic_partitions=True,
                          max_retries=1)
    assert fired["done"]
    got3 = snap.read(spark, root3)
    assert got3.filter("grp = 0").count() == 1        # replaced
    assert got3.filter("id = 400").count() == 1       # raced append landed
    assert got3.filter("grp = 1").count() == 5        # 4 originals + 400
    # ...but an append INTO a dynamically-overwritten partition conflicts
    root4 = str(tmp_path / "iowc4")
    snap.create(spark, root4, part, partition_by=["grp"])
    clash = spark.createDataFrame([(500, 0, "c")], "id long, grp long, s string")
    fired = _race(monkeypatch, "insert_overwrite",
                  lambda: snap.append(spark, root4, clash))
    with pytest.raises(snap.ConcurrentWriteConflict, match="appended rows"):
        snap.insert_overwrite(spark, root4, dyn, dynamic_partitions=True,
                              max_retries=1)
    assert fired["done"]


def test_insert_overwrite_row_tracking_and_sql(spark, tmp_path):
    """Row tracking through an overwrite: survivors of the replaceWhere
    rewrite KEEP their stable row ids, incoming rows mint fresh ones;
    both SQL spellings route to the same writer."""
    from unfccc_documents_database_sandbox_spark.sources.sql_dml import (
        execute_dml,
    )

    root = str(tmp_path / "iowr")
    df = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(10)],
        "id long, grp long, s string")
    snap.create(spark, root, df.coalesce(1), row_tracking=True)
    before = {r.id: r["_row_id"] for r in
              snap.read_with_row_ids(spark, root).collect()}
    execute_dml(
        spark,
        "INSERT INTO t REPLACE WHERE grp = 1 "
        "SELECT id + 500, 1, 'new' FROM t WHERE grp = 1",
        {"t": root})
    after = {r.id: r["_row_id"] for r in
             snap.read_with_row_ids(spark, root).collect()}
    for i in range(0, 10, 2):  # survivors keep ids
        assert after[i] == before[i], f"rid drifted for id {i}"
    minted = {after[k] for k in after if k >= 500}
    assert len(minted) == 5 and minted.isdisjoint(set(before.values()))
    # full-overwrite SQL spelling
    execute_dml(spark, "INSERT OVERWRITE t VALUES (1, 0, 'only')",
                {"t": root})
    assert [(r.id, r.grp, r.s) for r in
            snap.read(spark, root).collect()] == [(1, 0, "only")]


def test_copy_into_idempotent_ledger(spark, tmp_path):
    """VERDICT r14 #3: COPY INTO loads only files the ledger has not
    seen, records them in the SAME commit as the data (atomic), and a
    double run is a bit-exact no-op; new files load incrementally; a
    same-path file that changed size reloads; FORCE ignores the ledger."""
    root = str(tmp_path / "ci")
    src = str(tmp_path / "incoming")
    os.makedirs(src)
    snap.create(spark, root, spark.createDataFrame([], "id long, s string"))
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string") \
        .coalesce(1).write.parquet(os.path.join(src, "b1"))
    r1 = snap.copy_into(spark, root, src)
    assert r1["version"] == 1 and len(r1["loaded"]) == 1
    state1 = sorted(tuple(r) for r in snap.read(spark, root).collect())
    files1 = sorted(snap.live_files(root))
    # double run: no commit, no files, same rows
    r2 = snap.copy_into(spark, root, src)
    assert r2["version"] is None and r2["loaded"] == []
    assert r2["skipped"] == r1["loaded"]
    assert snap.latest_version(root) == 1
    assert sorted(snap.live_files(root)) == files1
    assert sorted(tuple(r) for r in snap.read(spark, root).collect()) \
        == state1
    # incremental: only the new file loads
    spark.createDataFrame([(3, "c")], "id long, s string") \
        .coalesce(1).write.parquet(os.path.join(src, "b2"))
    r3 = snap.copy_into(spark, root, src)
    assert r3["version"] == 2 and len(r3["loaded"]) == 1
    assert all(p.startswith("b2/") for p in r3["loaded"])
    assert snap.read(spark, root).count() == 3
    # the ledger time-travels with the table (index artifact)
    led = snap.get_index(root, "__copy_into__", version=1)["index"]["files"]
    assert len(led) == 1
    led2 = snap.get_index(root, "__copy_into__")["index"]["files"]
    assert len(led2) == 2
    # changed size at the same path reloads (the re-upload rule)
    p1 = [f for f in os.listdir(os.path.join(src, "b2"))
          if f.endswith(".parquet")][0]
    spark.createDataFrame([(4, "d"), (5, "e"), (6, "f")],
                          "id long, s string") \
        .toPandas().to_parquet(os.path.join(src, "b2", p1))
    stale_crc = os.path.join(src, "b2", f".{p1}.crc")
    if os.path.exists(stale_crc):  # Spark's sidecar now mismatches
        os.remove(stale_crc)
    r4 = snap.copy_into(spark, root, src)
    assert r4["version"] == 3 and len(r4["loaded"]) == 1
    got = sorted(r.id for r in snap.read(spark, root).collect())
    assert got == [1, 2, 3, 4, 5, 6]  # old rows stay (append semantics)
    # FORCE reloads everything
    r5 = snap.copy_into(spark, root, src, force=True)
    assert r5["version"] == 4 and len(r5["loaded"]) == 2
    assert snap.read(spark, root).count() == 11
    # pattern filter + unsupported format refuse/apply
    with pytest.raises(ValueError, match="unsupported format"):
        snap.copy_into(spark, root, src, format="avro")


def test_copy_into_sql_and_csv(spark, tmp_path):
    """The SQL spelling routes to the same loader; CSV files load under
    the table schema; PATTERN narrows the listing."""
    from unfccc_documents_database_sandbox_spark.sources.sql_ddl import (
        execute_ddl,
    )

    root = str(tmp_path / "cis")
    src = str(tmp_path / "lz")
    os.makedirs(src)
    snap.create(spark, root,
                spark.createDataFrame([], "id long, s string"))
    with open(os.path.join(src, "a.csv"), "w") as fh:
        fh.write("1,x\n2,y\n")
    with open(os.path.join(src, "b.txt"), "w") as fh:
        fh.write("9,zz\n")
    v = execute_ddl(
        spark,
        f"COPY INTO t FROM '{src}' FILEFORMAT = CSV PATTERN = '\\.csv$'",
        {"t": root})
    assert v == 1
    assert sorted(tuple(r) for r in snap.read(spark, root).collect()) \
        == [(1, "x"), (2, "y")]
    # idempotent from SQL too: returns head, no new commit
    v2 = execute_ddl(
        spark,
        f"COPY INTO t FROM '{src}' FILEFORMAT = CSV PATTERN = '\\.csv$'",
        {"t": root})
    assert v2 == 1 and snap.latest_version(root) == 1


def test_copy_into_pattern_matches_dir_relative_paths(spark, tmp_path):
    """r15 review: PATTERN runs against the source_dir-RELATIVE path
    (the ledger key and the Databricks PATTERN semantics) — a pattern
    with a subdirectory component selects exactly that subtree, and the
    unmatched files still show up as skipped-by-listing never, i.e. they
    are simply outside the listing."""
    import os

    root = str(tmp_path / "cpat")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    snap.create(spark, root, df.limit(0))
    src = str(tmp_path / "land")
    df.filter("id = 1").coalesce(1).write.parquet(os.path.join(src, "b1"))
    df.filter("id = 2").coalesce(1).write.parquet(os.path.join(src, "b2"))
    r = snap.copy_into(spark, root, src, pattern=r"b2/.*\.parquet")
    assert r["version"] is not None
    assert all(p.startswith("b2/") for p in r["loaded"]) and r["loaded"]
    got = sorted(x.id for x in snap.read(spark, root).collect())
    assert got == [2]
    # re-run with the same pattern: pure no-op
    r2 = snap.copy_into(spark, root, src, pattern=r"b2/.*\.parquet")
    assert r2["version"] is None and r2["loaded"] == []
    # widening the pattern loads the b1 subtree the ledger hasn't seen
    r3 = snap.copy_into(spark, root, src, pattern=r"b[12]/.*\.parquet")
    assert sorted(x.id for x in snap.read(spark, root).collect()) == [1, 2]
    assert all(p.startswith("b1/") for p in r3["loaded"])
