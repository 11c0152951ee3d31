"""Compressed deletion vectors (VERDICT r12 #6): DV payloads are now one
bit-packed bitmap row per data file instead of (src, pos) parquet rows.
These tests pin the encoding-level contracts the (unchanged) MoR protocol
suite can't see: the on-disk size bound, decode exactness, supersede-OR
dedup, and the stale-row scoping of the pointer-filtered reader."""

from __future__ import annotations

import os

import pytest

from unfccc_documents_database_sandbox_spark.sources import snapshots as snap


@pytest.fixture()
def mor_table(spark, tmp_path):
    root = str(tmp_path / "dvt")
    df = spark.createDataFrame(
        [(i, i % 7, f"p{i}") for i in range(2000)],
        "id long, grp long, payload string",
    )
    snap.create(spark, root, df.repartition(4))
    return root


def _dv_disk_bytes(root: str) -> int:
    state_parts = {
        p for ps in snap.dv_map(root).values() for p in ps
    }
    data_root = snap._data_root(root)
    return sum(
        os.path.getsize(os.path.join(data_root, p)) for p in state_parts
    )


def test_dv_bitmap_size_bound(spark, mor_table):
    """The r12 verdict's 'Done' criterion: DV bytes ≪ positions × 16.
    1000 scattered deletes across 4 files must cost (well) under the
    row-form floor — the bitmaps themselves are ≤ rows/8 bytes per file
    and the parquet container stays small because there are 4 rows."""
    snap.delete_where_mor(spark, mor_table, "id % 2 = 0")
    n_pos = 1000
    disk = _dv_disk_bytes(mor_table)
    assert disk < n_pos * 16, f"DV payload {disk}B >= row-form floor"
    # decoded cardinality is exact and matches the bitmap rows' card
    ents = snap.dv_entries(spark, mor_table)
    assert ents.count() == n_pos
    bm = snap._read_dv_bitmaps(spark, mor_table, snap.dv_map(mor_table))
    rows = bm.collect()
    assert sum(r.card for r in rows) == n_pos
    assert len(rows) == 4  # one bitmap row per DV'd file
    # bitmap payload bytes are bounded by (max position / 8) + 1
    assert all(len(r.dv_bytes) <= 2000 // 8 + 1 for r in rows)
    # and the read is correct
    assert snap.read(spark, mor_table).count() == 1000
    assert snap.read(spark, mor_table).filter("id % 2 = 0").count() == 0


def test_dv_supersede_bitmap_or_dedupes(spark, mor_table):
    """Two overlapping MoR deletes: the superseding bitmap is the OR of
    old and new positions — each position exactly once in the decode
    (the row-form union could only promise this when affected-file sets
    never chained; the bitmap makes it structural)."""
    snap.delete_where_mor(spark, mor_table, "id % 3 = 0")   # 667 rows
    snap.delete_where_mor(spark, mor_table, "id % 5 = 0")   # +266 new
    want_deleted = len(
        [i for i in range(2000) if i % 3 == 0 or i % 5 == 0])  # 933
    ents = snap.dv_entries(spark, mor_table)
    assert ents.count() == want_deleted == ents.distinct().count()
    assert snap.read(spark, mor_table).filter(
        "id % 3 = 0 OR id % 5 = 0").count() == 0
    assert snap.read(spark, mor_table).count() == 2000 - want_deleted


def test_dv_pointer_scoping_ignores_stale_rows(spark, mor_table):
    """A payload dir keeps a stale bitmap row for a file whose pointer
    later moved to a superseding dir. Reading v1's pointer map must use
    v1's bitmaps, head's map must use head's — time travel through DV
    versions stays exact."""
    v1 = snap.delete_where_mor(spark, mor_table, "id < 100")
    v2 = snap.delete_where_mor(spark, mor_table, "id >= 100 AND id < 150")
    assert snap.read(spark, mor_table, v1).count() == 1900
    assert snap.read(spark, mor_table, v2).count() == 1850
    e1 = snap.dv_entries(spark, mor_table, version=v1)
    e2 = snap.dv_entries(spark, mor_table, version=v2)
    assert e1.count() == 100 and e2.count() == 150
    # the superseding dir's rows never leak into the v1 decode
    assert snap.read(spark, mor_table, v1).filter(
        "id >= 100 AND id < 150").count() == 50


def test_dv_offset_window_sparse_tail_delete(spark, tmp_path):
    """The offset window: a single delete near the END of a file costs
    ~1 byte of bitmap (plus the offset), not O(file rows / 8) of
    leading zeros — the sparse-trickle case dense bitmaps get wrong."""
    root = str(tmp_path / "dvsparse")
    df = spark.createDataFrame([(i,) for i in range(50_000)], "id long")
    snap.create(spark, root, df.coalesce(1))
    snap.delete_where_mor(spark, root, "id = 49999")
    rows = snap._read_dv_bitmaps(spark, root, snap.dv_map(root)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.card == 1 and len(r.dv_bytes) <= 8, (
        f"sparse tail delete stored {len(r.dv_bytes)} bitmap bytes")
    assert r.start_byte > 0
    ents = {(e.src, e.pos) for e in snap.dv_entries(spark, root).collect()}
    assert len(ents) == 1 and next(iter(ents))[1] == 49_999
    assert snap.read(spark, root).count() == 49_999
    assert snap.read(spark, root).filter("id = 49999").count() == 0
    # a later low-position delete widens the window but stays exact
    snap.delete_where_mor(spark, root, "id = 3")
    got = sorted(e.pos for e in snap.dv_entries(spark, root).collect())
    assert got == [3, 49_999]
    assert snap.read(spark, root).count() == 49_998


def test_dv_both_extremes_two_tiny_containers(spark, tmp_path):
    """Roaring-style chunking: deletes at BOTH extremes of a 200k-row
    file land in two ~1-byte containers instead of one span-wide
    window — the caveat the flat offset window had."""
    root = str(tmp_path / "dvchunk")
    df = spark.createDataFrame([(i,) for i in range(200_000)], "id long")
    snap.create(spark, root, df.coalesce(1))
    snap.delete_where_mor(spark, root, "id = 0 OR id = 199999")
    rows = sorted(
        snap._read_dv_bitmaps(spark, root, snap.dv_map(root)).collect(),
        key=lambda r: r.chunk,
    )
    assert [r.chunk for r in rows] == [0, 199_999 // 65_536]
    assert all(r.card == 1 and len(r.dv_bytes) <= 8 for r in rows)
    total_bytes = sum(len(r.dv_bytes) for r in rows)
    assert total_bytes <= 16, f"both-extremes delete stored {total_bytes}B"
    got = sorted(e.pos for e in snap.dv_entries(spark, root).collect())
    assert got == [0, 199_999]
    head = snap.read(spark, root)
    assert head.count() == 199_998
    assert head.filter("id IN (0, 199999)").count() == 0
    assert head.filter("id IN (1, 199998, 65536)").count() == 3


def test_dv_update_mor_and_row_ids_survive_encoding(spark, tmp_path):
    """update_where_mor under bitmap DVs: old copies die via the bitmap
    probe, appended postimages carry the same stable row ids."""
    root = str(tmp_path / "dvu")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(300)], "id long, score long")
    snap.create(spark, root, df.repartition(3), row_tracking=True)
    rid_before = {
        r.id: r._row_id
        for r in snap.read_with_row_ids(spark, root).collect()
    }
    snap.update_where_mor(spark, root, "id % 4 = 1", {"score": "-score"})
    got = {r.id: (r.score, r._row_id)
           for r in snap.read_with_row_ids(spark, root).collect()}
    assert len(got) == 300
    for i in range(300):
        want = -i * 10 if i % 4 == 1 else i * 10
        assert got[i] == (want, rid_before[i])


def _legacy_write_dv_parts(root, entries):
    """What the pre-bitmap engine wrote: plain (src, pos) parquet rows."""
    pdir = snap._new_payload_dir(root)
    entries.select("src", "pos").write.parquet(pdir)
    return snap._dir_files(root, pdir)


def test_dv_legacy_row_format_parts_still_decode(spark, mor_table,
                                                 monkeypatch):
    """r13 ADVICE high: a table whose DV parts were written by the
    row-format era ((src, pos) rows, no dv_bytes column) must decode
    exactly — NOT NULL-read under the bitmap schema and silently
    resurrect its deletes. The reader routes each part by its parquet
    footer schema."""
    monkeypatch.setattr(snap, "_write_dv_parts", _legacy_write_dv_parts)
    snap.delete_where_mor(spark, mor_table, "id % 2 = 0")
    monkeypatch.undo()
    # head read: 1000 even ids stay deleted through the legacy decode
    head = snap.read(spark, mor_table)
    assert head.count() == 1000
    assert head.filter("id % 2 = 0").count() == 0
    ents = snap.dv_entries(spark, mor_table)
    assert ents.count() == 1000 == ents.distinct().count()
    # a bitmap-era delete SUPERSEDES the legacy entries: the OR unions
    # legacy-decoded positions with the new ones, each exactly once
    snap.delete_where_mor(spark, mor_table, "id % 3 = 0")
    want = len([i for i in range(2000) if i % 2 == 0 or i % 3 == 0])
    ents2 = snap.dv_entries(spark, mor_table)
    assert ents2.count() == want == ents2.distinct().count()
    assert snap.read(spark, mor_table).count() == 2000 - want


def test_dv_unknown_encoding_refuses(spark, mor_table, monkeypatch):
    """A DV part with NEITHER pos nor dv_bytes is a future encoding —
    the reader refuses loudly instead of guessing."""
    def _alien_write(root, entries):
        pdir = snap._new_payload_dir(root)
        entries.select(
            entries.src, entries.pos.alias("mystery")
        ).write.parquet(pdir)
        return snap._dir_files(root, pdir)

    monkeypatch.setattr(snap, "_write_dv_parts", _alien_write)
    snap.delete_where_mor(spark, mor_table, "id < 10")
    monkeypatch.undo()
    with pytest.raises(ValueError, match="unknown encoding"):
        snap.read(spark, mor_table).count()


def test_dv_first_bitmap_write_raises_protocol(spark, mor_table):
    """r13 ADVICE high (the protocol half): the first bitmap-DV commit on
    a table stamped below (reader 4, writer 3) raises the requirement IN
    THE SAME COMMIT — Delta's protocol-action rule — so a row-format-era
    engine refuses the table instead of resurrecting deletes. Tables
    already at the requirement keep their DV commits data-only."""
    import json
    import os

    # simulate a pre-bitmap-era table: downgrade commit 0's stamp
    p = snap._commit_path(mor_table, 0)
    with open(p, encoding="utf-8") as fh:
        c = json.load(fh)
    assert c["protocol"] == {"reader": 4, "writer": 3}  # engine max today
    c["protocol"] = {"reader": 3, "writer": 2}
    tmp = p + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(c, fh)
    os.replace(tmp, p)
    assert snap._read_state(mor_table)["protocol"] == {
        "reader": 3, "writer": 2}
    v = snap.delete_where_mor(spark, mor_table, "id < 100")
    commit = snap._load_commit(mor_table, v)
    assert commit.get("protocol") == {"reader": 4, "writer": 3}
    assert snap._read_state(mor_table)["protocol"] == {
        "reader": 4, "writer": 3}
    assert snap.read(spark, mor_table).count() == 1900
    # second DV commit: requirement already met -> data-only commit
    v2 = snap.delete_where_mor(spark, mor_table, "id >= 1900")
    assert "protocol" not in snap._load_commit(mor_table, v2)
    assert snap.read(spark, mor_table).count() == 1800
