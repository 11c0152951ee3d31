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
