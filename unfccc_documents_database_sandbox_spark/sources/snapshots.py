"""Minimal snapshot/commit-log table format (VERDICT r06 #6).

SURVEY §1.4 maps the reference's ORM entities to "Parquet (+ optionally
Delta)"; `merge_upsert` reproduces the MERGE physical shape and
`layout_compaction(_apply)` the OPTIMIZE rewrite, but neither gives the
table a transactional story. This module adds the missing 20%: a
versioned commit log over plain parquet files — the Delta/Iceberg core
protocol stripped to what the sandbox can express:

- A table is a directory: `data/v{N}/part-*.parquet` payload files plus
  `_log/{N:08d}.json` commit records, each listing the files the commit
  ADDs and REMOVEs (logical removal only — payload files are immutable
  and never deleted, which is exactly what makes time travel free).
- A snapshot at version V is the replay of commits 0..V: the live set =
  union of adds minus union of removes. Readers resolve the file list
  from the log and read ONLY those files — writers never block readers,
  and a reader pinned to V is immune to later commits (snapshot
  isolation by construction).
- A commit is one JSON file created with os.open(O_CREAT|O_EXCL) — the
  POSIX atomic create-if-absent. Two concurrent writers racing to the
  same version: exactly one wins, the loser gets FileExistsError and
  must rebase (optimistic concurrency — the same protocol Delta runs on
  object stores via put-if-absent).
- DELETE is copy-on-write: read only the live files that contain
  matching rows, rewrite them without those rows as a new version's
  files, commit (add: rewritten, remove: originals). Untouched files
  are carried forward by reference, not rewritten — at 100 TB a delete
  touching 0.1% of files costs 0.1% of a full rewrite.

Scale notes: the log is O(commits) tiny JSON; production systems add
checkpoint compaction once replay cost matters (documented seam, not
needed at sandbox commit counts). File pruning via per-file min/max
stats would slot in at `live_files` (the layout_zorder story). The
schema is pinned in commit 0 and supplied on every read, so partition-
value/type inference can never drift a read (the r06
layout_compaction_apply lesson).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _log_dir(root: str) -> str:
    return os.path.join(root, "_log")


def _commit_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.json")


def _data_files(root: str, version: int) -> list[str]:
    """Relative paths of the parquet part files under data/v{version}."""
    vdir = os.path.join(root, "data", f"v{version}")
    out = []
    for fn in sorted(os.listdir(vdir)):
        if fn.endswith(".parquet"):
            out.append(os.path.join("data", f"v{version}", fn))
    return out


def _write_commit(root: str, version: int, add: list[str], remove: list[str],
                  schema_json: str | None = None) -> None:
    """Atomically publish one commit: O_CREAT|O_EXCL create-if-absent is the
    linearization point — a concurrent writer racing to the same version
    number loses with FileExistsError and must re-resolve HEAD and retry
    (optimistic concurrency, the object-store-friendly protocol)."""
    os.makedirs(_log_dir(root), exist_ok=True)
    payload = {"version": version, "add": add, "remove": remove}
    if schema_json is not None:
        payload["schema"] = schema_json
    fd = os.open(_commit_path(root, version), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    with os.fdopen(fd, "w") as fh:
        json.dump(payload, fh)


def _read_log(root: str) -> list[dict]:
    """All commits in version order; gaps are protocol corruption."""
    names = sorted(fn for fn in os.listdir(_log_dir(root)) if fn.endswith(".json"))
    commits = []
    for i, fn in enumerate(names):
        with open(os.path.join(_log_dir(root), fn), encoding="utf-8") as fh:
            c = json.load(fh)
        if c["version"] != i:
            raise ValueError(f"commit log gap: file {fn} carries version {c['version']}")
        commits.append(c)
    return commits


def latest_version(root: str) -> int:
    return len(_read_log(root)) - 1


def live_files(root: str, version: int | None = None) -> list[str]:
    """Replay the log through ``version`` (default: HEAD): live set =
    adds − removes. Order-stable (sorted) so reads are deterministic."""
    commits = _read_log(root)
    if version is None:
        version = len(commits) - 1
    if not 0 <= version < len(commits):
        raise ValueError(f"version {version} not in [0, {len(commits) - 1}]")
    live: set[str] = set()
    for c in commits[: version + 1]:
        live -= set(c["remove"])
        live |= set(c["add"])
    return sorted(live)


def table_schema(root: str) -> StructType:
    return StructType.fromJson(json.loads(_read_log(root)[0]["schema"]))


def create(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Initialize the table: write v0's files and commit 0 (which pins the
    table schema for every later read)."""
    shutil.rmtree(root, ignore_errors=True)
    df.write.parquet(os.path.join(root, "data", "v0"))
    _write_commit(root, 0, _data_files(root, 0), [], schema_json=df.schema.json())
    return 0


def append(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Append-only commit: new files added, nothing removed."""
    version = latest_version(root) + 1
    df.write.parquet(os.path.join(root, "data", f"v{version}"))
    _write_commit(root, version, _data_files(root, version), [])
    return version


def read(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Snapshot read (time travel when ``version`` is given): resolve the
    live file list from the log and scan only those files under the pinned
    schema. A version-0 read after any number of later commits returns
    exactly v0's rows — the files it references are immutable."""
    files = live_files(root, version)
    if not files:
        return spark.createDataFrame([], table_schema(root))
    return spark.read.schema(table_schema(root)).parquet(
        *[os.path.join(root, f) for f in files]
    )


def merge_into(
    spark: SparkSession, root: str, source: DataFrame, key_cols: list[str]
) -> int:
    """Transactional MERGE (upsert): rows in ``source`` whose key matches a
    live row REPLACE it; unmatched source rows are inserted — as ONE atomic
    commit, giving the plans/relational.py `merge_upsert` physical shape
    (keyed anti-join + union) a commit-log story. Copy-on-write like
    delete_where: only files CONTAINING matched keys are rewritten (their
    unmatched rows are carried into the rewrite; every other file moves by
    log reference). Readers of older versions are untouched.

    At 100 TB the matched-file discovery is a broadcast semi-join of the
    (small) source key set against one corpus scan — file granularity is
    what bounds the rewrite, exactly Delta's MERGE story."""
    version = latest_version(root) + 1
    files = live_files(root, version - 1)
    schema = table_schema(root)
    paths = {os.path.realpath(os.path.join(root, f)): f for f in files}
    cur = spark.read.schema(schema).parquet(*paths)
    keys = source.select(*key_cols).distinct()
    hit_rows = (
        cur.join(F.broadcast(keys), key_cols, "left_semi")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    hit = sorted(
        paths[os.path.realpath(r.f[len("file:"):] if r.f.startswith("file:") else r.f)]
        for r in hit_rows
    )
    vdir = os.path.join(root, "data", f"v{version}")
    if hit:
        survivors = spark.read.schema(schema).parquet(
            *[os.path.join(root, f) for f in hit]
        ).join(F.broadcast(keys), key_cols, "left_anti")
        out = survivors.unionByName(source.select(*[f.name for f in schema]))
    else:
        out = source.select(*[f.name for f in schema])
    out.write.parquet(vdir)
    _write_commit(root, version, _data_files(root, version), hit)
    return version


def compact(spark: SparkSession, root: str, max_files: int = 4) -> int:
    """OPTIMIZE: rewrite the live file set down to ``max_files`` files as
    one commit (add: coalesced rewrite, remove: everything it replaced) —
    the layout_compaction small-files fix, transactional. Contents are
    bit-identical; only the physical layout changes, so any pinned reader
    of an older version still sees its own files."""
    version = latest_version(root) + 1
    files = live_files(root, version - 1)
    schema = table_schema(root)
    cur = spark.read.schema(schema).parquet(
        *[os.path.join(root, f) for f in files]
    )
    cur.coalesce(max_files).write.parquet(
        os.path.join(root, "data", f"v{version}")
    )
    _write_commit(root, version, _data_files(root, version), files)
    return version


def delete_where(spark: SparkSession, root: str, condition: str) -> int:
    """Copy-on-write DELETE: find the live files that CONTAIN matching rows
    (one scan with input_file_name), rewrite only those files without the
    matching rows, and commit (add: rewrites, remove: originals). Files
    with no matches are untouched — carried forward by log reference."""
    version = latest_version(root) + 1
    files = live_files(root, version - 1)
    schema = table_schema(root)
    abs_of = {os.path.realpath(os.path.join(root, f)): f for f in files}
    cur = spark.read.schema(schema).parquet(*abs_of)
    hit_rows = (
        cur.filter(condition)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    # input_file_name is a file: URI; map back to log-relative paths
    hit = sorted(
        abs_of[os.path.realpath(r.f[len("file:"):] if r.f.startswith("file:") else r.f)]
        for r in hit_rows
    )
    if not hit:
        _write_commit(root, version, [], [])
        return version
    # DELETE semantics: remove rows where the predicate is TRUE; rows where
    # it evaluates NULL are kept (NOT(cond) would silently drop them).
    kept = spark.read.schema(schema).parquet(
        *[os.path.join(root, f) for f in hit]
    ).filter(f"({condition}) IS NOT TRUE")
    kept.write.parquet(os.path.join(root, "data", f"v{version}"))
    _write_commit(root, version, _data_files(root, version), hit)
    return version
