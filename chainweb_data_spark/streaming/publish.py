"""Atomic multi-table publish — the parquet-native analog of the reference's
single-transaction write of all six tables per block
(``haskell-src/exec/Chainweb/Worker.hs:50-82``).

Plain ``merge_batch`` appends table-by-table, so a reader between a crash
and its replay can observe a half-applied block (replay converges, but the
window exists).  This module closes the window with a manifest commit:

    out_dir/
      <table>.parquet/<bucket>=<v>/part-*.parquet   data files, append-only
      _manifest/v<N>.json    snapshot: {"tables": {name: [relative files]}}
      _manifest/CURRENT      name of the live snapshot file

A batch stages ALL tables' new files first (files on disk but referenced by
no manifest ⇒ invisible to manifest readers), then publishes one new
manifest and flips ``CURRENT`` via write-tmp + ``os.rename`` — atomic on
POSIX — so a reader holding :func:`read_published` sees the previous
snapshot or the complete new one, never a partial block set.  Crash at ANY
point before the flip leaves orphan data files that no manifest references;
:func:`vacuum` reclaims them, and the duplicate probe only consults
published rows, so the replayed batch re-stages identical content.

Single-writer, like the reference's one ingest worker per database.  With
Delta/Iceberg available this module disappears into their transaction log —
same protocol (stage files, commit one metadata pointer), engine-grade
implementation; the manifest keeps the repo dependency-free.

Scale: the manifest holds file NAMES, not data — O(files) JSON, and the
probe reads published files through the same partition pruning as
``merge_plan`` (the ``basePath`` option preserves bucket-directory
partition columns for an explicit file list).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from .listen import TABLE_PKS, _existing_layout_is_flat, prune_existing_to_batch

_MANIFEST_DIR = "_manifest"


# ---------------------------------------------------------------------------
# manifest I/O
# ---------------------------------------------------------------------------


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, _MANIFEST_DIR)


def read_manifest(out_dir: str) -> dict:
    """The live snapshot: {"version": N, "tables": {name: [relative files]}}
    — or an empty v0 when nothing is published."""
    cur = os.path.join(_manifest_path(out_dir), "CURRENT")
    if not os.path.exists(cur):
        return {"version": 0, "tables": {}}
    with open(cur) as f:
        name = f.read().strip()
    with open(os.path.join(_manifest_path(out_dir), name)) as f:
        return json.load(f)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    """Write v<N>.json then atomically flip CURRENT to it."""
    mdir = _manifest_path(out_dir)
    os.makedirs(mdir, exist_ok=True)
    name = f"v{manifest['version']:09d}.json"
    tmp = os.path.join(mdir, f".{name}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, separators=(",", ":"))
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(mdir, name))
    cur_tmp = os.path.join(mdir, f".CURRENT.{uuid.uuid4().hex}.tmp")
    with open(cur_tmp, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    os.rename(cur_tmp, os.path.join(mdir, "CURRENT"))  # the commit point


def ensure_manifest(out_dir: str) -> dict:
    """Adopt an unmanaged directory into the manifest protocol — the
    rewrite-compat shim that lets ``atomic=True`` be the DEFAULT sink over
    tables previously written by the plain table-by-table ``merge_batch``
    path.

    When no ``CURRENT`` exists, every data file already under a
    ``<table>.parquet`` directory is committed as snapshot v1 (legacy rows
    stay visible to ``read_published`` and to the duplicate probe, so the
    switch appends nothing twice).  On a FRESH directory this commits an
    EMPTY v1 — deliberately, and before any staging: once ``CURRENT``
    exists, a crash mid-stage can never be mistaken for adoptable legacy
    data on replay (files outside the manifest are orphans, reclaimed by
    :func:`vacuum`).  The only unsupported shape is a directory holding
    half-staged files from a crashed manifest-LESS writer — don't mix
    writers mid-crash.  Idempotent; returns the live manifest."""
    cur = os.path.join(_manifest_path(out_dir), "CURRENT")
    if os.path.exists(cur):
        return read_manifest(out_dir)
    tables: dict[str, list[str]] = {}
    if os.path.isdir(out_dir):
        for entry in sorted(os.listdir(out_dir)):
            if not entry.endswith(".parquet"):
                continue
            tdir = os.path.join(out_dir, entry)
            if not os.path.isdir(tdir):
                continue
            rels = [
                os.path.relpath(os.path.join(root, fname), tdir)
                for root, _dirs, files in os.walk(tdir)
                for fname in files
                if not fname.startswith(("_", "."))
            ]
            if rels:
                tables[entry[: -len(".parquet")]] = sorted(rels)
    manifest = {"version": 1, "tables": tables}
    _write_manifest(out_dir, manifest)
    return manifest


def read_published(
    spark: SparkSession, out_dir: str, table: str
) -> DataFrame | None:
    """The committed view of ``table``: exactly the manifest's file list,
    with bucket partition columns preserved (``basePath``) so probe filters
    still prune.  ``None`` when the table has no published rows."""
    files = read_manifest(out_dir)["tables"].get(table, [])
    if not files:
        return None
    tdir = os.path.join(out_dir, f"{table}.parquet")
    return spark.read.option("basePath", tdir).parquet(
        *[os.path.join(tdir, f) for f in files]
    )


# ---------------------------------------------------------------------------
# staged write + commit
# ---------------------------------------------------------------------------


def _stage_table(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    table: str,
    pk: tuple[str, ...],
) -> list[str]:
    """Anti-join ``df`` against the PUBLISHED rows (bounded by the same
    bucket pruning as merge_plan), write the survivors partition-laid-out
    into the table directory, and return the new files' relative paths —
    on disk but in no manifest until the caller commits."""
    from pyspark.sql import functions as F  # noqa: F401

    batch = df.dropDuplicates(list(pk))
    bucket_col = next(
        (c for c in ("height_bucket", "key_bucket") if c in batch.columns), None
    )
    existing = read_published(spark, out_dir, table)
    if existing is not None:
        existing = prune_existing_to_batch(existing, batch, bucket_col)
        batch = batch.join(existing.select(*pk), on=list(pk), how="left_anti")

    staging = os.path.join(out_dir, "_staging", f"{table}-{uuid.uuid4().hex}")
    tdir = os.path.join(out_dir, f"{table}.parquet")
    writer = batch.write.mode("overwrite")
    # an ADOPTED legacy table may be flat (bucket col in the data, not the
    # directory name) — match it: mixing partition subdirs beside flat files
    # would give readers conflicting schemas for the bucket column
    if bucket_col is not None and not _existing_layout_is_flat(tdir):
        writer = writer.partitionBy(bucket_col)
    writer.parquet(staging)

    # move data files into the table dir, preserving the partition-relative
    # path; part file names embed a UUID so collisions can't occur
    moved: list[str] = []
    for root, _dirs, files in os.walk(staging):
        for fname in files:
            if fname.startswith(("_", ".")):
                continue
            rel = os.path.relpath(os.path.join(root, fname), staging)
            dest = os.path.join(tdir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.rename(os.path.join(root, fname), dest)
            moved.append(rel)
    shutil.rmtree(staging, ignore_errors=True)
    return sorted(moved)


def publish_batch(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    out_dir: str,
    pks: dict[str, tuple[str, ...]] | None = None,
) -> dict:
    """Stage every table's merge, then commit ONE manifest covering all of
    them — the Worker.hs:50-82 transaction boundary.  Returns the committed
    manifest."""
    pks = pks or TABLE_PKS
    # adopt legacy (manifest-less) layouts and pin CURRENT before staging —
    # see ensure_manifest for why this must precede the first staged file
    manifest = ensure_manifest(out_dir)
    new_tables = {t: list(fs) for t, fs in manifest["tables"].items()}
    for name, df in tables.items():
        new_files = _stage_table(spark, df, out_dir, name, pks[name])
        if new_files:
            new_tables.setdefault(name, []).extend(new_files)
    committed = {"version": manifest["version"] + 1, "tables": new_tables}
    _write_manifest(out_dir, committed)
    return committed


def compact_published(
    spark: SparkSession,
    out_dir: str,
    table: str,
    min_files: int = 2,
    target_files: int = 1,
) -> dict[str, tuple[int, int]]:
    """Manifest-aware compaction: rewrite each partition's many LIVE files
    (the manifest's list, not the directory's) into ``target_files``, then
    commit the swap as ONE manifest flip — a reader sees the old snapshot
    or the compacted one, never a mix; rows are preserved exactly.  The
    replaced files fall out of the manifest and are reclaimed by
    :func:`vacuum` (called here — safe under the single-writer
    assumption).  This is the append-only sink's autovacuum: per-batch
    writes bound file growth per batch (coalesce(1) in the sinks), but
    cumulative growth is O(batches) and probe cost is O(live files) at
    the parquet-open layer — periodic compaction is the long-run bound.
    Returns {partition: (files_before, files_after)}."""
    from collections import defaultdict

    manifest = read_manifest(out_dir)
    files = manifest["tables"].get(table, [])
    if not files:
        return {}
    tdir = os.path.join(out_dir, f"{table}.parquet")
    by_part: dict[str, list[str]] = defaultdict(list)
    for rel in files:
        by_part[os.path.dirname(rel)].append(rel)
    new_list: list[str] = []
    done: dict[str, tuple[int, int]] = {}
    for part in sorted(by_part):
        rels = by_part[part]
        if len(rels) <= max(min_files, target_files):
            new_list.extend(rels)
            continue
        df = spark.read.parquet(*[os.path.join(tdir, r) for r in rels])
        staging = os.path.join(
            out_dir, "_staging", f"compact-{table}-{uuid.uuid4().hex}"
        )
        df.coalesce(target_files).write.mode("overwrite").parquet(staging)
        moved: list[str] = []
        for fname in sorted(os.listdir(staging)):
            if fname.startswith(("_", ".")):
                continue
            dest_rel = os.path.join(part, fname) if part else fname
            dest = os.path.join(tdir, dest_rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.rename(os.path.join(staging, fname), dest)
            moved.append(dest_rel)
        shutil.rmtree(staging, ignore_errors=True)
        new_list.extend(moved)
        done[part or "."] = (len(rels), len(moved))
    if done:
        _write_manifest(
            out_dir,
            {
                "version": manifest["version"] + 1,
                "tables": {**manifest["tables"], table: sorted(new_list)},
            },
        )
        vacuum(out_dir)
    return done


def vacuum(out_dir: str) -> list[str]:
    """Delete data files referenced by NO manifest snapshot (crash orphans
    from batches that staged but never committed) plus leftover staging
    dirs.  Safe under the single-writer assumption: a file outside every
    manifest can never be read via read_published."""
    manifest = read_manifest(out_dir)
    removed: list[str] = []
    shutil.rmtree(os.path.join(out_dir, "_staging"), ignore_errors=True)
    if not os.path.isdir(out_dir):
        return removed
    for entry in os.listdir(out_dir):
        if not entry.endswith(".parquet"):
            continue
        table = entry[: -len(".parquet")]
        live = set(manifest["tables"].get(table, []))
        tdir = os.path.join(out_dir, entry)
        if not os.path.isdir(tdir):
            continue
        for root, _dirs, files in os.walk(tdir):
            for fname in files:
                if fname.startswith(("_", ".")):
                    continue
                rel = os.path.relpath(os.path.join(root, fname), tdir)
                if rel not in live:
                    os.remove(os.path.join(root, fname))
                    removed.append(os.path.join(entry, rel))
    return sorted(removed)
