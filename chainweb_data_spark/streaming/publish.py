"""Atomic multi-table publish on a parquet transaction log — the
parquet-native analog of the reference's single-transaction write of all six
tables per block (``haskell-src/exec/Chainweb/Worker.hs:50-82``).

Plain ``merge_batch`` appends table-by-table, so a reader between a crash
and its replay can observe a half-applied block (replay converges, but the
window exists).  This module closes the window with a commit log:

    out_dir/
      <table>.parquet/<bucket>=<v>/part-*.parquet   data files, append-only
      _manifest/v<N>.json    commit N: full snapshot (checkpoint) or an
                             incremental {add, remove} delta against N-1
      _manifest/CURRENT      discovery hint naming the newest commit file

A batch stages ALL tables' new files first (files on disk but referenced by
no commit ⇒ invisible to snapshot readers), then publishes ONE commit.  The
commit point is the creation of ``v<N>.json`` itself via ``os.link`` —
put-if-absent on POSIX — so (a) a reader holding :func:`read_published`
sees the previous snapshot or the complete new one, never a partial block
set, and (b) two writers racing for version N cannot both win: the loser
gets :class:`ConcurrentWriteError` and rebases (optimistic concurrency,
the Delta-log protocol on a filesystem with atomic link).  ``CURRENT`` is
only a hint — readers probe forward from it, so a crash between the link
and the hint update loses nothing.  Crash at ANY point before the link
leaves orphan data files that no commit references; :func:`vacuum`
reclaims them (with a ``min_age_s`` grace window so a CONCURRENT writer's
staged-but-uncommitted files — indistinguishable from crash orphans by
reference alone — survive until its commit lands), and the duplicate
probe only consults published rows (null-safe on PK components, like
``merge_plan``), so the replayed batch re-stages identical content — or
stages nothing at all, in which case NO commit is written (a version
burned per replay would silently shrink the retention horizon).

Scale properties (the reasons a 100 TB table needs a log, not a listing):

- **O(delta) commits.**  A commit writes only its added/removed file names;
  every ``CHECKPOINT_EVERY``-th commit also writes a full snapshot so a
  reader replays at most ``CHECKPOINT_EVERY - 1`` tiny deltas.  The v5
  manifest rewrote the entire O(live files) list on every batch — at
  millions of files that rewrite IS the commit cost; here it is amortized
  to O(delta + files/CHECKPOINT_EVERY).
- **No directory listings.**  Readers get explicit file lists from the
  snapshot (``basePath`` preserves bucket-partition columns), so the
  object-store LIST that dominates partitioned-table reads at scale never
  happens.
- **File skipping.**  Staging records per-file min/max column stats from
  the parquet footers into the commit; ``read_published(where=...)``
  prunes files whose ranges are disjoint from the predicate — finer than
  directory partition pruning, the same mechanism as Delta/Iceberg data
  skipping.
- **Time travel.**  ``read_manifest``/``read_published`` accept
  ``version=`` — any retained commit resolves to its exact snapshot
  (``vacuum`` bounds how far back the data files themselves survive).

Concurrent writers rebase with CONFLICT DETECTION (r9): a losing writer
compares its staged files' partition directories with what the racers
ADDED in between — overlapping tables re-run their PK anti-join against
the fresh snapshot (duplicates a racer published are dropped; the stale
staging is vacuumed as an orphan), disjoint tables rebase verbatim (the
fast path — the reference's disjoint-chain-range workers never pay a
re-stage).  Partition values are deterministic functions of row content
(height/key buckets), so directory disjointness implies PK disjointness;
flat tables conservatively re-stage on any same-table race.
Single-writer deployments never rebase at all.

With Delta/Iceberg available this module disappears into their transaction
log — same protocol (stage files, commit one metadata delta, checkpoint,
vacuum), engine-grade implementation; the log here keeps the repo
dependency-free.

Checkpoints are PARQUET (r9 — Delta's move, closing the former "known
residual"): the per-checkpoint commit JSON stays O(1) bytes (version,
op, pin fold, a sidecar reference and row count) while the O(live files)
snapshot — file names and their per-file stats — lives in a zstd
parquet sidecar next to the log.  The stats column is the bulk of
checkpoint bytes and the part most readers never need, so consumers that
want only file SETS (vacuum's live-set sweep, pin_version's
re-readability probes) read the sidecar column-pruned via
:func:`_snapshot_files` — the stats bytes are never fetched.  The commit
point is unchanged (sidecars are staged and fsynced BEFORE the
``os.link`` of the JSON, so a crash in between leaves an orphan sidecar
that :func:`vacuum` reclaims by its embedded version, age-gated).
Pre-r9 stores (checkpoints with inline ``tables``) read unchanged.

Snapshot resolution is CLUSTER-SIDE on the scale path (r10, closing the
former "known residual at extreme file counts"): :func:`snapshot_files_df`
reads the checkpoint sidecar as a Spark DataFrame and ships only the
O(delta) commits since it from the driver, so ``vacuum(spark=...)`` plans
its orphan sweep as a distributed-listing anti-join (collecting only the
orphans it deletes — Delta's vacuum shape) and ``pin_version(spark=...)``
probes snapshot re-readability in executors (collecting at most one
missing row).  ``read_published`` resolves PER TABLE through a filtered,
column-pruned sidecar read — O(that table's files), never O(all live
files), with stats bytes fetched only when a ``where`` needs them.  The
remaining O(table files) driver artifact is the explicit path list handed
to ``spark.read`` — the same place Delta keeps it (a scan's file index
lives on the JVM driver by construction).

Checkpoint WRITES are cluster-side too (r11, closing the last
O(live files) driver path): past :data:`CLUSTER_PATH_MIN_FILES` a
checkpoint's sidecar is DERIVED by Spark from the previous sidecar plus
the O(delta) commit chain and written by a Spark job
(:func:`_write_checkpoint_spark`) — the driver ships only the delta and
links the O(1) commit JSON; row order and stats encoding match the
driver builder byte-for-byte.  Every writer (publish, compact, z-order,
expire, rewrite, pin) now commits DELTA-form through
:func:`_commit_delta` — exactly the files it changed, no parent
hydration or set-diff anywhere between checkpoints — and the
maintenance ops resolve their inputs per-table.  The cluster paths
AUTO-SELECT: ``vacuum``/``pin_version``/``unpin_version`` default to
:data:`AUTO`, which picks the active SparkSession once the store's
live-file count (free metadata: ``n_files`` in every checkpoint commit
+ delta folds, :func:`_store_n_files`) crosses the threshold; explicit
``spark=None`` keeps the dependency-free driver path, fine to ~10^6
files.  The 1M/4M-file sweeps comparing all paths are
``scripts/txlog_rehearsal.py`` rows.

The STORAGE SEAM (r12 — Delta's LogStore move): every
durability/atomicity-bearing call on the LOG surface — the
put-if-absent commit link, the CURRENT hint, sidecar writes/reads,
orphan sweeps, staging reclamation, and the executor probe/walk
closures — goes through the injectable :data:`LOG_STORE`
(:class:`~.logstore.PosixLogStore` by default), so an object-store
backend (conditional PUT) slots in without touching protocol code;
URL-scheme ``out_dir``s are refused by the POSIX backend instead of
silently becoming local relative paths.  DATA files stay on the data
plane: Spark writes staged parquet and ``read_published`` scans by
path, exactly as Delta moves data through Hadoop filesystems — the
three staging moves (``_stage_table``, ``compact_published``,
``rewrite_published_many``) are same-filesystem renames of
Spark-written files and remain native.  ``tests/test_logstore.py``
runs a whole driver-path lifecycle against the in-memory backend with
a real-filesystem bypass trap.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .listen import TABLE_PKS, _existing_layout_is_flat, prune_existing_to_batch
from .logstore import InMemoryLogStore, PosixLogStore  # noqa: F401

#: the txlog's storage seam (r12 — Delta's LogStore move): every
#: durability/atomicity-bearing call on the LOG surface (commit JSONs,
#: CURRENT, sidecars, orphan sweeps, probe/walk closures) goes through
#: this object, so an object-store backend slots in without touching
#: protocol code.  Swap per-deployment (``publish.LOG_STORE = MyStore()``)
#: — DATA files are still written/read by Spark by path, exactly as
#: Delta reads data through Hadoop filesystems (see logstore.py).
LOG_STORE = PosixLogStore()

_MANIFEST_DIR = "_manifest"

#: every Nth commit is written as a full snapshot; readers replay at most
#: N-1 incremental deltas on top of the nearest checkpoint at or below the
#: requested version.
CHECKPOINT_EVERY = 16

#: per-file stats are kept for at most this many columns (footer order) to
#: bound commit JSON size on wide tables.
_MAX_STATS_COLUMNS = 24

#: live-file count past which the maintenance consumers (vacuum,
#: pin_version, checkpoint construction) AUTO-SELECT the cluster-side
#: plan when a SparkSession is reachable (r11 — mechanism-not-policy
#: with a safe default: below the threshold the dependency-free driver
#: path is faster, above it the driver path's O(live files) dicts are
#: exactly the state the cluster path exists to avoid; the README's
#: 1M/4M crossover table is where the number comes from).  The count is
#: free metadata: every checkpoint commit JSON carries ``n_files``, and
#: :func:`_store_n_files` folds the deltas since.  Pass ``spark=None``
#: explicitly to force the driver path, or a session to force the
#: cluster path, regardless of size.
CLUSTER_PATH_MIN_FILES = 1_000_000

#: live-file count past which a CLUSTER-BUILT checkpoint sidecar is
#: written as a DIRECTORY of range-partitioned part files instead of a
#: single file (Delta's multi-part checkpoint move, r11): one writer
#: task per ~this many rows, so checkpoint serialization stays parallel
#: at the 10^8-file regime instead of bottlenecking on a single task's
#: sort+write.  Readers are unchanged — pyarrow and Spark both read a
#: parquet directory natively, and the global (table, file) sort order
#: is preserved across parts by range partitioning.
SIDECAR_ROWS_PER_PART = 8_000_000


class _AutoSpark:
    """Sentinel default for ``spark=`` parameters: resolve to the active
    SparkSession iff the store's live-file count crosses
    :data:`CLUSTER_PATH_MIN_FILES` (see :func:`_resolve_spark_arg`)."""

    def __repr__(self) -> str:  # pragma: no cover - repr cosmetics
        return "AUTO"


AUTO = _AutoSpark()

#: how many snapshots BEFORE the newest the maintenance ops
#: (compact_published, rewrite_zordered, expire_files) retain when they
#: auto-vacuum after their commit.  0 would delete the previous snapshot's
#: replaced files the instant the swap commits — destroying time travel
#: and breaking any reader still scanning a DataFrame pinned to it
#: (read_published hands out explicit file lists, so the scan runs
#: arbitrarily later).  Delta solves this with a time-based retention
#: horizon (default 7 days); version-count retention is the analog a
#: wall-clock-free test environment can assert on.  Production tuning: set
#: it to cover the longest reader pin / time-travel window divided by the
#: maintenance cadence.
MAINT_KEEP_VERSIONS = 2

#: concurrent-writer grace window (seconds) for the maintenance ops'
#: auto-vacuum: unreferenced files younger than this survive, because a
#: concurrent writer's staged-but-uncommitted files look exactly like
#: crash orphans until its commit lands.  15 minutes comfortably covers a
#: staging write; explicit vacuum(out) keeps grace 0 for quiesced cleanup.
VACUUM_GRACE_S = 900.0


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this writer was about to.

    Raised from the put-if-absent commit; callers re-read the log and
    rebase (``publish_batch`` retries automatically, ``compact_published``
    rebases once or abandons — compaction is an optimization)."""


def _warn_executor_blind(op: str, out_dir: str) -> None:
    """The one degradation message for every AUTO-selected cluster path
    abandoned because executors cannot see the store (vacuum, pin) —
    kept in a helper so the polarity/wording cannot drift per site."""
    import warnings

    warnings.warn(
        f"{op}: {out_dir!r} is not visible to executors; the "
        "auto-selected cluster path was abandoned and the driver path "
        "ran instead — expect O(live files) driver work at this store's "
        "size",
        RuntimeWarning,
        stacklevel=3,
    )


class StorageVisibilityError(RuntimeError):
    """The cluster-side path found files the DRIVER can see but the
    executors' distributed walk cannot — ``out_dir`` is not on shared
    storage.  Raised when the caller passed an explicit ``spark``
    session; when :data:`AUTO` picked the session on its own, consumers
    degrade to the driver path with a warning instead (the pre-r11
    default behavior must not turn into a hard error just because a
    store crossed the size threshold)."""


# ---------------------------------------------------------------------------
# commit-log I/O
# ---------------------------------------------------------------------------


def _manifest_path(out_dir: str) -> str:
    _check_posix_path(out_dir)
    return os.path.join(out_dir, _MANIFEST_DIR)


def _check_posix_path(out_dir: str) -> None:
    """The store's path guard, checked at :func:`_manifest_path` so one
    check covers every txlog entry point — :class:`PosixLogStore`
    refuses URL schemes (``s3://bucket/x`` would otherwise be treated as
    a weird RELATIVE local path and the sink would silently create a
    working-looking local store); a non-POSIX backend accepts its own
    scheme here."""
    LOG_STORE.validate(out_dir)


def _commit_name(version: int) -> str:
    return f"v{version:09d}.json"


def _load_commit(out_dir: str, version: int) -> dict:
    return json.loads(
        LOG_STORE.read_bytes(
            os.path.join(_manifest_path(out_dir), _commit_name(version))
        )
    )


#: delta commits whose changed-file count reaches this spill their
#: add/remove lists into a ``delta-v<N>-*.parquet`` sidecar and keep the
#: commit JSON O(1) bytes (plus O(#tables) count fields).  Without the
#: spill a mega-rewrite (format migration, whole-table re-sort) inlines
#: the ENTIRE table's file list into v<N>.json — which every resolve
#: between checkpoints then re-parses.  Ordinary micro-batch commits
#: (a few files) never come near this.
DELTA_SIDECAR_MIN_FILES = 100_000

#: cap on per-table partition-directory lists carried in a spilled
#: commit's JSON (``add_dirs_by_table``) — above it the entry is null
#: (= wildcard: same-table races conservatively re-stage)
DELTA_DIRS_CAP = 4096


def _write_sidecar_parquet(mdir: str, name: str, table) -> None:
    """Stream a log sidecar to the store: stage where the store says
    (pyarrow streams the parquet — no in-memory double buffer), then
    durably publish through the seam's ``finalize_file`` (POSIX:
    fsync + same-dir rename).  Shared by the checkpoint and delta-spill
    writers so the format knobs — zstd, the 262 144-row group bound that
    keeps later cluster-side scans parallel and the sorted key columns'
    per-group min/max pruning fine-grained — cannot drift apart.  A
    failed stage never outlives the call."""
    import pyarrow.parquet as pq

    store = LOG_STORE
    final = os.path.join(mdir, name)
    stage = store.stage_path(final)
    try:
        pq.write_table(
            table, stage, compression="zstd", row_group_size=262_144
        )
        store.finalize_file(stage, final)
    except BaseException:
        if os.path.exists(stage):
            os.unlink(stage)
        raise


def _write_delta_sidecar(
    mdir: str,
    version: int,
    add: dict[str, list],
    remove: dict[str, list],
    stats_add: dict[str, dict],
) -> str:
    """Spill a mega-delta's add/remove lists to a zstd parquet sidecar —
    one row per changed file: ``(action, table, file, stats)`` with
    ``action`` in {'add','remove'} and stats the same compact JSON-string
    encoding as checkpoint sidecars.  Durable before return (fsync +
    same-dir rename), version+uuid named exactly like checkpoint sidecars
    so a commit-race loser's spill becomes a vacuumable orphan.  Rows
    sort by (action, table, file): readers that want one action or one
    table prune row groups on the sorted columns' min/max."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    a_col: list[str] = []
    t_col: list[str] = []
    f_col: list[str] = []
    s_col: list[str | None] = []
    for action, per in (("add", add), ("remove", remove)):
        for t in sorted(per):
            per_stats = stats_add.get(t, {}) if action == "add" else {}
            for rel in sorted(per[t]):
                a_col.append(action)
                t_col.append(t)
                f_col.append(rel)
                s = per_stats.get(rel)
                s_col.append(
                    json.dumps(s, separators=(",", ":")) if s else None
                )
    name = f"delta-v{version}-{uuid.uuid4().hex[:12]}.parquet"
    # durable before the commit link — a lost commit race leaves a
    # vacuumable orphan, never a torn sidecar
    _write_sidecar_parquet(
        mdir,
        name,
        pa.table(
            {
                "action": pa.array(a_col, pa.string()),
                "table": pa.array(t_col, pa.string()),
                "file": pa.array(f_col, pa.string()),
                "stats": pa.array(s_col, pa.string()),
            }
        ),
    )
    return name


def _hydrate_delta(
    out_dir: str,
    commit: dict,
    table: str | None = None,
    with_stats: bool = True,
) -> dict:
    """Materialize a SPILLED delta commit's add/remove/stats_add back
    into the dict shape every driver-side fold consumes (a commit
    without ``delta`` passes through untouched).  ``table`` narrows the
    read to one table via a parquet predicate — the sidecar is sorted by
    (action, table, file), so row groups outside the table prune on
    footer min/max and :func:`_table_files` stays O(that table).
    ``with_stats=False`` column-prunes the stats bytes — the sidecar's
    dominant payload — for consumers that only fold file SETS (the same
    pruning every checkpoint-sidecar reader gets).  Driver folds are
    the small-store/per-table paths; the cluster resolve
    (:func:`_snapshot_df`) reads the same sidecar with Spark and never
    hydrates it here."""
    if "delta" not in commit:
        return commit
    path = os.path.join(_manifest_path(out_dir), commit["delta"])
    filters = [("table", "=", table)] if table is not None else None
    cols = ["action", "table", "file"] + (["stats"] if with_stats else [])
    t = LOG_STORE.read_parquet(path, columns=cols, filters=filters)
    add: dict[str, list] = {}
    remove: dict[str, list] = {}
    stats_add: dict[str, dict] = {}
    s_col = (
        t.column("stats").to_pylist()
        if with_stats
        else [None] * t.num_rows
    )
    for action, tname, rel, s in zip(
        t.column("action").to_pylist(),
        t.column("table").to_pylist(),
        t.column("file").to_pylist(),
        s_col,
    ):
        if action == "add":
            add.setdefault(tname, []).append(rel)
            if s:
                stats_add.setdefault(tname, {})[rel] = json.loads(s)
        else:
            remove.setdefault(tname, []).append(rel)
    out = dict(commit)
    # "add" is set even when empty: its PRESENCE tells _added_between
    # the commit states its own delta (no snapshot diff needed) — the
    # same sentinel inline checkpoint commits carry
    out["add"] = add
    if remove:
        out["remove"] = remove
    if stats_add:
        out["stats_add"] = stats_add
    return out


def _write_checkpoint_sidecar(
    mdir: str, version: int, tables: dict, stats: dict
) -> tuple[str, int]:
    """Write the O(live files) half of a checkpoint as a zstd parquet
    sidecar — one row per live file: ``(table, file, stats)`` with stats
    as a compact JSON string (heterogeneous per table, so a string column
    beats a union of typed structs; it dictionary-encodes and compresses
    far better than the file-repeated JSON object form, and readers that
    don't want it column-prune it away entirely).  Durable before return
    (fsync + same-dir rename); named with the version AND a uuid so
    racing writers of the same version cannot collide — the loser's
    sidecar becomes an orphan that vacuum reclaims.  Returns
    ``(sidecar name, n_files)``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t_col: list[str] = []
    f_col: list[str] = []
    s_col: list[str | None] = []
    for t in sorted(tables):
        per_file = stats.get(t, {})
        for rel in tables[t]:
            t_col.append(t)
            f_col.append(rel)
            s = per_file.get(rel)
            s_col.append(
                json.dumps(s, separators=(",", ":")) if s else None
            )
    name = f"ckpt-v{version}-{uuid.uuid4().hex[:12]}.parquet"
    # durable before the commit link, via the storage seam (this is the
    # DRIVER builder — the small-store path; the cluster builder stages
    # via Spark and finalizes separately)
    _write_sidecar_parquet(
        mdir,
        name,
        pa.table(
            {
                "table": pa.array(t_col, pa.string()),
                "file": pa.array(f_col, pa.string()),
                "stats": pa.array(s_col, pa.string()),
            }
        ),
    )
    return name, len(f_col)


def _read_checkpoint_sidecar(
    out_dir: str, commit: dict, with_stats: bool = True
) -> tuple[dict, dict]:
    """Hydrate a parquet-checkpoint commit back to ``(tables, stats)``.
    ``with_stats=False`` column-prunes the stats bytes — the sidecar's
    dominant payload — for consumers that only need file sets."""
    path = os.path.join(_manifest_path(out_dir), commit["ckpt"])
    cols = ["table", "file"] + (["stats"] if with_stats else [])
    arr = LOG_STORE.read_parquet(path, columns=cols)
    tables: dict[str, list] = {}
    stats: dict[str, dict] = {}
    t_col = arr.column("table").to_pylist()
    f_col = arr.column("file").to_pylist()
    s_col = arr.column("stats").to_pylist() if with_stats else None
    for i, (t, rel) in enumerate(zip(t_col, f_col)):
        tables.setdefault(t, []).append(rel)
        if s_col is not None and s_col[i]:
            stats.setdefault(t, {})[rel] = json.loads(s_col[i])
    return tables, stats


def _read_sidecar_table(
    out_dir: str, commit: dict, table: str, with_stats: bool
) -> tuple[list, dict]:
    """ONE table's rows out of a checkpoint sidecar — predicate-pushed
    (``filters`` prunes row groups on the ``table`` column, which the
    writer emits in sorted runs) and column-pruned, so resolving a single
    table never deserializes the other tables' file names or any stats
    bytes it doesn't need."""
    path = os.path.join(_manifest_path(out_dir), commit["ckpt"])
    cols = ["file"] + (["stats"] if with_stats else [])
    arr = LOG_STORE.read_parquet(
        path, columns=cols, filters=[("table", "==", table)]
    )
    files = arr.column("file").to_pylist()
    stats: dict = {}
    if with_stats:
        for rel, s in zip(files, arr.column("stats").to_pylist()):
            if s:
                stats[rel] = json.loads(s)
    return files, stats


def _table_files(
    out_dir: str, version: int, table: str, with_stats: bool
) -> tuple[list, dict]:
    """Resolve ONE table's ``(files, stats)`` at ``version`` — the
    read_published path (r10): per-table filtered sidecar read + per-table
    delta replay, so reading one table of an N-table store costs O(that
    table's files + deltas), never O(all live files).  Shares the resolved
    snapshot cache on hit; on miss it deliberately does not populate it
    (a one-table entry would poison full resolves)."""
    root = os.path.abspath(out_dir)
    hit = _SNAP_CACHE.get((root, version))
    if hit is not None:
        return (
            list(hit["tables"].get(table, [])),
            dict(hit["stats"].get(table, {})) if with_stats else {},
        )
    deltas: list[dict] = []
    v = version
    while True:
        commit = _load_commit(out_dir, v)
        if "ckpt" in commit:
            files, stats = _read_sidecar_table(
                out_dir, commit, table, with_stats
            )
            break
        if "tables" in commit:
            files = list(commit["tables"].get(table, []))
            stats = (
                dict(commit.get("stats", {}).get(table, {}))
                if with_stats
                else {}
            )
            break
        deltas.append(commit)
        v = commit.get("parent", v - 1)
        if v < 1:
            raise RuntimeError(
                f"commit chain for version {version} in {out_dir} has no "
                "checkpoint ancestor — log is corrupt"
            )
    for delta in reversed(deltas):
        # a spilled mega-delta hydrates ONLY this table's rows (parquet
        # predicate on the sorted table column) — the per-table read
        # stays O(that table's churn)
        delta = _hydrate_delta(
            out_dir, delta, table=table, with_stats=with_stats
        )
        rm = delta.get("remove", {}).get(table)
        if rm:
            gone = set(rm)
            files = [f for f in files if f not in gone]
            for rel in rm:
                stats.pop(rel, None)
        ad = delta.get("add", {}).get(table)
        if ad:
            files.extend(ad)
        if with_stats:
            stats.update(delta.get("stats_add", {}).get(table, {}))
    return sorted(files), stats


def _latest_version(out_dir: str) -> int:
    """Newest committed version: start from the CURRENT hint and probe
    forward (a crash between the commit link and the hint update, or a
    racing writer, can leave commits newer than the hint).  Falls back to
    a directory scan when the hint is missing."""
    store = LOG_STORE
    mdir = _manifest_path(out_dir)
    cur = os.path.join(mdir, "CURRENT")
    v = 0
    if store.exists(cur):
        name = store.read_bytes(cur).decode().strip()
        try:
            v = int(name[1:].split(".")[0])
        except ValueError:
            v = 0
    if v == 0:
        if not store.isdir(mdir):
            return 0
        for name in store.listdir(mdir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    v = max(v, int(name[1:-5]))
                except ValueError:
                    continue
        if v == 0:
            return 0
    while store.exists(os.path.join(mdir, _commit_name(v + 1))):
        v += 1
    return v


def _store_n_files(out_dir: str, version: int) -> int | None:
    """The snapshot's live-file COUNT at ``version`` from commit metadata
    alone — O(deltas since the last checkpoint), never a file-list scan:
    checkpoint commits carry ``n_files`` in their O(1) JSON, and each
    delta states exactly how many files it added/removed.  Pre-r9 inline
    checkpoints pay one JSON parse (those stores are driver-bounded by
    construction).  ``None`` when nothing is committed."""
    if version < 1:
        return None
    n = 0
    v = version
    while v >= 1:
        c = _load_commit(out_dir, v)
        if "n_files" in c:
            return int(c["n_files"]) + n
        if "tables" in c:  # inline / legacy checkpoint
            return sum(len(fs) for fs in c["tables"].values()) + n
        if "delta" in c:  # spilled mega-delta: counts ride in the JSON
            n += sum(c.get("n_add_by_table", {}).values())
            n -= sum(c.get("n_remove_by_table", {}).values())
        else:
            n += sum(len(fs) for fs in c.get("add", {}).values())
            n -= sum(len(fs) for fs in c.get("remove", {}).values())
        v = c.get("parent", v - 1)
    raise RuntimeError(
        f"commit chain for version {version} in {out_dir} has no "
        "checkpoint ancestor — log is corrupt"
    )


def _store_table_counts(out_dir: str, version: int) -> dict[str, int] | None:
    """Per-table live-file counts at ``version`` from commit metadata
    alone — the per-table refinement of :func:`_store_n_files` (r12):
    checkpoint commits carry ``n_files_by_table`` and each delta states
    exactly what it added/removed per table, so the fold is O(deltas ×
    tables) with no file-list scan.  ``None`` when the checkpoint
    ancestor predates the field (pre-r12 sidecar) — callers then fall
    back to deriving names from the sidecar itself."""
    if version < 1:
        return {}
    deltas: list[dict] = []
    v = version
    while True:
        c = _load_commit(out_dir, v)
        if "n_files_by_table" in c:
            counts = {t: int(n) for t, n in c["n_files_by_table"].items()}
            break
        if "tables" in c:  # inline / legacy checkpoint: exact and tiny
            counts = {t: len(fs) for t, fs in c["tables"].items()}
            break
        if "ckpt" in c:  # pre-r12 sidecar checkpoint: counts not carried
            return None
        deltas.append(c)
        v = c.get("parent", v - 1)
        if v < 1:
            return None
    for c in reversed(deltas):
        if "delta" in c:  # spilled mega-delta: counts ride in the JSON
            for t, n in c.get("n_add_by_table", {}).items():
                counts[t] = counts.get(t, 0) + int(n)
            for t, n in c.get("n_remove_by_table", {}).items():
                counts[t] = counts.get(t, 0) - int(n)
            continue
        for t, fs in c.get("add", {}).items():
            counts[t] = counts.get(t, 0) + len(fs)
        for t, fs in c.get("remove", {}).items():
            counts[t] = counts.get(t, 0) - len(fs)
    return counts


def _resolve_spark_arg(spark, out_dir: str):
    """Resolve a consumer's ``spark`` argument: :data:`AUTO` (the
    default) picks the active SparkSession when the store's live-file
    count has crossed :data:`CLUSTER_PATH_MIN_FILES` — the point where
    the driver path's O(live files) Python dicts become the bottleneck —
    and the driver path otherwise; an explicit session or ``None``
    passes through untouched (the caller's override)."""
    if not isinstance(spark, _AutoSpark):
        return spark
    n = _store_n_files(out_dir, _latest_version(out_dir))
    if n is not None and n >= CLUSTER_PATH_MIN_FILES:
        return SparkSession.getActiveSession()
    return None


#: resolved snapshots keyed by (abspath, version).  A committed version is
#: immutable (put-if-absent commit files are never rewritten), so entries
#: never go stale; the cache turns the single-writer hot loop's resolve
#: into O(deltas since last read) instead of O(live files) JSON parsing.
#: Cached structures are shared — consumers treat snapshots as read-only
#: (all in-module consumers copy before mutating).
_SNAP_CACHE: dict[tuple, dict] = {}
_SNAP_CACHE_MAX = 32


def _cache_put(key: tuple, snap: dict) -> None:
    while len(_SNAP_CACHE) >= _SNAP_CACHE_MAX:
        _SNAP_CACHE.pop(next(iter(_SNAP_CACHE)))
    _SNAP_CACHE[key] = snap


def _walk_snapshot(
    out_dir: str, version: int, with_stats: bool
) -> tuple[dict, dict]:
    """The shared resolve walk: back to the nearest full-form commit
    (parquet-checkpoint sidecar, inline checkpoint, pre-log legacy
    manifest, or a cached resolved ancestor), then replay the deltas
    forward.  ``with_stats=False`` column-prunes checkpoint sidecars and
    skips ``stats_add`` replay — the stats bytes are never fetched.
    Returns un-normalized ``(tables, stats)``."""
    root = os.path.abspath(out_dir)
    deltas: list[dict] = []
    v = version
    while True:
        cached = _SNAP_CACHE.get((root, v))
        if cached is not None:
            base_tables = {t: list(fs) for t, fs in cached["tables"].items()}
            base_stats = (
                {t: dict(s) for t, s in cached["stats"].items()}
                if with_stats
                else {}
            )
            break
        commit = _load_commit(out_dir, v)
        if "ckpt" in commit:  # r9 parquet-checkpoint form
            base_tables, base_stats = _read_checkpoint_sidecar(
                out_dir, commit, with_stats=with_stats
            )
            break
        if "tables" in commit:  # inline snapshot / legacy manifest form
            base_tables = {t: list(fs) for t, fs in commit["tables"].items()}
            base_stats = (
                {t: dict(s) for t, s in commit.get("stats", {}).items()}
                if with_stats
                else {}
            )
            break
        deltas.append(commit)
        v = commit.get("parent", v - 1)
        if v < 1:
            raise RuntimeError(
                f"commit chain for version {version} in {out_dir} has no "
                "checkpoint ancestor — log is corrupt"
            )
    for delta in reversed(deltas):
        delta = _hydrate_delta(out_dir, delta, with_stats=with_stats)
        for t, rels in delta.get("remove", {}).items():
            gone = set(rels)
            base_tables[t] = [f for f in base_tables.get(t, []) if f not in gone]
            if t in base_stats:
                for rel in rels:
                    base_stats[t].pop(rel, None)
        for t, rels in delta.get("add", {}).items():
            base_tables.setdefault(t, []).extend(rels)
        if with_stats:
            for t, per_file in delta.get("stats_add", {}).items():
                base_stats.setdefault(t, {}).update(per_file)
    return base_tables, base_stats


def _resolve(out_dir: str, version: int) -> dict:
    """Reconstruct the full snapshot at ``version`` (tables + stats),
    cached per immutable version."""
    root = os.path.abspath(out_dir)
    hit = _SNAP_CACHE.get((root, version))
    if hit is not None:
        return {
            "version": version,
            "tables": dict(hit["tables"]),
            "stats": dict(hit["stats"]),
        }
    base_tables, base_stats = _walk_snapshot(out_dir, version, with_stats=True)
    snap = {
        "tables": {t: sorted(fs) for t, fs in base_tables.items() if fs},
        "stats": {t: s for t, s in base_stats.items() if s},
    }
    _cache_put((root, version), snap)
    return {
        "version": version,
        "tables": dict(snap["tables"]),
        "stats": dict(snap["stats"]),
    }


def _snapshot_files(out_dir: str, version: int) -> dict[str, list]:
    """The snapshot's FILE SETS only — the column-pruned read path for
    consumers that never touch stats (vacuum's live-set sweep,
    pin_version's readability probe): the shared walk with
    ``with_stats=False`` reads checkpoint sidecars without their stats
    column (the dominant bytes).  Shares the resolved-snapshot cache on
    hit; on miss it deliberately does NOT populate it (a stats-less
    entry would poison full resolves)."""
    root = os.path.abspath(out_dir)
    hit = _SNAP_CACHE.get((root, version))
    if hit is not None:
        return {t: list(fs) for t, fs in hit["tables"].items()}
    base, _ = _walk_snapshot(out_dir, version, with_stats=False)
    return {t: sorted(fs) for t, fs in base.items() if fs}


def snapshot_files_df(
    spark: SparkSession, out_dir: str, version: int
) -> DataFrame:
    """The snapshot's live file SET at ``version`` as a DataFrame of
    ``(table string, file string)`` — the CLUSTER-SIDE resolve (r10,
    closing the module's former driver-dict residual): the checkpoint
    sidecar is scanned by Spark where it lies, and only the O(delta)
    commits since it ship from the driver (as a broadcast anti-join set
    plus a union), so resolution never materializes O(live files) Python
    state no matter how many files are live.  Pre-r9 inline checkpoints
    fall back to hydrating through the driver — those stores carried
    their whole snapshot in one JSON and are driver-bounded by
    construction; their next checkpoint lands as a sidecar."""
    return _snapshot_df(spark, out_dir, version, with_stats=False)


def _snapshot_df(
    spark: SparkSession,
    out_dir: str,
    version: int,
    with_stats: bool,
    base_cache: dict | None = None,
) -> DataFrame:
    """The shared cluster-side resolve behind :func:`snapshot_files_df`
    (file sets) and :func:`_write_checkpoint_spark` (``with_stats=True``
    adds the per-file stats-JSON string column, the sidecar's dominant
    payload — only the checkpoint writer wants those bytes moved).

    ``base_cache`` (r12): a caller resolving MANY versions that share a
    checkpoint ancestor (vacuum over retained + pinned snapshots) passes
    a dict; the ancestor's sidecar scan is then built once, PERSISTED,
    and shared — K resolves cost one sidecar scan per distinct ancestor
    instead of K.  The caller owns unpersisting the cached DataFrames."""
    from pyspark.sql import functions as F

    cols = ["table", "file"] + (["stats"] if with_stats else [])
    schema = "table string, file string" + (
        ", stats string" if with_stats else ""
    )
    deltas: list[dict] = []
    base: DataFrame | None = None
    v = version
    while True:
        commit = _load_commit(out_dir, v)
        if "ckpt" in commit:
            if base_cache is not None and v in base_cache:
                base = base_cache[v]
                break
            # explicit schema: the sidecar layout is fixed by protocol,
            # and letting Spark infer it re-reads the footer on every
            # resolve (~0.7 s at a 1M-row sidecar, pure overhead)
            base = spark.read.schema(
                "table string, file string, stats string"
            ).parquet(
                os.path.join(_manifest_path(out_dir), commit["ckpt"])
            ).select(*cols)
            if base_cache is not None:
                base = base.persist()
                base_cache[v] = base
            break
        if "tables" in commit:  # inline / legacy: already driver-sized
            st = commit.get("stats", {})
            if with_stats:
                rows = [
                    (
                        t,
                        f,
                        json.dumps(
                            st[t][f], separators=(",", ":")
                        )
                        if st.get(t, {}).get(f)
                        else None,
                    )
                    for t, fs in commit["tables"].items()
                    for f in fs
                ]
            else:
                rows = [
                    (t, f) for t, fs in commit["tables"].items() for f in fs
                ]
            base = spark.createDataFrame(rows, schema)
            break
        deltas.append(commit)
        v = commit.get("parent", v - 1)
        if v < 1:
            raise RuntimeError(
                f"commit chain for version {version} in {out_dir} has no "
                "checkpoint ancestor — log is corrupt"
            )
    # fold the delta chain driver-side (it is O(changed files) by the
    # commit protocol): file names are never reused, so the net effect is
    # one removed-set anti-join plus one added-rows union.  stats_add
    # keys are a subset of the same delta's add (enforced at the
    # _write_manifest choke point), so added rows carry their stats.
    removed: set[tuple] = set()
    added: dict[tuple, str | None] = {}
    for delta in reversed(deltas):
        for t, rels in delta.get("remove", {}).items():
            for rel in rels:
                key = (t, rel)
                if key in added:
                    del added[key]
                else:
                    removed.add(key)
        st = delta.get("stats_add", {})
        for t, rels in delta.get("add", {}).items():
            per = st.get(t, {})
            for rel in rels:
                s = per.get(rel)
                added[(t, rel)] = (
                    json.dumps(s, separators=(",", ":")) if s else None
                )
    spill_paths = [
        os.path.join(_manifest_path(out_dir), d["delta"])
        for d in deltas
        if "delta" in d
    ]
    if spill_paths:
        # SPILLED mega-deltas (r12): their file lists live in parquet
        # sidecars, read here by Spark where they lie — the driver ships
        # only the inline deltas' rows, never the spilled lists.  File
        # names are never reused (commit protocol), so a remove always
        # postdates its file's add and ANY interleaving of inline and
        # spilled deltas reduces to set algebra: (base ∪ adds) \ removes.
        sp = spark.read.schema(
            "action string, table string, file string, stats string"
        ).parquet(*spill_paths)
        all_rm = sp.filter(F.col("action") == "remove").select(
            "table", "file"
        )
        if removed:
            all_rm = all_rm.union(
                spark.createDataFrame(
                    sorted(removed), "table string, file string"
                )
            )
        adds = sp.filter(F.col("action") == "add").select(*cols)
        if added:
            if with_stats:
                add_rows = [
                    (t, f, s) for (t, f), s in sorted(added.items())
                ]
            else:
                add_rows = sorted(added)
            adds = adds.unionByName(
                spark.createDataFrame(add_rows, schema)
            )
        # removes can be table-sized here (that's what a mega-rewrite
        # is), so no broadcast hint — AQE picks the join strategy
        base = base.join(all_rm, ["table", "file"], "left_anti")
        return base.unionByName(
            adds.join(all_rm, ["table", "file"], "left_anti")
        )
    if removed:
        rm_df = spark.createDataFrame(
            sorted(removed), "table string, file string"
        )
        base = base.join(F.broadcast(rm_df), ["table", "file"], "left_anti")
    if added:
        if with_stats:
            add_rows = [(t, f, s) for (t, f), s in sorted(added.items())]
        else:
            add_rows = sorted(added)
        base = base.unionByName(spark.createDataFrame(add_rows, schema))
    return base


def _write_checkpoint_spark(
    spark: SparkSession,
    out_dir: str,
    version: int,
    add: dict[str, list],
    remove: dict[str, list],
    stats_add: dict[str, dict],
    op: str,
    pin: dict | None = None,
    est_rows: int | None = None,
) -> None:
    """Write checkpoint ``version`` with the snapshot derived and
    serialized CLUSTER-SIDE (r11 — closing the last O(live files) driver
    path): the parent snapshot comes from :func:`_snapshot_df` (previous
    sidecar scanned by Spark + the O(delta) commit chain), this commit's
    own add/remove folds in the same way, and the new sidecar parquet is
    written by a Spark job — the driver ships only O(delta) rows and
    never hydrates a file list.  Row order (sorted by table, file) and
    stats encoding match :func:`_write_checkpoint_sidecar` exactly, so
    the two builders are byte-comparable and every sidecar reader works
    on either.  ``n_files`` / ``table_names`` for the O(1) commit JSON
    come from the written file's own parquet footer (no second job).
    Past :data:`SIDECAR_ROWS_PER_PART` estimated rows the sidecar is a
    DIRECTORY of range-partitioned part files (Delta's multi-part
    checkpoint): writer tasks serialize in parallel, readers (pyarrow
    dataset, Spark) consume the directory natively, and the global
    sort order survives across parts.

    The sidecar is durable (fsync + rename into ``_manifest``) BEFORE
    the commit JSON links — same protocol as the driver builder: a crash
    or a lost commit race leaves an orphan sidecar that :func:`vacuum`
    reclaims by its embedded version; the staging dir lives under
    ``_staging`` where vacuum already sweeps crashed builds."""
    from pyspark.sql import functions as F

    df = _snapshot_df(spark, out_dir, version - 1, with_stats=True)
    rm = sorted((t, rel) for t, rels in remove.items() for rel in rels)
    if rm:
        rm_df = spark.createDataFrame(rm, "table string, file string")
        df = df.join(F.broadcast(rm_df), ["table", "file"], "left_anti")
    add_rows = sorted(
        (
            t,
            rel,
            json.dumps(stats_add[t][rel], separators=(",", ":"))
            if stats_add.get(t, {}).get(rel)
            else None,
        )
        for t, rels in add.items()
        for rel in rels
    )
    if add_rows:
        df = df.unionByName(
            spark.createDataFrame(
                add_rows, "table string, file string, stats string"
            )
        )
    # the target version rides in the staging dir name so vacuum's
    # staging sweep can recognize an IN-FLIGHT checkpoint build (version
    # ahead of the newest commit) and give it the same full grace window
    # as an in-flight sidecar — unlike an orphaned data stage, rmtree'ing
    # a live build mid-Spark-job fails the checkpoint commit
    staging = os.path.join(
        out_dir, "_staging", f"ckpt-build-v{version}-{uuid.uuid4().hex}"
    )
    # MULTI-PART past SIDECAR_ROWS_PER_PART (Delta's multi-part
    # checkpoint move): range-partitioned on the sort key, so the global
    # (table, file) order is preserved across part files and every
    # writer task serializes ~one part's rows — at 10^8 files a single
    # repartition(1) task's sort+write would be the checkpoint's wall
    if est_rows is None:  # the gate in _commit_delta passes its count
        est_rows = (_store_n_files(out_dir, version - 1) or 0) + sum(
            len(fs) for fs in add.values()
        )
    n_parts = max(1, min(256, -(-est_rows // SIDECAR_ROWS_PER_PART)))
    if n_parts == 1:
        shaped = df.repartition(1)
    else:
        shaped = df.repartitionByRange(n_parts, "table", "file")
    (
        shaped.sortWithinPartitions("table", "file")
        .write.mode("overwrite")
        .option("compression", "zstd")
        # bounded row groups (same rationale as the driver builder's
        # row_group_size): one giant group would make later sidecar
        # scans single-task
        .option("parquet.block.size", 16 * 1024 * 1024)
        .parquet(staging)
    )
    import pyarrow.parquet as pq

    store = LOG_STORE
    parts = [
        f
        for f in store.listdir(staging)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    if not parts:  # pragma: no cover - the write above always emits one
        store.rmtree(staging)
        raise RuntimeError("checkpoint build wrote no part files")
    # n_files from the part footers (free — no data read or extra job)
    n_files = 0
    for p in parts:
        src = os.path.join(staging, p)
        n_files += pq.ParquetFile(src).metadata.num_rows
    mdir = _manifest_path(out_dir)
    store.makedirs(mdir)
    name = f"ckpt-v{version}-{uuid.uuid4().hex[:12]}.parquet"
    if len(parts) == 1:
        # single-file shape: byte-compatible with the driver builder;
        # finalize_file carries the fsync+rename durability
        store.finalize_file(
            os.path.join(staging, parts[0]), os.path.join(mdir, name)
        )
        store.rmtree(staging)
    else:
        # directory shape: the staging dir itself becomes the sidecar
        # (one atomic rename on POSIX; _SUCCESS/hidden files stay —
        # pyarrow's dataset discovery and Spark both ignore '_'/'.'
        # prefixes).  Durability: fsync each part before the move
        for p in parts:
            store.finalize_file(
                os.path.join(staging, p), os.path.join(staging, p)
            )
        store.finalize_dir(staging, os.path.join(mdir, name))

    path = os.path.join(mdir, name)
    # table NAMES + per-table counts: folded from free commit metadata
    # (parent checkpoint's n_files_by_table + the delta chain + this
    # commit's own add/remove) — no extra Spark job, no driver
    # hydration.  Cross-checked against the written sidecar's footer
    # row count; a mismatch (protocol violation: a remove naming a
    # non-live file) or a pre-r12 parent falls back to ONE aggregate
    # job over the sidecar (a pyarrow unique() would materialize the
    # whole O(live files) column on the driver, the exact state this
    # builder exists to avoid).
    counts = _store_table_counts(out_dir, version - 1)
    if counts is not None:
        for t, fs in add.items():
            counts[t] = counts.get(t, 0) + len(fs)
        for t, fs in remove.items():
            counts[t] = counts.get(t, 0) - len(fs)
        counts = {t: c for t, c in counts.items() if c > 0}
        if sum(counts.values()) != n_files:
            import warnings

            warnings.warn(
                f"checkpoint v{version}: per-table metadata fold "
                f"({sum(counts.values())} files) disagrees with the "
                f"written sidecar ({n_files}) — a delta commit removed "
                "a file that was not live; deriving table counts from "
                "the sidecar instead",
                RuntimeWarning,
                stacklevel=2,
            )
            counts = None
    if counts is None:
        counts = {
            r["table"]: int(r["n"])
            for r in spark.read.schema(
                "table string, file string, stats string"
            )
            .parquet(path)
            .groupBy("table")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    table_names = sorted(counts)
    manifest = {
        "version": version,
        "op": op,
        "ckpt": name,
        "n_files": int(n_files),
        "table_names": table_names,
        "n_files_by_table": {t: counts[t] for t in table_names},
        # the checkpoint's OWN delta rides along (O(changed files) JSON):
        # racing writers' conflict detection (_added_between) then never
        # hydrates two full snapshots just because a checkpoint landed
        # inside the race window
        "add": {t: sorted(fs) for t, fs in add.items() if fs},
        "remove": {t: sorted(fs) for t, fs in remove.items() if fs},
    }
    if pin is not None:
        manifest["pin"] = pin
    _write_manifest(out_dir, manifest)


def _executor_visible(spark: SparkSession, path: str) -> bool:
    """True when an EXECUTOR can see ``path`` — one tiny single-partition
    job.  The common non-shared-storage failure is NOT the walk
    cross-check (which sees an empty inventory) but executors being
    unable to read the checkpoint sidecar at all: ``snapshot_files_df``'s
    scan then throws an opaque executor ``FileNotFoundException`` before
    any cross-check runs.  Probing first lets :data:`AUTO` degrade to the
    driver path with the documented warning, and explicit ``spark=``
    raise a :class:`StorageVisibilityError` that names the contract
    instead of a Java stack trace."""

    store = LOG_STORE  # pickled into the executor closure

    def _probe(p: str) -> bool:
        return store.exists(p)

    return bool(
        spark.sparkContext.parallelize([path], 1).map(_probe).collect()[0]
    )


def _disk_files_df(
    spark: SparkSession, out_dir: str, tables: list[str]
) -> DataFrame:
    """One row per data file currently ON DISK under the given tables'
    directories: ``(table, file, mtime)``.  The driver lists only each
    table directory's immediate children (O(partition directories)); the
    per-directory recursive walks run in EXECUTORS via ``mapInPandas`` —
    the distributed-listing shape Delta's vacuum uses.  Requires storage
    visible to executors, which holds for local mode and for any shared
    filesystem / object store a real cluster would run against (the
    caller cross-checks the inventory against a driver probe and fails
    loudly when the walk sees nothing the driver can see —
    :func:`_vacuum_data_spark`).

    Hidden (``_``/``.``-prefixed) SUBDIRECTORIES are walked — only file
    NAMES filter, exactly like the driver vacuum's walk — so a crashed
    non-staged writer's ``_temporary`` tree reclaims identically on both
    paths (r11, closing the one reclamation divergence)."""
    store = LOG_STORE  # driver seeding AND the executor walk closures
    seeds: list[tuple] = []
    for t in tables:
        tdir = os.path.join(out_dir, f"{t}.parquet")
        if not store.isdir(tdir):
            continue
        seeds.append((t, ""))  # the directory's own immediate files
        for e in store.listdir(tdir):
            if store.isdir(os.path.join(tdir, e)):
                seeds.append((t, e))
    schema = "table string, file string, mtime double"
    if not seeds:
        return spark.createDataFrame([], schema)
    root = os.path.abspath(out_dir)

    def _walk(batches):
        import os as _os

        import pandas as pd

        for pdf in batches:
            t_out: list[str] = []
            f_out: list[str] = []
            m_out: list[float] = []

            def emit(t: str, tdir: str, full: str) -> None:
                try:
                    m = store.getmtime(full)
                except OSError:
                    return  # vanished concurrently
                t_out.append(t)
                f_out.append(_os.path.relpath(full, tdir))
                m_out.append(m)

            for t, sub in zip(pdf["table"], pdf["sub"]):
                tdir = _os.path.join(root, f"{t}.parquet")
                if sub == "":
                    try:
                        entries = store.listdir(tdir)
                    except OSError:
                        continue
                    for e in entries:
                        full = _os.path.join(tdir, e)
                        if e.startswith(("_", ".")) or store.isdir(full):
                            continue  # subdirs are their own seeds
                        emit(t, tdir, full)
                else:
                    for wroot, _dirs, files in store.walk(
                        _os.path.join(tdir, sub)
                    ):
                        for fname in files:
                            if fname.startswith(("_", ".")):
                                continue
                            emit(t, tdir, _os.path.join(wroot, fname))
            yield pd.DataFrame(
                {"table": t_out, "file": f_out, "mtime": m_out}
            )

    # half the cores, not all: each seed partition is a statfs-bound walk
    # of one directory, and scheduling 32 tiny tasks cost ~2 s of fixed
    # overhead at 1M files where 16 fatter ones amortize it (r11 trim);
    # on a real cluster the walk is I/O-bound and extra slots don't help
    n_part = max(
        1, min(len(seeds), spark.sparkContext.defaultParallelism // 2 or 1)
    )
    return (
        spark.createDataFrame(seeds, "table string, sub string")
        .repartition(n_part)
        .mapInPandas(_walk, schema)
    )


def read_manifest(out_dir: str, version: int | None = None) -> dict:
    """The snapshot at ``version`` (default: newest): ``{"version": N,
    "tables": {name: [relative files]}, "stats": {name: {file: {col:
    [min, max]}}}}`` — or an empty v0 when nothing is published.  Any
    retained version time-travels (data-file survival is bounded by
    :func:`vacuum`)."""
    latest = _latest_version(out_dir)
    if version is None:
        version = latest
    if version == 0:
        return {"version": 0, "tables": {}, "stats": {}}
    if version > latest:
        raise ValueError(f"version {version} > latest committed {latest}")
    return _resolve(out_dir, version)


def _fold_checkpoint_pins(
    out_dir: str, version: int, op: str, pin: dict | None
) -> dict[str, str | None]:
    """The ACTIVE pin set this checkpoint must fold (the table-state
    amortization applied to leases): pinned_versions then replays at
    most CHECKPOINT_EVERY-1 commits instead of the whole log."""
    pins = {} if version == 1 else _pins_at(out_dir, version - 1)
    if op == "pin":
        pins[int(pin["version"])] = pin.get("name")
    elif op == "unpin":
        pins.pop(int(pin["version"]), None)
    return {str(k): n for k, n in sorted(pins.items())}


def _attach_delta(
    commit: dict,
    mdir: str,
    version: int,
    manifest: dict,
    keep_empty_add: bool,
) -> None:
    """The ONE spill-or-inline decision (delta commits and checkpoint
    commits both funnel here, so the threshold semantics cannot
    diverge): inline ``add``/``remove``/``stats_add`` below
    :data:`DELTA_SIDECAR_MIN_FILES` changed files, a spilled
    ``delta-v*`` sidecar + O(#tables) count fields past it.
    ``keep_empty_add=True`` (checkpoint commits) preserves an EMPTY
    ``add`` key — its presence is the sentinel telling
    :func:`_added_between` the commit states its own delta."""
    add = manifest.get("add", {})
    remove = manifest.get("remove", {})
    stats_add = manifest.get("stats_add", {})
    n_changed = sum(len(fs) for fs in add.values()) + sum(
        len(fs) for fs in remove.values()
    )
    if n_changed >= DELTA_SIDECAR_MIN_FILES:
        commit["delta"] = _write_delta_sidecar(
            mdir, version, add, remove, stats_add
        )
        if add:
            commit["n_add_by_table"] = {
                t: len(fs) for t, fs in sorted(add.items())
            }
            # the added files' partition DIRECTORIES (bounded:
            # partition values are content-derived buckets, O(dozens)
            # per table) ride in the JSON so race-window conflict
            # detection (_conflicting_tables) never opens the sidecar —
            # the one remaining O(changed files) read a spilled
            # mega-rewrite cost a racing writer.  A table spanning more
            # than DELTA_DIRS_CAP dirs stores null = wildcard: any
            # same-table race conservatively re-stages (the safe call
            # against a rewrite that wide).
            dirs_by_t = {}
            for t, fs in sorted(add.items()):
                d = {os.path.dirname(f) for f in fs}
                dirs_by_t[t] = sorted(d) if len(d) <= DELTA_DIRS_CAP else None
            commit["add_dirs_by_table"] = dirs_by_t
        if remove:
            commit["n_remove_by_table"] = {
                t: len(fs) for t, fs in sorted(remove.items())
            }
        return
    if add or (keep_empty_add and "add" in manifest):
        commit["add"] = add
    if remove:
        commit["remove"] = remove
    if stats_add:
        commit["stats_add"] = stats_add


def _write_manifest(out_dir: str, manifest: dict) -> None:
    """Commit ``manifest`` as version N — the single commit choke point.

    Three accepted shapes:

    - FULL form (``tables`` [+ ``stats``]): the target snapshot.  The
      durable encoding is chosen here — checkpoints (v1 and every
      ``CHECKPOINT_EVERY``-th version) store the snapshot verbatim (the
      parquet sidecar); other versions store only the computed delta
      against N-1.
    - DELTA form (``add`` and/or ``remove`` [+ ``stats_add``], no
      ``tables`` — the r10/r11 hot path, :func:`_commit_delta`): the
      caller states exactly which files it added/removed and the record
      is written directly, O(changed files) with NO parent-snapshot
      hydration or set-diff.  ``stats_add`` is filtered to the files in
      ``add`` (the protocol invariant the cluster-side resolves rely
      on).  Refused on checkpoint versions (those owe readers a full
      snapshot).
    - PRE-BUILT CHECKPOINT form (``ckpt`` + ``n_files`` +
      ``table_names``, no ``tables`` — :func:`_write_checkpoint_spark`,
      r11): the sidecar parquet was already staged and made durable by a
      Spark job; only the O(1) commit JSON (with the pin fold) is
      written here.  Refused OFF checkpoint versions.

    Either way the commit point is :func:`_link_commit`'s put-if-absent
    ``os.link`` — a concurrent committer of the same version raises
    :class:`ConcurrentWriteError` instead of silently clobbering."""
    mdir = _manifest_path(out_dir)
    LOG_STORE.makedirs(mdir)
    version = manifest["version"]
    op = manifest.get("op", "write")
    is_ckpt_version = version == 1 or version % CHECKPOINT_EVERY == 0
    if "ckpt" in manifest and "tables" not in manifest:
        if not is_ckpt_version:
            raise ValueError(
                f"pre-built checkpoint commit for non-checkpoint version "
                f"{version} — deltas between checkpoints use the delta form"
            )
        commit = {
            "version": version,
            "ts": round(time.time(), 3),
            "op": op,
            "ckpt": manifest["ckpt"],
            "n_files": int(manifest["n_files"]),
            "table_names": sorted(manifest["table_names"]),
        }
        if "n_files_by_table" in manifest:  # r12: per-table fold seed
            commit["n_files_by_table"] = {
                t: int(n)
                for t, n in sorted(manifest["n_files_by_table"].items())
            }
        # the checkpoint's own delta, when the writer knows it: presence
        # (even empty) tells _added_between no snapshot diff is needed;
        # a mega-delta landing ON the boundary spills (r12)
        _attach_delta(commit, mdir, version, manifest, keep_empty_add=True)
        if "pin" in manifest:
            commit["pin"] = manifest["pin"]
        commit["pins"] = _fold_checkpoint_pins(
            out_dir, version, op, manifest.get("pin")
        )
        _link_commit(mdir, version, commit)
        return
    if "tables" not in manifest:
        if is_ckpt_version:
            raise ValueError(
                f"delta-form commit for checkpoint version {version} — "
                "checkpoints must carry the full snapshot (_commit_delta "
                "routes them through the full or pre-built form)"
            )
        commit = {
            "version": version,
            "parent": version - 1,
            "ts": round(time.time(), 3),
            "op": op,
        }
        add = {
            t: sorted(fs) for t, fs in manifest.get("add", {}).items() if fs
        }
        remove = {
            t: sorted(fs)
            for t, fs in manifest.get("remove", {}).items()
            if fs
        }
        # hoist the per-table membership sets: rebuilding set(add[t])
        # inside the inner comprehension is O(n^2) for an n-file table,
        # which bites mega-rewrites (whole-table delta commits)
        added_sets = {t: set(fs) for t, fs in add.items()}
        stats_add = {
            t: {rel: s for rel, s in per.items() if rel in added_sets[t]}
            for t, per in manifest.get("stats_add", {}).items()
            if per and t in added_sets
        }
        stats_add = {t: per for t, per in stats_add.items() if per}
        # mega-deltas (format migration, whole-table rewrite) spill the
        # file lists to a parquet sidecar and keep the commit JSON O(1)
        # bytes + O(#tables) counts — every resolve between checkpoints
        # re-parses this JSON, so an inlined million-file list would tax
        # the whole store until the next checkpoint.  The sidecar is
        # durable BEFORE the commit link; a race loser's spill is a
        # vacuumable orphan.  Same decision point as checkpoint commits.
        _attach_delta(
            commit, mdir, version,
            {"add": add, "remove": remove, "stats_add": stats_add},
            keep_empty_add=False,
        )
        if "pin" in manifest:  # pin/unpin ops change no files — O(1) commit
            commit["pin"] = manifest["pin"]
        _link_commit(mdir, version, commit)
        return
    tables = {t: sorted(fs) for t, fs in manifest["tables"].items() if fs}
    stats = {t: s for t, s in manifest.get("stats", {}).items() if s}

    if is_ckpt_version:
        # the O(live files) payload goes to a parquet sidecar; the commit
        # JSON stays O(1) bytes no matter how many files are live
        ckpt_name, n_files = _write_checkpoint_sidecar(
            mdir, version, tables, stats
        )
        commit = {
            "version": version,
            "ts": round(time.time(), 3),
            "op": op,
            "ckpt": ckpt_name,
            "n_files": n_files,
            # table NAMES are O(dozens) — carrying them here lets
            # consumers (vacuum's candidate-table seeding) learn the
            # snapshot's tables without scanning the O(live files) sidecar
            "table_names": sorted(tables),
            # per-table counts (r12): lets the NEXT cluster-side
            # checkpoint derive its table_names/counts by folding delta
            # metadata instead of running a Spark distinct over the
            # sidecar — O(#tables) JSON bytes buys back one job/ckpt
            "n_files_by_table": {
                t: len(fs) for t, fs in sorted(tables.items())
            },
        }
        # delta passthrough (see the pre-built branch): _commit_delta's
        # driver checkpoint path states what it changed so race-window
        # conflict detection never diffs full snapshots; mega-deltas
        # landing on the boundary spill (r12)
        _attach_delta(commit, mdir, version, manifest, keep_empty_add=True)
        if "pin" in manifest:
            commit["pin"] = manifest["pin"]
        commit["pins"] = _fold_checkpoint_pins(
            out_dir, version, op, manifest.get("pin")
        )
    else:
        base = _resolve(out_dir, version - 1)
        add: dict[str, list[str]] = {}
        remove: dict[str, list[str]] = {}
        stats_add: dict[str, dict] = {}
        names = set(tables) | set(base["tables"])
        for t in sorted(names):
            old = set(base["tables"].get(t, []))
            new = set(tables.get(t, []))
            if new - old:
                add[t] = sorted(new - old)
                per_file = {
                    rel: stats.get(t, {})[rel]
                    for rel in add[t]
                    if rel in stats.get(t, {})
                }
                if per_file:
                    stats_add[t] = per_file
            if old - new:
                remove[t] = sorted(old - new)
        commit = {
            "version": version,
            "parent": version - 1,
            "ts": round(time.time(), 3),
            "op": op,
        }
        # the legacy full-form route spills past the threshold too — a
        # whole-table rewrite handed in as a target snapshot must not
        # re-create the multi-MB inline JSON the spill exists to prevent
        _attach_delta(
            commit, mdir, version,
            {"add": add, "remove": remove, "stats_add": stats_add},
            keep_empty_add=False,
        )
        if "pin" in manifest:
            commit["pin"] = manifest["pin"]

    _link_commit(mdir, version, commit)


def _link_commit(mdir: str, version: int, commit: dict) -> None:
    """Durably publish one commit record through the storage seam:
    ``put_if_absent`` of ``v<N>.json`` (THE commit point — POSIX: fsync'd
    temp + ``os.link``; object stores: conditional PUT; a concurrent
    committer of the same version raises :class:`ConcurrentWriteError`
    instead of silently clobbering), then the CURRENT discovery hint via
    ``write_atomic``."""
    name = _commit_name(version)
    data = json.dumps(commit, separators=(",", ":")).encode()
    try:
        LOG_STORE.put_if_absent(os.path.join(mdir, name), data)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"version {version} already committed in {os.path.dirname(mdir)}"
        ) from None
    LOG_STORE.write_atomic(
        os.path.join(mdir, "CURRENT"), name.encode()
    )  # hint, not the commit


def _commit_append(
    out_dir: str,
    version: int,
    add: dict[str, list],
    stats_add: dict[str, dict],
    op: str = "publish",
    spark: SparkSession | None = None,
) -> None:
    """Commit ``version`` as a pure ADDITION of files — the hot write
    path (r10); :func:`_commit_delta` with an empty remove set."""
    _commit_delta(out_dir, version, add, {}, stats_add, op=op, spark=spark)


def _commit_delta(
    out_dir: str,
    version: int,
    add: dict[str, list],
    remove: dict[str, list],
    stats_add: dict[str, dict],
    op: str = "publish",
    spark: SparkSession | None = None,
    pin: dict | None = None,
) -> None:
    """Commit ``version`` from exactly what the writer CHANGED — the
    single delta-shaped commit every writer (publish, compact, z-order,
    expire, rewrite, pin) funnels through (r11).  Non-checkpoint
    versions write the delta record DIRECTLY: O(changed files) driver
    work, no parent-snapshot hydration, no full-list set-diff.  The old
    route (hand ``_write_manifest`` a full target snapshot and let it
    diff against the parent) cost O(live files) of driver CPU on EVERY
    commit — measured 660 ms/commit at 1M live files
    (``txlog_rehearsal.py 1000000``) for a writer adding 3 files, the
    kind of tax a micro-batch sink pays every few seconds forever.

    Checkpoint versions (v1 and every ``CHECKPOINT_EVERY``-th) owe
    readers the full snapshot.  Above :data:`CLUSTER_PATH_MIN_FILES`
    (with a ``spark`` session supplied or auto-resolved by the caller)
    the sidecar is derived and written CLUSTER-SIDE
    (:func:`_write_checkpoint_spark`: previous sidecar + delta chain,
    one Spark job — the r11 path that keeps the driver O(delta) even on
    the amortized commit); below it, or with no session, the driver
    resolves the parent and writes the sidecar itself (fast at small
    counts: the cache makes the resolve a ≤15-delta replay).

    Same commit point (``_link_commit``'s put-if-absent), so racing
    writers fail loudly and rebase exactly as before; all forms funnel
    through ``_write_manifest``, the single injectable choke point."""
    if version == 1 or version % CHECKPOINT_EVERY == 0:
        parent_n = (
            _store_n_files(out_dir, version - 1) if version > 1 else None
        )
        if (
            spark is not None
            and version > 1
            and (parent_n or 0) >= CLUSTER_PATH_MIN_FILES
        ):
            _write_checkpoint_spark(
                spark, out_dir, version, add, remove, stats_add, op,
                pin=pin,
                est_rows=(parent_n or 0)
                + sum(len(fs) for fs in add.values()),
            )
            return
        base = (
            _resolve(out_dir, version - 1)
            if version > 1
            else {"tables": {}, "stats": {}}
        )
        tables = {t: list(fs) for t, fs in base["tables"].items()}
        stats = {t: dict(s) for t, s in base["stats"].items()}
        for t, rels in remove.items():
            gone = set(rels)
            tables[t] = [f for f in tables.get(t, []) if f not in gone]
            if t in stats:
                for rel in rels:
                    stats[t].pop(rel, None)
        for t, fs in add.items():
            tables.setdefault(t, []).extend(fs)
        for t, per in stats_add.items():
            if per:
                stats.setdefault(t, {}).update(per)
        manifest = {
            "version": version,
            "tables": tables,
            "stats": stats,
            "op": op,
            # the delta this commit applies, carried into the checkpoint
            # JSON so race-window conflict detection stays O(delta)
            "add": {t: sorted(fs) for t, fs in add.items() if fs},
            "remove": {t: sorted(fs) for t, fs in remove.items() if fs},
        }
        if pin is not None:
            manifest["pin"] = pin
        _write_manifest(out_dir, manifest)
        return
    manifest = {
        "version": version,
        "op": op,
        "add": add,
        "remove": remove,
        "stats_add": stats_add,
    }
    if pin is not None:
        manifest["pin"] = pin
    _write_manifest(out_dir, manifest)


def history(out_dir: str) -> list[dict]:
    """The commit log, oldest first: ``[{version, op, ts, kind, added,
    removed}]`` — the DESCRIBE HISTORY analog."""
    out: list[dict] = []
    for v in range(1, _latest_version(out_dir) + 1):
        c = _load_commit(out_dir, v)
        if "ckpt" in c:
            # parquet checkpoint: counts ride in the commit JSON, so
            # history never opens the sidecar.  r11 checkpoints carry
            # their own delta — report the TRUE change (a compact
            # landing on a boundary removes files; n_files would show a
            # phantom million-file write); pre-r11 checkpoints fall
            # back to the snapshot size, the only number they recorded
            kind = "checkpoint"
            if "delta" in c:  # spilled mega-delta on a boundary (r12)
                added = sum(c.get("n_add_by_table", {}).values())
                removed = sum(c.get("n_remove_by_table", {}).values())
            elif "add" in c or "remove" in c:
                added = sum(len(fs) for fs in c.get("add", {}).values())
                removed = sum(
                    len(fs) for fs in c.get("remove", {}).values()
                )
            else:
                added = int(c["n_files"])
                removed = 0
        elif "tables" in c:
            kind = "checkpoint" if "ts" in c else "legacy"
            added = sum(len(fs) for fs in c["tables"].values())
            removed = 0
        elif "delta" in c:  # spilled mega-delta (r12): counts in JSON
            kind = "delta"
            added = sum(c.get("n_add_by_table", {}).values())
            removed = sum(c.get("n_remove_by_table", {}).values())
        else:
            kind = "delta"
            added = sum(len(fs) for fs in c.get("add", {}).values())
            removed = sum(len(fs) for fs in c.get("remove", {}).values())
        out.append(
            {
                "version": v,
                "op": c.get("op", "write"),
                "ts": c.get("ts"),
                "kind": kind,
                "added": added,
                "removed": removed,
            }
        )
    return out


def _pins_at(out_dir: str, version: int) -> dict[int, str | None]:
    """The active pin set AS OF ``version``: walk back to the nearest
    commit carrying a folded ``pins`` snapshot (checkpoints write one —
    the same amortization as table state, so this is O(commits since
    last checkpoint), not O(total versions)), then replay the pin/unpin
    ops forward.  Pre-fold stores (checkpoints without the key) fall
    through to a full replay from v1 — correct, just unamortized until
    their next checkpoint lands."""
    ops: list[dict] = []
    base: dict[int, str | None] = {}
    v = version
    while v >= 1:
        c = _load_commit(out_dir, v)
        if "pins" in c:
            base = {int(k): n for k, n in c["pins"].items()}
            break
        p = c.get("pin")
        if p and c.get("op") in ("pin", "unpin"):
            ops.append({"op": c["op"], **p})
        v = c.get("parent", v - 1) if "tables" not in c else v - 1
    for p in reversed(ops):
        if p["op"] == "pin":
            base[int(p["version"])] = p.get("name")
        else:
            base.pop(int(p["version"]), None)
    return base


def pinned_versions(out_dir: str) -> dict[int, str | None]:
    """The ACTIVE retention leases: ``{pinned version: name}``, folded
    from the ``pin`` / ``unpin`` ops in the commit log (the registry
    lives IN the log — a pin is itself a commit, so it is atomic,
    crash-durable, and visible to every concurrent maintenance writer
    through the same protocol as data).  Amortized by the checkpoint
    fold (see :func:`_pins_at`): maintenance loops that call this after
    every compaction pay O(CHECKPOINT_EVERY) commit reads, not O(total
    versions) — the r8-flagged quadratic."""
    return _pins_at(out_dir, _latest_version(out_dir))


def pin_version(
    out_dir: str,
    version: int,
    name: str | None = None,
    spark: SparkSession | None | _AutoSpark = AUTO,
) -> dict:
    """Take a RETENTION LEASE on snapshot ``version``: commit a ``pin``
    log entry that :func:`vacuum` (and therefore every maintenance op's
    auto-vacuum) must honor — the pinned snapshot's data files survive
    any number of compaction/vacuum cycles past ``MAINT_KEEP_VERSIONS``,
    so a training run's ``dataset_snapshot`` provenance version stays
    byte-identically re-readable until :func:`unpin_version` releases it.
    Refuses a version that is uncommitted or whose files are ALREADY
    reclaimed (a lease on an unreadable snapshot would promise the
    impossible).  Returns the pin COMMIT RECORD ({version, op, pin} —
    an O(1) delta commit off checkpoint boundaries, r10), not a
    snapshot; callers that want the snapshot read it
    (``read_manifest`` / ``read_published``).

    ``spark`` defaults to :data:`AUTO`: past
    :data:`CLUSTER_PATH_MIN_FILES` live files the re-readability probe
    runs in executors on the active session (collecting ≤1 row); below
    it — or with an explicit ``spark=None`` — the dependency-free driver
    probe runs.  Pass a session explicitly to force the cluster path.

    Concurrency: a vacuum IN FLIGHT while this commits may have read the
    pin set before the pin landed.  The files are re-verified AFTER the
    pin commit and the lease is released (plus a loud raise) if any were
    lost — so a lost race surfaces as an error, never as a silently
    unreadable lease.  The residual window (vacuum deletes after this
    re-verify returns) requires the single-maintenance-writer discipline
    every other maintenance op here already assumes: don't run vacuum
    concurrently with pin_version on versions at/past the retention
    horizon."""
    latest = _latest_version(out_dir)
    if not 1 <= version <= latest:
        raise ValueError(
            f"pin_version: version {version} not in committed range "
            f"1..{latest} of {out_dir!r}"
        )
    auto_selected = isinstance(spark, _AutoSpark)
    spark = _resolve_spark_arg(spark, out_dir)

    def _driver_missing_file() -> str | None:
        for t, fs in _snapshot_files(out_dir, version).items():  # no stats
            tdir = os.path.join(out_dir, f"{t}.parquet")
            for rel in fs:
                if not LOG_STORE.exists(os.path.join(tdir, rel)):
                    return f"{t}/{rel}"
        return None

    if spark is not None and not _executor_visible(
        spark, os.path.abspath(_manifest_path(out_dir))
    ):
        # same polarity as vacuum (r12): executors that cannot read the
        # commit log would die inside the sidecar scan with an opaque
        # FileNotFoundException — AUTO degrades to the driver probe with
        # the documented warning, explicit spark= names the contract
        if not auto_selected:
            raise StorageVisibilityError(
                f"pin_version(spark=...): executors cannot see the "
                f"commit log under {out_dir!r} — the store is not on "
                "shared storage; use spark=None or run against shared "
                "storage"
            )
        _warn_executor_blind("pin_version", out_dir)
        spark = None
    if spark is None:
        _missing_file = _driver_missing_file
    else:
        # r10 scale path: the snapshot file set never touches the driver —
        # the sidecar-resolved DataFrame is probed for existence in
        # EXECUTORS and only the first missing row (O(1)) is collected.
        # Re-invoking the DataFrame re-runs the probe, so the post-commit
        # re-verify below is a genuinely fresh look at the filesystem.
        files_df = snapshot_files_df(spark, out_dir, version)
        root = os.path.abspath(out_dir)
        store = LOG_STORE  # pickled into the executor closure

        def _probe(batches):
            import os as _os

            for pdf in batches:
                mask = [
                    not store.exists(
                        _os.path.join(root, f"{t}.parquet", rel)
                    )
                    for t, rel in zip(pdf["table"], pdf["file"])
                ]
                yield pdf[mask]

        def _missing_file() -> str | None:
            miss = files_df.mapInPandas(
                _probe, "table string, file string"
            ).take(1)
            if not miss:
                return None
            return _classify_pin_miss(
                out_dir,
                miss[0]["table"],
                miss[0]["file"],
                auto_selected,
                _driver_missing_file,
            )

    gone = _missing_file()
    if gone is not None:
        raise ValueError(
            f"pin_version: version {version} is no longer "
            f"re-readable — {gone} was already vacuumed; "
            "pin BEFORE the retention horizon passes"
        )
    for _ in range(2):
        try:
            commit = _commit_pin_op(
                out_dir, "pin", {"version": version, "name": name},
                spark=spark,
            )
        except ConcurrentWriteError:
            continue
        # re-verify AFTER the lease is durable: a vacuum that snapshotted
        # the pin set before this commit may have reclaimed the files in
        # between — release the now-hollow lease and fail loudly
        gone = _missing_file()
        if gone is not None:
            unpin_version(out_dir, version)
            raise ValueError(
                f"pin_version: lost the race with a concurrent vacuum — "
                f"{gone} was reclaimed while the pin committed; the lease "
                "was released (see the single-maintenance-writer note)"
            )
        return commit
    raise ConcurrentWriteError(
        f"pin_version: lost the commit race twice in {out_dir!r}"
    )


def _classify_pin_miss(
    out_dir: str,
    table: str,
    rel: str,
    auto_selected: bool,
    driver_probe,
) -> str | None:
    """Diagnose a file the EXECUTOR probe reported missing.  When the
    DRIVER can see it, the snapshot was never vacuumed — the storage is
    not shared with executors, and misdiagnosing that would refuse a
    perfectly valid lease: explicit ``spark=`` surfaces
    :class:`StorageVisibilityError` loudly; :data:`AUTO` degrades to the
    driver probe with a warning (the pre-r11 default behavior).  When
    the driver can't see it either, it is genuinely gone."""
    if LOG_STORE.exists(
        os.path.join(os.path.abspath(out_dir), f"{table}.parquet", rel)
    ):
        if not auto_selected:
            raise StorageVisibilityError(
                f"pin_version: executors cannot see {table}/{rel} that "
                f"the driver can — out_dir {out_dir!r} is not on shared "
                "storage; use spark=None or run against shared storage"
            )
        import warnings

        warnings.warn(
            f"pin_version: {out_dir!r} is not visible to executors; the "
            "auto-selected cluster probe was abandoned for the driver "
            "probe",
            RuntimeWarning,
            stacklevel=4,
        )
        return driver_probe()
    return f"{table}/{rel}"


def unpin_version(
    out_dir: str,
    version: int,
    spark: SparkSession | None | _AutoSpark = AUTO,
) -> dict:
    """Release the retention lease on ``version`` (a ``unpin`` log
    entry); its files become reclaimable by the next :func:`vacuum` when
    outside the normal retention horizon.  Refuses when no active pin
    exists — an unpin that silently no-ops would mask a double-release
    bug in the caller's provenance bookkeeping.  ``spark`` (default
    :data:`AUTO`, like :func:`pin_version`) only matters when the commit
    lands on a checkpoint boundary — the sidecar is then built
    cluster-side past :data:`CLUSTER_PATH_MIN_FILES`."""
    if version not in pinned_versions(out_dir):
        raise ValueError(
            f"unpin_version: version {version} holds no active pin in "
            f"{out_dir!r}"
        )
    spark = _resolve_spark_arg(spark, out_dir)
    for _ in range(2):
        try:
            return _commit_pin_op(
                out_dir, "unpin", {"version": version}, spark=spark
            )
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"unpin_version: lost the commit race twice in {out_dir!r}"
    )


def _commit_pin_op(
    out_dir: str, op: str, pin: dict, spark: SparkSession | None = None
) -> dict:
    """One ``pin``/``unpin`` log entry.  A lease changes NO files, so off
    checkpoint boundaries this is an O(1) delta-form commit (r10 — the
    old path hydrated the full snapshot just to re-state it); a commit
    landing ON a checkpoint boundary carries the full snapshot form the
    protocol owes readers there (and folds the pin set) — built
    cluster-side past :data:`CLUSTER_PATH_MIN_FILES` when ``spark`` is
    supplied, like every other checkpoint (:func:`_commit_delta`).
    Raises :class:`ConcurrentWriteError` on a lost race; returns the pin
    commit record ``{version, op, pin}`` (version metadata only — even
    on a checkpoint boundary the sidecar keys stay in the log; read the
    commit with ``_load_commit`` if you need them)."""
    v_next = _latest_version(out_dir) + 1
    _commit_delta(
        out_dir, v_next, {}, {}, {}, op=op, spark=spark, pin=pin
    )
    return {"version": v_next, "op": op, "pin": pin}


def ensure_manifest(out_dir: str) -> dict:
    """Adopt an unmanaged directory into the commit-log protocol — the
    rewrite-compat shim that lets ``atomic=True`` be the DEFAULT sink over
    tables previously written by the plain table-by-table ``merge_batch``
    path.

    When no commit exists, every data file already under a
    ``<table>.parquet`` directory is committed as snapshot v1 (legacy rows
    stay visible to ``read_published`` and to the duplicate probe, so the
    switch appends nothing twice).  On a FRESH directory this commits an
    EMPTY v1 — deliberately, and before any staging: once a commit
    exists, a crash mid-stage can never be mistaken for adoptable legacy
    data on replay (files outside the log are orphans, reclaimed by
    :func:`vacuum`).  The only unsupported shape is a directory holding
    half-staged files from a crashed log-LESS writer — don't mix writers
    mid-crash.  Idempotent; returns the live snapshot."""
    if _latest_version(out_dir) > 0:
        return read_manifest(out_dir)
    store = LOG_STORE
    tables: dict[str, list[str]] = {}
    if store.isdir(out_dir):
        for entry in sorted(store.listdir(out_dir)):
            if not entry.endswith(".parquet"):
                continue
            tdir = os.path.join(out_dir, entry)
            if not store.isdir(tdir):
                continue
            rels = [
                os.path.relpath(os.path.join(root, fname), tdir)
                for root, _dirs, files in store.walk(tdir)
                for fname in files
                if not fname.startswith(("_", "."))
            ]
            if rels:
                tables[entry[: -len(".parquet")]] = sorted(rels)
    manifest = {"version": 1, "tables": tables, "op": "adopt"}
    try:
        _write_manifest(out_dir, manifest)
    except ConcurrentWriteError:
        pass  # another writer adopted first — their v1 serves
    return read_manifest(out_dir)


def _file_may_match(
    stats: dict | None, where: dict[str, tuple] | None
) -> bool:
    """Range-overlap test: False only when the file's recorded [min, max]
    for some predicate column is provably disjoint from the requested
    bounds.  Missing stats (column or file) keep the file — pruning is an
    optimization, never a filter."""
    if not where:
        return True
    if not stats:
        return True
    for col, (lo, hi) in where.items():
        rng = stats.get(col)
        if not rng:
            continue
        fmin, fmax = rng
        if fmin is None or fmax is None:
            continue
        try:
            if lo is not None and fmax < lo:
                return False
            if hi is not None and fmin > hi:
                return False
        except TypeError:
            continue  # bound/stat type mismatch: never prune on it
    return True


def read_published(
    spark: SparkSession,
    out_dir: str,
    table: str,
    version: int | None = None,
    where: dict[str, tuple] | None = None,
) -> DataFrame | None:
    """The committed view of ``table``: exactly the snapshot's file list,
    with bucket partition columns preserved (``basePath``) so probe filters
    still prune.  ``None`` when the table has no published rows.

    ``version`` time-travels to an older snapshot.  ``where`` ({col:
    (lo, hi)}, either bound None for open) SKIPS files whose footer stats
    are disjoint from the bounds — the result may still contain
    non-matching rows (callers apply the row filter; this prunes I/O,
    like Delta data skipping, it does not implement the predicate).

    Resolution is PER-TABLE (r10): the checkpoint sidecar is read
    filtered to ``table`` and column-pruned (stats bytes only when a
    ``where`` needs them), so reading one table of an N-table store
    costs O(that table's files), not O(all live files).  The explicit
    path list handed to ``spark.read`` is the one remaining O(table
    files) driver artifact — the same place Delta keeps it (the scan's
    file index lives on the JVM driver by construction)."""
    latest = _latest_version(out_dir)
    if version is None:
        version = latest
    elif version > latest:
        raise ValueError(f"version {version} > latest committed {latest}")
    if version == 0:
        return None
    all_files, per_file = _table_files(
        out_dir, version, table, with_stats=bool(where)
    )
    if not all_files:
        return None
    tdir = os.path.join(out_dir, f"{table}.parquet")
    files = all_files
    if where:
        files = [f for f in files if _file_may_match(per_file.get(f), where)]
        if not files:
            # every file pruned: empty result with the table's full schema
            # (one-file read keeps partition columns via basePath)
            try:
                schema = (
                    spark.read.option("basePath", tdir)
                    .parquet(os.path.join(tdir, all_files[0]))
                    .schema
                )
            except Exception as e:
                # the probe file can vanish between resolve and read if a
                # concurrent vacuum reclaimed this snapshot's horizon —
                # surface the snapshot context instead of an opaque
                # parquet path error (r11)
                raise RuntimeError(
                    f"read_published: schema probe file "
                    f"{table}/{all_files[0]} of snapshot v{version} in "
                    f"{out_dir!r} is unreadable — was the version vacuumed "
                    "between resolve and read?  Pin the version "
                    "(pin_version) to hold its files."
                ) from e
            return spark.createDataFrame([], schema)
    return spark.read.option("basePath", tdir).parquet(
        *[os.path.join(tdir, f) for f in files]
    )


# ---------------------------------------------------------------------------
# staged write + commit
# ---------------------------------------------------------------------------


def _json_safe(v):
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float, str)):
        return v
    return None


def _file_stats(path: str) -> dict[str, list]:
    """Per-column [min, max] from the parquet footer (row-group stats
    folded across groups) — free at stage time, and what lets
    ``read_published(where=...)`` skip files without opening them.  Only
    JSON-comparable scalar types are kept; anything else is skipped."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
    except Exception:
        return {}
    acc: dict[str, list] = {}
    skipped: set[str] = set()
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name or name in skipped:
                continue  # nested leaves don't map to predicate columns
            st = col.statistics
            if st is None or not st.has_min_max:
                skipped.add(name)
                acc.pop(name, None)
                continue
            lo, hi = _json_safe(st.min), _json_safe(st.max)
            if lo is None or hi is None:
                skipped.add(name)
                acc.pop(name, None)
                continue
            if name in acc:
                acc[name] = [min(acc[name][0], lo), max(acc[name][1], hi)]
            else:
                acc[name] = [lo, hi]
    if len(acc) > _MAX_STATS_COLUMNS:
        acc = dict(sorted(acc.items())[:_MAX_STATS_COLUMNS])
    return acc


def _stage_table(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    table: str,
    pk: tuple[str, ...],
    layout: tuple[tuple[str, ...], tuple[str, ...]] | None = None,
) -> tuple[list[str], dict[str, dict]]:
    """Anti-join ``df`` against the PUBLISHED rows (bounded by the same
    bucket pruning as merge_plan), write the survivors partition-laid-out
    into the table directory, and return the new files' relative paths and
    footer stats — on disk but in no commit until the caller commits.

    ``layout`` = (cluster_cols, sort_cols): applied AFTER the PK
    dropDuplicates/anti-join (which shuffle, so any shaping the CALLER did
    upstream is destroyed by the time rows reach the writer — r9 find: the
    BM25 postings' term order only survived by accident of the dedup
    aggregate's internal ordering).  ``repartition(cluster) →
    sortWithinPartitions(sort)`` here is the only placement that actually
    reaches the files."""
    from pyspark.sql import functions as F  # noqa: F401

    batch = df.dropDuplicates(list(pk))
    bucket_col = next(
        (c for c in ("height_bucket", "key_bucket") if c in batch.columns), None
    )
    existing = read_published(spark, out_dir, table)
    if existing is not None:
        existing = prune_existing_to_batch(existing, batch, bucket_col)
        # null-safe per-column equality, SAME rule as listen.py merge_plan:
        # silver-table PKs carry nullable components, and plain equality
        # (NULL != NULL) would re-append every NULL-keyed row on each
        # crash replay — the duplication the probe exists to prevent
        probe = existing.select(*pk)
        cond = None
        for c in pk:
            eq = batch[c].eqNullSafe(probe[c])
            cond = eq if cond is None else (cond & eq)
        batch = batch.join(probe, on=cond, how="left_anti")
    if batch.isEmpty():
        # zero survivors (fully-duplicate replay, or an empty stream
        # batch): staging would still emit a 0-row part file for
        # unpartitioned tables, accumulating junk files — and the caller
        # would burn a commit version on it (merge_batch guards the same
        # case, listen.py)
        return [], {}

    if layout is not None:
        cluster, sort = layout
        if cluster:
            batch = batch.repartition(*cluster)
        if sort:
            # the sort KEY must lead with the cluster/partition columns:
            # the V1 planned-write rule inserts its own Sort(partitionCols)
            # above the query, and EliminateSorts drops whichever sort is
            # subsumed — a bare sortWithinPartitions(sort) is the one
            # eliminated (silently, leaving files in writer-sort order).
            # With the partition cols prefixed, OUR ordering satisfies the
            # writer's requirement and the planner's sort is the one
            # removed, so the caller's file order actually lands on disk.
            lead = [c for c in cluster if c not in sort]
            batch = batch.sortWithinPartitions(*lead, *sort)
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
    stats: dict[str, dict] = {}
    for root, _dirs, files in os.walk(staging):
        for fname in files:
            if fname.startswith(("_", ".")):
                continue
            rel = os.path.relpath(os.path.join(root, fname), staging)
            dest = os.path.join(tdir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.rename(os.path.join(root, fname), dest)
            moved.append(rel)
            fs = _file_stats(dest)
            if fs:
                stats[rel] = fs
    shutil.rmtree(staging, ignore_errors=True)
    return sorted(moved), stats


def _added_between(out_dir: str, old_v: int, new_v: int) -> dict[str, list]:
    """Files ADDED by commits ``old_v+1 .. new_v`` — what the racing
    writer(s) published while our batch was staging.  Delta commits carry
    the answer verbatim, and r11 checkpoints carry their OWN delta in the
    commit JSON (``add``/``remove`` beside ``ckpt``), so a checkpoint
    landing in the race window costs O(delta) too; only pre-r11
    full-form commits fall back to diffing two resolved snapshots.
    Conflict detection itself uses the cheaper
    :func:`_added_dirs_between` (r12 — spilled mega-deltas answer from
    JSON metadata); this file-level fold remains for introspection and
    as the reference semantics the dirs fold is tested against."""
    added: dict[str, list] = {}
    for v in range(old_v + 1, new_v + 1):
        c = _hydrate_delta(
            out_dir, _load_commit(out_dir, v), with_stats=False
        )
        if "add" in c or ("tables" not in c and "ckpt" not in c):
            per = c.get("add", {})
        else:  # full form: diff against the previous snapshot
            prev = _snapshot_files(out_dir, v - 1)
            cur = _snapshot_files(out_dir, v)
            per = {
                t: sorted(set(fs) - set(prev.get(t, [])))
                for t, fs in cur.items()
            }
        for t, rels in per.items():
            if rels:
                added.setdefault(t, []).extend(rels)
    return added


def _added_dirs_between(
    out_dir: str, old_v: int, new_v: int
) -> dict[str, set | None]:
    """The partition DIRECTORIES of files added by commits
    ``old_v+1 .. new_v`` — all conflict detection needs (r12).  Spilled
    mega-deltas answer from their ``add_dirs_by_table`` JSON field
    without opening the sidecar; a ``None`` value is the over-cap
    wildcard (treat as conflicting with anything on that table).
    Pre-r12 spills without the field hydrate once, like
    :func:`_added_between`."""
    dirs: dict[str, set | None] = {}

    def _merge(t: str, ds) -> None:
        if dirs.get(t, set()) is None:
            return  # already wildcard
        if ds is None:
            dirs[t] = None
            return
        dirs.setdefault(t, set()).update(ds)

    for v in range(old_v + 1, new_v + 1):
        c = _load_commit(out_dir, v)
        if "delta" in c and "add_dirs_by_table" in c:
            for t, ds in c["add_dirs_by_table"].items():
                _merge(t, set(ds) if ds is not None else None)
            continue
        c = _hydrate_delta(out_dir, c, with_stats=False)
        if "add" in c or ("tables" not in c and "ckpt" not in c):
            per = c.get("add", {})
        else:  # pre-r10 full form: diff against the previous snapshot
            prev = _snapshot_files(out_dir, v - 1)
            cur = _snapshot_files(out_dir, v)
            per = {
                t: sorted(set(fs) - set(prev.get(t, [])))
                for t, fs in cur.items()
            }
        for t, rels in per.items():
            if rels:
                _merge(t, {os.path.dirname(f) for f in rels})
    return dirs


def _conflicting_tables(
    out_dir: str, old_v: int, new_v: int, staged: dict
) -> set[str]:
    """Which staged tables a racing commit may have COLLIDED with on PK:
    the staged files' partition directories (``bucket=…`` prefixes, the
    deterministic function of each row's content) are compared with the
    racers' added files' directories — overlap means the pre-race
    anti-join may have missed a racer's row, so that table must re-stage
    against the fresh snapshot.  Flat (unpartitioned) tables share the
    empty prefix, so any racer touch of the same table re-stages —
    conservative by construction."""

    racer_dirs = _added_dirs_between(out_dir, old_v, new_v)
    out = set()
    for t, (files, _stats) in staged.items():
        if t not in racer_dirs:
            continue
        theirs_d = racer_dirs[t]
        ours_d = {os.path.dirname(f) for f in files}
        # a flat file ("" prefix) on EITHER side is a wildcard — its
        # rows carry no partition evidence — and so is an over-cap
        # spilled rewrite (theirs_d is None): any same-table race
        # conflicts
        if (
            theirs_d is None
            or "" in ours_d
            or "" in theirs_d
            or ours_d & theirs_d
        ):
            out.add(t)
    return out


def publish_batch(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    out_dir: str,
    pks: dict[str, tuple[str, ...]] | None = None,
    max_retries: int = 3,
    layouts: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] | None = None,
) -> dict:
    """Stage every table's merge, then commit ONE log entry covering all of
    them — the Worker.hs:50-82 transaction boundary.  On a version race
    (another writer committed first) the commit is retried against the
    fresh snapshot — with CONFLICT DETECTION (r9): a staged table whose
    partition directories overlap the racers' added files may have
    missed a racer's PK in its pre-race anti-join, so it is RE-STAGED
    against the fresh snapshot (duplicates drop; the stale staging
    becomes a vacuumable orphan); disjoint tables rebase verbatim (the
    fast path — the reference's disjoint-chain-range workers never
    re-stage).  Detection is sound because every partition value here is
    a deterministic function of the row's content (height/key buckets);
    flat tables are always conservatively re-staged.  ``layouts``
    optionally pins a table's physical file shape as ``{table:
    (cluster_cols, sort_cols)}`` — see ``_stage_table``.

    Returns the COMMIT RECORD ``{"version": N, "op": "publish"|"noop",
    "add": {table: n_files}}`` — version metadata only (r10): the hot
    write path commits O(staged files) deltas directly
    (:func:`_commit_append`) and never hydrates the full snapshot, so
    returning one would cost more than the commit; callers that want the
    snapshot read it (``read_manifest`` / ``read_published``)."""
    pks = pks or TABLE_PKS
    # adopt legacy (log-less) layouts and pin v1 before staging — see
    # ensure_manifest for why this must precede the first staged file
    # (rare one-time path; the hot loop skips the full-snapshot resolve)
    if _latest_version(out_dir) == 0:
        ensure_manifest(out_dir)
    base_v = _latest_version(out_dir)
    staged: dict[str, tuple[list[str], dict]] = {}
    # stage CONCURRENTLY: each table's probe+write is an independent small
    # Spark job against its own directory, and a micro-batch commit is
    # job-scheduling-bound, not data-bound — sequential staging of an
    # 8-table curation batch paid ~16 back-to-back job latencies where the
    # slowest one suffices (threaded job submission is the supported Spark
    # pattern; file contents per table are unchanged, so replay
    # byte-idempotence is unaffected)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, max(1, len(tables)))) as ex:
        futs = [
            (
                name,
                ex.submit(
                    _stage_table,
                    spark,
                    df,
                    out_dir,
                    name,
                    pks[name],
                    (layouts or {}).get(name),
                ),
            )
            for name, df in tables.items()
        ]
        for name, fut in futs:
            new_files, new_stats = fut.result()
            if new_files:
                staged[name] = (new_files, new_stats)
    if not staged:
        # nothing survived the duplicate probes — do NOT burn a version on
        # an empty delta: retention (MAINT_KEEP_VERSIONS) counts VERSIONS,
        # so a run of no-op commits (crash-replay storms) would silently
        # shrink the real time-travel / pinned-reader horizon toward zero
        return {"version": _latest_version(out_dir), "op": "noop", "add": {}}
    for attempt in range(max_retries + 1):
        add = {name: files for name, (files, _s) in staged.items()}
        stats_add = {
            name: fstats for name, (_f, fstats) in staged.items() if fstats
        }
        try:
            # spark rides along for the amortized checkpoint commits: at
            # ≥ CLUSTER_PATH_MIN_FILES the sidecar is derived and written
            # cluster-side instead of hydrating O(live files) driver dicts
            _commit_append(
                out_dir, base_v + 1, add, stats_add, op="publish",
                spark=spark,
            )
            return {
                "version": base_v + 1,
                "op": "publish",
                "add": {t: len(fs) for t, fs in add.items()},
            }
        except ConcurrentWriteError:
            if attempt == max_retries:
                raise
            fresh_v = _latest_version(out_dir)
            # conflict detection before the rebase: re-stage any table
            # whose partitions the racers touched (its pre-race anti-join
            # may have missed their rows); the stale staged files become
            # orphans for vacuum
            for name in _conflicting_tables(
                out_dir, base_v, fresh_v, staged
            ):
                staged.pop(name)
                nf, ns = _stage_table(
                    spark,
                    tables[name],
                    out_dir,
                    name,
                    pks[name],
                    (layouts or {}).get(name),
                )
                if nf:
                    staged[name] = (nf, ns)
            if not staged:
                # every row turned out already-published by the racers
                return {"version": fresh_v, "op": "noop", "add": {}}
            base_v = fresh_v  # rebase and retry
    raise AssertionError("unreachable")


def compact_published(
    spark: SparkSession,
    out_dir: str,
    table: str,
    min_files: int = 2,
    target_files: int = 1,
    keep_versions: int = MAINT_KEEP_VERSIONS,
    sort_within: tuple[str, ...] | None = None,
) -> dict[str, tuple[int, int]]:
    """Log-aware compaction: rewrite each partition's many LIVE files
    (the snapshot's list, not the directory's) into ``target_files``, then
    commit the swap as ONE log entry — a reader sees the old snapshot
    or the compacted one, never a mix; rows are preserved exactly.  The
    replaced files fall out of the snapshot and are reclaimed by
    :func:`vacuum` (called here with ``keep_versions`` — the retention
    horizon that keeps recent snapshots' files readable for pinned
    readers and time travel).  This is the append-only sink's
    autovacuum: per-batch writes bound file growth per batch (coalesce(1)
    in the sinks), but cumulative growth is O(batches) and probe cost is
    O(live files) at the parquet-open layer — periodic compaction is the
    long-run bound.  On a version race the swap is rebased if every
    replaced file is still live in the fresh snapshot, else abandoned
    (compaction is an optimization; the orphaned rewrite is vacuumed).
    Returns {partition: (files_before, files_after)}.

    Resolution and commit are PER-TABLE and delta-form (r11): the input
    file list comes from the filtered sidecar read (never O(all live
    files)), and the swap commits exactly {remove: replaced, add:
    rewritten} — no full-snapshot hydration anywhere on the path; a
    swap landing on a checkpoint boundary builds the sidecar
    cluster-side past :data:`CLUSTER_PATH_MIN_FILES`."""
    from collections import defaultdict

    latest = _latest_version(out_dir)
    if latest == 0:
        return {}
    files, _ = _table_files(out_dir, latest, table, with_stats=False)
    if not files:
        return {}
    tdir = os.path.join(out_dir, f"{table}.parquet")
    by_part: dict[str, list[str]] = defaultdict(list)
    for rel in files:
        by_part[os.path.dirname(rel)].append(rel)
    replaced: list[str] = []
    added: list[str] = []
    added_stats: dict[str, dict] = {}
    done: dict[str, tuple[int, int]] = {}
    for part in sorted(by_part):
        rels = by_part[part]
        if len(rels) <= max(min_files, target_files):
            continue
        df = spark.read.parquet(*[os.path.join(tdir, r) for r in rels])
        staging = os.path.join(
            out_dir, "_staging", f"compact-{table}-{uuid.uuid4().hex}"
        )
        out_df = df.coalesce(target_files)
        if sort_within:
            # tables whose probes rely on row-group min/max pruning (e.g.
            # the BM25 postings' term order) must keep that order through
            # compaction, or the rewrite silently degrades every later probe
            out_df = out_df.sortWithinPartitions(*sort_within)
        out_df.write.mode("overwrite").parquet(staging)
        moved: list[str] = []
        for fname in sorted(os.listdir(staging)):
            if fname.startswith(("_", ".")):
                continue
            dest_rel = os.path.join(part, fname) if part else fname
            dest = os.path.join(tdir, dest_rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.rename(os.path.join(staging, fname), dest)
            moved.append(dest_rel)
            fs = _file_stats(dest)
            if fs:
                added_stats[dest_rel] = fs
        shutil.rmtree(staging, ignore_errors=True)
        replaced.extend(rels)
        added.extend(moved)
        done[part or "."] = (len(rels), len(moved))
    if not done:
        return {}
    gone = set(replaced)
    for rebase in (False, True):
        try:
            _commit_delta(
                out_dir,
                latest + 1,
                add={table: sorted(added)},
                remove={table: sorted(replaced)},
                stats_add={table: added_stats},
                op="compact",
                spark=spark,
            )
            vacuum(out_dir, keep_versions=keep_versions, min_age_s=VACUUM_GRACE_S)
            return done
        except ConcurrentWriteError:
            if rebase:
                raise
            latest = _latest_version(out_dir)
            live, _ = _table_files(out_dir, latest, table, with_stats=False)
            if not gone <= set(live):
                # a racing commit already dropped some input file — the
                # rewrite no longer describes the live table; abandon it
                vacuum(out_dir, keep_versions=keep_versions, min_age_s=VACUUM_GRACE_S)
                return {}
    raise AssertionError("unreachable")


def live_partition_values(
    out_dir: str, table: str, column: str = "key_bucket"
) -> list[str]:
    """Distinct values of a partition-directory column across the LIVE
    snapshot — from the manifest file list when a log exists (replaced
    files linger on disk for time travel, so a directory listing would
    false-positive right after a format migration), else one listdir.
    No Spark job; cheap enough for per-batch format guards."""
    tdir = os.path.join(out_dir, f"{table}.parquet")
    if not LOG_STORE.isdir(tdir):
        return []
    prefix = f"{column}="
    vals: set[str] = set()
    if LOG_STORE.isdir(_manifest_path(out_dir)):
        latest = _latest_version(out_dir)
        # per-table filtered resolve (r11): a per-batch format guard must
        # not pay O(all live files) for one table's partition values
        files = (
            _table_files(out_dir, latest, table, with_stats=False)[0]
            if latest
            else []
        )
        for rel in files:
            head = rel.replace(os.sep, "/").split("/", 1)[0]
            if head.startswith(prefix):
                vals.add(head.split("=", 1)[1])
    else:
        vals = {
            d.split("=", 1)[1]
            for d in LOG_STORE.listdir(tdir)
            if d.startswith(prefix)
        }
    return sorted(vals)


def rewrite_published(
    spark: SparkSession,
    out_dir: str,
    table: str,
    df: DataFrame,
    keep_versions: int = MAINT_KEEP_VERSIONS,
) -> dict:
    """Replace ``table``'s ENTIRE live file list with a rewrite of ``df``
    in ONE commit — the format-migration primitive.  ``compact_published``
    deliberately keeps partition directory names, so it cannot express a
    key_bucket FORMAT change (new partition values need new directories);
    this op stages the rewrite partition-laid-out, then commits a manifest
    whose file list for ``table`` is exactly the staged files.  A reader
    sees the pre-migration snapshot or the migrated one, never a mix; the
    replaced files stay readable for pinned readers / time travel until
    the ``keep_versions`` vacuum horizon passes.  Migrations are
    administrative single-writer operations: a version race raises
    ``ConcurrentWriteError`` rather than rebasing (a rebase could silently
    drop rows a racing publish added to the old format)."""
    return rewrite_published_many(
        spark, out_dir, {table: df}, keep_versions=keep_versions
    )


def rewrite_published_many(
    spark: SparkSession,
    out_dir: str,
    tables: dict[str, DataFrame],
    keep_versions: int = MAINT_KEEP_VERSIONS,
    op: str = "rewrite",
    extra_appends: dict[str, DataFrame] | None = None,
) -> dict:
    """:func:`rewrite_published` over SEVERAL tables in ONE commit — the
    multi-table swap an index REBUILD needs (members re-encoded under a
    new quantizer + its stats/meta tables must flip together, or a reader
    could pair new codes with old metadata).  ``extra_appends`` stages
    additional tables whose staged files are APPENDED to (not replacing)
    their live lists in the same commit — the rebuild's meta-epoch row.
    Same single-writer contract as ``rewrite_published``.

    Commits DELTA-form (r11): remove = each rewritten table's old live
    list (resolved per-table from the filtered sidecar), add = the
    staged files — never a full-snapshot hydration; a migration landing
    on a checkpoint boundary builds the sidecar cluster-side past
    :data:`CLUSTER_PATH_MIN_FILES`.  Returns the commit record
    ``{"version": N, "op": op, "add": {table: n_files}}``."""
    latest = _latest_version(out_dir)
    version = latest + 1
    add: dict[str, list[str]] = {}
    remove: dict[str, list[str]] = {}
    stats_add: dict[str, dict] = {}

    def _stage_rewrite(table: str, df: DataFrame) -> tuple[list[str], dict]:
        tdir = os.path.join(out_dir, f"{table}.parquet")
        bucket_col = next(
            (c for c in ("height_bucket", "key_bucket") if c in df.columns),
            None,
        )
        staging = os.path.join(
            out_dir, "_staging", f"rewrite-{table.replace(os.sep, '_')}-"
            f"{uuid.uuid4().hex}"
        )
        writer = df.write.mode("overwrite")
        if bucket_col is not None:
            writer = writer.partitionBy(bucket_col)
        writer.parquet(staging)
        moved: list[str] = []
        new_stats: dict[str, dict] = {}
        for root, _dirs, files in os.walk(staging):
            for fname in files:
                if fname.startswith(("_", ".")):
                    continue
                rel = os.path.relpath(os.path.join(root, fname), staging)
                dest = os.path.join(tdir, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.rename(os.path.join(root, fname), dest)
                moved.append(rel)
                fs = _file_stats(dest)
                if fs:
                    new_stats[rel] = fs
        shutil.rmtree(staging, ignore_errors=True)
        return sorted(moved), new_stats

    for table, df in tables.items():
        moved, new_stats = _stage_rewrite(table, df)
        old = (
            _table_files(out_dir, latest, table, with_stats=False)[0]
            if latest
            else []
        )
        if old:
            remove[table] = old
        add[table] = moved
        stats_add[table] = new_stats
    for table, df in (extra_appends or {}).items():
        moved, new_stats = _stage_rewrite(table, df)
        add[table] = sorted(add.get(table, []) + moved)
        stats_add.setdefault(table, {}).update(new_stats)
    _commit_delta(
        out_dir, version, add, remove, stats_add, op=op, spark=spark
    )
    vacuum(out_dir, keep_versions=keep_versions, min_age_s=VACUUM_GRACE_S)
    return {
        "version": version,
        "op": op,
        "add": {t: len(fs) for t, fs in add.items()},
    }


def vacuum(
    out_dir: str,
    keep_versions: int = 0,
    min_age_s: float = 0.0,
    spark: SparkSession | None | _AutoSpark = AUTO,
) -> list[str]:
    """Delete data files referenced by NO retained snapshot (crash orphans
    from batches that staged but never committed, and files compacted
    away) plus leftover staging dirs.  ``keep_versions`` retains the files
    of that many snapshots BEFORE the newest as well, preserving time
    travel to them; the default keeps only the live snapshot (time-travel
    reads older than the horizon fail on missing data files, like Delta's
    VACUUM).  Commit-log JSON is never deleted — history stays readable.
    Safe under the committed-log protocol: a file outside every retained
    snapshot can never be read via read_published at those versions.

    ``min_age_s`` — concurrent-writer grace window (Delta's
    file-retention-age analog): unreferenced files and staging dirs
    YOUNGER than this are kept, because a concurrent writer's
    staged-but-uncommitted files are indistinguishable from crash orphans
    by reference alone — deleting them would corrupt the snapshot that
    writer is about to commit.  The maintenance ops' auto-vacuum passes
    :data:`VACUUM_GRACE_S`; an explicit ``vacuum(out)`` defaults to 0
    (immediate reclamation — correct once all writers are quiesced).

    A directory with NO commit log yet (a legacy table written by the
    non-atomic path, awaiting ``ensure_manifest`` adoption) is left
    untouched: an empty live set there means "nothing published", not
    "everything is garbage".

    ``spark`` (r10) switches the data-file phase to the CLUSTER-SIDE
    plan: live sets come from :func:`snapshot_files_df` (sidecar scanned
    by Spark), the on-disk inventory from a distributed directory walk,
    and the orphan set from an anti-join — the driver collects only the
    O(orphans) rows it must delete, never the O(live files) sets.  The
    default is :data:`AUTO` (r11): the cluster plan engages by itself on
    the active session once the store crosses
    :data:`CLUSTER_PATH_MIN_FILES` live files (the README's measured
    crossover), so a deployment that grows past the driver path's
    comfort zone doesn't silently degrade; ``spark=None`` explicitly
    forces the dependency-free driver path, fine to ~10^6 files.
    Identical reclamation semantics either way (rehearsed side-by-side
    in ``scripts/txlog_rehearsal.py``)."""
    latest = _latest_version(out_dir)
    removed: list[str] = []
    if latest == 0:
        return removed
    auto_selected = isinstance(spark, _AutoSpark)
    spark = _resolve_spark_arg(spark, out_dir)
    store = LOG_STORE
    now = time.time()

    def _old_enough(p: str) -> bool:
        if min_age_s <= 0:
            return True
        try:
            return now - store.getmtime(p) >= min_age_s
        except OSError:
            return False  # vanished concurrently — another vacuum got it
    retained = set(range(max(1, latest - keep_versions), latest + 1))
    # retention leases: every PINNED snapshot stays fully readable no
    # matter how far past the keep_versions horizon it falls — the
    # dataset_snapshot provenance contract (pin_version)
    pins = set(pinned_versions(out_dir))
    retained.update(pins)
    staging_root = os.path.join(out_dir, "_staging")
    if store.isdir(staging_root):
        for d in store.listdir(staging_root):
            p = os.path.join(staging_root, d)
            if d.startswith("ckpt-build-v"):
                # an IN-FLIGHT cluster-side checkpoint build (target
                # version ahead of the newest commit): reclaiming it
                # mid-Spark-job fails the checkpoint commit, so — like
                # in-flight sidecars — it always gets the full grace
                # window, keyed on the NEWEST mtime in the tree (a live
                # build keeps landing part files, so its newest mtime
                # stays fresh even when the job outlives the window;
                # the top dir's own mtime can go stale mid-job).  Builds
                # for versions ≤ latest are dead (committed elsewhere or
                # lost the race) and sweep under the normal min_age_s.
                try:
                    cv = int(d[len("ckpt-build-v"):].split("-", 1)[0])
                except ValueError:
                    cv = None
                if cv is not None and cv > latest:
                    newest = 0.0
                    for root_, _dirs, files_ in store.walk(p):
                        for fn in files_:
                            try:
                                m = store.getmtime(
                                    os.path.join(root_, fn)
                                )
                            except OSError:
                                continue
                            newest = max(newest, m)
                    if not newest:
                        try:
                            newest = store.getmtime(p)
                        except OSError:
                            continue
                    if now - newest < VACUUM_GRACE_S:
                        continue
            if _old_enough(p):
                store.rmtree(p)
    # orphan checkpoint / delta-spill sidecars: a crash between the
    # sidecar rename and the commit link, or the loser of a version
    # race, leaves a ckpt-v<N>-*.parquet (or delta-v<N>-*.parquet, the
    # r12 mega-delta spill) no commit references.  The name embeds the
    # version, so the check is one JSON read per CANDIDATE — never a log
    # scan; referenced sidecars are metadata and are NEVER deleted (old
    # checkpoints AND the spilled deltas after them must stay resolvable
    # for history/time-travel reads)
    mdir = _manifest_path(out_dir)
    if store.isdir(mdir):
        for name in store.listdir(mdir):
            if name.startswith(".") and name.endswith(".tmp"):
                # a crash between staging and finalize leaves a hidden
                # .<name>.<uuid>.tmp beside the log (the failure paths
                # unlink their own stage, but a hard kill can't).  Live
                # stages exist for milliseconds, so the full grace
                # window is a safe age gate.
                p = os.path.join(mdir, name)
                try:
                    if now - store.getmtime(p) >= VACUUM_GRACE_S:
                        store.remove(p)
                        removed.append(os.path.join(_MANIFEST_DIR, name))
                except OSError:
                    pass  # vanished concurrently
                continue
            if not name.endswith(".parquet"):
                continue
            if name.startswith("ckpt-v"):
                prefix, ref_key = "ckpt-v", "ckpt"
            elif name.startswith("delta-v"):
                prefix, ref_key = "delta-v", "delta"
            else:
                continue
            try:
                cv = int(name[len(prefix) :].split("-", 1)[0])
            except ValueError:
                continue
            ref = None
            if store.exists(os.path.join(mdir, _commit_name(cv))):
                ref = _load_commit(out_dir, cv).get(ref_key)
            p = os.path.join(mdir, name)
            if cv > latest:
                # a sidecar AHEAD of the newest commit is most likely an
                # in-flight writer's (renamed, commit link not yet created)
                # — unlike a staged DATA file, deleting it mid-window breaks
                # every snapshot resolve at/after that checkpoint until the
                # next one lands, so these always get the full grace window
                # even under an explicit min_age_s=0 vacuum
                try:
                    if time.time() - store.getmtime(p) < VACUUM_GRACE_S:
                        continue
                except OSError:
                    continue
            if name != ref and _old_enough(p):
                if store.isdir(p):  # multi-part sidecar (r11)
                    store.rmtree(p)
                else:
                    store.remove(p)
                removed.append(os.path.join(_MANIFEST_DIR, name))
    if not store.isdir(out_dir):
        return removed
    # re-read the pin set as LATE as possible (cheap post-r9: checkpoint
    # fold) and union in any lease that committed while the sweeps above
    # ran — narrows the pin/vacuum window to the gap between this read
    # and the deletes; pin_version's post-commit re-verify turns whatever
    # slips through into a loud failure
    late = set(pinned_versions(out_dir)) - retained
    pins |= late
    retained |= late
    if spark is not None and not _executor_visible(
        spark, os.path.abspath(_manifest_path(out_dir))
    ):
        # executors can't even see the commit log: the sidecar scan
        # inside the cluster sweep would die with an opaque executor
        # FileNotFoundException.  Same polarity as the walk cross-check:
        # AUTO degrades to the driver sweep with a warning, explicit
        # spark= surfaces the broken storage contract loudly.
        if not auto_selected:
            raise StorageVisibilityError(
                f"vacuum(spark=...): executors cannot see the commit log "
                f"under {out_dir!r} — the store is not on shared storage; "
                "use the driver path (spark=None) or run against shared "
                "storage"
            )
        _warn_executor_blind("vacuum", out_dir)
        spark = None
    if spark is not None:
        try:
            removed.extend(
                _vacuum_data_spark(
                    spark, out_dir, sorted(retained), pins, now, min_age_s
                )
            )
            return sorted(removed)
        except StorageVisibilityError:
            # the caller EXPLICITLY asked for the cluster plan: surface
            # the broken storage contract loudly.  When AUTO picked the
            # session on its own (the store merely crossed the size
            # threshold), degrade to the driver sweep with a warning —
            # a previously-working default must not become a hard error
            if not auto_selected:
                raise
            _warn_executor_blind("vacuum", out_dir)
    live: dict[str, set] = {}
    pin_files: dict[int, dict[str, set]] = {}
    for v in sorted(retained):
        snap_fs = {t: set(fs) for t, fs in _snapshot_files(out_dir, v).items()}
        if v in pins:
            pin_files[v] = snap_fs
        for t, fs in snap_fs.items():
            live.setdefault(t, set()).update(fs)
    # candidate tables: top-level <table>.parquet dirs PLUS every name the
    # retained snapshots reference — manifest table names may be nested
    # ("dedup_index/minhash_bands", the curation sink's unified commit),
    # which a flat listdir would never visit, leaving compacted-away index
    # files unreclaimable forever
    candidates = {
        entry[: -len(".parquet")]
        for entry in store.listdir(out_dir)
        if entry.endswith(".parquet")
    }
    candidates |= set(live)
    seen: dict[str, set] = {}
    for table in sorted(candidates):
        entry = f"{table}.parquet"
        keep = live.get(table, set())
        tdir = os.path.join(out_dir, entry)
        if not store.isdir(tdir):
            continue
        t_seen = seen.setdefault(table, set())
        for root, _dirs, files in store.walk(tdir):
            for fname in files:
                if fname.startswith(("_", ".")):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, tdir)
                t_seen.add(rel)
                if rel not in keep and _old_enough(full):
                    try:
                        store.remove(full)
                    except OSError:
                        continue  # vanished concurrently
                    removed.append(os.path.join(entry, rel))
    # HOLLOW-LEASE detection (r9 advice): pin_version's loud-failure
    # guarantee needs the pinning process to survive to its post-commit
    # re-verify — a crash in that window (or a lost unpin race in its
    # cleanup) leaves a lease whose data files are already reclaimed, and
    # nothing would ever notice.  The sweep above just enumerated every
    # on-disk file, so the probe is free set algebra: any pinned snapshot
    # referencing a file the walk never saw is no longer re-readable.
    # Warn rather than auto-release: vacuum is a reader of the pin
    # registry, and silently unpinning would erase the provenance evidence
    # the operator needs to investigate the loss.
    for v in sorted(pin_files):
        for t, fs in pin_files[v].items():
            gone = fs - seen.get(t, set())
            if gone:
                _warn_hollow(out_dir, v, t, sorted(gone)[0], len(gone) - 1)
                break
    return sorted(removed)


def _live_table_names(out_dir: str, version: int) -> set[str]:
    """The table NAMES a snapshot references — O(#tables + deltas)
    metadata, never a file-list scan: delta commits carry names as their
    add/remove keys, r10 checkpoints carry ``table_names`` in the commit
    JSON, and older checkpoints fall back to a columnar unique() over the
    sidecar's dictionary-encoded table column (pre-r9 inline forms just
    read their keys)."""
    names: set[str] = set()
    v = version
    while True:
        commit = _load_commit(out_dir, v)
        if "table_names" in commit:
            names.update(commit["table_names"])
            return names
        if "ckpt" in commit:
            arr = LOG_STORE.read_parquet(
                os.path.join(_manifest_path(out_dir), commit["ckpt"]),
                columns=["table"],
            )
            names.update(arr.column("table").unique().to_pylist())
            return names
        if "tables" in commit:
            names.update(commit["tables"])
            return names
        names.update(commit.get("add", {}))
        names.update(commit.get("remove", {}))
        # spilled mega-deltas (r12) carry their names as count keys
        names.update(commit.get("n_add_by_table", {}))
        names.update(commit.get("n_remove_by_table", {}))
        v = commit.get("parent", v - 1)
        if v < 1:
            raise RuntimeError(
                f"commit chain for version {version} in {out_dir} has no "
                "checkpoint ancestor — log is corrupt"
            )


def _warn_hollow(
    out_dir: str, version: int, table: str, rel: str, n_more: int
) -> None:
    import warnings

    more = f" (and {n_more} more)" if n_more > 0 else ""
    warnings.warn(
        f"vacuum: pinned version {version} in {out_dir!r} is HOLLOW —"
        f" {table}/{rel}{more} no longer exist on disk; the lease"
        " promises a snapshot that cannot be re-read.  Investigate, then"
        f" release it with unpin_version(out_dir, {version}).",
        RuntimeWarning,
        stacklevel=3,
    )


def _first_data_file(tdir: str, before: float | None = None) -> str | None:
    """The first non-hidden data file the DRIVER can see under a table
    directory — an early-exit walk touching O(few) entries, used only as
    the storage-visibility probe of :func:`_vacuum_data_spark`.
    ``before`` skips files created after the distributed walk began: a
    concurrent writer staging a dead table's first new file mid-sweep is
    not evidence the walk was blind (it ran before the file existed)."""
    store = LOG_STORE
    if not store.isdir(tdir):
        return None
    for root, _dirs, files in store.walk(tdir):
        for fname in files:
            if fname.startswith(("_", ".")):
                continue
            full = os.path.join(root, fname)
            if before is not None:
                try:
                    if store.getmtime(full) >= before:
                        continue
                except OSError:
                    continue  # vanished concurrently
            return os.path.relpath(full, tdir)
    return None


def _orphans_df(disk: DataFrame, live: DataFrame) -> DataFrame:
    """On-disk files referenced by no retained snapshot.  The anti-join
    is HINTED to sort-merge: the planner's static estimate sees the live
    side as a ~10MB compressed sidecar and elects to BROADCAST it — a
    hashed relation of every live file name on the JVM driver, the exact
    O(live files) driver state this path exists to avoid (and measured
    slower than SMJ at 1M files even locally: 3.6 s vs 1.9 s).  SMJ
    shuffles both sides on the key — the plan that still works at 10^8
    files.  Plan-guarded by ``tests/test_txlog_spark.py``."""
    return disk.join(live.hint("merge"), ["table", "file"], "left_anti")


def _vacuum_data_spark(
    spark: SparkSession,
    out_dir: str,
    retained: list[int],
    pins: set[int],
    now: float,
    min_age_s: float,
) -> list[str]:
    """The data-file phase of :func:`vacuum`, planned cluster-side: live
    sets are DataFrames resolved from the checkpoint sidecar
    (:func:`snapshot_files_df`), the on-disk inventory is a distributed
    walk (:func:`_disk_files_df`), and orphans fall out of one anti-join
    — the driver only ever collects the O(orphans) rows it deletes plus
    an O(1) hollow-lease probe per pin.  Same reclamation semantics as
    the driver path (one sweep of both at 1M synthetic files is a
    ``scripts/txlog_rehearsal.py`` row)."""
    from pyspark.sql import functions as F

    live: DataFrame | None = None
    pin_dfs: dict[int, DataFrame] = {}
    # shared-ancestor base cache (r12): retained versions cluster within
    # CHECKPOINT_EVERY of each other and pins can be arbitrary — resolve
    # each DISTINCT checkpoint ancestor's sidecar once (persisted) and
    # fold per-version deltas onto it, instead of one sidecar scan per
    # retained/pinned version (pin-heavy stores paid K scans)
    base_cache: dict[int, DataFrame] = {}
    for v in retained:
        df = _snapshot_df(
            spark, out_dir, v, with_stats=False, base_cache=base_cache
        )
        if v in pins:
            pin_dfs[v] = df
        live = df if live is None else live.unionByName(df)
    if live is None:
        return []
    if len(retained) > 1:
        live = live.distinct()
    # candidate tables: pure metadata — retained snapshots' table NAMES
    # (O(#tables), no file-list scan) plus any top-level directory
    # holding only dead files
    candidates = {
        entry[: -len(".parquet")]
        for entry in LOG_STORE.listdir(out_dir)
        if entry.endswith(".parquet")
    }
    for v in retained:
        candidates |= _live_table_names(out_dir, v)
    # persisted: reused by the sanity probe, the orphan scan, and each
    # pin's hollow probe — one distributed walk, not three
    disk = _disk_files_df(spark, out_dir, sorted(candidates)).persist()
    removed: list[str] = []
    try:
        # sanity cross-check (r11): when out_dir is NOT visible to
        # executors (non-shared storage) the distributed walk silently
        # returns an empty inventory — the fail direction is safe (no
        # wrong deletes) but every pinned snapshot would warn HOLLOW and
        # the vacuum would no-op with no signal.  Any table whose
        # directory the DRIVER can see a data file in (one early-exit
        # walk per table, O(1) files touched) must have rows in the
        # distributed inventory (one O(#tables) aggregate over the
        # persisted walk); if the driver sees bytes the executors
        # missed, the storage contract is broken — fail loudly instead
        # of reporting "nothing to reclaim".
        disk_counts = {
            r["table"]: r["n"]
            for r in disk.groupBy("table")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for t in candidates:
            if disk_counts.get(t, 0):
                continue
            seen = _first_data_file(
                os.path.join(out_dir, f"{t}.parquet"), before=now
            )
            if seen is not None:
                # a probe hit can be a RACE, not broken storage: the
                # table dir was empty when the persisted walk ran and a
                # concurrent writer then renamed staged files in (rename
                # preserves mtimes, which may predate `now`).  Re-list
                # that ONE table executor-side before raising — on
                # shared storage the fresh listing sees the file and the
                # vacuum proceeds (the stale inventory is still safe:
                # files it never saw are simply not deletion candidates)
                if (
                    _disk_files_df(spark, out_dir, [t]).limit(1).count()
                    > 0
                ):
                    continue
                raise StorageVisibilityError(
                    f"vacuum(spark=...): the distributed walk saw NO files "
                    f"under {t}.parquet but the driver can see "
                    f"{seen} — out_dir {out_dir!r} is not visible to "
                    "executors (non-shared storage?); use the driver path "
                    "(spark=None) or run against shared storage"
                )
        orphans = _orphans_df(disk, live)
        if min_age_s > 0:
            # the concurrent-writer grace window, evaluated on the mtimes
            # the distributed walk recorded
            orphans = orphans.filter(F.col("mtime") <= float(now - min_age_s))
        for r in orphans.select("table", "file").collect():  # O(orphans)
            entry = f"{r['table']}.parquet"
            full = os.path.join(out_dir, entry, r["file"])
            try:
                LOG_STORE.remove(full)
            except OSError:
                continue  # vanished concurrently — another vacuum got it
            removed.append(os.path.join(entry, r["file"]))
        # hollow-lease probe: a pinned file the (pre-delete, persisted)
        # disk inventory never saw is already lost — same detection as
        # the driver path.  The count is exact (one distributed count,
        # O(1) collected) so the warning reports the full loss, not just
        # the first file (r11 advice); the sample row is a second tiny
        # job only on the already-broken path.
        for v in sorted(pin_dfs):
            anti = pin_dfs[v].join(disk, ["table", "file"], "left_anti")
            n_gone = anti.count()
            if n_gone:
                miss = anti.take(1)[0]
                _warn_hollow(
                    out_dir, v, miss["table"], miss["file"], n_gone - 1
                )
    finally:
        disk.unpersist()
        for b in base_cache.values():
            b.unpersist()
    return removed
