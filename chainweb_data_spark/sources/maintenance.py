"""Table maintenance: compaction + layout migration for the streaming sink.

The always-on listen path appends one small file set per micro-batch per
partition (the reference's Postgres pays the analogous cost as index bloat
and solves it with autovacuum).  At scale that is the classic small-files
problem: a reader pays per-file open/footer costs, and the merge probe's
pruning still touches every file in the probed buckets.  ``compact_table``
is the autovacuum analog: rewrite each partition's many small files into
few sorted files, atomically per partition (write to a temp dir, swap via
rename), preserving rows exactly.

``migrate_flat_to_bucketed`` upgrades a table written flat by an older
merge_batch into the partitioned layout (merge_batch refuses to mix the
two layouts in one directory — see ``_existing_layout_is_flat``).

Both operate on one table directory at a time, driver-orchestrated but
cluster-executed (the rewrite is a Spark job per partition set); on a
1000-executor cluster the per-partition rewrites are independent jobs you
can run concurrently or bucket-by-bucket behind the ingest's watermark.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

from .layout import HEIGHT_BUCKET_SIZE  # noqa: F401  (re-export convenience)


def _partition_dirs(path: str) -> list[str]:
    return sorted(
        d
        for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    )


def _data_files(d: str) -> list[str]:
    return [
        f
        for f in os.listdir(d)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(d, f))
    ]


def compact_table(
    spark: SparkSession,
    path: str,
    sort_cols: list[tuple[str, bool]] | None = None,
    min_files: int = 2,
    target_files: int = 1,
) -> dict[str, tuple[int, int]]:
    """Compact every partition directory holding more than ``min_files``
    data files down to ``target_files`` sorted files.

    Per-partition atomicity: the rewrite lands in a sibling temp dir, then
    the old files are removed and the new ones renamed in — a reader sees
    the old files or the new ones; because content is identical row-for-row
    this is safe even mid-swap for readers that tolerate at-least-once
    (the same guarantee the merge probe itself relies on).  Returns
    {partition: (files_before, files_after)}.
    """
    from pyspark.sql import functions as F

    done: dict[str, tuple[int, int]] = {}
    for part in _partition_dirs(path):
        pdir = os.path.join(path, part)
        files = _data_files(pdir)
        if len(files) <= max(min_files, target_files):
            continue
        df = spark.read.parquet(pdir)
        if sort_cols:
            df = df.sort(
                *[
                    F.col(c).desc() if desc else F.col(c).asc()
                    for c, desc in sort_cols
                ]
            )
        tmp = os.path.join(path, f".compact-{uuid.uuid4().hex}")
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
        new_files = _data_files(tmp)
        for f in files:
            os.remove(os.path.join(pdir, f))
        for f in new_files:
            os.rename(os.path.join(tmp, f), os.path.join(pdir, f))
        shutil.rmtree(tmp, ignore_errors=True)
        done[part] = (len(files), len(new_files))
    return done


def migrate_flat_to_bucketed(
    spark: SparkSession,
    path: str,
    bucket_col: str,
    sort_cols: list[tuple[str, bool]] | None = None,
) -> str:
    """Rewrite a flat table directory into the partition layout merge_batch
    and the probe pruning expect.  The rewrite goes to a sibling temp dir
    and swaps in via two renames (old table parked, new table moved in,
    park removed) — the table is never half-migrated at its path.  Returns
    the path.  ``bucket_col`` must already exist as a column (the
    transforms compute height_bucket/key_bucket)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if bucket_col not in df.columns:
        raise ValueError(f"{bucket_col!r} not in table columns {df.columns}")
    tmp = f"{path}.migrating-{uuid.uuid4().hex}"
    out = df.repartition(bucket_col)
    if sort_cols:
        out = out.sortWithinPartitions(
            F.col(bucket_col).asc(),
            *[F.col(c).desc() if desc else F.col(c).asc() for c, desc in sort_cols],
        )
    out.write.mode("overwrite").partitionBy(bucket_col).parquet(tmp)
    park = f"{path}.pre-migration-{uuid.uuid4().hex}"
    os.rename(path, park)
    os.rename(tmp, path)
    shutil.rmtree(park, ignore_errors=True)
    return path


def zorder_expr(col_ranges: dict[str, tuple[int, int]], bits: int = 16):
    """Morton/Z-order key from N numeric columns: each value rank-scales to
    ``bits`` bits inside its [lo, hi] range, then the bits interleave
    round-robin — points close in EVERY dimension get close keys, so
    range-sorting files on the key gives every file a narrow min/max box in
    ALL dimensions at once.

    That is exactly what makes it compose with the transaction log's
    footer-stats file skipping (streaming/publish.py): a lexicographic
    (chain, height) sort prunes height-only predicates not at all (every
    file spans the full height range of some chain), while the Z-layout
    prunes them as well as chain-only ones — the Delta OPTIMIZE ZORDER
    rationale, built from plain shift/OR expressions (pure codegen, no
    UDF).  NULLs scale to 0.  ``bits × len(cols)`` must fit a long."""
    from pyspark.sql import functions as F

    k = len(col_ranges)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, (c, (lo, hi)) in enumerate(col_ranges.items()):
        if lo is None or hi is None:
            raise ValueError(
                f"zorder_expr: column {c!r} has NULL bounds ({lo}, {hi}) — "
                "an all-NULL column cannot rank-scale; drop it from the "
                "Z dimensions"
            )
        span = max(int(hi) - int(lo), 1)
        # rank-scale in DOUBLE: the int64 form ((v - lo) * top) overflows
        # once the column span exceeds ~2^63/top (≈1.4e14 — a mere 4.5
        # years of microsecond timestamps) and wraps negative, which the
        # clamp then collapses to Z-coordinate 0 — silently destroying the
        # clustering for that dimension.  The double ratio is monotone and
        # exact to far beyond the 16-bit quantization this feeds.
        v = (
            (F.coalesce(F.col(c), F.lit(lo)).cast("double") - F.lit(float(lo)))
            / F.lit(float(span))
            * F.lit(float(top))
        ).cast("long")
        v = F.least(F.greatest(v, F.lit(0)), F.lit(top))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return z


def rewrite_zordered(
    spark: SparkSession,
    out_dir: str,
    table: str,
    cols: list[str],
    target_files: int = 16,
    bits: int = 16,
    keep_versions: int | None = None,
) -> dict:
    """OPTIMIZE ZORDER for a log-published table: read the live snapshot,
    range-partition + sort by the Z-key of ``cols``, and swap the layout in
    as ONE transaction-log commit (readers see the old layout or the new
    one, rows preserved exactly; replaced files are vacuumed).  The commit
    records fresh per-file footer stats, so ``read_published(where=...)``
    prunes on every Z-dimension immediately after.

    Driver work is one min/max aggregate; the rewrite is a single
    repartitionByRange job — on a real cluster, run it per partition-bucket
    behind the ingest watermark like ``compact_table``.

    The rewritten layout is FLAT: a partition-directory column
    (height_bucket/key_bucket) survives as a DATA column (the read
    materializes it), but subsequent partition-DIRECTORY pruning no longer
    applies — file skipping via the refreshed footer stats replaces it.
    Z-order read-optimized ANALYTIC tables; the ingest merge path keeps
    its bucketed layout (merge_batch refuses mixed layouts by design).

    All-NULL Z columns are DROPPED from the key (a NULL-bounded dimension
    cannot rank-scale and would poison the whole key; the dropped names
    come back under ``"skipped_cols"``); if every requested column is
    all-NULL the rewrite is skipped.  ``keep_versions`` is the post-commit
    vacuum retention horizon (default :data:`publish.MAINT_KEEP_VERSIONS`
    — never 0, which would break pinned readers and time travel).  On a
    version race with a concurrent writer the swap REBASES when the fresh
    snapshot still lists exactly the input files for this table (only
    other tables changed), else ABANDONS — the rewrite no longer describes
    the live table (a racing publish added or dropped files); the staged
    z-files are uncommitted orphans and the vacuum reclaims them.  Same
    rebase-or-abandon stance as :func:`publish.compact_published`."""
    from pyspark.sql import functions as F

    from ..streaming import publish as pub

    if keep_versions is None:
        keep_versions = pub.MAINT_KEEP_VERSIONS
    latest = pub._latest_version(out_dir)
    if latest == 0:
        return {}
    files, _ = pub._table_files(out_dir, latest, table, with_stats=False)
    if not files:
        return {}
    tdir = os.path.join(out_dir, f"{table}.parquet")
    df = spark.read.option("basePath", tdir).parquet(
        *[os.path.join(tdir, f) for f in files]
    )
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    all_ranges = {c: (bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]) for c in cols}
    ranges = {
        c: r for c, r in all_ranges.items() if r[0] is not None and r[1] is not None
    }
    skipped = sorted(set(all_ranges) - set(ranges))
    if not ranges:
        return {"files": 0, "ranges": {}, "skipped_cols": skipped}
    z = zorder_expr(ranges, bits)

    staging = os.path.join(out_dir, "_staging", f"zorder-{table}-{uuid.uuid4().hex}")
    (
        df.withColumn("_z", z)
        .repartitionByRange(target_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(staging)
    )
    moved: list[str] = []
    stats: dict[str, dict] = {}
    for fname in sorted(os.listdir(staging)):
        if fname.startswith(("_", ".")):
            continue
        dest = os.path.join(tdir, fname)
        os.rename(os.path.join(staging, fname), dest)
        moved.append(fname)
        fs = pub._file_stats(dest)
        if fs:
            stats[fname] = fs
    shutil.rmtree(staging, ignore_errors=True)

    input_files = set(files)
    for rebase in (False, True):
        try:
            # delta-form swap (r11): exactly {remove: the old layout,
            # add: the z-files} — no full-snapshot hydration; a swap
            # landing on a checkpoint boundary builds the sidecar
            # cluster-side past CLUSTER_PATH_MIN_FILES
            pub._commit_delta(
                out_dir,
                latest + 1,
                add={table: sorted(moved)},
                remove={table: sorted(input_files)},
                stats_add={table: stats},
                op="zorder",
                spark=spark,
            )
            pub.vacuum(out_dir, keep_versions=keep_versions, min_age_s=pub.VACUUM_GRACE_S)
            out = {"files": len(moved), "ranges": ranges}
            if skipped:
                out["skipped_cols"] = skipped
            return out
        except pub.ConcurrentWriteError:
            if rebase:
                raise
            latest = pub._latest_version(out_dir)
            fresh, _ = pub._table_files(
                out_dir, latest, table, with_stats=False
            )
            if set(fresh) != input_files:
                # the racing commit changed THIS table — the z-layout's
                # file list would drop (or resurrect) rows; abandon and
                # reclaim the staged files
                pub.vacuum(out_dir, keep_versions=keep_versions, min_age_s=pub.VACUUM_GRACE_S)
                return {}
    raise AssertionError("unreachable")


def expire_files(
    spark: SparkSession,
    out_dir: str,
    table: str,
    col: str,
    cutoff,
    keep_versions: int | None = None,
    max_retries: int = 3,
) -> dict:
    """Metadata-only retention (TTL): drop every live file whose footer
    ``max(col)`` is strictly below ``cutoff`` — one transaction-log commit,
    ZERO data read or rewritten (the 100 TB retention job is a metadata
    operation when the layout is time-clustered; ingestion order usually
    is).  Boundary files that STRADDLE the cutoff are kept whole — readers
    wanting an exact horizon apply the row filter on top; rerunning after
    the next compaction/z-order tightens the boxes and expires more.
    Files with no recorded stats for ``col`` are never dropped.  Returns
    {"removed": n, "kept": n}.

    ``keep_versions`` is the post-commit vacuum retention horizon (default
    :data:`publish.MAINT_KEEP_VERSIONS` — expired files' BYTES survive
    that many snapshots for pinned readers and time travel; the live
    snapshot stops listing them immediately).  On a version race with a
    concurrent writer the whole decision is REBASED — re-read the fresh
    snapshot, recompute the drop set, retry (cheap: no data was staged)."""
    from ..streaming import publish as pub

    if keep_versions is None:
        keep_versions = pub.MAINT_KEEP_VERSIONS
    for attempt in range(max_retries + 1):
        latest = pub._latest_version(out_dir)
        if latest == 0:
            return {"removed": 0, "kept": 0}
        # per-table resolution (r11): files + their stats come from the
        # filtered, column-pruned sidecar read — O(this table's files),
        # never a full-snapshot hydration
        files, per_file = pub._table_files(
            out_dir, latest, table, with_stats=True
        )
        if not files:
            return {"removed": 0, "kept": 0}
        drop = set()
        for rel in files:
            rng = per_file.get(rel, {}).get(col)
            if not rng or rng[1] is None:
                continue
            try:
                if rng[1] < cutoff:
                    drop.add(rel)
            except TypeError:
                continue
        if not drop:
            return {"removed": 0, "kept": len(files)}
        try:
            # metadata-only delta commit: remove the expired files, add
            # nothing — O(dropped files) however large the table is
            pub._commit_delta(
                out_dir,
                latest + 1,
                add={},
                remove={table: sorted(drop)},
                stats_add={},
                op="expire",
                spark=spark,
            )
        except pub.ConcurrentWriteError:
            if attempt == max_retries:
                raise
            continue
        pub.vacuum(out_dir, keep_versions=keep_versions, min_age_s=pub.VACUUM_GRACE_S)
        return {"removed": len(drop), "kept": len(files) - len(drop)}
    raise AssertionError("unreachable")
