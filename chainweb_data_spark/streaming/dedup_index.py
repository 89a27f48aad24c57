"""Incremental MinHash dedup index — near-duplicate detection of each new
micro-batch against the FULL corpus history, with probe cost that scales
with the batch, not the history.

The batch queries (queries/pipeline.py ``minhash_verified_pairs``) dedup a
corpus against itself; a production ingestion pipeline needs the other
shape: "is this NEW document a near-dup of anything we already hold?" —
asked continuously, at 100 TB of history.  Re-running the batch job per
arrival is O(history) per batch; this module maintains three silver tables
(same merge/replay discipline as the chainweb listen sink,
streaming/listen.py) so each batch costs O(batch + hits):

- ``minhash_bands.parquet`` — (doc_id, band, bucket, key_bucket): the
  banded LSH index rows (operators/dedup.py ``banded_signatures``),
  PK (doc_id, band), partitioned by ``key_bucket`` = ``'h'`` + the
  bucket's first hex char (the letter prefix pins partition-type
  inference to string — an all-digit dir set from a small batch would
  read back as INT and crash the next probe's cast.  FORMAT NOTE: an
  index written before the prefix existed has unprefixed dirs the
  pruned probe no longer matches — migrate by reading the table,
  re-deriving key_bucket, and republishing; per-partition compaction
  keeps dir names and is NOT sufficient).  The cross-era probe BROADCASTS the batch's banded rows against
  this table — a map-side join: the index is never shuffled, only scanned
  (partition-pruned to the batch's key_buckets when the batch is narrow).
- ``shingle_sets.parquet`` — (doc_id, _sh array, key_bucket): per-doc
  distinct shingle arrays for exact-Jaccard verification, PK (doc_id),
  partitioned by doc_id bucket.  Only candidates' rows are fetched
  (broadcast semi-join on the candidate old-ids — O(hits)).
- ``bucket_counts.parquet`` — (batch_id, band, bucket, n): per-batch bucket
  occupancy deltas, PK (batch_id, band, bucket) so replays are no-ops.
  The HISTORICAL hot-bucket set (Σn > cap) is recomputed from this small
  table at probe time and excluded from the cross-era join — the same
  "drop hot buckets whole" rail the batch gate exercises, extended across
  time: a boilerplate bucket that went hot in week 1 stays dropped in
  week 40 without rescanning the index.

Semantics: ``update_dedup_index`` returns one row per flagged NEW doc —
(doc_id, dup_of, jaccard) with exact Jaccard ≥ the threshold — where
``dup_of`` is a historical doc or an earlier (lower-id) doc of the same
batch.  Flag-don't-drop (the ``contaminated_docs`` stance); the caller
decides removal.  Replaying a batch (same batch_id) re-flags the same rows
and merges nothing — idempotent end to end.

Scale notes: batch banded rows and the candidate id set broadcast (both
O(batch)); the only shuffles are batch-internal (signature groupBy, pair
dedup).  Index growth is bands rows × ~50 B per doc — ~2 TB of index per
10¹⁰ docs at the defaults, scanned map-side per probe; compact with
sources/maintenance.py like any other silver table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from .listen import merge_batch
from .publish import publish_batch, read_published

BANDS_TABLE = "minhash_bands.parquet"
SETS_TABLE = "shingle_sets.parquet"
COUNTS_TABLE = "bucket_counts.parquet"


def _id_bucket(id_col: str, n: int = 16):
    """Partition bucket for an id of ANY type: xxhash64 of the string form,
    mod ``n``.  A plain ``pmod(id, 16)`` assumed numeric ids — string ids
    (URLs, content hashes) crashed the fold under ANSI mode, and under
    non-ANSI the NULL cast made every key_bucket NULL, which emptied the
    merge probe's pruned view and broke replay idempotence (every replay
    re-appended)."""
    return F.pmod(
        F.xxhash64(F.col(id_col).cast("string")), F.lit(n)
    ).cast("string")


def _read_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    return spark.read.parquet(path) if os.path.exists(path) else None


_PKS = {
    "minhash_bands": ("doc_id", "band"),
    "shingle_sets": ("doc_id",),
    "bucket_counts": ("batch_id", "band", "bucket"),
}


class DedupIndexFormatError(RuntimeError):
    """A stored ``minhash_bands`` table predates the 'h'-prefixed
    key_bucket format.  The pruned cross-era probe filters on 'h'-prefixed
    partition values only, so pre-migration history would silently stop
    matching — every historical near-dup missed, no error.  Refusing at
    resume is the only loud option (round-6 advice)."""


def unprefixed_band_buckets(
    out_dir: str, table: str = "minhash_bands"
) -> list[str]:
    """key_bucket partition values of the LIVE bands table that lack the
    'h' prefix — one manifest read / listdir
    (``publish.live_partition_values``); no Spark job, cheap per batch."""
    from .publish import live_partition_values

    return [
        v
        for v in live_partition_values(out_dir, table)
        if not v.startswith("h")
    ]


def check_bands_format(out_dir: str, table: str = "minhash_bands") -> None:
    bad = unprefixed_band_buckets(out_dir, table)
    if bad:
        prefix = table[: -len("minhash_bands")]
        fix = (
            f"migrate_dedup_index(spark, {out_dir!r}"
            + (f", table_prefix={prefix!r})" if prefix else ")")
        )
        raise DedupIndexFormatError(
            f"{table} at {out_dir!r} has pre-migration key_bucket "
            f"partitions {bad}: the pruned cross-era probe matches only "
            "'h'-prefixed values, so this history would be silently "
            "skipped (missed near-dups). Run "
            f"chainweb_data_spark.streaming.dedup_index.{fix} once to "
            "re-derive key_bucket and republish, then resume the sink."
        )


def migrate_dedup_index(
    spark: SparkSession,
    out_dir: str,
    atomic: bool = True,
    table_prefix: str = "",
) -> int:
    """One-shot format migration: re-derive ``key_bucket`` ('h' + first
    hex char of bucket) over the whole bands table and republish.  On the
    txlog layout the rewrite commits as ONE log entry
    (``publish.rewrite_published`` — readers see old or migrated, never a
    mix; per-partition compaction keeps dir names and is NOT sufficient);
    the legacy layout swaps directories via the park-and-rename move
    (``maintenance.migrate_flat_to_bucketed``'s discipline).  Idempotent:
    already-prefixed rows re-derive to themselves.

    ``table_prefix`` mirrors :func:`update_dedup_index`'s: a unified
    curation store keeps the bands under ``dedup_index/minhash_bands`` in
    the PARENT log, and migrating the unprefixed name there would resolve
    an empty table, "succeed" with 0 rows, and leave the store
    unresumable (round-7 advice).  Returns the row count migrated."""
    from .publish import _manifest_path, rewrite_published

    t_bands = table_prefix + "minhash_bands"
    stored = _read_table(
        spark, out_dir, t_bands,
        atomic and os.path.isdir(_manifest_path(out_dir)),
    )
    if stored is None:
        tdir = os.path.join(out_dir, f"{t_bands}.parquet")
        stored = _read_if_exists(spark, tdir)
        if stored is None:
            return 0
    fixed = (
        stored.drop("key_bucket")
        .withColumn(
            "key_bucket", F.concat(F.lit("h"), F.substring("bucket", 1, 1))
        )
        .repartition("key_bucket")
    )
    n = fixed.count()
    if atomic and os.path.isdir(_manifest_path(out_dir)):
        rewrite_published(spark, out_dir, t_bands, fixed)
    else:
        import shutil
        import uuid

        tdir = os.path.join(out_dir, f"{t_bands}.parquet")
        tmp = f"{tdir}.migrating-{uuid.uuid4().hex}"
        fixed.write.mode("overwrite").partitionBy("key_bucket").parquet(tmp)
        park = f"{tdir}.pre-migration-{uuid.uuid4().hex}"
        os.rename(tdir, park)
        os.rename(tmp, tdir)
        shutil.rmtree(park, ignore_errors=True)
    return n


def _read_table(
    spark: SparkSession, out_dir: str, table: str, atomic: bool
) -> DataFrame | None:
    if atomic:
        return read_published(spark, out_dir, table)
    return _read_if_exists(spark, os.path.join(out_dir, f"{table}.parquet"))


def update_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.2,
    max_bucket_size: int = 50,
    atomic: bool = True,
    compact_every: int | None = None,
    table_prefix: str = "",
    defer_publish: bool = False,
):
    """Flag near-dups of ``docs`` against the index AND within the batch,
    then fold the batch into the index.  Returns the flagged rows, eagerly
    checkpointed (the probe must run before the merge appends to the
    tables its lazy plan reads).

    ``table_prefix`` / ``defer_publish`` — the UNIFIED-commit embedding
    (round-6 verdict #6): a caller holding its own transaction log (the
    curation sink) passes its ``out_dir``, a prefix like
    ``"dedup_index/"`` (same physical directories as the standalone
    layout), and ``defer_publish=True`` — the function then probes through
    the CALLER's log, stages nothing, and returns ``(flags, tables, pks,
    cleanup)`` for the caller to fold into ONE ``publish_batch`` covering
    all of its tables, then ``cleanup()`` to drop the caches the staged
    plans read; the crash window between two commits ceases to exist.
    With ``defer_publish`` the caller owns compaction too
    (``compact_every`` is ignored here).

    ``atomic`` (default) commits all three tables through ONE manifest
    flip (streaming/publish.py) — a crash mid-fold leaves the index
    exactly at the previous snapshot instead of bands-without-sets
    (sets-less candidates would silently verify against nothing).
    ``atomic=False`` falls back to per-table merge_batch appends.

    ``compact_every`` — the LONG-RUN file bound.  Per-batch growth is
    bounded (coalesce(1): ≤16 files/table/batch) but cumulative growth is
    O(batches), and probe cost is O(live files) at the parquet-open
    layer; every ``compact_every`` batches the three tables compact to
    one file per partition directory through a manifest flip
    (``publish.compact_published`` — crash-atomic, row-preserving; plain
    ``maintenance.compact_table`` on the non-atomic layout).  The
    100-batch streaming rehearsal measures probe time FLAT with this on
    and linearly degrading without."""

    t_bands = table_prefix + "minhash_bands"
    t_sets = table_prefix + "shingle_sets"
    t_counts = table_prefix + "bucket_counts"

    sets_ = dd.shingle_set_arrays(docs, id_col, text_col, k).cache()
    sig = dd.minhash_signatures_sets(sets_, id_col, num_hashes)
    banded = dd.banded_signatures(sig, id_col, num_hashes, bands).cache()

    # historical hot buckets (Σ occupancy over all PRIOR batches > cap):
    # excluded from BOTH probe sides, mirroring the batch gate's cap.
    # The current batch_id is excluded from the sum — on a replay the
    # first run's own counts are already stored, and including them would
    # make the replay see a hotter history than the original run did
    # (fewer flags ⇒ the idempotence contract breaks exactly at the cap).
    counts = _read_table(spark, out_dir, t_counts, atomic)
    if counts is not None:
        counts = counts.filter(F.col("batch_id") != batch_id)
        hot = (
            counts.groupBy("band", "bucket")
            .agg(F.sum("n").alias("_tot"))
            .filter(F.col("_tot") > max_bucket_size)
            .select("band", "bucket")
        )
        probe_banded = banded.join(
            F.broadcast(hot), ["band", "bucket"], "left_anti"
        ).cache()
    else:
        probe_banded = banded

    # cross-era candidates: stored index rows sharing a (band, bucket) with
    # the batch — batch side broadcast, index side scanned map-side only.
    # Refuse FIRST if the stored table predates the 'h'-prefixed
    # key_bucket format: the pruned probe below would silently skip all of
    # that history (one manifest/listdir check, no job)
    check_bands_format(out_dir, t_bands)
    stored = _read_table(spark, out_dir, t_bands, atomic)
    cross: DataFrame | None = None
    if stored is not None:
        keys = [
            r[0]
            for r in probe_banded.select(
                F.concat(F.lit("h"), F.substring("bucket", 1, 1)).alias("kb")
            )
            .distinct()
            .collect()
        ]
        pruned = stored.filter(F.col("key_bucket").isin(keys))
        new_side = probe_banded.select(
            F.col(id_col).alias("_new_id"), "band", "bucket"
        )
        # exclude old-ids that are IN this batch: on a replay the batch's
        # own rows are already stored, and without this the cross probe
        # would emit the internal pairs AGAIN in the opposite orientation —
        # replays must re-flag exactly the first run's rows
        batch_ids = docs.select(F.col(id_col)).distinct()
        cross = (
            pruned.join(F.broadcast(new_side), ["band", "bucket"])
            .filter(F.col(id_col) != F.col("_new_id"))
            .join(F.broadcast(batch_ids), id_col, "left_anti")
            .select(
                F.col("_new_id").alias("id_new"),
                F.col(id_col).alias("id_old"),
            )
            .distinct()
        )

    # batch-internal candidates (standard capped self-join) — dup_of is the
    # batch's earlier (min-id) doc; reuse the cached banded rows computed
    # above rather than re-running the signature/banding shuffle
    internal = dd.lsh_candidate_pairs(
        sig, id_col, num_hashes, bands,
        max_bucket_size=max_bucket_size, banded=banded,
    ).select(F.col("id_b").alias("id_new"), F.col("id_a").alias("id_old"))

    cand = internal if cross is None else internal.unionByName(cross).distinct()

    # verification sets: batch sets ∪ the candidates' historical sets
    # (fetched by broadcast semi-join on the old-id set — O(hits))
    verify_sets = sets_
    if cross is not None:
        old_ids = cand.select(F.col("id_old").alias(id_col)).distinct()
        stored_sets = _read_table(spark, out_dir, t_sets, atomic)
        if stored_sets is not None:
            fetched = stored_sets.join(F.broadcast(old_ids), id_col, "left_semi")
            verify_sets = (
                sets_.unionByName(fetched.select(id_col, "_sh"))
                .dropDuplicates([id_col])
                .cache()
            )

    flagged = (
        dd.jaccard_for_pairs_sets(
            verify_sets,
            cand.select(
                F.col("id_new").alias("id_a"), F.col("id_old").alias("id_b")
            ),
            id_col,
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("dup_of"),
            "jaccard",
        )
    )
    # materialize BEFORE merging — the merge appends to the tables the
    # probe's lazy plan reads; eager localCheckpoint freezes the result on
    # executors (no driver collect, flags can be any size)
    result = flagged.localCheckpoint(eager=True)

    # fold the batch in (idempotent PK merges; replays are no-ops).
    # coalesce(1): a micro-batch is small, but letting every shuffle task
    # write its own part file per bucket dir multiplies the table's FILE
    # count by the task count — and probe cost is O(index files) at the
    # parquet-open layer, which the 10× streaming rehearsal measured as
    # the dominant growth term.  coalesce(1) bounds growth at one file per
    # partition directory touched per table per batch (at most 16 for the
    # two bucketed tables, 1 for bucket_counts -- the bound the pinning
    # test asserts); periodic sources/maintenance.py compaction remains
    # the long-run bound.
    to_merge = {
        # 'h' prefix: a small batch can touch only DIGIT hex dirs, which
        # partition-type inference reads back as INT — the next batch's
        # letter bucket then fails the implicit cast in the pruned probe
        # (curation.py's content_hashes hit the identical trap); the
        # prefix pins the column to string at any batch size
        t_bands: banded.withColumn(
            "key_bucket", F.concat(F.lit("h"), F.substring("bucket", 1, 1))
        ).coalesce(1),
        t_sets: sets_.withColumn(
            "key_bucket", _id_bucket(id_col)
        ).coalesce(1),
        t_counts: banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("batch_id", F.lit(batch_id))
        .coalesce(1),
    }
    pks = {
        t_bands: _PKS["minhash_bands"],
        t_sets: _PKS["shingle_sets"],
        t_counts: _PKS["bucket_counts"],
    }
    if defer_publish:
        # the staged plans read the caches built above — leave them alive
        # (checkpointing them here would re-execute every plan eagerly, 3
        # extra blocking jobs per batch) and hand the caller a cleanup to
        # run AFTER its publish_batch has consumed them
        def _cleanup() -> None:
            sets_.unpersist()
            if probe_banded is not banded:
                probe_banded.unpersist()
            if verify_sets is not sets_:
                verify_sets.unpersist()
            banded.unpersist()

        return result, to_merge, pks, _cleanup
    if atomic:
        publish_batch(spark, to_merge, out_dir, pks=pks)
    else:
        for name, df in to_merge.items():
            merge_batch(
                spark, df, os.path.join(out_dir, f"{name}.parquet"), pks[name]
            )
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        if atomic:
            from .publish import compact_published

            for name in pks:
                compact_published(spark, out_dir, name)
        else:
            from ..sources.maintenance import compact_table

            for name in pks:
                compact_table(spark, os.path.join(out_dir, f"{name}.parquet"))
    sets_.unpersist()
    if probe_banded is not banded:
        probe_banded.unpersist()
    if verify_sets is not sets_:
        verify_sets.unpersist()
    banded.unpersist()
    return result


def dedup_index_sink(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    flags_dir: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = 16,
    available_now: bool = True,
    **index_kwargs,
):
    """The index as a SINK: ``writeStream.foreachBatch`` wrapper mirroring
    ``listen_stream`` (checkpoint + engine-assigned batch_id plumbing), so
    a caller points a document stream at a directory instead of
    orchestrating ``update_dedup_index`` per batch by hand.

    Exactly-once shape, same as the listen sink: the checkpoint replays an
    uncommitted batch with the SAME batch_id after a crash, and
    ``update_dedup_index`` is idempotent per (content, batch_id) — the
    replay re-flags identical rows and merges nothing.  Flagged rows
    optionally persist to ``flags_dir`` through the idempotent PK merge
    (PK = (id, dup_of); a replayed batch's flags land as no-ops), with a
    ``key_bucket`` so downstream probes prune.  Compaction runs inside the
    batch callback every ``compact_every`` batches — serialized with the
    writes, which the manifest protocol's single-writer assumption
    requires.  Returns the StreamingQuery (caller awaits / stops)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        flags = update_dedup_index(
            sp,
            batch_df,
            out_dir,
            batch_id=batch_id,
            id_col=id_col,
            text_col=text_col,
            compact_every=compact_every,
            **index_kwargs,
        )
        if flags_dir is not None:
            out = flags.withColumn("key_bucket", _id_bucket(id_col))
            merge_batch(sp, out, flags_dir, (id_col, "dup_of"))

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
