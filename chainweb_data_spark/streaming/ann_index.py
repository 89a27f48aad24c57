"""Incremental streaming ANN index — IVFPQ as a SINK.

``ivfpq_topk`` derives cells and codes in-plan, which is right for a
one-shot query but wrong for a living corpus: at 100 TB you encode each
vector ONCE, on arrival, and every later query batch searches the stored
index.  This module maintains that index with the listen pipeline's
merge/replay discipline (the vector analog of
``streaming/dedup_index.py``):

    ann_members table: (vec_id PK, key_bucket = 'c' + IVF cell, codes
    m ints) — the letter prefix pins partition-type inference to string
    (digit-only dirs read back as INT; the 'h'/'k' trap elsewhere)

- **Fold** (:func:`update_ann_index`): assign each arriving vector to its
  IVF cell (broadcast centroids, one Arrow pass), PQ-encode it (broadcast
  codebooks), and merge by PK through the transaction log
  (``publish_batch``) — replayed batches anti-join to nothing, a crash
  mid-fold leaves the previous snapshot.  The cell doubles as the
  ``key_bucket`` partition column, so the table is physically clustered
  by cell: probes read only the probed cells' files.
- **Search** (:func:`ann_index_search`): queries assign to probe cells,
  the index's (cell, codes) rows feed the shared cell-local ADC kernel
  (``operators/similarity.adc_topk``) — member vectors never move, only
  their m-int codes.
- **Sink** (:func:`ann_index_sink`): ``foreachBatch`` wrapper mirroring
  ``dedup_index_sink`` (checkpoint + engine batch-id), with the same
  serialized ``compact_every`` long-run file bound.

The quantizer (centroids + codebooks) is trained once on a sample and
then FROZEN — the standard production contract (FAISS's train/add split):
retraining would silently re-cell existing members, so it is an explicit
rebuild, not a streaming concern.

Reference anchor: extends the ingest discipline of
``haskell-src/exec/Chainweb/Listen.hs:99-113`` (idempotent per-arrival
fold) to the beyond-reference vector surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as sim
from .publish import compact_published, publish_batch, read_published

MEMBERS_TABLE = "ann_members"
_PKS = {MEMBERS_TABLE: ("vec_id",)}


class AnnIndexFormatError(RuntimeError):
    """A stored ``ann_members`` table predates the 'c'-prefixed key_bucket
    format.  Digit-only partition values read back as INT under partition
    type inference (the same fragility class the 'h'/'k' prefixes removed
    elsewhere), and the pruned probe / merge probe filter on 'c'-prefixed
    strings only — pre-migration members would silently stop matching and
    replays would re-append.  Refusing at resume is the loud option."""


def unprefixed_member_cells(out_dir: str) -> list[str]:
    """LIVE key_bucket partition values lacking the 'c' prefix — one
    manifest read / listdir, no Spark job."""
    from .publish import live_partition_values

    return [
        v
        for v in live_partition_values(out_dir, MEMBERS_TABLE)
        if not v.startswith("c")
    ]


def check_members_format(out_dir: str) -> None:
    bad = unprefixed_member_cells(out_dir)
    if bad:
        raise AnnIndexFormatError(
            f"ann_members at {out_dir!r} has pre-migration key_bucket "
            f"partitions {bad}: probes and merge pruning match only "
            "'c'-prefixed cell values, so this history would be silently "
            "skipped and replays would duplicate. Run "
            "chainweb_data_spark.streaming.ann_index.migrate_ann_index("
            "spark, out_dir) once to re-derive key_bucket and republish, "
            "then resume the sink."
        )


def migrate_ann_index(spark: SparkSession, out_dir: str) -> int:
    """One-shot format migration: re-derive ``key_bucket`` = 'c' + cell
    over the whole members table and republish as ONE log commit
    (``publish.rewrite_published``).  Idempotent: already-prefixed rows
    re-derive to themselves.  Returns the row count migrated."""
    from .publish import rewrite_published

    members = read_published(spark, out_dir, MEMBERS_TABLE)
    if members is None:
        return 0
    kb = F.col("key_bucket").cast("string")
    fixed = (
        members.withColumn(
            "key_bucket",
            F.when(kb.startswith("c"), kb).otherwise(F.concat(F.lit("c"), kb)),
        )
        .repartition("key_bucket")
    )
    n = fixed.count()
    rewrite_published(spark, out_dir, MEMBERS_TABLE, fixed)
    return n


def update_ann_index(
    spark: SparkSession,
    vecs: DataFrame,
    out_dir: str,
    batch_id: int,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
) -> int:
    """Fold a vector batch into the index; returns rows newly encoded
    (pre-merge — the PK anti-join drops replayed ids).  Assignment and
    encoding run FUSED in one Arrow-batched pass over the BATCH only
    (``pq_index_rows``); the existing index is touched solely by the
    merge probe, pruned to the batch's key_buckets."""
    check_members_format(out_dir)  # refuse pre-'c'-prefix history loudly
    members = (
        sim.pq_index_rows(vecs, id_col, vec_col, centroids, codebooks)
        .select(
            F.col(id_col).alias("vec_id"),
            # 'c' prefix pins partition-type inference to string: an
            # all-digit cell-id dir set from a small batch reads back as
            # INT, and the next probe's isin(string) / a later letter
            # value then breaks — the same trap the 'h'/'k' prefixes
            # closed in the curation and silver writers (round-6 advice)
            F.concat(F.lit("c"), F.col("cell").cast("string")).alias(
                "key_bucket"
            ),
            "codes",
        )
        .coalesce(1)
    )
    # eager: the count and the publish share one assignment+encode run
    members = members.localCheckpoint(eager=True)
    n = members.count()
    publish_batch(spark, {MEMBERS_TABLE: members}, out_dir, pks=_PKS)
    if compact_every and batch_id > 0 and batch_id % compact_every == 0:
        compact_published(spark, out_dir, MEMBERS_TABLE)
    return n


def ann_index_search(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    k: int = 5,
    prune_cells: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k of ``queries`` against the STORED index: (id, neighbor_id,
    adc).  The index side ships codes only, read through the transaction
    log's explicit file list with the cell as partition column; with
    ``prune_cells`` (default) the distinct probed cells are collected
    first (≤ nprobe × queries ids, bounded by n_cells) and pushed as a
    partition filter, so the index SCAN touches only the probed cells'
    files — search cost grows with the probed cells' occupancy, not with
    the index (merged snapshots hold one row per vector regardless of how
    many batches built them).  Disable for query batches that probe most
    cells anyway (the extra collect buys nothing).

    Query ids and stored ``vec_id``s must share ONE id space: the ADC
    kernel excludes self-pairs by id equality (right when the query IS the
    indexed object — the re-ranking / dedup shape), so an external query
    batch numbered from an unrelated space would silently lose any member
    whose vec_id collides with a query id.  Pass ``exclude_self=False``
    for foreign-id query batches — every member then competes, including
    id-equal ones."""
    check_members_format(out_dir)
    members = read_published(spark, out_dir, MEMBERS_TABLE)
    if members is None:
        # schema-stable empty result: SAME columns as the non-empty path
        # (adc_topk's pair schema uses the caller's id_col, not vec_id)
        return spark.createDataFrame(
            [], f"{id_col} long, neighbor_id long, adc double"
        )
    probes = (
        sim.pq_assign_cells(queries, id_col, vec_col, centroids, nprobe)
        .select(id_col, F.explode("probe_cells").alias("cell"))
        .join(
            queries.select(
                F.col(id_col),
                F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                    "_v"
                ),
            ),
            id_col,
        )
        .select("cell", id_col, "_v")
        .localCheckpoint(eager=True)  # cells are collected AND re-scanned
    )
    if prune_cells:
        cells = [
            f"c{r['cell']}" for r in probes.select("cell").distinct().collect()
        ]
        members = members.filter(F.col("key_bucket").isin(cells))
    members = members.select(
        F.expr("cast(substring(key_bucket, 2) as int)").alias("cell"),
        F.col("vec_id").alias(id_col),
        "codes",
    )
    return sim.adc_topk(
        members, probes, codebooks, id_col, k, exclude_self=exclude_self
    )


def ann_index_sink(
    vec_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = 16,
    available_now: bool = True,
):
    """The index as a sink: ``writeStream.foreachBatch`` with the listen
    pipeline's exactly-once shape — a crash-replayed batch re-encodes
    identical rows and the PK merge drops them all; compaction runs inside
    the serialized batch callback.  Returns the StreamingQuery."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        update_ann_index(
            batch_df.sparkSession,
            batch_df,
            out_dir,
            batch_id=batch_id,
            centroids=centroids,
            codebooks=codebooks,
            id_col=id_col,
            vec_col=vec_col,
            compact_every=compact_every,
        )

    writer = (
        vec_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
