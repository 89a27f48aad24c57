"""Incremental continuation-history silver table — SURVEY §2.3 J4 option
(b), the design the reference can't express and the query-time walk only
approximates: maintain, at ingest, one table of resolved defpact ancestry
rows so the continuation-history endpoint (``Queries.hs:112-137``, WITH
RECURSIVE per request) becomes an O(1) bucket-pruned lookup.

Two tables under ``<out_dir>/``:

- ``tx_lineage.parquet`` — slim (requestkey, pactid, code, key_bucket)
  projection of every tx seen, PK requestkey.  This is the walk universe:
  a later batch's continuation step may name ANY earlier tx as its parent,
  so the projection must persist (it is the same data the query-time walk
  scans, kept narrow).
- ``cont_history.parquet`` — (start_rk, depth, rk, code, key_bucket) — one
  row per (continuation tip, ancestor): depth 0 = the immediate parent,
  increasing toward the origin exec tx.  ``key_bucket`` is a pure function
  of ``start_rk`` (same convention as signers/minerkeys,
  ``ingest/transforms.py _key_bucket``), so the endpoint lookup and the
  incremental probe both prune to one bucket.

Incremental maintenance per micro-batch (``update_continuation_history``):
frontier walk over ``batch ∪ (stored lineage pruned to the frontier's
buckets)``.  The feed is causal (a continuation step can only reference an
already-mined tx), so each iteration's frontier is at most the batch's
continuation txs, and the stored-lineage probe is an IN-set of ≤ that many
key buckets — probe cost scales with the batch, not table history, the
same bound the six-table merge probes enforce (streaming/listen.py).
Chains are short (cross-chain = 2 steps, defpacts ≲ 10; Queries.hs comment)
so the loop runs a handful of bucket-pruned broadcast joins.

At 100 TB the query-time walk (queries/chainweb.py
``continuation_histories``) remains the backfill/bootstrap job; this module
is the steady-state path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest.transforms import _key_bucket, _key_bucket_expr
from .listen import merge_batch

LINEAGE = "tx_lineage.parquet"
HISTORY = "cont_history.parquet"

# the walk terminates on its own (frontier empties at each chain's origin
# exec tx); the cap only bounds a pathological/corrupt feed
MAX_DEPTH = 64


def _lineage_proj(tx: DataFrame) -> DataFrame:
    # distinct over the FULL triple, not per requestkey: a re-introduced
    # requestkey (orphan re-mine) may carry different code, and the
    # reference's recursive join fans out over every distinct row
    # (Queries.hs:126-130 dedups whole rows, not keys) — so must we.
    return tx.select(
        "requestkey", "pactid", "code", _key_bucket(F.col("requestkey"))
    ).dropDuplicates(["requestkey", "pactid", "code"])


def _pruned_lineage(
    spark: SparkSession, path: str, buckets: list[str]
) -> DataFrame | None:
    if not os.path.exists(path) or not buckets:
        return None
    return (
        spark.read.parquet(path)
        .filter(F.col("key_bucket").isin(buckets))
        .select("requestkey", "pactid", "code")
    )


def update_continuation_history(
    spark: SparkSession, tx_batch: DataFrame, out_dir: str
) -> None:
    """Fold one micro-batch of transactions into the two silver tables."""
    lineage_path = os.path.join(out_dir, LINEAGE)
    history_path = os.path.join(out_dir, HISTORY)

    batch = _lineage_proj(tx_batch).cache()
    # tips: this batch's continuation steps, walked to their origins
    frontier = (
        batch.filter(F.col("pactid").isNotNull())
        .select(F.col("requestkey").alias("start_rk"), F.col("pactid").alias("_next"))
        .cache()
    )
    # the loop rebinds `frontier` to localCheckpoint results; keep the
    # cached initial frontier so its blocks are released after the walk
    # (unpersisting only the rebound frame would leak them every batch)
    first_frontier = frontier
    acc: DataFrame | None = None
    depth = 0
    while depth < MAX_DEPTH and not frontier.isEmpty():
        # probe universe: the batch itself plus ONLY the stored-lineage
        # buckets the frontier's parent keys map to (an IN-set of at most
        # |frontier| single-char buckets — O(batch), not O(history))
        need = [
            r[0]
            for r in frontier.select(
                _key_bucket_expr(F.col("_next")).alias("b")
            )
            .distinct()
            .collect()
        ]
        universe = batch.select("requestkey", "pactid", "code")
        stored = _pruned_lineage(spark, lineage_path, need)
        if stored is not None:
            universe = universe.unionByName(stored).dropDuplicates(
                ["requestkey", "pactid", "code"]
            )
        step = (
            frontier.join(
                F.broadcast(universe.withColumnRenamed("requestkey", "_rk")),
                F.col("_next") == F.col("_rk"),
            )
            .select(
                "start_rk",
                F.lit(depth).alias("depth"),
                F.col("_rk").alias("rk"),
                F.col("code"),
                F.col("pactid").alias("_parent_pactid"),
            )
            .localCheckpoint(eager=True)
        )
        out = step.select(
            "start_rk", "depth", "rk", "code", _key_bucket(F.col("start_rk"))
        )
        acc = out if acc is None else acc.unionByName(out)
        frontier = (
            step.filter(F.col("_parent_pactid").isNotNull())
            .select("start_rk", F.col("_parent_pactid").alias("_next"))
            .localCheckpoint(eager=True)
        )
        depth += 1

    # persist: lineage first (idempotent merge on the full row identity —
    # replays are no-ops), then the new history rows under the tip-bucket
    # layout.  History identity includes (rk, code): a twin-fanned chain
    # legitimately has two rows at one depth.
    merge_batch(spark, batch, lineage_path, ("requestkey", "pactid", "code"))
    if acc is not None:
        merge_batch(spark, acc, history_path, ("start_rk", "depth", "rk", "code"))
    first_frontier.unpersist()
    if frontier is not first_frontier:
        frontier.unpersist()
    batch.unpersist()


def lookup_history(spark: SparkSession, out_dir: str, start_rk: str) -> DataFrame:
    """The endpoint read: one bucket directory, one tip filter —
    O(1 bucket), no walk."""
    return (
        spark.read.parquet(os.path.join(out_dir, HISTORY))
        .filter(
            (F.col("key_bucket") == "k" + start_rk[:1])
            & (F.col("start_rk") == start_rk)
        )
        .orderBy("depth")
        .select("start_rk", "depth", "rk", "code")
    )
