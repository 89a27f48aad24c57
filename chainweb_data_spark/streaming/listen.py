"""Structured Streaming ingest — the Spark re-design of the reference's
``listen`` mode (``haskell-src/exec/Chainweb/Listen.hs:42-113``).

Reference shape: one SSE event per new block → fetch payload → pure
row-construction → one DB transaction writing all six tables with
``ON CONFLICT DO NOTHING`` (Worker.hs:50-82).  Spark shape (SURVEY §2.9):

    raw feed (file/socket/Kafka) → readStream
      → foreachBatch:
          payload_to_tables(batch)           # the SAME pure transforms
          merge_batch per table              # idempotent PK merge

Idempotence replaces the reference's ON CONFLICT DO NOTHING: each batch
left-anti-joins the target on the table's primary key before appending, so
replays (listener reconnects re-deliver blocks, Server.hs:171-182) and
orphan twins (same height, different hash — first-class rows) behave exactly
like the reference.  With Delta available the anti-join becomes
``MERGE WHEN NOT MATCHED THEN INSERT`` — same keys, same semantics; the
parquet path keeps the engine dependency-free.

Scale: the anti-join probes only the PK columns (column-pruned scan) and the
stream's natural ordering keeps batches height-clustered, so partition
pruning bounds the probe to recent height buckets once tables are
height-bucket partitioned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..ingest.transforms import payload_to_tables
from ..schemas.payload import RAW_SCHEMA

# Primary keys per table (init.sql / SURVEY §1.2) — row identity under
# orphans and replays.
TABLE_PKS: dict[str, tuple[str, ...]] = {
    "blocks": ("hash",),
    "transactions": ("block", "requestkey"),
    "events": ("block", "idx", "requestkey"),
    "transfers": ("block", "chainid", "idx", "modulehash", "requestkey"),
    "signers": ("requestkey", "idx"),
    "minerkeys": ("block", "key"),
}


def merge_batch(spark: SparkSession, df: DataFrame, path: str, pk: tuple[str, ...]) -> None:
    """Append rows of ``df`` whose PK is absent from the parquet table at
    ``path`` (ON CONFLICT DO NOTHING, Worker.hs:54-77).  Also dedups the
    batch itself on the PK (a batch can carry a replayed block)."""
    batch = df.dropDuplicates(list(pk))
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*pk)
        batch = batch.join(existing, on=list(pk), how="left_anti")
    batch.write.mode("append").parquet(path)


def listen_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
    event_min_height: int = 0,
    available_now: bool = True,
):
    """Run the listen pipeline over a raw-feed directory (each file = a
    micro-batch of {header, powHash, payload} rows — the file-source stand-in
    for the SSE stream; swap ``readStream.format`` for kafka/socket in
    production, the rest is identical).

    Returns the StreamingQuery (caller awaits / stops it).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    raw = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .json(source_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from ..schemas.payload import HEADER_SCHEMA

        # skip undecodable feed lines (the reference's FromEvent decode
        # failure drops the SSE event, Listen.hs:52-60); a parseable header
        # requires at least the block hash
        batch_df = batch_df.filter(
            F.from_json("header", HEADER_SCHEMA)["hash"].isNotNull()
        )
        tables = payload_to_tables(batch_df, event_min_height=event_min_height)
        # derive events once; transfers re-derive from it inside
        # payload_to_tables — all six writes see one consistent batch
        for name, df in tables.items():
            merge_batch(
                batch_df.sparkSession,
                df,
                os.path.join(out_dir, f"{name}.parquet"),
                TABLE_PKS[name],
            )

    writer = (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
