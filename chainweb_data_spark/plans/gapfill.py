"""End-to-end gap fill — the reference's ``gaps`` command
(``haskell-src/exec/Chainweb/Gaps.hs:60-195``): find missing height ranges
in the store, fetch them from the node, ingest the results.

Composition of the already-tested pieces, in the reference's order:

1. detect: the W1 lead-window operator over the store's blocks
   (``operators/gaps.py``; Gaps.hs's SQL window at 156-188);
2. plan: chunk each (chain, gap) into ≤120-height fetch ranges
   (``plans/fill.py gap_ranges_to_plan`` = createRanges, Gaps.hs:82-91);
3. fetch: the retrying executor (``ingest/fetch.py run_fetch_plan`` =
   blocksBetween + handleRequest retry taxonomy);
4. ingest: the same pure transforms + idempotent PK merge the streaming
   path uses (``payload_to_tables`` → ``merge_batch``) — a re-fetched
   boundary block is a no-op, exactly the reference's ON CONFLICT.

Scale: detection is one window over the blocks table's (chainid, height)
projection (column-pruned scan); fetching parallelism is the executor
thread pool; ingestion is the normal bucket-partitioned merge whose probe
prunes to the fetched ranges' buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..ingest.fetch import FetchPolicy, FetchReport, Transport, raw_df_from_report, run_fetch_plan
from ..ingest.transforms import payload_to_tables
from ..operators.gaps import detect_gaps
from ..streaming.listen import TABLE_PKS, merge_batch
from .fill import gap_ranges_to_plan


def find_gap_plan(
    spark: SparkSession, store_dir: str, chunk: int = 120
) -> list[tuple[int, int, int]]:
    """(chain, low, high) fetch ranges for every missing height range
    between the store's per-chain min and max heights."""
    blocks = spark.read.parquet(os.path.join(store_dir, "blocks.parquet"))
    gaps = [
        (r["chainid"], r["gap_start"], r["gap_end"])
        for r in detect_gaps(blocks.select("chainid", "height"), "chainid", "height")
        .select("chainid", "gap_start", "gap_end")
        .collect()
    ]
    return gap_ranges_to_plan(gaps, chunk)


def fill_gaps(
    spark: SparkSession,
    store_dir: str,
    transport: Transport,
    policy: FetchPolicy | None = None,
    event_min_height: int = 0,
    chunk: int = 120,
) -> FetchReport:
    """Detect, fetch, and merge-ingest every interior gap in the store.
    Returns the fetch report (failed ranges stay missing and will be found
    again by the next run — the reference's behavior on fetch errors,
    Gaps.hs:112-127)."""
    plan = find_gap_plan(spark, store_dir, chunk)
    report = run_fetch_plan(transport, plan, policy)
    if report.rows:
        tables = payload_to_tables(
            raw_df_from_report(spark, report), event_min_height=event_min_height
        )
        for name, df in tables.items():
            merge_batch(
                spark, df, os.path.join(store_dir, f"{name}.parquet"), TABLE_PKS[name]
            )
    return report
