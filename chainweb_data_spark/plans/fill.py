"""Backfill/gap-fill planning — pure-Python port of the reference's planner
semantics (``haskell-src/lib/ChainwebData/Backfill.hs:19-53`` ``lookupPlan``,
genesis floors from graph history ``lib/ChainwebData/Genesis.hs:28-44``,
descending chunking ``lib/ChainwebData/Types.hs:94-111``).

Planning is driver-side (tiny data: one (chain → height) map); execution is
the cluster's job.  The unit tests mirror the reference's own backfill-plan
tests (test/Chainweb/Data/Test/Backfill.hs:36-80): windows start at genesis,
never go below genesis, and cover exactly [genesis, min-1] per chain.
"""

from __future__ import annotations

CHUNK = 120  # blockRequestSize, Types.hs:110-111


def genesis_floors(graph_history: list[tuple[int, int]]) -> dict[int, int]:
    """chain → genesis height, from (fork_height, n_chains) transitions.

    A chain added by the fork at height H has genesis H (the reference reads
    this from the node's /info graph history; e.g. Kadena chains 10-19 begin
    at the 20-chain fork height).
    """
    floors: dict[int, int] = {}
    for fork_height, n_chains in sorted(graph_history):
        for c in range(n_chains):
            floors.setdefault(c, fork_height)
    return floors


def desc_ranges(lo: int, hi: int, chunk: int = CHUNK) -> list[tuple[int, int]]:
    """[hi..lo] as descending inclusive (low, high) chunks of ≤ chunk heights
    (rangeToDescGroupsOf, Types.hs:94-99) — newest blocks first."""
    out = []
    h = hi
    while h >= lo:
        low = max(lo, h - chunk + 1)
        out.append((low, h))
        h = low - 1
    return out


def lookup_plan(
    min_heights: dict[int, int | None],
    graph_history: list[tuple[int, int]],
    chunk: int = CHUNK,
) -> list[tuple[int, int, int]]:
    """Backfill plan: (chain, low, high) ranges covering everything below
    each chain's current minimum stored height, down to its genesis.

    ``min_heights[c] is None`` (empty chain) ⇒ plan nothing — the reference
    requires at least one block per chain before backfilling
    (Backfill.hs:36-43 guards); gap-fill handles empty chains instead.
    """
    floors = genesis_floors(graph_history)
    plan: list[tuple[int, int, int]] = []
    for chain, mn in sorted(min_heights.items()):
        if mn is None:
            continue
        floor = floors.get(chain, 0)
        if mn - 1 < floor:
            continue  # already at genesis
        for low, high in desc_ranges(floor, mn - 1, chunk):
            plan.append((chain, low, high))
    return plan


def gap_ranges_to_plan(
    gaps: list[tuple[int, int, int]], chunk: int = CHUNK
) -> list[tuple[int, int, int]]:
    """Chunk detected gaps (chain, gap_start, gap_end) into fetchable ranges
    (createRanges, Gaps.hs:82-91)."""
    plan = []
    for chain, lo, hi in gaps:
        for low, high in desc_ranges(lo, hi, chunk):
            plan.append((chain, low, high))
    return plan
