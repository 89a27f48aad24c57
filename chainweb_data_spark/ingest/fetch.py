"""Block-range fetch executor — the engine shell around the backfill/gap
plans of ``plans/fill.py``.

Mirrors the reference's fetcher semantics without copying its code:

- Error taxonomy of ``handleRequest`` (``exec/Chainweb/Lookups.hs:77-96``):
  429/403 → rate-limiting, other 4xx → client error, 5xx → server error,
  non-HTTP failure → other.
- Worker loop of ``backfillBlocksCut`` (``exec/Chainweb/Backfill.hs:55-90``):
  concurrent traversal over (chain, low, high) ranges, an optional
  inter-request delay (the ``--delay`` rate limit), failed ranges logged and
  left for a later gap-fill pass.
- Per-item decode failures drop the item, not the batch
  (``blocksBetween``'s catMaybes + error log, ``Lookups.hs:118-135``).

On top of that, the retryable classes (rate-limiting / server error) get
bounded exponential backoff before the range is abandoned — the reference
reruns ``gaps`` for abandoned ranges; backoff just shrinks how much is left
for it.

The sandbox has no network, so the transport is INJECTED: any callable
``(chain, low, high) -> (status_code, body_text)``.  In production this is a
thin ``urllib``/``requests`` wrapper around
``/chainweb/0.0/<ver>/chain/<cid>/block?minheight=..&maxheight=..``; tests
use an in-process mock node.  Fetching runs driver-side in a thread pool —
the right shape for the reference-parity ingest worker (network-bound, a few
hundred ranges); a cluster-scale backfill would move the same
``fetch_range`` body into ``mapInPandas`` over a plan DataFrame so every
executor fetches its own partitions.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Sequence

Transport = Callable[[int, int, int], tuple[int, str]]

RATE_LIMITING = "rate_limiting"
CLIENT_ERROR = "client_error"
SERVER_ERROR = "server_error"
OTHER_ERROR = "other"


@dataclass(frozen=True)
class ApiError:
    error_type: str
    status: int
    body: str


def classify_status(status: int) -> str | None:
    """handleRequest's checkErr (Lookups.hs:86-95): None = success."""
    if status in (429, 403):
        return RATE_LIMITING
    if 400 <= status < 500:
        return CLIENT_ERROR
    if 500 <= status < 600:
        return SERVER_ERROR
    if 200 <= status < 300:
        return None
    return OTHER_ERROR


@dataclass
class FetchPolicy:
    """Retry/rate-limit knobs.  ``delay_seconds`` is the reference's
    ``--delay`` between requests; retries apply only to transient classes
    (a 404 range will 404 forever — the reference logs and moves on)."""

    max_retries: int = 3
    backoff_seconds: float = 0.5  # doubles per attempt
    delay_seconds: float = 0.0
    retryable: frozenset = frozenset({RATE_LIMITING, SERVER_ERROR})
    sleep: Callable[[float], None] = time.sleep  # injectable for tests


@dataclass
class FetchReport:
    rows: list  # raw-feed rows: (header_json, pow_hash, payload_json)
    failures: list[tuple[tuple[int, int, int], ApiError]] = field(
        default_factory=list
    )
    dropped_items: int = 0  # per-item decode failures (logged-and-skipped)
    attempts: int = 0


def fetch_range(
    transport: Transport,
    chain: int,
    low: int,
    high: int,
    policy: FetchPolicy,
) -> FetchReport:
    """Fetch one inclusive height range on one chain, with retry-on-transient
    and the item-level decode tolerance of blocksBetween."""
    report = FetchReport(rows=[])
    attempt = 0
    while True:
        attempt += 1
        report.attempts += 1
        try:
            status, body = transport(chain, low, high)
            err_type = classify_status(status)
        except Exception as e:  # noqa: BLE001 — network layer, OtherError
            status, body = 0, str(e)
            err_type = OTHER_ERROR
        if err_type is None:
            break
        err = ApiError(err_type, status, body[:200])
        if err_type in policy.retryable and attempt <= policy.max_retries:
            policy.sleep(policy.backoff_seconds * (2 ** (attempt - 1)))
            continue
        report.failures.append(((chain, low, high), err))
        return report

    try:
        items = json.loads(body).get("items", [])
    except (json.JSONDecodeError, AttributeError):
        report.failures.append(
            ((chain, low, high), ApiError(OTHER_ERROR, status, body[:200]))
        )
        return report
    for item in items:
        try:
            header = item["header"]
            payload = item["payloadWithOutputs"]
            row = (
                json.dumps(header, separators=(",", ":")),
                item.get("powHash", ""),
                json.dumps(payload, separators=(",", ":")),
            )
        except (KeyError, TypeError):
            report.dropped_items += 1  # catMaybes: drop the item, keep batch
            continue
        report.rows.append(row)
    return report


def run_fetch_plan(
    transport: Transport,
    plan: Sequence[tuple[int, int, int]],
    policy: FetchPolicy | None = None,
    max_workers: int = 8,
) -> FetchReport:
    """Execute a (chain, low, high) plan concurrently — Backfill.hs's
    ``traverseConcurrently_``; with a ``delay_seconds`` rate limit the
    reference drops to sequential (Seq strategy), mirrored here."""
    policy = policy or FetchPolicy()
    merged = FetchReport(rows=[])

    def one(rng: tuple[int, int, int]) -> FetchReport:
        rep = fetch_range(transport, *rng, policy)
        if policy.delay_seconds:
            policy.sleep(policy.delay_seconds)
        return rep

    if policy.delay_seconds:
        reports = [one(r) for r in plan]
    else:
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            reports = list(pool.map(one, plan))
    for rep in reports:
        merged.rows.extend(rep.rows)
        merged.failures.extend(rep.failures)
        merged.dropped_items += rep.dropped_items
        merged.attempts += rep.attempts
    return merged


def raw_df_from_report(spark, report: FetchReport):
    """Fetched rows as the raw-feed DataFrame payload_to_tables consumes."""
    from ..schemas.payload import RAW_SCHEMA

    return spark.createDataFrame(report.rows, RAW_SCHEMA)
