"""SSE wire-format decode for the listen source (S1) — the transport layer
of ``/chainweb/0.0/<ver>/header/updates``.

The reference consumes this stream with an SSE client and decodes each
event's data as a ``PowHeader`` — ``{header, powHash}`` JSON — dropping
events that fail to decode (``Listen.hs:52-60`` via the ``FromEvent``
instance, ``lib/ChainwebData/Types.hs:45-50``), then fetches the block's
``payloadWithOutputs`` before handing one complete raw row to the ingest
transforms (``processNewHeader``, ``Listen.hs:63-81``).

This module re-implements that framing as pure functions so the pipeline is
testable without a network: ``parse_sse_lines`` is the wire protocol
(event/data/id fields, ``:`` comments, blank-line dispatch, multi-line data
joined by newline, unterminated trailing event discarded), and
``sse_events_to_raw_rows`` is the PowHeader decode + payload-join that turns
a byte stream into the ``{header, powHash, payload}`` rows
``listen_stream`` consumes.  In production the line source is the chunked
HTTP response (with the fetch.py retry shell around reconnects); here tests
feed literal lines.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Iterator


def parse_sse_lines(lines: Iterable[str]) -> Iterator[dict]:
    """Decode Server-Sent-Events framing into {'event', 'data', 'id'} dicts.

    Spec behavior implemented: ``:`` comment lines ignored; a field line is
    ``name: value`` (one optional space after the colon); multiple ``data``
    lines accumulate joined by ``\\n``; a blank line dispatches the pending
    event iff it has any data; an unterminated trailing event is discarded
    (the reconnect re-delivers it — the at-least-once the merge absorbs)."""
    event_type, data_lines, event_id = None, [], None
    for raw in lines:
        line = raw.rstrip("\r\n")
        if line == "":
            if data_lines:
                yield {
                    "event": event_type or "message",
                    "data": "\n".join(data_lines),
                    "id": event_id,
                }
            event_type, data_lines = None, []
            continue
        if line.startswith(":"):
            continue
        name, _, value = line.partition(":")
        if value.startswith(" "):
            value = value[1:]
        if name == "event":
            event_type = value
        elif name == "data":
            data_lines.append(value)
        elif name == "id":
            event_id = value
        # unknown field names are ignored per spec


def decode_pow_header(data: str) -> tuple[str, str] | None:
    """PowHeader's FromEvent (Types.hs:45-50): the event data must be JSON
    with ``header`` (object) and ``powHash`` (string); anything else is a
    dropped event, not an error."""
    try:
        obj = json.loads(data)
        header = obj["header"]
        pow_hash = obj["powHash"]
    except (json.JSONDecodeError, TypeError, KeyError):
        return None
    if not isinstance(header, dict) or not isinstance(pow_hash, str):
        return None
    return json.dumps(header, separators=(",", ":")), pow_hash


def sse_events_to_raw_rows(
    lines: Iterable[str],
    fetch_payload: Callable[[int, str], dict | None],
    event_type: str = "BlockHeader",
) -> tuple[list[tuple[str, str, str]], int]:
    """SSE line stream → raw feed rows (header_json, pow_hash, payload_json).

    ``fetch_payload(chain_id, payload_hash)`` is the payloadWithOutputs
    lookup (Listen.hs:65-70) — inject a ``fetch.py``-backed transport in
    production, a dict in tests; returning ``None`` drops the block with the
    same couldn't-fetch log-and-skip as the reference (Listen.hs:67-69).
    Returns (rows, dropped) where dropped counts undecodable events plus
    failed payload fetches."""
    rows: list[tuple[str, str, str]] = []
    dropped = 0
    for ev in parse_sse_lines(lines):
        if ev["event"] != event_type:
            continue
        decoded = decode_pow_header(ev["data"])
        if decoded is None:
            dropped += 1
            continue
        header_json, pow_hash = decoded
        header = json.loads(header_json)
        payload = fetch_payload(header.get("chainId"), header.get("payloadHash"))
        if payload is None:
            dropped += 1
            continue
        rows.append((header_json, pow_hash, json.dumps(payload, separators=(",", ":"))))
    return rows, dropped
