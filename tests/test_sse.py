"""SSE transport decode (S1, Listen.hs:52-60 + Types.hs:45-50): wire
framing, PowHeader decode tolerance, and the header→payload join that
assembles the raw rows listen_stream consumes — end-to-end against the
fixture generator, no network."""

import json

import pytest

from chainweb_data_spark.fixtures.generate import generate_raw_rows
from chainweb_data_spark.ingest.transforms import payload_to_tables
from chainweb_data_spark.schemas.payload import RAW_SCHEMA
from chainweb_data_spark.streaming.sse import (
    decode_pow_header,
    parse_sse_lines,
    sse_events_to_raw_rows,
)


def test_sse_framing():
    lines = [
        ": keep-alive comment",
        "event: BlockHeader",
        "data: {\"a\":",
        "data: 1}",
        "id: 7",
        "",
        "data: bare message",
        "",
        "retry: 1000",  # unknown-but-valid field, ignored
        "event: Other",
        "data: x",
        "",
        "event: BlockHeader",
        "data: never dispatched (no blank line)",
    ]
    evs = list(parse_sse_lines(lines))
    assert evs == [
        {"event": "BlockHeader", "data": '{"a":\n1}', "id": "7"},
        {"event": "message", "data": "bare message", "id": "7"},
        {"event": "Other", "data": "x", "id": "7"},
    ]


def test_sse_crlf_and_space_handling():
    evs = list(parse_sse_lines(["event:E\r\n", "data:  two spaces\r\n", "\r\n"]))
    # exactly one optional space after the colon is stripped, per spec
    assert evs == [{"event": "E", "data": " two spaces", "id": None}]


def test_pow_header_decode_tolerance():
    assert decode_pow_header("not json") is None
    assert decode_pow_header("[]") is None
    assert decode_pow_header('{"header": {}}') is None  # powHash missing
    assert decode_pow_header('{"header": 3, "powHash": "x"}') is None
    got = decode_pow_header('{"header": {"h": 1}, "powHash": "pw"}')
    assert got == ('{"h":1}', "pw")


@pytest.fixture(scope="module")
def raw_rows():
    return generate_raw_rows(n_chains=2, max_height=40, seed=31)


@pytest.mark.heavy
def test_sse_stream_to_tables_end_to_end(spark, raw_rows):
    """Synthesize the node's header/updates stream from fixture blocks, feed
    it through framing + PowHeader decode + payload fetch, and check the
    assembled raw rows drive payload_to_tables identically to direct
    ingest."""
    payloads = {}
    lines = ["retry: 5000", ""]
    for r in raw_rows:
        h = json.loads(r["header"])
        payloads[(h["chainId"], h["payloadHash"])] = json.loads(r["payload"])
        lines += [
            "event: BlockHeader",
            "data: " + json.dumps({"header": h, "powHash": r["powHash"]}),
            "",
        ]
    # one undecodable event between real events (FromEvent failure → dropped)
    lines[2:2] = ["event: BlockHeader", "data: {broken", ""]

    rows, dropped = sse_events_to_raw_rows(
        lines, lambda cid, ph: payloads.get((cid, ph))
    )
    assert dropped == 1
    assert len(rows) == len(raw_rows)

    got = payload_to_tables(spark.createDataFrame(rows, RAW_SCHEMA))
    direct = payload_to_tables(
        spark.createDataFrame(
            [(r["header"], r["powHash"], r["payload"]) for r in raw_rows], RAW_SCHEMA
        )
    )
    for name in got:
        assert got[name].count() == direct[name].count(), name
        assert got[name].exceptAll(direct[name]).isEmpty(), name


def test_failed_payload_fetch_drops_block(raw_rows):
    r = raw_rows[0]
    h = json.loads(r["header"])
    lines = [
        "event: BlockHeader",
        "data: " + json.dumps({"header": h, "powHash": r["powHash"]}),
        "",
    ]
    rows, dropped = sse_events_to_raw_rows(lines, lambda cid, ph: None)
    assert rows == [] and dropped == 1  # Listen.hs:67-69 log-and-skip
