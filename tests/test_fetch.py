"""Fetch executor shell (ingest/fetch.py): the reference's retry taxonomy
(Lookups.hs:77-96) and backfill worker loop (Backfill.hs:55-90) against an
in-process mock node — no network in the sandbox, so the transport is a
callable fixture serving the same raw rows the fixture generator builds.

The integration contract: mock node → fetch plan → payload_to_tables
produces EXACTLY the tables a direct batch ingest of the same rows does.
"""

import json
from collections import defaultdict

import pytest

from chainweb_data_spark.fixtures.generate import generate_raw_rows
from chainweb_data_spark.ingest.fetch import (
    CLIENT_ERROR,
    OTHER_ERROR,
    RATE_LIMITING,
    SERVER_ERROR,
    FetchPolicy,
    classify_status,
    fetch_range,
    raw_df_from_report,
    run_fetch_plan,
)
from chainweb_data_spark.ingest.transforms import payload_to_tables
from chainweb_data_spark.plans.fill import desc_ranges
from chainweb_data_spark.schemas.payload import RAW_SCHEMA
from chainweb_data_spark.streaming.listen import TABLE_PKS

ACTIVATION = 60
MAX_HEIGHT = 90
N_CHAINS = 2


@pytest.fixture(scope="module")
def raw_rows():
    return generate_raw_rows(n_chains=N_CHAINS, max_height=MAX_HEIGHT, seed=23)


@pytest.fixture(scope="module")
def mock_node(raw_rows):
    """(chain, low, high) -> (200, blocksBetween-shaped JSON body)."""
    by_chain = defaultdict(list)
    for r in raw_rows:
        h = json.loads(r["header"])
        by_chain[h["chainId"]].append((h["height"], r))

    def transport(chain, low, high):
        items = [
            {
                "header": json.loads(r["header"]),
                "powHash": r["powHash"],
                "payloadWithOutputs": json.loads(r["payload"]),
            }
            for height, r in by_chain.get(chain, [])
            if low <= height <= high
        ]
        return 200, json.dumps({"items": items})

    return transport


def _plan():
    return [
        (c, lo, hi)
        for c in range(N_CHAINS)
        for lo, hi in desc_ranges(0, MAX_HEIGHT, chunk=30)
    ]


def test_classification_matches_reference():
    """handleRequest's checkErr (Lookups.hs:86-95)."""
    assert classify_status(429) == RATE_LIMITING
    assert classify_status(403) == RATE_LIMITING
    assert classify_status(404) == CLIENT_ERROR
    assert classify_status(500) == SERVER_ERROR
    assert classify_status(503) == SERVER_ERROR
    assert classify_status(200) is None
    assert classify_status(204) is None
    assert classify_status(301) == OTHER_ERROR


@pytest.mark.heavy
def test_fetch_plan_rebuilds_fixture_tables(spark, raw_rows, mock_node):
    report = run_fetch_plan(mock_node, _plan(), FetchPolicy())
    assert not report.failures and report.dropped_items == 0
    assert len(report.rows) == len(raw_rows)

    fetched = payload_to_tables(
        raw_df_from_report(spark, report), event_min_height=ACTIVATION
    )
    direct_raw = spark.createDataFrame(
        [(r["header"], r["powHash"], r["payload"]) for r in raw_rows], RAW_SCHEMA
    )
    direct = payload_to_tables(direct_raw, event_min_height=ACTIVATION)
    for name in TABLE_PKS:
        pk = list(TABLE_PKS[name])
        got, exp = fetched[name], direct[name]
        assert got.count() == exp.count(), name
        assert (
            exp.select(pk).exceptAll(got.select(pk)).isEmpty()
            and got.select(pk).exceptAll(exp.select(pk)).isEmpty()
        ), f"{name}: PK sets differ between fetched and direct ingest"


def test_transient_errors_retry_with_backoff(mock_node):
    """429 then 503 then success: the range must come back complete, with
    the exponential backoff sequence observed and no recorded failure."""
    calls = defaultdict(int)
    sleeps = []

    def flaky(chain, low, high):
        calls[(chain, low, high)] += 1
        n = calls[(chain, low, high)]
        if n == 1:
            return 429, "slow down"
        if n == 2:
            return 503, "upstream hiccup"
        return mock_node(chain, low, high)

    policy = FetchPolicy(max_retries=3, backoff_seconds=0.25, sleep=sleeps.append)
    rep = fetch_range(flaky, 0, 0, 30, policy)
    assert not rep.failures
    assert rep.attempts == 3
    assert sleeps == [0.25, 0.5]  # doubling backoff
    assert len(rep.rows) > 0


def test_transient_gives_up_after_max_retries(mock_node):
    always_503 = lambda c, lo, hi: (503, "down")  # noqa: E731
    policy = FetchPolicy(max_retries=2, sleep=lambda s: None)
    rep = fetch_range(always_503, 0, 0, 30, policy)
    assert rep.rows == []
    assert rep.attempts == 3  # initial + 2 retries
    (rng, err), = rep.failures
    assert rng == (0, 0, 30) and err.error_type == SERVER_ERROR


def test_client_error_not_retried(mock_node):
    """A 404 range will 404 forever — one attempt, logged, left for
    gap-fill (Backfill.hs logs ApiError and moves on)."""
    calls = defaultdict(int)

    def half_broken(chain, low, high):
        calls[(chain, low, high)] += 1
        if chain == 1:
            return 404, "no such chain"
        return mock_node(chain, low, high)

    rep = run_fetch_plan(half_broken, _plan(), FetchPolicy(sleep=lambda s: None))
    failed_ranges = {rng for rng, _ in rep.failures}
    assert failed_ranges == {(1, lo, hi) for lo, hi in desc_ranges(0, MAX_HEIGHT, 30)}
    assert all(err.error_type == CLIENT_ERROR for _, err in rep.failures)
    assert all(calls[rng] == 1 for rng in failed_ranges), "client errors retried"
    assert len(rep.rows) > 0  # chain 0 fetched fine


def test_rate_limit_delay_goes_sequential(mock_node):
    """delay_seconds mirrors the reference's --delay: strategy drops to
    sequential and every request is followed by the delay sleep."""
    sleeps = []
    plan = _plan()
    policy = FetchPolicy(delay_seconds=0.01, sleep=sleeps.append)
    rep = run_fetch_plan(mock_node, plan, policy)
    assert not rep.failures
    assert sleeps == [0.01] * len(plan)


def test_undecodable_item_dropped_not_fatal():
    good = {"header": {"height": 1}, "powHash": "p", "payloadWithOutputs": {}}
    body = json.dumps({"items": [good, {"header": {"h": 1}}, None, 42]})
    rep = fetch_range(lambda c, lo, hi: (200, body), 0, 0, 10, FetchPolicy())
    assert rep.dropped_items == 3  # missing payload / None / non-object
    assert len(rep.rows) == 1 and not rep.failures
