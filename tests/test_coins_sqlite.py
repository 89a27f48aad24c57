"""Coins interpolation (A8) and the SQLite richlist source (S7/J6/F9)."""

import json
import os
import sqlite3

import pytest

from chainweb_data_spark.operators.coins import (
    ALLOCATION_SCHEDULE,
    REWARD_SCHEDULE,
    circulating_at,
    mined_at,
    unlocked_at,
    with_circulating,
)
from chainweb_data_spark.sources.sqlite import richlist_from_sqlite


# --- coins: scalar semantics (the reference's pure function) ----------------


def test_mined_interpolates_linearly():
    (h0, c0), (h1, c1) = REWARD_SCHEDULE[2], REWARD_SCHEDULE[3]
    mid = (h0 + h1) // 2
    expected = c0 + (c1 - c0) * (mid - h0) / (h1 - h0)
    assert mined_at(mid) == expected
    # breakpoints are exact
    for h, c in REWARD_SCHEDULE[:-1]:
        assert mined_at(h) == c


def test_mined_clamps():
    assert mined_at(-5) == REWARD_SCHEDULE[0][1]
    assert mined_at(10**9) == REWARD_SCHEDULE[-1][1]


def test_unlocked_steps():
    t0, c0 = ALLOCATION_SCHEDULE[0]
    assert unlocked_at(t0 - 1) == 0.0
    assert unlocked_at(t0) == c0
    t1, c1 = ALLOCATION_SCHEDULE[1]
    assert unlocked_at(t1 - 1) == c0
    assert unlocked_at(t1 + 1) == c1


def test_distributed_matches_scalar(spark):
    rows = [(h, ALLOCATION_SCHEDULE[0][0] + h * 1_000_000) for h in
            [0, 25, 50, 99, 123, 250, 999, 5000, 2_000_000]]
    df = spark.createDataFrame(rows, "height long, ts_us long")
    got = {r["height"]: r for r in with_circulating(df, "height", "ts_us").collect()}
    for h, ts in rows:
        assert got[h]["circulating"] == pytest.approx(circulating_at(h, ts), abs=0, rel=0), h


# --- sqlite richlist --------------------------------------------------------


def _mk_ledger(path: str, rows):
    con = sqlite3.connect(path)
    con.execute('CREATE TABLE "coin_coin-table" (rowkey TEXT, txid INT, rowdata TEXT)')
    con.executemany('INSERT INTO "coin_coin-table" VALUES (?,?,?)', rows)
    con.commit()
    con.close()


def test_richlist_from_sqlite(spark, tmp_path):
    # chain 0: alice's balance updated twice — only txid=9 counts (J6);
    # every F9 shape: bare number, {"decimal": str}, {"int": num}
    p0 = str(tmp_path / "pact-v1-chain-0.sqlite")
    _mk_ledger(
        p0,
        [
            ("alice", 3, json.dumps({"balance": 100.0})),
            ("alice", 9, json.dumps({"balance": {"decimal": "42.5"}})),
            ("bob", 5, json.dumps({"balance": {"int": 7}})),
        ],
    )
    p1 = str(tmp_path / "pact-v1-chain-1.sqlite")
    _mk_ledger(
        p1,
        [
            ("alice", 2, json.dumps({"balance": "10.25"})),
            ("carol", 4, json.dumps({"balance": 1})),
        ],
    )
    out = {
        r["account"]: float(r["balance"])
        for r in richlist_from_sqlite(spark, [p0, p1]).collect()
    }
    assert out == {"alice": 52.75, "bob": 7.0, "carol": 1.0}


def test_richlist_top_n_order(spark, tmp_path):
    p = str(tmp_path / "pact-v1-chain-0.sqlite")
    _mk_ledger(
        p,
        [(f"acct{i}", 1, json.dumps({"balance": i})) for i in range(10)],
    )
    rows = richlist_from_sqlite(spark, [p], top_n=3).collect()
    assert [r["account"] for r in rows] == ["acct9", "acct8", "acct7"]


def test_richlist_csv_sink(spark, tmp_path):
    # S9 (RichList.hs:95-103): headerless account,balance CSV
    p = str(tmp_path / "pact-v1-chain-0.sqlite")
    _mk_ledger(
        p,
        [(f"acct{i}", 1, json.dumps({"balance": i})) for i in range(5)],
    )
    out = str(tmp_path / "richlist.csv")
    richlist_from_sqlite(spark, [p], top_n=2, out_csv=out)
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].split(",")[0] == "acct4"
