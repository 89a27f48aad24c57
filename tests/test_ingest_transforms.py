"""Unit tests for the payload→tables ingest transforms against hand-built
payload fixtures (SURVEY §5: ingest decode correctness is the reference's
own unit-test focus — Parser.hs golden values, mkTransaction semantics)."""

import base64
import json

import pytest
from pyspark.sql import functions as F

from chainweb_data_spark.ingest.transforms import (
    blocks_from_raw,
    events_from_raw,
    minerkeys_from_raw,
    payload_to_tables,
    signers_from_raw,
    transactions_from_raw,
    transfers_from_events,
)
from chainweb_data_spark.schemas.payload import RAW_SCHEMA


def b64u(doc) -> str:
    return base64.urlsafe_b64encode(
        json.dumps(doc, separators=(",", ":")).encode()
    ).decode().rstrip("=")


def le_b64(n: int) -> str:
    return base64.urlsafe_b64encode(n.to_bytes(32, "little")).decode().rstrip("=")


# the reference parser test's golden 256-bit target value (Parser.hs:23-60)
GOLDEN_TARGET = 144740111546645244279463731260859884816587480832050705049321980945238459955


def make_raw(spark, txs, coinbase_events=None, height=100, chainid=2):
    header = {
        "creationTime": 1_700_000_000_123_456,
        "chainId": chainid,
        "height": height,
        "parent": "parenthash",
        "hash": "blockhash1",
        "payloadHash": "payloadhash1",
        "target": le_b64(GOLDEN_TARGET),
        "weight": le_b64(12345 * 2**128),
        "epochStart": 1_700_000_000_000_000,
        "nonce": "18446744073709551615",
        "featureFlags": 0,
    }
    coinbase = {
        "gas": 0,
        "logs": "cblogs",
        "reqKey": "parenthash",
        "txId": 7,
        "events": coinbase_events or [],
        "metadata": None,
        "continuation": None,
        "result": {"status": "success", "data": "Write succeeded"},
    }
    payload = {
        "transactions": [[b64u(t), b64u(o)] for t, o in txs],
        "minerData": b64u(
            {"account": "miner-acct", "predicate": "keys-all", "public-keys": ["mk1", "mk2"]}
        ),
        "coinbase": b64u(coinbase),
        "payloadHash": "payloadhash1",
    }
    return spark.createDataFrame(
        [
            (
                json.dumps(header, separators=(",", ":")),
                "deadbeef",
                json.dumps(payload, separators=(",", ":")),
            )
        ],
        RAW_SCHEMA,
    )


def exec_tx(rk="rk-exec-1", code='(coin.transfer "alice" "bob" 1.5)', events=None,
            failed=False):
    cmd = {
        "networkId": "mainnet01",
        "nonce": "n1",
        "meta": {
            "creationTime": 1_700_000_000.5,
            "ttl": 28800,
            "gasLimit": 2500,
            "gasPrice": 1e-7,
            "sender": "alice",
            "chainId": "2",
        },
        "payload": {"exec": {"code": code, "data": {"k": 1}}},
        "signers": [
            {"pubKey": "pk1", "scheme": "ED25519", "addr": None,
             "clist": [{"name": "coin.GAS", "args": []}]},
            {"pubKey": "pk2", "scheme": None, "addr": None, "clist": []},
        ],
    }
    tx = {"hash": rk, "sigs": [{"sig": "sig1"}, {"sig": "sig2"}], "cmd": json.dumps(cmd)}
    out = {
        "gas": 543,
        "logs": "logshash",
        "reqKey": rk,
        "txId": 99 if not failed else None,
        "events": events or [],
        "metadata": None,
        "continuation": None,
        "result": (
            {"status": "failure", "error": {"message": "boom"}}
            if failed
            else {"status": "success", "data": {"amount": 1.5}}
        ),
    }
    return tx, out


def cont_tx(rk="rk-cont-1", pactid="rk-exec-1", step=1):
    cmd = {
        "networkId": "mainnet01",
        "nonce": "n2",
        "meta": {
            "creationTime": 1_700_000_100.0,
            "ttl": 28800,
            "gasLimit": 2500,
            "gasPrice": 1e-7,
            "sender": "bob",
            "chainId": "2",
        },
        "payload": {
            "cont": {"pactId": pactid, "rollback": False, "step": step,
                      "data": {"s": step}, "proof": "proofdata"}
        },
        "signers": [],
    }
    tx = {"hash": rk, "sigs": [], "cmd": json.dumps(cmd)}
    out = {
        "gas": 321,
        "logs": "logs2",
        "reqKey": rk,
        "txId": 100,
        "events": [],
        "metadata": None,
        "continuation": {"pactId": pactid, "step": step},
        "result": {"status": "success", "data": "cont ok"},
    }
    return tx, out


TRANSFER_EVENT = {
    "name": "TRANSFER",
    "module": {"name": "coin"},
    "moduleHash": "mh-coin",
    "params": ["alice", "bob", {"decimal": "12.5"}],
}
NS_EVENT = {
    "name": "mint",
    "module": {"namespace": "free", "name": "token-x"},
    "moduleHash": "mh-tok",
    "params": ["carol", 5],
}


def test_blocks_row(spark):
    raw = make_raw(spark, [exec_tx()])
    b = blocks_from_raw(raw).collect()[0]
    assert b.hash == "blockhash1" and b.parent == "parenthash"
    assert b.chainid == 2 and b.height == 100
    assert b.miner == "miner-acct" and b.predicate == "keys-all"
    # golden 256-bit decode (reference Parser.hs value)
    assert b.target_raw == str(GOLDEN_TARGET)
    assert b.weight_raw == str(12345 * 2**128)
    assert str(b.nonce) == "18446744073709551615"
    assert b.creationtime.isoformat().startswith("2023-11-14T22:13:20.123456")
    assert b.height_bucket == 0


def test_transaction_exec_row(spark):
    raw = make_raw(spark, [exec_tx(events=[TRANSFER_EVENT])])
    t = transactions_from_raw(raw).collect()[0]
    assert t.requestkey == "rk-exec-1" and t.block == "blockhash1"
    assert t.code and "coin.transfer" in t.code
    assert t.pactid is None and t.rollback is None and t.step is None
    assert json.loads(t.data) == {"k": 1}
    assert t.gas == 543 and t.txid == 99
    assert t.badresult is None and json.loads(t.goodresult) == {"amount": 1.5}
    assert t.num_events == 1
    assert t.sender == "alice" and t.gaslimit == 2500


def test_transaction_cont_row(spark):
    raw = make_raw(spark, [cont_tx()])
    t = transactions_from_raw(raw).collect()[0]
    assert t.code is None
    assert t.pactid == "rk-exec-1" and t.rollback is False and t.step == 1
    assert json.loads(t.data) == {"s": 1}
    assert t.proof == "proofdata"
    assert json.loads(t.continuation) == {"pactId": "rk-exec-1", "step": 1}


def test_transaction_failed_result(spark):
    raw = make_raw(spark, [exec_tx(failed=True)])
    t = transactions_from_raw(raw).collect()[0]
    assert t.goodresult is None and json.loads(t.badresult) == {"message": "boom"}
    assert t.txid is None


def test_events_coinbase_and_tx(spark):
    cb_ev = {
        "name": "TRANSFER",
        "module": {"name": "coin"},
        "moduleHash": "mh-coin",
        "params": ["", "miner-acct", {"decimal": "0.983026"}],
    }
    raw = make_raw(spark, [exec_tx(events=[TRANSFER_EVENT, NS_EVENT])],
                   coinbase_events=[cb_ev])
    evs = events_from_raw(raw).orderBy("requestkey", "idx").collect()
    assert len(evs) == 3
    cb = [e for e in evs if e.requestkey == "cb"][0]
    assert cb.idx == 0 and cb.param_0 == "" and cb.param_1 == "miner-acct"
    tx_evs = [e for e in evs if e.requestkey == "rk-exec-1"]
    assert [e.idx for e in tx_evs] == [0, 1]
    t0, t1 = tx_evs
    assert t0.qualname == "coin.TRANSFER" and t0.module == "coin"
    assert t1.qualname == "free.token-x.mint" and t1.module == "free.token-x"
    assert t0.param_0 == "alice" and t0.param_1 == "bob"
    assert float(t0.amount_dec) == 12.5
    assert json.loads(t0.params) == ["alice", "bob", {"decimal": "12.5"}]
    assert t0.paramtext == t0.params


@pytest.mark.parametrize(
    "param2,expected",
    [
        ({"decimal": 3.25}, 3.25),
        ({"decimal": "4.5"}, 4.5),
        ({"int": 7}, 7.0),
        ({"int": "8"}, 8.0),
        (9.75, 9.75),
        ("10.5", 10.5),
        # precedence: decimal wins over int and bare
        ({"decimal": "1.0", "int": "2"}, 1.0),
    ],
)
def test_amount_coercion_precedence(spark, param2, expected):
    ev = {
        "name": "TRANSFER",
        "module": {"name": "coin"},
        "moduleHash": "mh",
        "params": ["a", "b", param2],
    }
    raw = make_raw(spark, [exec_tx(events=[ev])])
    e = events_from_raw(raw).filter(F.col("requestkey") != "cb").collect()[0]
    assert float(e.amount_dec) == expected


def test_transfers_projection_validity(spark):
    good = TRANSFER_EVENT
    wrong_name = dict(good, name="NOTRANSFER-X")  # qualname must END with TRANSFER
    wrong_arity = dict(good, params=["a", "b"])
    non_string_acct = dict(good, params=[1, "b", {"decimal": "1"}])
    xchain = {
        "name": "TRANSFER_XCHAIN",
        "module": {"name": "coin"},
        "moduleHash": "mh",
        "params": ["a", "b", {"decimal": "2"}, "3"],
    }
    raw = make_raw(
        spark,
        [exec_tx(events=[good, wrong_name, wrong_arity, non_string_acct, xchain])],
    )
    evs = events_from_raw(raw)
    tr = transfers_from_events(evs, event_min_height=0).collect()
    # only the valid 3-param TRANSFER row survives (XCHAIN has 4 params)
    assert len(tr) == 1
    t = tr[0]
    assert (t.from_acct, t.to_acct) == ("alice", "bob")
    assert float(t.amount) == 12.5
    assert t.modulename == "coin" and t.idx == 0


def test_transfers_activation_floor(spark):
    raw = make_raw(spark, [exec_tx(events=[TRANSFER_EVENT])], height=100)
    evs = events_from_raw(raw)
    assert transfers_from_events(evs, event_min_height=101).count() == 0
    assert transfers_from_events(evs, event_min_height=100).count() == 1


def test_signers_zip(spark):
    raw = make_raw(spark, [exec_tx()])
    s = signers_from_raw(raw).orderBy("idx").collect()
    assert [(x.idx, x.pubkey, x.sig) for x in s] == [
        (0, "pk1", "sig1"),
        (1, "pk2", "sig2"),
    ]
    assert json.loads(s[0].caps) == [{"name": "coin.GAS", "args": []}]
    assert s[0].scheme == "ED25519" and s[1].scheme is None


def test_minerkeys(spark):
    raw = make_raw(spark, [exec_tx()])
    mk = minerkeys_from_raw(raw).orderBy("key").collect()
    assert [(m.block, m.key) for m in mk] == [
        ("blockhash1", "mk1"),
        ("blockhash1", "mk2"),
    ]


@pytest.mark.heavy
def test_payload_to_tables_counts(spark):
    raw = make_raw(spark, [exec_tx(events=[TRANSFER_EVENT]), cont_tx()])
    tables = payload_to_tables(raw)
    assert tables["blocks"].count() == 1
    assert tables["transactions"].count() == 2
    assert tables["events"].count() == 1
    assert tables["transfers"].count() == 1
    assert tables["signers"].count() == 2
    assert tables["minerkeys"].count() == 2
