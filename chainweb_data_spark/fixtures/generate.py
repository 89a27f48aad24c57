"""Deterministic chainweb-shaped fixture generator (FIXTURES.md §A).

Produces RAW rows in the node wire format (schemas/payload.py) and derives
the six relational tables by running the real ingest transforms — so fixture
tables and ingest agree by construction (FIXTURES.md A4 requirement).

Required phenomena (FIXTURES.md "Scale/distribution knobs"), all present:
orphan twins, per-chain height gaps, continuation chains (len ≥ 3), XCHAIN
send/receive pairs, pre-activation region without events, coinbase events,
duplicated requestkey across orphan branches, every amount-coercion branch
(Lookups.hs:245-257), searchable code terms (Bench.hs:202-208).

Everything is seeded (seed=42 convention) — regeneration is bit-stable.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import random

GENESIS_US = 1_572_393_600_000_000  # 2019-10-30 UTC, µs
BLOCK_SPACING_US = 30_000_000
ACTIVATION_FLOOR = 60  # heights below this: no events/transfers
SEARCH_TERMS = ["transfer", "receiver-guard", "transfer-crosschain", "module", "hat"]
ACCOUNTS = [f"k:acct{i:03d}" for i in range(40)] + ["alice", "bob", "carol"]
TOKENS = ["coin", "coin", "coin", "ns.token-1", "ns.token-2"]


def _b64u(doc) -> str:
    raw = json.dumps(doc, separators=(",", ":")).encode()
    return base64.urlsafe_b64encode(raw).decode().rstrip("=")


def _hash(*parts) -> str:
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).digest()
    return base64.urlsafe_b64encode(h[:24]).decode().rstrip("=")


def _le_b64(n: int, nbytes: int = 32) -> str:
    return base64.urlsafe_b64encode(n.to_bytes(nbytes, "little")).decode().rstrip("=")


def _amount_param(rng: random.Random):
    """Cover every coercion branch of Lookups.hs:245-257."""
    v = round(rng.uniform(0.1, 500.0), 6)
    branch = rng.randrange(6)
    if branch == 0:
        return {"decimal": v}
    if branch == 1:
        return {"decimal": str(v)}
    if branch == 2:
        return {"int": int(v) + 1}
    if branch == 3:
        return {"int": str(int(v) + 1)}
    if branch == 4:
        return v
    return str(v)


def _mk_event(rng: random.Random, kind: str, chainid: int, params=None):
    name = kind
    module = {"name": rng.choice(TOKENS).split(".")[-1]}
    token = rng.choice(TOKENS)
    if "." in token:
        ns, mn = token.split(".")
        module = {"namespace": ns, "name": mn}
    else:
        module = {"name": token}
    if params is None:
        a, b = rng.choice(ACCOUNTS), rng.choice(ACCOUNTS)
        if kind == "TRANSFER":
            params = [a, b, _amount_param(rng)]
        elif kind == "TRANSFER_XCHAIN":
            params = [a, b, _amount_param(rng), str(rng.randrange(4))]
        elif kind == "X_RESUME":
            params = [str(chainid), "coin.transfer-crosschain", [a, b]]
        else:
            params = [a, rng.randrange(100)]
    return {
        "name": name,
        "module": module,
        "moduleHash": _hash("mh", module.get("name")),
        "params": params,
    }


def _mk_tx(rng: random.Random, chainid: int, height: int, time_us: int, idx: int,
           cont_of: str | None = None, step: int = 0):
    rk = _hash("tx", chainid, height, idx, cont_of or "")
    sender = rng.choice(ACCOUNTS)
    if cont_of is None:
        term = rng.choice(SEARCH_TERMS)
        code = f'(coin.{term} "{rng.choice(ACCOUNTS)}" "{rng.choice(ACCOUNTS)}" {round(rng.uniform(0.1, 9.9), 2)})'
        payload = {"exec": {"code": code, "data": {"note": term}}}
    else:
        payload = {
            "cont": {
                "pactId": cont_of,
                "rollback": False,
                "step": step,
                "data": {"s": step},
                "proof": (_hash("proof", rk) if step == 1 else None),
            }
        }
    n_signers = rng.randrange(1, 4)
    signers = [
        {
            "pubKey": _hash("pk", rk, i),
            "scheme": "ED25519" if rng.random() < 0.7 else None,
            "addr": None,
            "clist": [{"name": "coin.GAS", "args": []}],
        }
        for i in range(n_signers)
    ]
    cmd = {
        "networkId": "testnet-fixture",
        "nonce": _hash("nonce", rk),
        "meta": {
            "creationTime": (time_us - 5_000_000) / 1_000_000,
            "ttl": 28800,
            "gasLimit": 2500,
            "gasPrice": round(rng.uniform(1e-8, 1e-4), 9),
            "sender": sender,
            "chainId": str(chainid),
        },
        "payload": payload,
        "signers": signers,
    }
    n_events = rng.randrange(0, 5) if height >= ACTIVATION_FLOOR else 0
    events = []
    for e in range(n_events):
        r = rng.random()
        kind = (
            "TRANSFER"
            if r < 0.6
            else rng.choice(["TRANSFER_XCHAIN", "X_RESUME", "mint", "burn", "sale"])
        )
        events.append(_mk_event(rng, kind, chainid))
    failed = rng.random() < 0.05
    output = {
        "gas": rng.randrange(100, 2000),
        "logs": _hash("logs", rk),
        "reqKey": rk,
        "txId": None if failed else rng.randrange(1, 10_000_000),
        "events": events,
        "metadata": None,
        "continuation": ({"pactId": cont_of, "step": step} if cont_of else None),
        "result": (
            {"status": "failure", "error": {"message": "tx failed", "type": "EvalError"}}
            if failed
            else {"status": "success", "data": {"ok": True}}
        ),
    }
    tx = {
        "hash": rk,
        "sigs": [{"sig": _hash("sig", rk, i)} for i in range(n_signers)],
        "cmd": json.dumps(cmd, separators=(",", ":")),
    }
    return rk, tx, output


def generate_raw_rows(
    n_chains: int = 4,
    max_height: int = 300,
    seed: int = 42,
) -> list[dict]:
    """Raw rows {header, powHash, payload} per the node wire format."""
    rng = random.Random(seed)
    rows = []
    # per-chain gaps: a few missing height ranges (FIXTURES: ≥1 gap/chain)
    gaps = {
        c: set(
            h
            for start in rng.sample(range(10, max_height - 10), 3)
            for h in range(start, start + rng.randrange(1, 4))
        )
        for c in range(n_chains)
    }
    parent_hash = {c: _hash("genesis", c) for c in range(n_chains)}
    open_conts: list[tuple[str, int, int]] = []  # (pactid, next_step, remaining)

    for height in range(max_height):
        for chainid in range(n_chains):
            if height in gaps[chainid]:
                continue
            n_branches = 2 if rng.random() < 0.02 else 1  # orphan twins
            for branch in range(n_branches):
                bh = _hash("blk", chainid, height, branch)
                time_us = (
                    GENESIS_US
                    + height * BLOCK_SPACING_US
                    + rng.randrange(-5_000_000, 5_000_000)
                )
                txs = []
                n_txs = max(0, rng.randrange(-2, 6))
                for i in range(n_txs):
                    cont_of = None
                    step = 0
                    if open_conts and rng.random() < 0.3:
                        cont_of, step, remaining = open_conts.pop(0)
                        rk, tx, out = _mk_tx(
                            rng, chainid, height, time_us, i, cont_of, step
                        )
                        if remaining > 1:
                            open_conts.append((rk, step + 1, remaining - 1))
                    else:
                        rk, tx, out = _mk_tx(rng, chainid, height, time_us, i)
                        if rng.random() < 0.15:
                            open_conts.append((rk, 1, rng.randrange(1, 4)))
                    txs.append((tx, out))
                miner = rng.choice(ACCOUNTS[:10])
                miner_data = {
                    "account": miner,
                    "predicate": "keys-all",
                    "public-keys": [_hash("mk", miner, k) for k in range(rng.randrange(1, 3))],
                }
                coinbase_events = (
                    [
                        _mk_event(
                            rng,
                            "TRANSFER",
                            chainid,
                            params=["", miner, {"decimal": "0.983026"}],
                        )
                    ]
                    if height >= ACTIVATION_FLOOR
                    else []
                )
                coinbase = {
                    "gas": 0,
                    "logs": _hash("cblogs", bh),
                    "reqKey": parent_hash[chainid],
                    "txId": rng.randrange(1, 10_000_000),
                    "events": coinbase_events,
                    "metadata": None,
                    "continuation": None,
                    "result": {"status": "success", "data": "Write succeeded"},
                }
                header = {
                    "creationTime": time_us,
                    "chainId": chainid,
                    "height": height,
                    "parent": parent_hash[chainid],
                    "hash": bh,
                    "payloadHash": _hash("pay", bh),
                    "target": _le_b64(2**236 // (1 + height + chainid)),
                    "weight": _le_b64((height + 1) * 2**140 + chainid),
                    "epochStart": GENESIS_US + (height // 120) * 120 * BLOCK_SPACING_US,
                    "nonce": str(rng.getrandbits(64)),
                    "featureFlags": 0,
                }
                payload = {
                    "transactions": [[_b64u(t), _b64u(o)] for t, o in txs],
                    "minerData": _b64u(miner_data),
                    "coinbase": _b64u(coinbase),
                    "payloadHash": header["payloadHash"],
                }
                rows.append(
                    {
                        "header": json.dumps(header, separators=(",", ":")),
                        "powHash": hashlib.sha256(bh.encode()).hexdigest(),
                        "payload": json.dumps(payload, separators=(",", ":")),
                    }
                )
                if branch == 0:
                    next_parent = bh
            parent_hash[chainid] = next_parent
    return rows


def fixture_dir(root: str | None = None) -> str:
    return root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".fixtures",
        "chainweb",
    )


def write_chainweb_fixture(
    spark,
    out_dir: str | None = None,
    n_chains: int = 4,
    max_height: int = 300,
    seed: int = 42,
    force: bool = False,
) -> str:
    """Generate raw rows, run the real ingest, write six parquet tables +
    the raw feed.  Idempotent (skips when the marker file exists)."""
    from ..ingest.transforms import payload_to_tables
    from ..schemas.payload import RAW_SCHEMA

    out = fixture_dir(out_dir)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker) and not force:
        return out
    os.makedirs(out, exist_ok=True)
    rows = generate_raw_rows(n_chains, max_height, seed)
    raw = spark.createDataFrame(
        [(r["header"], r["powHash"], r["payload"]) for r in rows], RAW_SCHEMA
    )
    raw.write.mode("overwrite").parquet(os.path.join(out, "raw.parquet"))
    raw = spark.read.parquet(os.path.join(out, "raw.parquet"))
    tables = payload_to_tables(raw, event_min_height=ACTIVATION_FLOOR)
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out
