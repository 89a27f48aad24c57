"""Incremental continuation-history silver table (SURVEY §2.3 J4 option b):
streaming the tx feed through per-batch updates must produce exactly the
ancestry a direct Python walk over the full tx table produces, replays must
be no-ops, and the endpoint lookup must be a single-bucket read."""

import os

import pytest

from pyspark.sql import functions as F

from chainweb_data_spark.fixtures.generate import generate_raw_rows
from chainweb_data_spark.ingest.transforms import payload_to_tables
from chainweb_data_spark.schemas.payload import RAW_SCHEMA
from chainweb_data_spark.streaming.silver import (
    HISTORY,
    lookup_history,
    update_continuation_history,
)

ACTIVATION = 60


@pytest.fixture(scope="module")
def tx(spark):
    rows = generate_raw_rows(n_chains=2, max_height=120, seed=11)
    raw = spark.createDataFrame(
        [(r["header"], r["powHash"], r["payload"]) for r in rows], RAW_SCHEMA
    )
    return payload_to_tables(raw, event_min_height=ACTIVATION)[
        "transactions"
    ].cache()


def _python_walk(tx_rows):
    """Independent spec: breadth-first over pactid links, fanning out over
    every distinct (pactid, code) row a requestkey carries (a re-mined
    requestkey may appear with different code — the reference's recursive
    join fans out over distinct rows)."""
    by_rk: dict[str, set] = {}
    for r in tx_rows:
        by_rk.setdefault(r["requestkey"], set()).add((r["pactid"], r["code"]))
    expected = set()
    for rk, variants in by_rk.items():
        frontier = {p for (p, _) in variants if p is not None}
        depth = 0
        while frontier:
            nxt_frontier = set()
            for parent in frontier:
                for p_pactid, p_code in by_rk.get(parent, ()):
                    expected.add((rk, depth, parent, p_code))
                    if p_pactid is not None:
                        nxt_frontier.add(p_pactid)
            frontier = nxt_frontier
            depth += 1
    return expected


@pytest.fixture(scope="module")
def silver_dir(spark, tx, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("silver"))
    # three causal batches: continuation steps always reference earlier
    # heights, so height-sliced batches respect the feed's causality
    for lo, hi in ((0, 40), (40, 80), (80, 1_000_000)):
        batch = tx.filter((F.col("height") >= lo) & (F.col("height") < hi))
        update_continuation_history(spark, batch, out)
    return out


def test_incremental_equals_direct_walk(spark, tx, silver_dir):
    expected = _python_walk(
        tx.select("requestkey", "pactid", "code").collect()
    )
    assert expected, "fixture must contain continuation chains"
    assert any(d >= 2 for (_, d, _, _) in expected), "need chains of len >= 3"
    got = {
        (r["start_rk"], r["depth"], r["rk"], r["code"])
        for r in spark.read.parquet(os.path.join(silver_dir, HISTORY)).collect()
    }
    assert got == expected


def test_replay_is_noop(spark, tx, silver_dir):
    before = (
        spark.read.parquet(os.path.join(silver_dir, HISTORY)).count()
    )
    last = tx.filter(F.col("height") >= 80)
    update_continuation_history(spark, last, silver_dir)
    after = spark.read.parquet(os.path.join(silver_dir, HISTORY)).count()
    assert after == before


def test_lookup_reads_one_bucket_in_depth_order(spark, tx, silver_dir):
    hist = spark.read.parquet(os.path.join(silver_dir, HISTORY))
    tip = (
        hist.groupBy("start_rk")
        .count()
        .orderBy(F.desc("count"), "start_rk")
        .first()["start_rk"]
    )
    rows = lookup_history(spark, silver_dir, tip).collect()
    assert [r["depth"] for r in rows] == list(range(len(rows)))
    assert len(rows) >= 2
    # the physical read prunes to the tip's key bucket directory
    # (input_file_name must be captured before any exchange — no orderBy)
    files = [
        f["fp"]
        for f in spark.read.parquet(os.path.join(silver_dir, HISTORY))
        .filter(
            (F.col("key_bucket") == "k" + tip[:1]) & (F.col("start_rk") == tip)
        )
        .select(F.input_file_name().alias("fp"))
        .distinct()
        .collect()
    ]
    assert files and all(f"key_bucket=k{tip[:1]}" in f for f in files)


def test_listen_stream_maintains_silver_history(spark, tx, tmp_path_factory):
    """End-to-end: the live listen pipeline with continuation_history=True
    produces the same ancestry as the direct walk over the ingested txs."""
    import json

    from chainweb_data_spark.fixtures.generate import generate_raw_rows
    from chainweb_data_spark.streaming.listen import listen_stream

    base = str(tmp_path_factory.mktemp("listen_silver"))
    feed = os.path.join(base, "feed")
    out = os.path.join(base, "tables")
    os.makedirs(feed)
    rows = generate_raw_rows(n_chains=2, max_height=120, seed=11)
    third = (len(rows) + 2) // 3
    for i in range(3):
        path = os.path.join(feed, f"f{i}.json")
        with open(path, "w") as f:
            for r in rows[i * third : (i + 1) * third]:
                f.write(json.dumps(r) + "\n")
        os.utime(path, (1_700_000_000 + i * 10,) * 2)

    q = listen_stream(
        spark, feed, out, event_min_height=ACTIVATION, continuation_history=True
    )
    q.awaitTermination(300)

    ingested = spark.read.parquet(os.path.join(out, "transactions.parquet"))
    expected = _python_walk(
        ingested.select("requestkey", "pactid", "code").collect()
    )
    got = {
        (r["start_rk"], r["depth"], r["rk"], r["code"])
        for r in spark.read.parquet(os.path.join(out, HISTORY)).collect()
    }
    assert expected and got == expected
