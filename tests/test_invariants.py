"""The reference's operational SQL invariants (``invariants.md:1-24``),
automated as DataFrame assertions over the chainweb fixture — SURVEY §5
marks these as the reference's only data-level correctness checks beyond
unit tests ("excellent candidates for automated DataFrame assertion
tests").

Fixture ground truth (fixtures/generate.py): per-chain height gaps exist,
~2% of heights carry an orphan twin (same height, different hash), events
and coinbase activate at height >= ACTIVATION_FLOOR.
"""

import pytest

from pyspark.sql import functions as F

from chainweb_data_spark.fixtures.generate import ACTIVATION_FLOOR
from chainweb_data_spark.operators.gaps import detect_gaps
from chainweb_data_spark.queries.chainweb import _cw


@pytest.fixture(scope="module")
def t(spark):
    return {
        n: _cw(spark, n)
        for n in (
            "blocks",
            "transactions",
            "events",
            "transfers",
            "signers",
            "minerkeys",
        )
    }


def test_block_count_equals_height_span_modulo_orphans_and_gaps(t):
    """invariants.md: per-chain ``count(*) ≈ max(height) − min(height)``
    modulo orphans — made exact: total rows = distinct heights + orphan
    extras, and distinct heights = span − gap widths, where the gap widths
    come from the W1 gap-detection operator itself (ties the operator to
    the reference's manual check)."""
    per_chain = (
        t["blocks"]
        .groupBy("chainid")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("height").alias("n_heights"),
            (F.max("height") - F.min("height") + 1).alias("span"),
        )
    )
    gaps = (
        detect_gaps(t["blocks"], "chainid", "height")
        .groupBy("chainid")
        .agg(F.sum(F.col("gap_end") - F.col("gap_start") + 1).alias("n_missing"))
    )
    joined = per_chain.join(gaps, "chainid", "left").fillna(0, ["n_missing"])
    rows = joined.collect()
    assert rows, "fixture must have blocks"
    for r in rows:
        assert r["n_heights"] == r["span"] - r["n_missing"], r
        # orphan extras are the only reason n_rows can exceed n_heights
        assert r["n_rows"] >= r["n_heights"], r
    # the fixture's ~2% twin rate must actually exercise the orphan path
    assert sum(r["n_rows"] - r["n_heights"] for r in rows) > 0


def test_exactly_one_coinbase_event_per_activated_block(t):
    """invariants.md: coinbase-event counts vs the activation height —
    every block at height >= floor carries exactly one coinbase event
    (requestkey 'cb', idx 0); none below the floor."""
    cb = t["events"].filter(F.col("requestkey") == "cb")
    assert cb.filter(F.col("idx") != 0).count() == 0
    assert cb.filter(F.col("height") < ACTIVATION_FLOOR).count() == 0
    n_activated_blocks = (
        t["blocks"].filter(F.col("height") >= ACTIVATION_FLOOR).count()
    )
    # one per block: join on block hash, count matches, no block missing
    per_block = cb.groupBy("block").count()
    assert per_block.filter(F.col("count") != 1).count() == 0
    assert per_block.count() == n_activated_blocks


def test_transfers_are_exactly_the_valid_transfer_events(t):
    """P8 parity: the transfers table is the materialization of TRANSFER-
    shaped events (qualname ends 'TRANSFER', 3 params, coercible amount) —
    same cardinality, and every transfer row joins its source event on the
    (block, requestkey, idx) identity."""
    ev = t["events"]
    tr = t["transfers"]
    valid = ev.filter(
        F.col("qualname").endswith("TRANSFER")
        & (F.expr("json_array_length(params)") == 3)
    )
    # every transfer joins a qualifying event on its PK-embedded identity
    unmatched = tr.join(
        valid.select("block", "requestkey", "idx").distinct(),
        ["block", "requestkey", "idx"],
        "left_anti",
    )
    assert unmatched.count() == 0
    # and transfers never exceed qualifying events (amount-coercion may
    # drop some events, never add)
    assert tr.count() <= valid.count()
    assert tr.count() > 0


def test_foreign_keys_resolve(t):
    """Every child row's block hash exists in blocks; every signer's
    requestkey exists in transactions (init.sql FKs)."""
    hashes = t["blocks"].select(F.col("hash").alias("block")).distinct()
    for child in ("transactions", "events", "transfers", "minerkeys"):
        dangling = t[child].join(hashes, "block", "left_anti").count()
        assert dangling == 0, f"{child} has {dangling} dangling block FKs"
    rks = t["transactions"].select("requestkey").distinct()
    assert t["signers"].join(rks, "requestkey", "left_anti").count() == 0
