"""Incremental MinHash dedup index (streaming/dedup_index.py): cross-batch
near-dup detection, within-batch detection, replay idempotence, the
historical hot-bucket rail, and agreement with the batch operator on the
union corpus."""

import os

import pytest
from pyspark.sql import functions as F

from chainweb_data_spark.operators import dedup as dd
from chainweb_data_spark.streaming.dedup_index import (
    BANDS_TABLE,
    COUNTS_TABLE,
    SETS_TABLE,
    update_dedup_index,
)

BASE_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _flags(df):
    return sorted((r["doc_id"], r["dup_of"]) for r in df.collect())


def test_cross_batch_and_internal_flags(spark, tmp_path):
    out = str(tmp_path / "idx")
    # batch 0: two distinct docs
    b0 = _docs(
        spark,
        [
            (1, BASE_TEXT),
            (2, "one two three four five six seven eight nine ten"),
        ],
    )
    f0 = update_dedup_index(spark, b0, out, batch_id=0)
    assert _flags(f0) == []
    # batch 1: near-dup of doc 1 (one appended token), a within-batch
    # near-dup pair (10 and 11), and a fresh doc
    b1 = _docs(
        spark,
        [
            (10, BASE_TEXT + " tail"),
            (11, BASE_TEXT + " tail extra"),
            (12, "completely different words with no shared trigrams at all"),
        ],
    )
    f1 = update_dedup_index(spark, b1, out, batch_id=1)
    got = _flags(f1)
    assert (10, 1) in got          # cross-batch: history doc is the dup_of
    assert (11, 10) in got         # within-batch: earlier (min-id) doc wins
    assert not any(d == 12 for d, _ in got)
    # all three tables exist and carry the expected PKs
    for t in (BANDS_TABLE, SETS_TABLE, COUNTS_TABLE):
        assert os.path.exists(os.path.join(out, t))


def test_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "idx")
    b0 = _docs(spark, [(1, BASE_TEXT)])
    b1 = _docs(spark, [(10, BASE_TEXT + " tail")])
    update_dedup_index(spark, b0, out, batch_id=0)
    first = _flags(update_dedup_index(spark, b1, out, batch_id=1))
    n_bands = spark.read.parquet(os.path.join(out, BANDS_TABLE)).count()
    n_counts = spark.read.parquet(os.path.join(out, COUNTS_TABLE)).count()
    # replay the same batch: identical flags, no table growth
    replay = _flags(update_dedup_index(spark, b1, out, batch_id=1))
    assert replay == first == [(10, 1)]
    assert spark.read.parquet(os.path.join(out, BANDS_TABLE)).count() == n_bands
    assert (
        spark.read.parquet(os.path.join(out, COUNTS_TABLE)).count() == n_counts
    )


def test_matches_batch_operator_on_union(spark, tmp_path):
    """Feeding the corpus in two batches flags exactly the pairs the batch
    operator finds on the union (oriented newer←older)."""
    out = str(tmp_path / "idx")
    rows = [
        (1, BASE_TEXT),
        (2, "one two three four five six seven eight nine ten"),
        (10, BASE_TEXT + " tail"),
        (11, "one two three four five six seven eight nine ten eleven"),
        (12, "unrelated content entirely here made of other tokens"),
    ]
    b0, b1 = rows[:2], rows[2:]
    update_dedup_index(spark, _docs(spark, b0), out, batch_id=0)
    inc_flags = _flags(update_dedup_index(spark, _docs(spark, b1), out, batch_id=1))

    batch_pairs = (
        dd.minhash_dedup_pairs(
            _docs(spark, rows), "doc_id", "text", min_jaccard=0.2
        )
        .select("id_a", "id_b")
        .collect()
    )
    expected = sorted((max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"])) for r in batch_pairs)
    assert inc_flags == expected


def test_historical_hot_bucket_rail(spark, tmp_path):
    """A bucket that went hot in an earlier batch stays excluded from later
    probes (no quadratic candidate fan-out against boilerplate history)."""
    out = str(tmp_path / "idx")
    # 30 identical docs blow past the cap (max_bucket_size=8)
    boiler = _docs(spark, [(i, BASE_TEXT) for i in range(30)])
    update_dedup_index(spark, boiler, out, batch_id=0, max_bucket_size=8)
    probe = _docs(spark, [(100, BASE_TEXT + " tail")])
    flags = _flags(
        update_dedup_index(spark, probe, out, batch_id=1, max_bucket_size=8)
    )
    # every band bucket of the probe doc collides with the hot boilerplate
    # buckets — all dropped whole, so no flags (the batch gate's cap
    # semantics, extended across time)
    assert flags == []


def test_replay_idempotent_at_the_hot_cap_boundary(spark, tmp_path):
    """The review scenario: history sits just under the cap, the batch
    pushes the bucket over it.  The replay must still see only PRIOR
    batches' counts (its own first-run counts excluded) and re-flag the
    same rows."""
    out = str(tmp_path / "idx")
    cap = 8
    # history: 7 near-identical docs → bucket occupancy 7 <= cap
    hist = _docs(spark, [(i, BASE_TEXT) for i in range(7)])
    update_dedup_index(spark, hist, out, batch_id=0, max_bucket_size=cap)
    # batch 1: 4 more near-dups → post-merge occupancy 11 > cap
    b1 = _docs(spark, [(100 + i, BASE_TEXT + " tail") for i in range(4)])
    first = _flags(update_dedup_index(spark, b1, out, batch_id=1, max_bucket_size=cap))
    assert first  # cross-era flags exist on the first run
    replay = _flags(update_dedup_index(spark, b1, out, batch_id=1, max_bucket_size=cap))
    assert replay == first


def test_non_atomic_fallback_matches_atomic(spark, tmp_path):
    rows0 = [(1, BASE_TEXT)]
    rows1 = [(10, BASE_TEXT + " tail"), (11, BASE_TEXT + " tail extra")]
    flags = {}
    for mode in (True, False):
        out = str(tmp_path / f"idx_{mode}")
        update_dedup_index(spark, _docs(spark, rows0), out, batch_id=0, atomic=mode)
        flags[mode] = _flags(
            update_dedup_index(spark, _docs(spark, rows1), out, batch_id=1, atomic=mode)
        )
    assert flags[True] == flags[False] != []
    # atomic mode leaves a manifest; fallback mode does not
    assert os.path.exists(os.path.join(str(tmp_path / "idx_True"), "_manifest"))
    assert not os.path.exists(os.path.join(str(tmp_path / "idx_False"), "_manifest"))


# ---------------------------------------------------------------------------
# incremental corpus stats (streaming/corpus_stats.py)
# ---------------------------------------------------------------------------


def test_corpus_stats_accumulate_and_replay(spark, tmp_path):
    from chainweb_data_spark.streaming.corpus_stats import (
        corpus_stats,
        update_corpus_stats,
    )

    out = str(tmp_path / "stats")
    b0 = spark.createDataFrame(
        [(1, "en", "one two three"), (2, "fr", "un deux"), (3, None, "x y z w")],
        "doc_id long, lang string, text string",
    )
    b1 = spark.createDataFrame(
        [(4, "en", "four five")], "doc_id long, lang string, text string"
    )
    update_corpus_stats(spark, b0, out, batch_id=0)
    update_corpus_stats(spark, b1, out, batch_id=1)
    update_corpus_stats(spark, b1, out, batch_id=1)  # replay: no double count
    got = {
        r["lang"]: (r["n_docs"], r["n_tokens"], r["n_chars"])
        for r in corpus_stats(spark, out).collect()
    }
    assert got["en"] == (2, 5, 22)   # 3+2 tokens, 13+9 chars
    assert got["fr"] == (1, 2, 7)
    assert got[None] == (1, 4, 7)    # NULL language is reported, not dropped


def test_batch_writes_one_file_per_table(spark, tmp_path):
    """The file-growth bound the streaming rehearsal motivated: each batch
    adds at most ONE data file per TOUCHED BUCKET DIR per table (the
    single coalesced task still splits across partitionBy dirs — ≤16
    key_buckets — where the pre-fix writer multiplied that by the shuffle
    task count).  Probe cost is O(index files) at the parquet-open layer,
    so this discipline IS the scale property."""
    out = str(tmp_path / "idx")
    n_batches = 3
    for b in range(n_batches):
        docs = _docs(
            spark, [(b * 10 + i, BASE_TEXT + f" uniq{b}_{i}") for i in range(5)]
        )
        update_dedup_index(spark, docs, out, batch_id=b)
    caps = {"minhash_bands": 16, "shingle_sets": 16, "bucket_counts": 1}
    for table, per_batch in caps.items():
        n_files = sum(
            1
            for root, _d, files in os.walk(os.path.join(out, f"{table}.parquet"))
            for f in files
            if not f.startswith(("_", "."))
        )
        assert n_files <= per_batch * n_batches, (table, n_files)
