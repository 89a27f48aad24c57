"""Streaming listen path: replay + orphan idempotence (SURVEY §7.1 step 7).

The reference's guarantees (Listen.hs + Worker.hs ON CONFLICT DO NOTHING):
re-delivered blocks change nothing; orphan twins at the same height coexist;
the streamed result equals a one-shot batch ingest of the same feed.
"""

import json
import os

import pytest

from chainweb_data_spark.fixtures.generate import generate_raw_rows
from chainweb_data_spark.ingest.transforms import payload_to_tables
from chainweb_data_spark.schemas.payload import RAW_SCHEMA
from chainweb_data_spark.streaming.listen import TABLE_PKS, listen_stream

# the generator's event-activation floor is 60 (fixtures ACTIVATION_FLOOR);
# run past it so events/transfers actually flow through the stream
ACTIVATION = 60


@pytest.fixture(scope="module")
def raw_rows():
    return generate_raw_rows(n_chains=2, max_height=100, seed=7)


def _write_feed(rows, feed_dir, chunks):
    os.makedirs(feed_dir, exist_ok=True)
    n = len(rows)
    bounds = [int(n * i / chunks) for i in range(chunks + 1)]
    for i in range(chunks):
        with open(os.path.join(feed_dir, f"feed_{i:03d}.json"), "w") as f:
            for r in rows[bounds[i] : bounds[i + 1]]:
                f.write(json.dumps(r) + "\n")


def test_stream_equals_batch_and_replay_is_noop(spark, tmp_path_factory, raw_rows):
    base = str(tmp_path_factory.mktemp("stream"))
    feed = os.path.join(base, "feed")
    out = os.path.join(base, "tables")
    # 3 chunks + chunk 0 re-delivered under a new filename (listener
    # reconnect replays recent blocks, Server.hs:171-182)
    _write_feed(raw_rows, feed, 3)
    with open(os.path.join(feed, "feed_000.json")) as f:
        dup = f.read()
    with open(os.path.join(feed, "feed_900_replay.json"), "w") as f:
        f.write(dup)

    q = listen_stream(spark, feed, out, event_min_height=ACTIVATION)
    q.awaitTermination(300)

    raw = spark.createDataFrame(
        [(r["header"], r["powHash"], r["payload"]) for r in raw_rows], RAW_SCHEMA
    )
    expected = payload_to_tables(raw, event_min_height=ACTIVATION)
    for name, exp_raw in expected.items():
        got = spark.read.parquet(os.path.join(out, f"{name}.parquet"))
        pk = list(TABLE_PKS[name])
        # ON CONFLICT DO NOTHING collapses PK twins (e.g. a signer row
        # re-introduced by an orphan branch) — dedup the batch oracle too
        exp = exp_raw.dropDuplicates(pk)
        assert got.count() == got.dropDuplicates(pk).count(), f"{name}: dup PKs"
        assert got.count() == exp.count(), f"{name}: stream {got.count()} != batch {exp.count()}"
        # exact content match on the PK set
        assert (
            exp.select(pk).exceptAll(got.select(pk)).isEmpty()
            and got.select(pk).exceptAll(exp.select(pk)).isEmpty()
        ), f"{name}: PK sets differ"


def test_second_run_is_noop(spark, tmp_path_factory, raw_rows):
    base = str(tmp_path_factory.mktemp("stream2"))
    feed = os.path.join(base, "feed")
    out = os.path.join(base, "tables")
    _write_feed(raw_rows, feed, 2)
    q = listen_stream(spark, feed, out, event_min_height=ACTIVATION)
    q.awaitTermination(300)
    counts1 = {
        n: spark.read.parquet(os.path.join(out, f"{n}.parquet")).count()
        for n in TABLE_PKS
    }
    # fresh checkpoint → every file re-delivered end-to-end
    q2 = listen_stream(
        spark, feed, out, checkpoint_dir=os.path.join(base, "ckpt2"),
        event_min_height=ACTIVATION,
    )
    q2.awaitTermination(300)
    counts2 = {
        n: spark.read.parquet(os.path.join(out, f"{n}.parquet")).count()
        for n in TABLE_PKS
    }
    assert counts1 == counts2, f"replay changed tables: {counts1} vs {counts2}"


def test_merge_probe_prunes_to_batch_buckets(spark, tmp_path_factory):
    """The duplicate probe must scan ONLY the partition buckets the batch
    can collide with — numFiles of the executed anti-join plan equals the
    probed bucket's files, not the whole table's (same technique as
    tests/test_layout.py)."""
    from pyspark.sql import functions as F

    from chainweb_data_spark.streaming.listen import merge_batch, merge_plan

    path = str(tmp_path_factory.mktemp("merge") / "blocks.parquet")
    base = spark.range(0, 10_000).select(
        F.md5(F.col("id").cast("string")).alias("hash"),
        F.col("id").alias("height"),
        (F.col("id") / 1_000).cast("long").alias("height_bucket"),
    )
    merge_batch(spark, base, path, ("hash",))
    existing = spark.read.parquet(path)
    n_total_files = len(existing.inputFiles())
    assert n_total_files >= 10  # one dir per bucket at least

    # a new batch confined to the top bucket: half replayed, half new
    batch = spark.range(9_500, 10_500).select(
        F.md5(F.col("id").cast("string")).alias("hash"),
        F.col("id").alias("height"),
        (F.col("id") / 1_000).cast("long").alias("height_bucket"),
    )
    plan, bucketed = merge_plan(spark, batch, path, ("hash",))
    assert bucketed == "height_bucket"
    # the probe side is the only parquet scan in the plan
    from tests.test_layout import _scan_files_read

    files_read = _scan_files_read(plan)
    assert files_read < n_total_files, "probe scanned the full table"
    per_bucket = n_total_files / 10
    assert files_read <= 2 * per_bucket, (files_read, n_total_files)
    # and the merge itself is exact: only the 500 genuinely-new rows append
    assert plan.count() == 500


def test_merge_probe_prunes_key_buckets(spark, tmp_path_factory):
    """signers/minerkeys carry no height (a requestkey re-mined after an
    orphan may reappear at any later height), so their probe prunes on the
    PK-prefix key_bucket instead: a batch touching few buckets must scan
    only those partitions, never the full table."""
    from pyspark.sql import functions as F

    from chainweb_data_spark.streaming.listen import merge_batch, merge_plan

    path = str(tmp_path_factory.mktemp("mergek") / "signers.parquet")
    base = spark.range(0, 20_000).select(
        F.md5(F.col("id").cast("string")).alias("requestkey"),
        F.lit(0).cast("int").alias("idx"),
    ).withColumn("key_bucket", F.substring("requestkey", 1, 1))
    merge_batch(spark, base, path, ("requestkey", "idx"))
    existing = spark.read.parquet(path)
    n_buckets = existing.select("key_bucket").distinct().count()
    assert n_buckets == 16  # md5 hex → 16 prefix buckets, all populated
    n_total_files = len(existing.inputFiles())

    # a batch confined to two buckets: half replayed, half new keys
    batch = (
        base.filter(F.col("key_bucket").isin("a", "b")).limit(100)
        .unionByName(
            spark.range(0, 100).select(
                F.concat(F.lit("a-new-"), F.col("id").cast("string")).alias(
                    "requestkey"
                ),
                F.lit(0).cast("int").alias("idx"),
            ).withColumn("key_bucket", F.substring("requestkey", 1, 1))
        )
    )
    plan, bucketed = merge_plan(spark, batch, path, ("requestkey", "idx"))
    assert bucketed == "key_bucket"
    from tests.test_layout import _scan_files_read

    files_read = _scan_files_read(plan)
    assert files_read < n_total_files, "probe scanned the full table"
    assert files_read <= 2 * (2 / 16) * n_total_files, (files_read, n_total_files)
    assert plan.count() == 100  # replayed rows dropped, new keys kept


def test_stream_partitions_all_six_tables(spark, tmp_path_factory, raw_rows):
    """Reference parity for Worker.hs:50-82 at the layout level: after a
    stream run, EVERY table directory is partition-laid-out, so every
    subsequent merge probe can prune (height_bucket for the height tables,
    key_bucket for signers/minerkeys)."""
    base = str(tmp_path_factory.mktemp("streamp"))
    feed = os.path.join(base, "feed")
    out = os.path.join(base, "tables")
    _write_feed(raw_rows, feed, 1)
    q = listen_stream(spark, feed, out, event_min_height=ACTIVATION)
    q.awaitTermination(300)
    expect_prefix = {
        "blocks": "height_bucket=",
        "transactions": "height_bucket=",
        "events": "height_bucket=",
        "transfers": "height_bucket=",
        "signers": "key_bucket=",
        "minerkeys": "key_bucket=",
    }
    for name, prefix in expect_prefix.items():
        tdir = os.path.join(out, f"{name}.parquet")
        parts = [d for d in os.listdir(tdir) if d.startswith(prefix)]
        assert parts, f"{name}: no {prefix}* partition dirs in {os.listdir(tdir)[:5]}"


def test_merge_into_legacy_flat_table_stays_readable(spark, tmp_path_factory):
    """Appending to a table previously written FLAT (pre-bucketed layout)
    must match the existing layout: partition subdirs beside root data files
    make the directory unreadable (ADVICE r02).  The merge stays correct,
    just without directory pruning — migrate via sources/layout.py for
    that."""
    from pyspark.sql import functions as F

    from chainweb_data_spark.streaming.listen import merge_batch

    path = str(tmp_path_factory.mktemp("flat") / "blocks.parquet")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.md5(F.col("id").cast("string")).alias("hash"),
        F.col("id").alias("height"),
        (F.col("id") / 100).cast("long").alias("height_bucket"),
    )
    # legacy writer: flat, no partitionBy
    mk(0, 500).write.parquet(path)
    # new merge_batch appends a batch that WOULD be bucket-partitioned
    merge_batch(spark, mk(400, 700), path, ("hash",))
    back = spark.read.parquet(path)
    assert back.count() == 700  # 100 replayed rows dropped by the PK probe
    assert back.select("hash").distinct().count() == 700
    # layout stayed flat: no partition subdirectories were created
    assert not any(
        d.startswith("height_bucket=")
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
    )


def test_crash_between_table_writes_converges(spark, tmp_path_factory, raw_rows, monkeypatch):
    """The reference writes all six tables in ONE transaction
    (Worker.hs:50-82); the parquet path is not atomic across tables, so the
    guarantee is re-expressed as replay-convergence: kill the batch between
    table writes, restart the stream on the same checkpoint, and the
    re-delivered batch heals the partially-applied block set."""
    import chainweb_data_spark.streaming.listen as listen_mod

    base = str(tmp_path_factory.mktemp("crash"))
    feed = os.path.join(base, "feed")
    out = os.path.join(base, "tables")
    ckpt = os.path.join(base, "ckpt")
    _write_feed(raw_rows, feed, 2)

    real_merge = listen_mod.merge_batch
    calls = {"n": 0}

    def dying_merge(spark_, df, path, pk):
        calls["n"] += 1
        if calls["n"] == 3:  # die mid-transaction: after 2 of 6 table writes
            raise RuntimeError("injected crash between table writes")
        real_merge(spark_, df, path, pk)

    monkeypatch.setattr(listen_mod, "merge_batch", dying_merge)
    q = listen_stream(spark, feed, out, checkpoint_dir=ckpt,
                      event_min_height=ACTIVATION)
    try:
        q.awaitTermination(300)
    except Exception:
        pass  # the injected crash surfaces as a StreamingQueryException
    assert calls["n"] == 3, "crash injection did not fire"

    # restart on the SAME checkpoint: the uncommitted batch re-delivers
    monkeypatch.setattr(listen_mod, "merge_batch", real_merge)
    q2 = listen_stream(spark, feed, out, checkpoint_dir=ckpt,
                       event_min_height=ACTIVATION)
    q2.awaitTermination(300)

    raw = spark.createDataFrame(
        [(r["header"], r["powHash"], r["payload"]) for r in raw_rows], RAW_SCHEMA
    )
    expected = payload_to_tables(raw, event_min_height=ACTIVATION)
    for name, exp_raw in expected.items():
        got = spark.read.parquet(os.path.join(out, f"{name}.parquet"))
        pk = list(TABLE_PKS[name])
        exp = exp_raw.dropDuplicates(pk)
        assert got.count() == exp.count(), f"{name}: {got.count()} != {exp.count()}"
        assert (
            exp.select(pk).exceptAll(got.select(pk)).isEmpty()
            and got.select(pk).exceptAll(exp.select(pk)).isEmpty()
        ), f"{name}: PK sets differ after crash-recovery"


def test_orphan_twins_coexist(spark, raw_rows):
    raw = spark.createDataFrame(
        [(r["header"], r["powHash"], r["payload"]) for r in raw_rows], RAW_SCHEMA
    )
    blocks = payload_to_tables(raw, event_min_height=ACTIVATION)["blocks"]
    from pyspark.sql import functions as F

    twins = (
        blocks.groupBy("chainid", "height").count().filter(F.col("count") > 1)
    )
    assert not twins.isEmpty(), "fixture must contain orphan twins"
    # twins have distinct hashes (PK) — both retained
    assert blocks.select("hash").distinct().count() == blocks.count()
