"""Retention leases (streaming/publish.py pin_version/unpin_version):
a pinned snapshot's files survive compaction + vacuum cycles arbitrarily
far past the keep_versions horizon — the dataset_snapshot provenance
contract — and an unpin releases them for reclamation."""

import os

import pytest

import chainweb_data_spark.streaming.publish as pub
from chainweb_data_spark.streaming.publish import (
    compact_published,
    pin_version,
    pinned_versions,
    publish_batch,
    read_manifest,
    read_published,
    unpin_version,
    vacuum,
)

PK = {"t": ("id",)}


def _batch(spark, lo, hi):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 2).alias("val"))
        .coalesce(1)
    )


def _rows(df):
    return sorted((r["id"], r["val"]) for r in df.collect())


def _churn(spark, out, rounds, start):
    """Publish + compact + aggressive vacuum ``rounds`` times — each
    cycle rewrites the live file set, so any unpinned old snapshot's
    files fall outside retention immediately."""
    for i in range(rounds):
        lo = start + i * 10
        publish_batch(spark, {"t": _batch(spark, lo, lo + 10)}, out, pks=PK)
        compact_published(spark, out, "t", keep_versions=0)
        vacuum(out, keep_versions=0)


def test_pin_survives_compaction_and_vacuum_cycles(spark, tmp_path):
    out = str(tmp_path / "p1")
    publish_batch(spark, {"t": _batch(spark, 0, 10)}, out, pks=PK)
    publish_batch(spark, {"t": _batch(spark, 10, 20)}, out, pks=PK)
    v_pin = read_manifest(out)["version"]
    want = _rows(read_published(spark, out, "t", version=v_pin))
    pin_version(out, v_pin, name="training-run-7")
    assert pinned_versions(out) == {v_pin: "training-run-7"}

    # churn far past any keep_versions horizon (MAINT_KEEP_VERSIONS = 2)
    _churn(spark, out, rounds=pub.MAINT_KEEP_VERSIONS + 3, start=20)

    # the pinned snapshot re-reads byte-identically
    got = read_published(spark, out, "t", version=v_pin)
    assert _rows(got) == want
    # and the lease itself survived the churn's commits
    assert pinned_versions(out) == {v_pin: "training-run-7"}


def test_unpin_releases_files_for_reclamation(spark, tmp_path):
    out = str(tmp_path / "p2")
    publish_batch(spark, {"t": _batch(spark, 0, 10)}, out, pks=PK)
    v_pin = read_manifest(out)["version"]
    pin_version(out, v_pin)
    _churn(spark, out, rounds=2, start=10)
    pinned_files = set(
        pub._resolve(out, v_pin)["tables"]["t"]
    )  # still on disk under the lease
    tdir = os.path.join(out, "t.parquet")
    assert all(os.path.exists(os.path.join(tdir, f)) for f in pinned_files)

    unpin_version(out, v_pin)
    assert pinned_versions(out) == {}
    removed = vacuum(out, keep_versions=0)
    # the compacted-away originals are now reclaimable ...
    assert any(f.split(os.sep, 1)[-1] in r for f in pinned_files for r in removed)
    # ... and the pinned read fails loudly, not wrongly
    with pytest.raises(Exception):
        read_published(spark, out, "t", version=v_pin).collect()


def test_pin_refuses_uncommitted_or_reclaimed_versions(spark, tmp_path):
    out = str(tmp_path / "p3")
    publish_batch(spark, {"t": _batch(spark, 0, 10)}, out, pks=PK)
    with pytest.raises(ValueError, match="not in committed range"):
        pin_version(out, 99)
    v_old = read_manifest(out)["version"]
    _churn(spark, out, rounds=2, start=10)
    # v_old's file was compacted away and vacuumed — the lease would
    # promise a read that can never succeed
    with pytest.raises(ValueError, match="no longer re-readable"):
        pin_version(out, v_old)


def test_unpin_without_active_pin_refused(spark, tmp_path):
    out = str(tmp_path / "p4")
    publish_batch(spark, {"t": _batch(spark, 0, 10)}, out, pks=PK)
    with pytest.raises(ValueError, match="no active pin"):
        unpin_version(out, 1)


def test_pin_commit_on_checkpoint_boundary(spark, tmp_path, monkeypatch):
    # a pin landing exactly on a CHECKPOINT_EVERY-th version takes the
    # full-snapshot commit form — the pin field must persist there too
    monkeypatch.setattr(pub, "CHECKPOINT_EVERY", 2)
    out = str(tmp_path / "p5")
    publish_batch(spark, {"t": _batch(spark, 0, 10)}, out, pks=PK)
    while (read_manifest(out)["version"] + 1) % 2 != 0:
        publish_batch(
            spark,
            {"t": _batch(spark, 100, 110)},
            out,
            pks=PK,
        )
    v = read_manifest(out)["version"]
    pin_version(out, v, name="ckpt")
    assert (v + 1) % 2 == 0  # the pin commit itself was a checkpoint
    assert pinned_versions(out) == {v: "ckpt"}


def test_dataset_snapshot_pin_flag(spark, tmp_path):
    from pyspark.sql import functions as F

    from chainweb_data_spark.streaming.curation import dataset_snapshot

    out = str(tmp_path / "p6")
    docs = spark.range(0, 20).select(
        F.col("id").alias("doc_id"), F.lit("body text").alias("text")
    )
    publish_batch(
        spark, {"curated_docs": docs}, out, pks={"curated_docs": ("doc_id",)}
    )
    v, df = dataset_snapshot(spark, out, pin=True)
    assert df.count() == 20
    assert pinned_versions(out) == {v: "dataset_snapshot"}
