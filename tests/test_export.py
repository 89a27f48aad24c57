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
