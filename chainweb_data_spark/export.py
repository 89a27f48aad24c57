"""Training-shard export — the last mile between a curated corpus and a
training job: write the epoch in seeded-shuffled order as N self-contained
shard directories plus a verifiable manifest.

Everything upstream of this module produces DataFrames; a trainer consumes
FILES in a defined order with an integrity story.  This sink bridges the
two with the repo's determinism discipline:

- **Order** is ``operators/text.py shuffle_shards`` — the seeded md5
  permutation (replay- and engine-exact); reading shards ascending and
  rows by ``pos`` within each IS the shuffled epoch.  Re-exporting with
  the same seed reproduces the same assignment; changing the seed
  reshuffles without touching upstream data.
- **Layout** is one ``shard=NNNNN`` partition directory per shard, rows
  written pre-sorted by ``pos`` (the ``repartition(shard) →
  sortWithinPartitions`` shape — the only wide edge, no global sort at
  any scale; pick ``n_shards`` ≥ trainer parallelism).
- **Integrity** is ``_export_manifest.json``: per-shard row counts and an
  ORDER-INVARIANT content checksum (sum over rows of
  ``xxhash64(struct(pos, columns))`` in DECIMAL — exact integer
  arithmetic, so partition order can never change it).
  ``read_training_shards(verify=True)`` recomputes and refuses a
  truncated, tampered, or partially-written export — the check a trainer
  runs once before burning GPU-hours on a corrupt corpus.

Reference parity: none (the reference serves queries; it has no training
export).  This extends the beyond-reference pipeline suite: curate →
snapshot (``dataset_snapshot``) → pack/encode → **export**.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.text import shuffle_shards

MANIFEST_NAME = "_export_manifest.json"


def _shard_stats(sharded: DataFrame, columns: list[str]) -> DataFrame:
    content = F.xxhash64(F.struct(F.col("pos"), *[F.col(c) for c in columns]))
    return sharded.groupBy("shard").agg(
        F.count("*").alias("rows"),
        F.sum(content.cast("decimal(38,0)")).alias("checksum"),
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
    columns: list[str] | None = None,
) -> dict:
    """Export ``df`` as ``n_shards`` shuffled shard directories under
    ``out_dir`` + a verifiable manifest; returns the manifest dict.

    ``columns`` selects what ships (default: every input column); the
    export adds ``shard`` (partition directory) and ``pos`` (the row's
    position in the shuffled epoch order).  Refuses an ``out_dir`` that
    already holds an export — shards are immutable artifacts; write a new
    directory per epoch/version instead of mutating one in place."""
    if os.path.exists(os.path.join(out_dir, MANIFEST_NAME)):
        raise ValueError(
            f"write_training_shards: {out_dir!r} already holds an export — "
            "shard artifacts are immutable; export to a fresh directory"
        )
    columns = list(columns) if columns is not None else list(df.columns)
    sharded = shuffle_shards(df.select(*columns), id_col, n_shards, seed)
    out_cols = ["shard", "pos", *columns]
    (
        sharded.select(*out_cols)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .parquet(out_dir)
    )
    stats = {
        int(r["shard"]): {"rows": int(r["rows"]), "checksum": str(r["checksum"])}
        for r in _shard_stats(sharded, columns).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "columns": columns,
        "total_rows": sum(s["rows"] for s in stats.values()),
        "shards": {str(k): stats[k] for k in sorted(stats)},
    }
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.rename(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest


def read_training_shards(
    spark: SparkSession, out_dir: str, verify: bool = True
) -> DataFrame:
    """Read an export back (``shard`` partition column restored; iterate
    ascending (shard, pos) for the epoch order).  ``verify`` recomputes
    every shard's row count and order-invariant checksum against the
    manifest and REFUSES on any mismatch — truncated files, a lost shard
    directory, or edited rows all surface here, before training."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    df = spark.read.parquet(out_dir)
    if verify:
        got = {
            int(r["shard"]): (int(r["rows"]), str(r["checksum"]))
            for r in _shard_stats(df, manifest["columns"]).collect()
        }
        want = {
            int(k): (v["rows"], v["checksum"])
            for k, v in manifest["shards"].items()
        }
        if got != want:
            missing = sorted(set(want) - set(got))
            extra = sorted(set(got) - set(want))
            drifted = sorted(
                k for k in set(got) & set(want) if got[k] != want[k]
            )
            raise ValueError(
                "read_training_shards: export fails verification — "
                f"missing shards {missing}, unexpected shards {extra}, "
                f"content drift in {drifted}"
            )
    return df
