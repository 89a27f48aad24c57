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
    chain: dict | None = None,
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
    if chain is not None:
        manifest["chain"] = chain
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


# ---------------------------------------------------------------------------
# snapshot-chained incremental export
# ---------------------------------------------------------------------------


def _manifest_sha256(export_dir: str) -> str:
    import hashlib

    with open(os.path.join(export_dir, MANIFEST_NAME), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _load_manifest(export_dir: str) -> dict:
    with open(os.path.join(export_dir, MANIFEST_NAME)) as f:
        return json.load(f)


def export_dataset_snapshot(
    spark: SparkSession,
    store_dir: str,
    out_dir: str,
    n_shards: int,
    version: int | None = None,
    parent_dir: str | None = None,
    table: str = "curated_docs",
    id_col: str = "doc_id",
    seed: str = "",
    columns: list[str] | None = None,
    keep_parent_pin: bool = False,
) -> dict:
    """Export a curation store's ``dataset_snapshot`` version as training
    shards — FULL when ``parent_dir`` is None, INCREMENTAL otherwise:
    only the documents added between the parent export's snapshot version
    and this one ship, as a new shard directory whose manifest records
    the chain (parent path, parent manifest sha256, version range).  An
    epoch-over-time becomes a series of immutable deltas instead of
    repeated full rewrites — O(new docs) per export at any corpus size
    (the delta is one PK anti-join between two log versions, pruned the
    same way the sink's duplicate probe is).

    Refusals: an unchanged range (parent already at this version, or a
    zero-row delta) is a loud no-op refusal, NOT an empty export — a
    trainer polling for "new data since v" must distinguish "nothing new"
    from "new empty link"; a parent without chain metadata refuses (plain
    write_training_shards exports are not version-addressed, so a delta
    against them is undefined); a parent exported from a DIFFERENT store
    or table refuses (a delta between unrelated version counters would
    silently ship the wrong dataset).

    Retention: the exported ``to_v`` is PINNED in the store's log
    (``pin_version``, lease named ``export:<out_dir>``) so a later
    incremental export chaining FROM this one can still derive its delta
    after any number of compaction/vacuum cycles — without the pin,
    maintenance past ``MAINT_KEEP_VERSIONS`` reclaims the base version's
    files and the chain dead-ends (r8 verdict #6).  A successful
    incremental RELEASES the parent export's lease (superseded — future
    deltas chain from the newest link) unless ``keep_parent_pin=True`` or
    the parent's version carries a differently-named pin.  Returns the
    manifest."""
    from .streaming.publish import (
        pin_version,
        pinned_versions,
        read_manifest,
        read_published,
        unpin_version,
    )

    to_v = read_manifest(store_dir, version=version)["version"]
    cur = read_published(spark, store_dir, table, version=to_v)
    if cur is None:
        raise ValueError(
            f"export_dataset_snapshot: no {table} at {store_dir!r} "
            f"version {to_v}"
        )
    # the lease registry is ONE pin per version (last name wins, unpin
    # releases it regardless of name) — so take the export lease only when
    # the version is unprotected; an existing pin (e.g. the producer's
    # dataset_snapshot(pin=True)) already holds the files, and re-pinning
    # would let a later release of EITHER lease silently drop the other's
    lease = f"export:{os.path.abspath(out_dir)}"
    we_pinned = to_v not in pinned_versions(store_dir)
    if we_pinned:
        pin_version(store_dir, to_v, name=lease)
    try:
        if parent_dir is None:
            return write_training_shards(
                cur,
                out_dir,
                n_shards,
                id_col=id_col,
                seed=seed,
                columns=columns,
                chain={
                    "store": os.path.abspath(store_dir),
                    "table": table,
                    "store_version": to_v,
                    "from_version": None,
                    "parent": None,
                },
            )
        parent = _load_manifest(parent_dir)
        pchain = parent.get("chain")
        if pchain is None or "store_version" not in pchain:
            raise ValueError(
                "export_dataset_snapshot: parent export carries no chain "
                "metadata (plain write_training_shards output?) — a version "
                "delta against it is undefined"
            )
        if pchain.get("store") != os.path.abspath(store_dir) or (
            pchain.get("table") != table
        ):
            raise ValueError(
                "export_dataset_snapshot: parent export's chain points at "
                f"store {pchain.get('store')!r} table "
                f"{pchain.get('table')!r}, not {os.path.abspath(store_dir)!r}"
                f" table {table!r} — a delta between unrelated version "
                "counters would ship the wrong dataset (refused)"
            )
        from_v = int(pchain["store_version"])
        if from_v >= to_v:
            raise ValueError(
                f"export_dataset_snapshot: unchanged range — parent already "
                f"covers version {from_v}, store is at {to_v}; nothing to "
                "export (no-op refused)"
            )
        _check_version_readable(store_dir, table, from_v)
        prev = read_published(spark, store_dir, table, version=from_v)
        delta = (
            cur.join(prev.select(id_col), id_col, "left_anti")
            if prev is not None
            else cur
        )
        if delta.isEmpty():
            raise ValueError(
                f"export_dataset_snapshot: versions {from_v}->{to_v} added "
                f"no {table} rows; nothing to export (no-op refused)"
            )
        manifest = write_training_shards(
            delta,
            out_dir,
            n_shards,
            id_col=id_col,
            seed=seed,
            columns=columns,
            chain={
                "store": os.path.abspath(store_dir),
                "table": table,
                "store_version": to_v,
                "from_version": from_v,
                "parent": os.path.abspath(parent_dir),
                "parent_manifest_sha256": _manifest_sha256(parent_dir),
            },
        )
    except BaseException:
        # the export never shipped — release its lease so a refused/failed
        # attempt can't leak a permanent retention hold on the store (only
        # the lease THIS call took; never a pre-existing one)
        if we_pinned and pinned_versions(store_dir).get(to_v) == lease:
            unpin_version(store_dir, to_v)
        raise
    if not keep_parent_pin:
        parent_lease = f"export:{os.path.abspath(parent_dir)}"
        if pinned_versions(store_dir).get(from_v) == parent_lease:
            unpin_version(store_dir, from_v)
    return manifest


def _check_version_readable(store_dir: str, table: str, version: int) -> None:
    """Refuse an incremental export whose base version's files were
    reclaimed (the user explicitly unpinned and vacuum ran): without this
    the delta derivation dies mid-scan with a raw FileNotFound deep in a
    Spark job — surface the provenance story instead."""
    from .streaming.publish import read_manifest

    snap = read_manifest(store_dir, version=version)
    tdir = os.path.join(store_dir, f"{table}.parquet")
    for rel in snap["tables"].get(table, []):
        if not os.path.exists(os.path.join(tdir, rel)):
            raise ValueError(
                f"export_dataset_snapshot: base version {version} of "
                f"{table!r} is no longer re-readable ({rel} was vacuumed) — "
                "its export lease was released; re-export FULL or chain "
                "from a link whose version is still pinned"
            )


def read_training_chain(
    spark: SparkSession, out_dir: str, verify: bool = True
) -> DataFrame:
    """Read a chained export back as ONE DataFrame — the union of every
    link from the root full export to ``out_dir``'s delta, with an
    ``export_step`` column (0 = root; iterate ascending (export_step,
    shard, pos) for the epoch order).  ``verify`` checks BOTH layers per
    link: the shard checksums (``read_training_shards``) and the chain
    linkage — each child records its parent's manifest sha256 at export
    time, so a parent manifest swapped or regenerated after the child
    shipped refuses here, not silently trains on a different base."""
    dirs: list[str] = []
    d: str | None = out_dir
    seen: set[str] = set()
    while d is not None:
        key = os.path.abspath(d)
        if key in seen:
            raise ValueError(
                f"read_training_chain: parent cycle at {d!r}"
            )
        seen.add(key)
        dirs.append(d)
        man = _load_manifest(d)
        chain = man.get("chain") or {}
        parent = chain.get("parent")
        if parent is not None and verify:
            want = chain.get("parent_manifest_sha256")
            got = _manifest_sha256(parent)
            if want != got:
                raise ValueError(
                    "read_training_chain: parent manifest of "
                    f"{d!r} changed since this link was exported "
                    f"(recorded sha256 {want}, found {got}) — the chain "
                    "no longer describes the dataset that was shipped"
                )
            pchain = _load_manifest(parent).get("chain") or {}
            if (pchain.get("store"), pchain.get("table")) != (
                chain.get("store"),
                chain.get("table"),
            ):
                raise ValueError(
                    f"read_training_chain: link {d!r} chains store "
                    f"{chain.get('store')!r} table {chain.get('table')!r} "
                    f"but its parent exported store {pchain.get('store')!r} "
                    f"table {pchain.get('table')!r} — links from unrelated "
                    "stores do not form one dataset"
                )
        d = parent
    dirs.reverse()  # root first
    out: DataFrame | None = None
    for step, link in enumerate(dirs):
        df = read_training_shards(spark, link, verify=verify).withColumn(
            "export_step", F.lit(step)
        )
        out = df if out is None else out.unionByName(df)
    return out
