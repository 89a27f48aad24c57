"""Spilled mega-delta commits (streaming/publish.py, r12): past
``DELTA_SIDECAR_MIN_FILES`` changed files a delta commit's add/remove
lists spill into a ``delta-v<N>-*.parquet`` sidecar and the commit JSON
stays O(1) bytes + O(#tables) counts — a format migration at the
10^5–10^6-file regime must not inline the whole table's file list into
a v<N>.json that every subsequent resolve re-parses.

The load-bearing property: a SPILLED store is value-identical to an
INLINE twin with the same commit history, on every consumer — driver
resolve, per-table read, cluster-side DataFrame resolve, metadata count
folds, history, race-window conflict detection."""

import json
import os
import time

import pytest

import chainweb_data_spark.streaming.publish as pub


def _grow_twin(out, spill):
    """Seed + 3 small deltas + one mega rewrite (remove ALL of t, add 8)
    + 2 more small deltas — identical histories either way."""
    os.makedirs(out)
    pub._write_manifest(
        out,
        {"version": 1,
         "tables": {"t": [f"b=0/s{k}.parquet" for k in range(4)]},
         "op": "seed"},
    )
    for i in range(3):
        pub._commit_delta(
            out, pub._latest_version(out) + 1,
            {"t": [f"b={i % 2}/p{i}.parquet"], "u": [f"u{i}.parquet"]},
            {},
            {"t": {f"b={i % 2}/p{i}.parquet": {"id": [i, i + 9]}}},
            op="publish",
        )
    pub._SNAP_CACHE.clear()
    livet = pub._snapshot_files(out, pub._latest_version(out))["t"]
    pub._commit_delta(
        out, pub._latest_version(out) + 1,
        {"t": [f"b=9/r{k}.parquet" for k in range(8)]},
        {"t": livet},
        {"t": {f"b=9/r{k}.parquet": {"id": [k, k]} for k in range(8)}},
        op="rewrite",
    )
    for i in range(3, 5):
        pub._commit_delta(
            out, pub._latest_version(out) + 1,
            {"u": [f"u{i}.parquet"]}, {"u": [f"u{i - 3}.parquet"]}, {},
            op="publish",
        )


@pytest.fixture
def twins(tmp_path, monkeypatch):
    outs = {}
    for mode, thr in (("inline", 10 ** 9), ("spill", 5)):
        monkeypatch.setattr(pub, "DELTA_SIDECAR_MIN_FILES", thr)
        out = str(tmp_path / mode)
        _grow_twin(out, spill=mode == "spill")
        outs[mode] = out
    pub._SNAP_CACHE.clear()
    return outs


def test_mega_delta_commit_json_is_o1_bytes(twins):
    c = pub._load_commit(twins["spill"], 5)
    assert "delta" in c and "add" not in c and "remove" not in c
    assert len(json.dumps(c)) < 300  # O(1) + O(#tables) counts
    assert c["n_add_by_table"] == {"t": 8}
    assert c["n_remove_by_table"] == {"t": 7}
    # the sidecar exists, version-named, durable in _manifest
    assert os.path.isfile(
        os.path.join(twins["spill"], "_manifest", c["delta"])
    )
    # the inline twin recorded the same change the heavy way
    ci = pub._load_commit(twins["inline"], 5)
    assert len(ci["add"]["t"]) == 8 and len(ci["remove"]["t"]) == 7


def test_spilled_store_resolves_identically_to_inline_twin(twins):
    latest = pub._latest_version(twins["spill"])
    for v in range(1, latest + 1):
        pub._SNAP_CACHE.clear()
        a = pub._snapshot_files(twins["inline"], v)
        b = pub._snapshot_files(twins["spill"], v)
        assert {t: sorted(f) for t, f in a.items()} == {
            t: sorted(f) for t, f in b.items()
        }, v
        assert pub._store_n_files(twins["inline"], v) == pub._store_n_files(
            twins["spill"], v
        ), v
        assert pub._store_table_counts(
            twins["inline"], v
        ) == pub._store_table_counts(twins["spill"], v), v
    # stats fold through the spill (stats ride the sidecar's add rows)
    pub._SNAP_CACHE.clear()
    assert (
        pub._resolve(twins["inline"], latest)["stats"]
        == pub._resolve(twins["spill"], latest)["stats"]
    )
    # per-table read hydrates only that table (parquet predicate)
    assert pub._table_files(
        twins["inline"], latest, "t", with_stats=True
    ) == pub._table_files(twins["spill"], latest, "t", with_stats=True)


def test_spilled_store_history_and_race_detection(twins):
    ha, hb = pub.history(twins["inline"]), pub.history(twins["spill"])
    assert [(e["added"], e["removed"], e["kind"]) for e in ha] == [
        (e["added"], e["removed"], e["kind"]) for e in hb
    ]
    # race-window adds fold from the sidecar, never a snapshot diff
    def boom(*a, **k):
        raise AssertionError("race detection resolved a full snapshot")

    orig = pub._snapshot_files
    pub._snapshot_files = boom
    try:
        a = pub._added_between(twins["inline"], 3, 6)
        b = pub._added_between(twins["spill"], 3, 6)
    finally:
        pub._snapshot_files = orig
    assert {t: sorted(f) for t, f in a.items()} == {
        t: sorted(f) for t, f in b.items()
    }
    assert set(a["t"]) >= {f"b=9/r{k}.parquet" for k in range(8)}


def test_cluster_resolve_reads_spill_with_spark(spark, twins, monkeypatch):
    """snapshot_files_df must fold a spilled delta by READING the
    sidecar with Spark — the driver never hydrates the spilled list
    (pyarrow hydration is bombed for the duration)."""
    latest = pub._latest_version(twins["spill"])

    def boom(out_dir, commit, table=None, with_stats=True):
        if "delta" in commit:
            raise AssertionError(
                "cluster resolve hydrated a spilled delta driver-side"
            )
        return commit

    monkeypatch.setattr(pub, "_hydrate_delta", boom)
    for v in (4, 5, latest):
        rows = sorted(
            (r["table"], r["file"])
            for r in pub.snapshot_files_df(
                spark, twins["spill"], v
            ).collect()
        )
        # the bomb stays armed for every version; the truth side below
        # reads the INLINE twin, which has no spilled commits to trip it
        pub._SNAP_CACHE.clear()
        truth = sorted(
            (t, f)
            for t, fs in pub._snapshot_files(twins["inline"], v).items()
            for f in fs
        )
        assert rows == truth, v


def test_checkpoint_crosses_spilled_delta_on_both_builders(
    spark, twins, monkeypatch
):
    """Both checkpoint builders (driver resolve, cluster _snapshot_df)
    must fold a spilled delta in their ancestry into an identical
    sidecar snapshot."""
    for mode, sp in (("inline", None), ("spill", spark)):
        out = twins[mode]
        if sp is not None:
            monkeypatch.setattr(pub, "CLUSTER_PATH_MIN_FILES", 0)
        while pub._latest_version(out) < pub.CHECKPOINT_EVERY:
            i = pub._latest_version(out)
            pub._commit_delta(
                out, i + 1, {"u": [f"uu{i}.parquet"]}, {}, {},
                op="publish", spark=sp,
            )
    cks = {
        m: pub._load_commit(twins[m], pub.CHECKPOINT_EVERY)
        for m in twins
    }
    for key in ("n_files", "table_names", "n_files_by_table"):
        assert cks["inline"][key] == cks["spill"][key], key
    pub._SNAP_CACHE.clear()
    assert pub._snapshot_files(
        twins["inline"], pub.CHECKPOINT_EVERY
    ) == pub._snapshot_files(twins["spill"], pub.CHECKPOINT_EVERY)


def test_mega_delta_on_checkpoint_boundary_spills(tmp_path, monkeypatch):
    """A mega-rewrite landing exactly ON a checkpoint version spills its
    own delta too: the ckpt JSON carries delta+counts, not the list, and
    race detection still folds O(delta)."""
    monkeypatch.setattr(pub, "DELTA_SIDECAR_MIN_FILES", 5)
    out = str(tmp_path / "ckb")
    os.makedirs(out)
    pub._write_manifest(
        out,
        {"version": 1,
         "tables": {"t": [f"b=0/s{k}.parquet" for k in range(6)]},
         "op": "seed"},
    )
    while pub._latest_version(out) < pub.CHECKPOINT_EVERY - 1:
        i = pub._latest_version(out)
        pub._commit_delta(
            out, i + 1, {"u": [f"u{i}.parquet"]}, {}, {}, op="publish"
        )
    pub._SNAP_CACHE.clear()
    livet = pub._snapshot_files(out, pub._latest_version(out))["t"]
    pub._commit_delta(
        out, pub.CHECKPOINT_EVERY,
        {"t": [f"b=9/r{k}.parquet" for k in range(8)]},
        {"t": livet}, {}, op="rewrite",
    )
    c = pub._load_commit(out, pub.CHECKPOINT_EVERY)
    assert "ckpt" in c and "delta" in c and "add" not in c
    assert c["n_add_by_table"] == {"t": 8}
    assert c["n_remove_by_table"] == {"t": 6}

    def boom(*a, **k):
        raise AssertionError("race detection resolved a full snapshot")

    orig = pub._snapshot_files
    pub._snapshot_files = boom
    try:
        added = pub._added_between(
            out, pub.CHECKPOINT_EVERY - 2, pub.CHECKPOINT_EVERY
        )
    finally:
        pub._snapshot_files = orig
    assert added["t"] == sorted(f"b=9/r{k}.parquet" for k in range(8))


def test_vacuum_reclaims_orphan_delta_spills_keeps_referenced(
    twins,
):
    """A commit-race loser's delta spill is an orphan vacuum reclaims by
    its embedded version; the referenced spill is metadata and is NEVER
    deleted (time-travel reads replay it)."""
    out = twins["spill"]
    mdir = os.path.join(out, "_manifest")
    ref = pub._load_commit(out, 5)["delta"]
    orphan = os.path.join(mdir, "delta-v3-deadbeef0000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"x")
    old = time.time() - 10 ** 6
    os.utime(orphan, (old, old))
    removed = pub.vacuum(out, keep_versions=99, spark=None)
    assert any("delta-v3-deadbeef0000" in r for r in removed)
    assert not os.path.exists(orphan)
    assert os.path.exists(os.path.join(mdir, ref))
    # an in-flight spill (version ahead of latest) gets the grace window
    ahead = os.path.join(
        mdir, f"delta-v{pub._latest_version(out) + 1}-ffff00001111.parquet"
    )
    with open(ahead, "wb") as f:
        f.write(b"x")
    pub.vacuum(out, keep_versions=99, min_age_s=0, spark=None)
    assert os.path.exists(ahead), "in-flight delta spill reclaimed"
    # time-travel still replays the spilled rewrite after the vacuum
    pub._SNAP_CACHE.clear()
    snap = pub._snapshot_files(out, 5)
    assert snap["t"] == sorted(f"b=9/r{k}.parquet" for k in range(8))


def test_legacy_full_form_route_spills_too(tmp_path, monkeypatch):
    """r12 review: a whole-table rewrite handed to _write_manifest as a
    FULL target snapshot (the legacy route) must spill past the
    threshold exactly like the delta-form route."""
    monkeypatch.setattr(pub, "DELTA_SIDECAR_MIN_FILES", 5)
    out = str(tmp_path / "lf")
    os.makedirs(out)
    pub._write_manifest(
        out,
        {"version": 1,
         "tables": {"t": [f"b=0/s{k}.parquet" for k in range(6)]},
         "op": "seed"},
    )
    pub._write_manifest(
        out,
        {"version": 2,
         "tables": {"t": [f"b=1/n{k}.parquet" for k in range(6)]},
         "op": "rewrite"},
    )
    c = pub._load_commit(out, 2)
    assert "delta" in c and "add" not in c and "remove" not in c
    assert c["n_add_by_table"] == {"t": 6}
    assert c["n_remove_by_table"] == {"t": 6}
    pub._SNAP_CACHE.clear()
    assert pub._snapshot_files(out, 2)["t"] == sorted(
        f"b=1/n{k}.parquet" for k in range(6)
    )


def test_hydrate_delta_prunes_stats_for_setonly_consumers(
    twins, monkeypatch
):
    """r12 review: file-set folds (with_stats=False) must never
    deserialize the spill sidecar's stats column — the dominant
    payload."""
    calls = []
    orig = pub.LOG_STORE.read_parquet

    def spy(path, columns=None, filters=None):
        calls.append((os.path.basename(path), tuple(columns or ())))
        return orig(path, columns=columns, filters=filters)

    monkeypatch.setattr(pub.LOG_STORE, "read_parquet", spy)
    pub._SNAP_CACHE.clear()
    pub._snapshot_files(twins["spill"], 6)  # set-only resolve
    pub._added_between(twins["spill"], 4, 6)
    spill_reads = [c for c in calls if c[0].startswith("delta-v")]
    assert spill_reads, "spill sidecar never read"
    assert all("stats" not in cols for _n, cols in spill_reads), spill_reads
    # the stats-bearing resolve still fetches them
    calls.clear()
    pub._SNAP_CACHE.clear()
    pub._resolve(twins["spill"], 6)
    assert any(
        "stats" in cols
        for n, cols in calls
        if n.startswith("delta-v")
    )


def test_vacuum_reclaims_crash_leaked_stage_tmps(twins):
    """r12 review: a hard kill between staging and finalize leaves a
    hidden .tmp beside the log; vacuum age-gates and reclaims it, and
    never touches a fresh (in-flight) stage."""
    out = twins["spill"]
    mdir = os.path.join(out, "_manifest")
    old_tmp = os.path.join(mdir, ".ckpt-v9-aaaa.parquet.deadbeef.tmp")
    fresh_tmp = os.path.join(mdir, ".ckpt-v9-bbbb.parquet.cafef00d.tmp")
    for p in (old_tmp, fresh_tmp):
        with open(p, "wb") as f:
            f.write(b"x")
    old = time.time() - 10 ** 6
    os.utime(old_tmp, (old, old))
    removed = pub.vacuum(out, keep_versions=99, spark=None)
    assert any(".deadbeef.tmp" in r for r in removed)
    assert not os.path.exists(old_tmp)
    assert os.path.exists(fresh_tmp)


def test_failed_sidecar_write_leaves_no_stage_litter(
    tmp_path, monkeypatch
):
    """r12 review: ENOSPC mid-write (simulated) must not leave hidden
    .tmp litter beside the log."""
    out = str(tmp_path / "ns")
    os.makedirs(os.path.join(out, "_manifest"))
    import pyarrow.parquet as pq_mod

    def boom(*a, **k):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(pq_mod, "write_table", boom)
    with pytest.raises(OSError):
        pub._write_delta_sidecar(
            os.path.join(out, "_manifest"), 5,
            {"t": ["a.parquet"]}, {}, {},
        )
    monkeypatch.undo()
    litter = [
        f for f in os.listdir(os.path.join(out, "_manifest"))
        if f.endswith(".tmp")
    ]
    assert litter == [], litter
    # write_atomic's own failure path cleans up too (bomb the final
    # rename — the test runs as root, so permission bits can't simulate
    # the failure)
    store = pub.LOG_STORE
    d = tmp_path / "wa"
    d.mkdir()

    def boom_rename(src, dst):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(os, "rename", boom_rename)
    try:
        with pytest.raises(OSError):
            store.write_atomic(str(d / "x.json"), b"data")
    finally:
        monkeypatch.undo()
    assert list(d.iterdir()) == []


def test_conflict_detection_never_opens_spill_sidecar(twins, monkeypatch):
    """r12: race-window conflict detection answers from the spilled
    commit's add_dirs_by_table JSON — the sidecar read is bombed, and
    the dirs fold must agree with the file-level reference fold on the
    inline twin."""
    c = pub._load_commit(twins["spill"], 5)
    assert c["add_dirs_by_table"] == {"t": ["b=9"]}

    def boom(path, columns=None, filters=None):
        raise AssertionError(
            "conflict detection opened the spill sidecar"
        )

    monkeypatch.setattr(pub.LOG_STORE, "read_parquet", boom)
    dirs = pub._added_dirs_between(twins["spill"], 3, 6)
    monkeypatch.undo()
    ref = {
        t: {os.path.dirname(f) for f in fs}
        for t, fs in pub._added_between(twins["inline"], 3, 6).items()
    }
    assert {t: d for t, d in dirs.items()} == ref
    # staged work colliding / not colliding with the rewrite's buckets
    hit = pub._conflicting_tables(
        twins["spill"], 3, 6, {"t": (["b=9/mine.parquet"], {})}
    )
    miss = pub._conflicting_tables(
        twins["spill"], 3, 6, {"t": (["b=7/mine.parquet"], {})}
    )
    assert hit == {"t"} and miss == set()


def test_overcap_spill_dirs_go_wildcard(tmp_path, monkeypatch):
    """A spilled rewrite spanning more than DELTA_DIRS_CAP directories
    stores null and conservatively conflicts with any same-table
    stage."""
    monkeypatch.setattr(pub, "DELTA_SIDECAR_MIN_FILES", 5)
    monkeypatch.setattr(pub, "DELTA_DIRS_CAP", 3)
    out = str(tmp_path / "oc")
    os.makedirs(out)
    pub._write_manifest(
        out, {"version": 1, "tables": {"t": ["b=0/s.parquet"]},
              "op": "seed"},
    )
    pub._commit_delta(
        out, 2,
        {"t": [f"b={k}/n.parquet" for k in range(1, 7)]}, {}, {},
        op="rewrite",
    )
    c = pub._load_commit(out, 2)
    assert c["add_dirs_by_table"] == {"t": None}
    assert pub._added_dirs_between(out, 1, 2) == {"t": None}
    hit = pub._conflicting_tables(
        out, 1, 2, {"t": (["b=99/mine.parquet"], {})}
    )
    assert hit == {"t"}
