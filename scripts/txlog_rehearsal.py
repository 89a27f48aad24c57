"""Commit-cost rehearsal for the transaction log (streaming/publish.py).

The question a 100 TB table asks of its metadata layer: what does ONE
commit cost when the table already holds N live files?  The v5 manifest
rewrote the complete O(N) file list every batch; the log writes O(delta)
with an O(N) checkpoint every CHECKPOINT_EVERY-th commit.  This rehearsal
measures both schemes at a simulated large-table file count — metadata
only, no Spark: the cost under test is JSON bytes + fsync, which is
exactly what an object-store commit pays.

Output: one JSON line {live_files, n_commits, schemes: {log: {...},
full_rewrite: {...}}} with per-commit bytes written (mean), total bytes,
wall seconds, and worst-case snapshot-resolve time for the log.

Usage: python scripts/txlog_rehearsal.py [live_files] [n_commits]

Two Spark-backed modes (r10):

  --bigsweep [n_files]   The 1M-file sweep: a store whose checkpoint
      sidecar names ``n_files`` live files (default 1M), with real
      orphans planted on disk.  Runs vacuum BOTH ways — the classic
      driver path (hydrates O(live files) Python sets) and the r10
      cluster path (``vacuum(spark=...)``: sidecar scanned by Spark,
      distributed disk walk, orphan anti-join, O(orphans) collected) —
      and reports wall seconds + Python-driver RSS growth for each,
      plus the resolve-only comparison (``_snapshot_files`` vs
      ``snapshot_files_df``).  Both must reclaim exactly the planted
      orphans or the row is refused.

  --megarewrite [n_files]   The r12 spilled-delta row: a whole-table
      rewrite committed at ``n_files`` live files, inline (pre-r12)
      vs spilled sidecar form on twin stores — commit JSON bytes,
      commit/resolve/race-fold walls, identical results required.

  --race [rounds]        Two genuinely interleaved writers (threads,
      shared session) publishing to the same table for ``rounds``
      commits each — once on DISJOINT height_bucket partitions (the
      reference's chain-range workers) and once on OVERLAPPING ids with
      shared PKs.  Asserts zero lost rows and zero duplicate PKs in
      both, and reports how many rebases took the verbatim fast path vs
      a conflict re-stage.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from chainweb_data_spark.streaming import publish as pub  # noqa: E402

TABLES = ["blocks", "transactions", "events", "transfers", "signers", "minerkeys"]


def _seed_snapshot(live_files: int) -> dict:
    per = live_files // len(TABLES)
    return {
        t: [f"height_bucket={i % 64}/part-{i:07d}-{t[:4]}.snappy.parquet" for i in range(per)]
        for t in TABLES
    }


def _dir_bytes(mdir: str) -> int:
    # commit JSONs + (r9) parquet checkpoint sidecars — the log's whole
    # metadata footprint
    return sum(
        os.path.getsize(os.path.join(mdir, f))
        for f in os.listdir(mdir)
        if f.endswith(".json") or f.endswith(".parquet")
    )


def run_log(base: str, tables: dict, n_commits: int) -> dict:
    out = os.path.join(base, "log")
    os.makedirs(out)
    pub._write_manifest(out, {"version": 1, "tables": tables, "op": "seed"})
    per_commit: list[tuple[bool, float]] = []
    t0 = time.perf_counter()
    for b in range(n_commits):
        # the r10 writer path: version discovery + a DIRECT delta commit
        # of the files this batch staged (publish_batch's _commit_append)
        # — O(staged files) per commit; checkpoint versions resolve the
        # parent and write the full sidecar form (amortized)
        v = pub._latest_version(out)
        add = {
            t: [f"height_bucket={b % 64}/part-new-{b}-{t[:4]}.parquet"]
            for t in TABLES[:3]  # a block batch touches a few tables
        }
        tc = time.perf_counter()
        pub._commit_append(out, v + 1, add, {}, op="publish")
        per_commit.append(
            ((v + 1) % pub.CHECKPOINT_EVERY == 0, time.perf_counter() - tc)
        )
    wall = time.perf_counter() - t0
    deltas = sorted(s for ck, s in per_commit if not ck)
    ckpts = [s for ck, s in per_commit if ck]
    # worst-case COLD resolve (fresh reader, no snapshot cache): the
    # version just before a checkpoint replays CHECKPOINT_EVERY-1 deltas
    latest = pub._latest_version(out)
    worst = latest - (latest % pub.CHECKPOINT_EVERY) - 1
    pub._SNAP_CACHE.clear()
    t1 = time.perf_counter()
    pub.read_manifest(out, version=max(worst, 1))
    resolve_s = time.perf_counter() - t1
    total = _dir_bytes(os.path.join(out, "_manifest"))
    return {
        "total_meta_bytes": total,
        "bytes_per_commit": round(total / (n_commits + 1)),
        "wall_s": round(wall, 2),
        "commit_ms": round(wall / n_commits * 1000, 2),
        # the split the mean hides: delta commits are O(staged files)
        # regardless of table size (r10 _commit_append); the amortized
        # spikes are the every-16th checkpoint's full-snapshot sidecar
        "delta_commit_ms_p50": round(deltas[len(deltas) // 2] * 1000, 2)
        if deltas
        else None,
        "checkpoint_ms_mean": round(sum(ckpts) / len(ckpts) * 1000, 2)
        if ckpts
        else None,
        "worst_resolve_ms": round(resolve_s * 1000, 2),
    }


def run_full_rewrite(base: str, tables: dict, n_commits: int) -> dict:
    """The v5 scheme: every commit serializes the complete live file list
    (write-tmp + fsync + rename, same durability)."""
    out = os.path.join(base, "full", "_manifest")
    os.makedirs(out)

    def write(version: int, tbls: dict) -> None:
        name = f"v{version:09d}.json"
        tmp = os.path.join(out, f".{name}.tmp")
        with open(tmp, "w") as f:
            json.dump({"version": version, "tables": tbls}, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(out, name))

    cur = {t: list(fs) for t, fs in tables.items()}
    write(1, cur)
    t0 = time.perf_counter()
    for b in range(n_commits):
        for t in TABLES[:3]:
            cur[t].append(f"height_bucket={b % 64}/part-new-{b}-{t[:4]}.parquet")
        write(b + 2, cur)
    wall = time.perf_counter() - t0
    total = _dir_bytes(out)
    return {
        "total_meta_bytes": total,
        "bytes_per_commit": round(total / (n_commits + 1)),
        "wall_s": round(wall, 2),
        "commit_ms": round(wall / n_commits * 1000, 2),
    }


def run_checkpoint_form(base: str, live_files: int) -> dict:
    """r9: price ONE checkpoint in both forms at this file count, WITH
    per-file stats (the dominant payload a real store carries — 12 stat
    columns per file here): inline-JSON (pre-r9) vs parquet sidecar, and
    the file-set read each form offers a consumer that doesn't want
    stats (vacuum's live-set sweep — the sidecar is column-pruned, the
    JSON must parse everything)."""
    tables = _seed_snapshot(live_files)
    stats = {
        t: {
            rel: {f"col_{c}": [i * 1000 + c, i * 1000 + c + 999]
                  for c in range(12)}
            for i, rel in enumerate(fs)
        }
        for t, fs in tables.items()
    }
    d = os.path.join(base, "ckptform")
    os.makedirs(d)
    jpath = os.path.join(d, "inline.json")
    t0 = time.perf_counter()
    with open(jpath, "w") as f:
        json.dump(
            {"version": 16, "ts": 1.0, "op": "write", "tables": tables,
             "stats": stats},
            f, separators=(",", ":"),
        )
    t_jw = time.perf_counter() - t0
    t0 = time.perf_counter()
    name, _n = pub._write_checkpoint_sidecar(d, 16, tables, stats)
    t_pw = time.perf_counter() - t0
    t0 = time.perf_counter()
    json.load(open(jpath))
    t_jr = time.perf_counter() - t0
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    pq.read_table(os.path.join(d, name), columns=["table", "file"])
    t_pr = time.perf_counter() - t0
    jb = os.path.getsize(jpath)
    pb = os.path.getsize(os.path.join(d, name))
    return {
        "inline_json": {"bytes": jb, "write_s": round(t_jw, 3),
                        "full_read_s": round(t_jr, 3)},
        "parquet_sidecar": {"bytes": pb, "write_s": round(t_pw, 3),
                            "pruned_fileset_read_s": round(t_pr, 3)},
        "bytes_ratio": round(jb / pb, 1),
    }


def _vm_rss_mb() -> float:
    """Current (not peak) resident set of THIS Python process, MB."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def run_bigsweep(n_files: int) -> dict:
    """Vacuum planning at ``n_files`` live files, driver path vs the r10
    cluster path, on twin stores with identical planted orphans."""
    from chainweb_data_spark.session import get_spark
    from chainweb_data_spark.streaming import publish as pub10

    spark = get_spark("txlog-bigsweep")
    tables = _seed_snapshot(n_files)
    n_orphans = 512
    report: dict = {"live_files": sum(len(v) for v in tables.values()),
                    "planted_orphans": n_orphans}
    base = tempfile.mkdtemp(prefix="txlog-bigsweep-")
    try:
        # warm the session once (worker pool, codegen, parquet reader) —
        # the number under test is a long-lived maintenance service's
        # steady-state planning cost, not JVM cold-start: a tiny
        # throwaway store runs the full spark-vacuum path untimed
        warm = os.path.join(base, "_warm")
        os.makedirs(warm)
        pub10._write_manifest(
            warm,
            {"version": 1, "tables": _seed_snapshot(600), "op": "seed"},
        )
        pub10.vacuum(warm, keep_versions=0, spark=spark)
        def plant_orphans(out: str) -> list[str]:
            kept = []
            for t in TABLES[:2]:
                tdir = os.path.join(out, f"{t}.parquet")
                for i in range(n_orphans // 2):
                    d = os.path.join(tdir, f"height_bucket={i % 64}")
                    os.makedirs(d, exist_ok=True)
                    with open(
                        os.path.join(d, f"part-orphan-{i:05d}.parquet"), "wb"
                    ) as f:
                        f.write(b"x")
                for rel in tables[t][:8]:
                    full = os.path.join(tdir, rel)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    if not os.path.exists(full):
                        with open(full, "wb") as f:
                            f.write(b"y")
                    kept.append(full)
            return kept

        for mode in ("driver", "spark"):
            out = os.path.join(base, mode)
            os.makedirs(out)
            # v1 checkpoint: the O(n_files) snapshot rides the parquet
            # sidecar; the commit JSON stays O(1)
            pub10._write_manifest(
                out, {"version": 1, "tables": tables, "op": "seed"}
            )
            # two timed sweeps per mode: the FIRST pays one-time plan/
            # codegen warmth this store's shapes haven't seen (the tiny
            # warm store above plans differently — AQE picks other
            # strategies at 600 rows); the SECOND, with orphans
            # replanted, is the steady-state cost a long-lived
            # maintenance service actually pays per cycle.  Both sweeps
            # must reclaim exactly the planted orphans.
            walls = []
            for run in ("cold", "steady"):
                kept = plant_orphans(out)
                pub10._SNAP_CACHE.clear()
                rss0 = _vm_rss_mb()
                t0 = time.perf_counter()
                if mode == "spark":
                    removed = pub10.vacuum(out, keep_versions=0, spark=spark)
                else:
                    removed = pub10.vacuum(out, keep_versions=0)
                walls.append(time.perf_counter() - t0)
                rss1 = _vm_rss_mb()
                assert len(removed) == n_orphans, (mode, run, len(removed))
                assert all(os.path.exists(p) for p in kept), (mode, run)
            report[f"vacuum_{mode}"] = {
                "wall_s": round(walls[1], 3),
                "cold_wall_s": round(walls[0], 3),
                "driver_rss_growth_mb": round(rss1 - rss0, 1),
            }
        # resolve-only comparison at the same version
        out = os.path.join(base, "spark")
        pub10._SNAP_CACHE.clear()
        t0 = time.perf_counter()
        n_drv = sum(len(v) for v in pub10._snapshot_files(out, 1).values())
        t_drv = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_spk = pub10.snapshot_files_df(spark, out, 1).count()
        t_spk = time.perf_counter() - t0
        assert n_drv == n_spk == report["live_files"]
        report["resolve_driver_s"] = round(t_drv, 3)
        report["resolve_spark_s"] = round(t_spk, 3)

        # AUTO-select row (r11): fresh orphans, vacuum() with NO spark
        # argument — past CLUSTER_PATH_MIN_FILES it must route
        # cluster-side by itself off the free n_files metadata
        fresh = []
        for i in range(64):
            d = os.path.join(out, "blocks.parquet", f"height_bucket={i}")
            os.makedirs(d, exist_ok=True)
            p = os.path.join(d, f"part-auto-orphan-{i:03d}.parquet")
            with open(p, "wb") as f:
                f.write(b"x")
            fresh.append(p)
        calls = {"n": 0}
        orig_vds = pub10._vacuum_data_spark

        def counting(*a, **k):
            calls["n"] += 1
            return orig_vds(*a, **k)

        pub10._vacuum_data_spark = counting
        try:
            pub10._SNAP_CACHE.clear()
            t0 = time.perf_counter()
            removed = pub10.vacuum(out, keep_versions=0)
            wall = time.perf_counter() - t0
        finally:
            pub10._vacuum_data_spark = orig_vds
        assert len(removed) == len(fresh), len(removed)
        report["vacuum_auto"] = {
            "wall_s": round(wall, 3),
            "routed": "spark" if calls["n"] else "driver",
            "threshold": pub10.CLUSTER_PATH_MIN_FILES,
        }

        # checkpoint-COMMIT rows (r11): the amortized every-16th commit
        # that used to hydrate the full snapshot on the driver.  Advance
        # each twin store to one version short of the boundary with tiny
        # deltas, then time the checkpoint commit itself — driver-built
        # sidecar vs the cluster-side build
        for mode in ("driver", "spark"):
            st = os.path.join(base, mode)
            while (pub10._latest_version(st) + 1) % pub10.CHECKPOINT_EVERY:
                v = pub10._latest_version(st) + 1
                pub10._commit_delta(
                    st, v,
                    {"blocks": [f"part-delta-{v:04d}.parquet"]}, {}, {},
                    op="publish",
                )
            v_ck = pub10._latest_version(st) + 1
            add = {"blocks": [f"part-ck-{v_ck:04d}.parquet"]}
            pub10._SNAP_CACHE.clear()
            old_thresh = pub10.CLUSTER_PATH_MIN_FILES
            if mode == "spark":
                pub10.CLUSTER_PATH_MIN_FILES = 0  # force at any sweep size
            try:
                rss0 = _vm_rss_mb()
                t0 = time.perf_counter()
                pub10._commit_delta(
                    st, v_ck, add, {}, {}, op="publish",
                    spark=spark if mode == "spark" else None,
                )
                wall = time.perf_counter() - t0
                rss1 = _vm_rss_mb()
            finally:
                pub10.CLUSTER_PATH_MIN_FILES = old_thresh
            c = pub10._load_commit(st, v_ck)
            assert "ckpt" in c, (mode, c)
            report[f"ckpt_commit_{mode}"] = {
                "wall_s": round(wall, 3),
                "driver_rss_growth_mb": round(rss1 - rss0, 1),
                "n_files": c["n_files"],
            }
        assert (
            report["ckpt_commit_driver"]["n_files"]
            == report["ckpt_commit_spark"]["n_files"]
        )

        # MULTI-PART checkpoint row (r11): same cluster build with the
        # part threshold forced low enough to range-partition the
        # sidecar — at 10^8 files this is the difference between one
        # writer task's giant sort+write and N parallel parts; here it
        # measures the shape's overhead/benefit at the sweep's size
        st = os.path.join(base, "spark")
        while (pub10._latest_version(st) + 1) % pub10.CHECKPOINT_EVERY:
            v = pub10._latest_version(st) + 1
            pub10._commit_delta(
                st, v, {"blocks": [f"part-mp-delta-{v:04d}.parquet"]},
                {}, {}, op="publish",
            )
        v_ck = pub10._latest_version(st) + 1
        old_thresh = pub10.CLUSTER_PATH_MIN_FILES
        old_part = pub10.SIDECAR_ROWS_PER_PART
        pub10.CLUSTER_PATH_MIN_FILES = 0
        pub10.SIDECAR_ROWS_PER_PART = max(1, n_files // 8)
        try:
            pub10._SNAP_CACHE.clear()
            t0 = time.perf_counter()
            pub10._commit_delta(
                st, v_ck, {"blocks": [f"part-mp-{v_ck:04d}.parquet"]},
                {}, {}, op="publish", spark=spark,
            )
            wall = time.perf_counter() - t0
        finally:
            pub10.CLUSTER_PATH_MIN_FILES = old_thresh
            pub10.SIDECAR_ROWS_PER_PART = old_part
        c = pub10._load_commit(st, v_ck)
        side = os.path.join(st, "_manifest", c["ckpt"])
        n_parts = (
            len([f for f in os.listdir(side)
                 if not f.startswith(("_", "."))])
            if os.path.isdir(side)
            else 1
        )
        pub10._SNAP_CACHE.clear()
        t0 = time.perf_counter()
        n_resolved = pub10.snapshot_files_df(spark, st, v_ck).count()
        t_res = time.perf_counter() - t0
        assert n_resolved == c["n_files"]
        report["ckpt_commit_spark_multipart"] = {
            "wall_s": round(wall, 3),
            "n_parts": n_parts,
            "resolve_spark_s": round(t_res, 3),
        }

        # ABOVE the 8M-row design point (r12: the 16M sweep) the natural
        # build is already multi-part — measure the INVERSE too: a
        # forced single-part build at the same size, so the threshold's
        # design point (multi-part ≤ single-part wall past 8M rows) is
        # measured rather than extrapolated from the forced-low 4M row
        if n_files > old_part:
            while (pub10._latest_version(st) + 1) % pub10.CHECKPOINT_EVERY:
                v = pub10._latest_version(st) + 1
                pub10._commit_delta(
                    st, v, {"blocks": [f"part-sp-delta-{v:04d}.parquet"]},
                    {}, {}, op="publish",
                )
            v_ck = pub10._latest_version(st) + 1
            pub10.CLUSTER_PATH_MIN_FILES = 0
            pub10.SIDECAR_ROWS_PER_PART = 10 ** 12  # force ONE part
            try:
                pub10._SNAP_CACHE.clear()
                t0 = time.perf_counter()
                pub10._commit_delta(
                    st, v_ck, {"blocks": [f"part-sp-{v_ck:04d}.parquet"]},
                    {}, {}, op="publish", spark=spark,
                )
                wall = time.perf_counter() - t0
            finally:
                pub10.CLUSTER_PATH_MIN_FILES = old_thresh
                pub10.SIDECAR_ROWS_PER_PART = old_part
            c = pub10._load_commit(st, v_ck)
            assert not os.path.isdir(
                os.path.join(st, "_manifest", c["ckpt"])
            ), "single-part force failed"
            report["ckpt_commit_spark_single_forced"] = {
                "wall_s": round(wall, 3),
            }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return report


def run_race(rounds: int) -> dict:
    """Two interleaved writers on one table: disjoint partitions (the
    verbatim-rebase fast path) vs overlapping PKs (conflict re-stage)."""
    import threading

    from pyspark.sql import functions as F

    from chainweb_data_spark.session import get_spark
    from chainweb_data_spark.streaming import publish as pub10

    spark = get_spark("txlog-race")
    PK = {"t": ("id",)}
    report: dict = {"rounds_per_writer": rounds}

    def batch(lo, hi, bucket_base):
        return (
            spark.range(lo, hi)
            .select(
                F.col("id"),
                (F.col("id") * 2).alias("val"),
                (bucket_base + F.col("id") % 4).alias("height_bucket"),
            )
            .coalesce(1)
        )

    for scenario in ("disjoint", "overlap"):
        base = tempfile.mkdtemp(prefix=f"txlog-race-{scenario}-")
        out = os.path.join(base, "store")
        # count conflict decisions by wrapping the detector: each racing
        # retry calls it once; the tables it returns are re-staged, the
        # rest rebase verbatim
        races = {"detector_calls": 0, "tables_restaged": 0}
        orig_conflicts = pub10._conflicting_tables

        def counting(out_dir, old_v, new_v, staged):
            res = orig_conflicts(out_dir, old_v, new_v, staged)
            races["detector_calls"] += 1
            races["tables_restaged"] += len(res)
            return res

        pub10._conflicting_tables = counting
        errors: list = []
        expected: set = set()

        def writer(w: int):
            try:
                for r in range(rounds):
                    if scenario == "disjoint":
                        lo = (r * 2 + w) * 50
                        hi = lo + 50
                        bb = w * 4  # buckets {0..3} vs {4..7}
                    else:
                        lo = r * 100 + w * 25  # 25 shared ids per round
                        hi = lo + 50
                        bb = 0  # same bucket space — PK collisions
                    expected.update(range(lo, hi))
                    pub10.publish_batch(
                        spark, {"t": batch(lo, hi, bb)}, out, pks=PK,
                        max_retries=8,
                    )
            except Exception as e:  # pragma: no cover - rehearsal guard
                errors.append(e)

        try:
            threads = [
                threading.Thread(target=writer, args=(w,)) for w in (0, 1)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            assert not errors, errors
            df = pub10.read_published(spark, out, "t")
            got = {r["id"] for r in df.select("id").collect()}
            dup_pks = (
                df.groupBy("id").count().filter(F.col("count") > 1).count()
            )
            assert got == expected, (
                f"{scenario}: lost {len(expected - got)} rows, "
                f"phantom {len(got - expected)}"
            )
            assert dup_pks == 0, f"{scenario}: {dup_pks} duplicate PKs"
            report[scenario] = {
                "commits": pub10._latest_version(out),
                "rows": len(got),
                "lost_rows": 0,
                "duplicate_pks": 0,
                "conflict_checks": races["detector_calls"],
                "tables_restaged": races["tables_restaged"],
                "verbatim_rebases": races["detector_calls"]
                - races["tables_restaged"],
                "wall_s": round(wall, 2),
            }
        finally:
            pub10._conflicting_tables = orig_conflicts
            shutil.rmtree(base, ignore_errors=True)
    return report


def run_race_spark(rounds: int) -> dict:
    """The r10/r11 CLUSTER paths under genuine interleaving (r11 verdict
    ask): a writer thread publishing micro-batches while a maintenance
    thread loops pin_version(spark=) → vacuum(spark=) → pinned-snapshot
    re-read → unpin — so distributed walks, executor pin probes, and
    checkpoint builds all run while commits land.  Pre-aged orphans are
    planted for the sweeps to reclaim (min_age_s=30 keeps the writer's
    in-flight staging safe, exactly the production configuration).
    Asserts zero lost rows / duplicate PKs, every pinned snapshot
    re-readable while its lease was held, and zero HOLLOW warnings —
    then injects one genuinely hollow lease, which MUST warn."""
    import threading
    import warnings

    from pyspark.sql import functions as F

    from chainweb_data_spark.session import get_spark
    from chainweb_data_spark.streaming import publish as pub10

    spark = get_spark("txlog-race-spark")
    PK = {"t": ("id",)}
    base = tempfile.mkdtemp(prefix="txlog-race-spark-")
    out = os.path.join(base, "store")

    def batch(lo, hi):
        return (
            spark.range(lo, hi)
            .select(
                F.col("id"),
                (F.col("id") * 2).alias("val"),
                (F.col("id") % 4).alias("height_bucket"),
            )
            .coalesce(1)
        )

    report: dict = {"rounds": rounds}
    errors: list = []
    expected: set = set()
    stop = threading.Event()
    stats = {
        "pins": 0,
        "rereads_ok": 0,
        "vacuums": 0,
        "orphans_reclaimed": 0,
        "pin_lost_races": 0,
    }
    hollow: list = []

    # adopt an EMPTY v1 first: once a commit exists, junk planted below
    # is an orphan — with no log it would be adopted as legacy data
    os.makedirs(os.path.join(out, "t.parquet"), exist_ok=True)
    pub10.ensure_manifest(out)
    # pre-aged orphans: reclaimable through min_age_s=30 from the start
    planted = 0
    for i in range(48):
        d = os.path.join(out, "t.parquet", f"height_bucket={i % 4}")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"part-aged-orphan-{i:03d}.parquet")
        with open(p, "wb") as f:
            f.write(b"x")
        os.utime(p, (time.time() - 3600, time.time() - 3600))
        planted += 1

    def writer():
        try:
            for r in range(rounds):
                lo = r * 50
                expected.update(range(lo, lo + 50))
                pub10.publish_batch(
                    spark, {"t": batch(lo, lo + 50)}, out, pks=PK,
                    max_retries=8,
                )
        except Exception as e:  # pragma: no cover - rehearsal guard
            errors.append(e)
        finally:
            stop.set()

    def maintainer():
        try:
            cycle = 0
            while not errors and not stop.is_set():
                v = pub10._latest_version(out)
                if v < 2:
                    time.sleep(0.02)
                    continue
                cycle += 1
                held = None
                try:
                    pub10.pin_version(out, v, name="race", spark=spark)
                    held = v
                    stats["pins"] += 1
                except ValueError:
                    # lost the pin/vacuum race — the LOUD contract
                    stats["pin_lost_races"] += 1
                # vacuum every THIRD cycle (r12 pacing): the full
                # cluster sweep dominated each cycle's wall, capping the
                # rehearsal at ~7 pin→read→unpin cycles per run — the
                # race-window coverage under test is the pin/read/unpin
                # vs writer interleaving, so let those cycles outnumber
                # the sweeps
                if cycle % 3 == 1:
                    with warnings.catch_warnings(record=True) as w:
                        warnings.simplefilter("always")
                        removed = pub10.vacuum(
                            out, keep_versions=1, min_age_s=30.0,
                            spark=spark,
                        )
                    hollow.extend(
                        x for x in w if "HOLLOW" in str(x.message)
                    )
                    stats["vacuums"] += 1
                    stats["orphans_reclaimed"] += len(removed)
                if held is not None:
                    # the lease's promise: the snapshot re-reads fully
                    pub10._SNAP_CACHE.clear()
                    df = pub10.read_published(spark, out, "t", version=held)
                    if df is not None:
                        df.count()
                    stats["rereads_ok"] += 1
                    pub10.unpin_version(out, held)
        except Exception as e:  # pragma: no cover - rehearsal guard
            errors.append(e)

    try:
        threads = [
            threading.Thread(target=writer),
            threading.Thread(target=maintainer),
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert not errors, errors
        assert not hollow, [str(x.message) for x in hollow]
        df = pub10.read_published(spark, out, "t")
        got = {r["id"] for r in df.select("id").collect()}
        dup_pks = (
            df.groupBy("id").count().filter(F.col("count") > 1).count()
        )
        assert got == expected, (
            f"lost {len(expected - got)}, phantom {len(got - expected)}"
        )
        assert dup_pks == 0, f"{dup_pks} duplicate PKs"
        assert stats["orphans_reclaimed"] >= planted, stats

        # injected hollow lease: delete a pinned file mid-lease — the
        # next spark vacuum MUST warn (and name the loss count)
        v_pin = pub10._latest_version(out)
        pub10.pin_version(out, v_pin, name="doomed", spark=spark)
        victim = pub10._snapshot_files(out, v_pin)["t"][0]
        os.remove(os.path.join(out, "t.parquet", victim))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            pub10.vacuum(out, keep_versions=0, min_age_s=30.0, spark=spark)
        injected = [x for x in w if "HOLLOW" in str(x.message)]
        assert injected, "injected hollow lease did not warn"

        report.update(
            {
                "commits": pub10._latest_version(out),
                "rows": len(got),
                "lost_rows": 0,
                "duplicate_pks": 0,
                "planted_aged_orphans": planted,
                **stats,
                "hollow_warnings_unexpected": 0,
                "injected_hollow_warned": True,
                "wall_s": round(wall, 2),
            }
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return report


def run_pinsweep(n_files: int) -> dict:
    """The r12 shared-base row: vacuum over a store with FOUR pinned
    snapshots (all sharing one checkpoint ancestor) — the base_cache
    resolves the ancestor's sidecar once instead of once per retained/
    pinned version.  Timed both ways (cache on = production path; cache
    off = per-version scans, simulated by bypassing the cache seam) on
    the same store; identical reclamation required."""
    from chainweb_data_spark.session import get_spark
    from chainweb_data_spark.streaming import publish as pub12

    spark = get_spark("txlog-pinsweep")
    tables = _seed_snapshot(n_files)
    base = tempfile.mkdtemp(prefix="txlog-pinsweep-")
    out = os.path.join(base, "store")
    os.makedirs(out)
    report: dict = {"live_files": sum(len(v) for v in tables.values())}
    try:
        pub12._write_manifest(
            out, {"version": 1, "tables": tables, "op": "seed"}
        )
        # a few deltas, then pins on four versions (same v1 ancestor)
        for i in range(6):
            v = pub12._latest_version(out) + 1
            add = {"blocks": [f"part-pin-delta-{v:03d}.parquet"]}
            pub12._commit_append(out, v, add, {}, op="publish")
        # materialize ONLY the pinned-delta files (the seed files are
        # synthetic metadata; the pin probe runs executor-side against
        # the full snapshot, so probe via driver path for speed here)
        pins = [2, 4, 6, 7]
        report["pins"] = len(pins)
        for v in pins:
            pub12._commit_pin_op(
                out, "pin", {"version": v, "name": f"lease-{v}"}
            )

        def timed(label, cache_on):
            orig = pub12._snapshot_df

            def uncached(sp, od, ver, with_stats, base_cache=None):
                return orig(
                    sp, od, ver, with_stats,
                    base_cache=base_cache if cache_on else None,
                )

            pub12._snapshot_df = uncached
            try:
                pub12._SNAP_CACHE.clear()
                t0 = time.perf_counter()
                removed = pub12.vacuum(
                    out, keep_versions=1, spark=spark
                )
                report[label] = {
                    "wall_s": round(time.perf_counter() - t0, 3),
                    "removed": len(removed),
                }
            finally:
                pub12._snapshot_df = orig

        timed("vacuum_cache_off", cache_on=False)  # warm plans first
        timed("vacuum_cache_off_steady", cache_on=False)
        timed("vacuum_cache_on", cache_on=True)
        timed("vacuum_cache_on_steady", cache_on=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return report


def run_megarewrite(n_files: int) -> dict:
    """The r12 spilled-delta row: a whole-table rewrite (format
    migration) committed against a store with ``n_files`` live files,
    spilled vs the pre-r12 inline form, on twin stores.  Reports commit
    JSON bytes (the number every subsequent resolve re-parses), commit
    wall, the race-window fold wall (``_added_between`` across the
    rewrite), and the post-rewrite resolve wall — identical results
    required both ways.  Metadata-only, like the base rehearsal: the
    cost under test is JSON/parquet bytes + fsync."""
    from chainweb_data_spark.session import get_spark

    tables = _seed_snapshot(n_files)
    rw_table = TABLES[0]
    new_files = [
        f"height_bucket={i % 64}/rewrite-{i:07d}.zstd.parquet"
        for i in range(len(tables[rw_table]))
    ]
    report: dict = {
        "live_files": sum(len(v) for v in tables.values()),
        "rewritten_files": len(tables[rw_table]),
        "spill_threshold": pub.DELTA_SIDECAR_MIN_FILES,
    }
    base = tempfile.mkdtemp(prefix="txlog-megarw-")
    old_thresh = pub.DELTA_SIDECAR_MIN_FILES
    try:
        for mode in ("inline", "spill"):
            pub.DELTA_SIDECAR_MIN_FILES = (
                10 ** 12 if mode == "inline" else old_thresh
            )
            out = os.path.join(base, mode)
            os.makedirs(out)
            pub._write_manifest(
                out, {"version": 1, "tables": tables, "op": "seed"}
            )
            # a couple of small deltas first, so the rewrite lands
            # off-boundary like a real maintenance op
            for i in range(2):
                pub._commit_delta(
                    out, pub._latest_version(out) + 1,
                    {rw_table: [f"pre-{i}.parquet"]}, {}, {}, op="publish",
                )
            pub._SNAP_CACHE.clear()
            old_live = pub._table_files(out, 3, rw_table, with_stats=False)[0]
            rss0 = _vm_rss_mb()
            t0 = time.perf_counter()
            pub._commit_delta(
                out, 4, {rw_table: new_files}, {rw_table: old_live}, {},
                op="rewrite",
            )
            commit_wall = time.perf_counter() - t0
            c = pub._load_commit(out, 4)
            mdir = os.path.join(out, "_manifest")
            json_bytes = os.path.getsize(os.path.join(mdir, "v000000004.json"))
            side_bytes = (
                os.path.getsize(os.path.join(mdir, c["delta"]))
                if "delta" in c
                else 0
            )
            # the race-window fold across the rewrite: what a concurrent
            # writer's conflict detection pays
            t0 = time.perf_counter()
            added = pub._added_between(out, 2, 4)
            race_wall = time.perf_counter() - t0
            assert len(added[rw_table]) == len(new_files) + 1
            # what a racing writer ACTUALLY pays (r12): conflict
            # detection folds partition DIRS from JSON metadata — the
            # spilled form answers without opening the sidecar
            t0 = time.perf_counter()
            rd = pub._added_dirs_between(out, 2, 4)
            conflict_wall = time.perf_counter() - t0
            assert rd[rw_table] and len(rd[rw_table]) <= 65  # 64 buckets + flat pre-file
            pub._SNAP_CACHE.clear()
            t0 = time.perf_counter()
            snap = pub._snapshot_files(out, 4)
            resolve_wall = time.perf_counter() - t0
            assert sorted(snap[rw_table]) == sorted(new_files)
            report[f"{mode}"] = {
                "commit_json_bytes": json_bytes,
                "sidecar_bytes": side_bytes,
                "commit_wall_s": round(commit_wall, 3),
                "race_fold_wall_s": round(race_wall, 3),
                "conflict_fold_wall_s": round(conflict_wall, 3),
                "resolve_wall_s": round(resolve_wall, 3),
                "driver_rss_growth_mb": round(_vm_rss_mb() - rss0, 1),
            }
        # cluster-side resolve across the spilled rewrite (the sidecar
        # is read by Spark, never hydrated on the driver)
        spark = get_spark("txlog-megarw")
        out = os.path.join(base, "spill")
        t0 = time.perf_counter()
        n = pub.snapshot_files_df(spark, out, 4).count()
        report["spill_resolve_spark_s"] = round(time.perf_counter() - t0, 3)
        assert n == report["live_files"]
        report["json_bytes_ratio"] = round(
            report["inline"]["commit_json_bytes"]
            / report["spill"]["commit_json_bytes"],
            1,
        )
    finally:
        pub.DELTA_SIDECAR_MIN_FILES = old_thresh
        shutil.rmtree(base, ignore_errors=True)
    return report


def main() -> None:
    if "--pinsweep" in sys.argv:
        i = sys.argv.index("--pinsweep")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 1_000_000
        print(json.dumps({"pinsweep": run_pinsweep(n)}))
        return
    if "--megarewrite" in sys.argv:
        i = sys.argv.index("--megarewrite")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 1_000_000
        print(json.dumps({"megarewrite": run_megarewrite(n)}))
        return
    if "--bigsweep" in sys.argv:
        i = sys.argv.index("--bigsweep")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 1_000_000
        print(json.dumps({"bigsweep": run_bigsweep(n)}))
        return
    if "--race" in sys.argv:
        i = sys.argv.index("--race")
        rounds = 12
        if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit():
            rounds = int(sys.argv[i + 1])
        if "--spark" in sys.argv:
            print(json.dumps({"race_spark": run_race_spark(rounds)}))
        else:
            print(json.dumps({"race": run_race(rounds)}))
        return
    live_files = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    tables = _seed_snapshot(live_files)
    base = tempfile.mkdtemp(prefix="txlog-rehearsal-")
    try:
        report = {
            "live_files": live_files,
            "n_commits": n_commits,
            "checkpoint_every": pub.CHECKPOINT_EVERY,
            "schemes": {
                "log": run_log(base, tables, n_commits),
                "full_rewrite": run_full_rewrite(base, tables, n_commits),
            },
            "checkpoint_form": run_checkpoint_form(base, live_files),
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    log_b = report["schemes"]["log"]["total_meta_bytes"]
    full_b = report["schemes"]["full_rewrite"]["total_meta_bytes"]
    report["meta_bytes_ratio"] = round(full_b / log_b, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
