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
    t0 = time.perf_counter()
    for b in range(n_commits):
        snap = pub.read_manifest(out)
        new = {t: fs for t, fs in snap["tables"].items()}
        for t in TABLES[:3]:  # a block batch touches a few tables
            new[t] = new[t] + [f"height_bucket={b % 64}/part-new-{b}-{t[:4]}.parquet"]
        pub._write_manifest(
            out, {"version": snap["version"] + 1, "tables": new, "op": "publish"}
        )
    wall = time.perf_counter() - t0
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


def main() -> None:
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
