#!/usr/bin/env python
"""Time-series join scale rehearsal: measure asof_join / binned_range_join
growth at N× data, in the two regimes that scale differently BY
CONSTRUCTION (same methodology as scale_rehearsal.py):

- wide (default): each replica gets a DISJOINT key range (new users /
  customers) — the normal "more entities" case.  Both joins shuffle on the
  key, per-key work is unchanged, so a healthy plan grows ~linearly in
  wall time (bounded below by the fixed 32-core machine).
- deep (--deep): replicas keep the SAME keys but shift time forward —
  per-key history gets N× deeper.  The as-of union–sort–fill is a per-key
  sort (n log n) with O(1) fill state, and the range join's per-bin
  population is time-localized, so both should STILL grow ~linearly; a
  per-key quadratic (e.g. a naive as-of via inequality self-join) would
  show N².
- hotkey (--hotkey): EVERY row collapses onto ONE key at N× depth — the
  pathological feed (one instrument carrying all the volume).  A window
  must hold a partition on one task, so the single-window as-of
  serializes; this regime measures the ``bucket_width_us`` skew rail
  (window inside (key, time-bucket) + per-bucket cascade) against the
  unbucketed plan on the same data, and reports both walls plus the
  bucketed plan's partition fan-out.

Usage:  python scripts/timeseries_rehearsal.py [multiplier=10] [--deep | --hotkey]
Prints one JSON line.  (Idle machine, same caveat as bench.py.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
import hashlib as _hashlib
_BASE_TAG = (os.path.basename(BASE_SF.rstrip("/")) or "base") + "-" + \
    _hashlib.md5(os.path.abspath(BASE_SF).encode()).hexdigest()[:6]

QUERIES = ["asof_join_orders", "range_join_orders"]
_KEY_OFFSET = 10_000_000


def build_scaled(spark, mult: int, deep: bool = False) -> str:
    from pyspark.sql import functions as F

    out = f"/tmp/cds_scale/ts_{_BASE_TAG}_x{mult}{'deep' if deep else ''}"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    reps = spark.range(0, mult).select(F.col("id").alias("rep"))

    ev = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
    n_ev = ev.count()
    orders = spark.read.parquet(os.path.join(BASE_SF, "orders.parquet"))
    n_ord = orders.count()

    if deep:
        # same keys, time shifted forward per replica: deeper history.
        # 31-day stride > the base events' span, so replica time ranges
        # stay disjoint (no artificial ties across replicas).
        ev_key, ord_key = F.col("user_id"), F.col("o_custkey")
        # timestampadd preserves the column's timestamp flavor (the raw
        # parquet reads as TIMESTAMP_NTZ here; unix_micros would reject it)
        shift_days = (F.col("rep") * 31).cast("int")
        ev_ts = F.timestamp_add("DAY", shift_days, F.col("ts"))
        ord_ts = F.timestamp_add("DAY", shift_days, F.col("o_orderdate"))
    else:
        # disjoint key ranges per replica: more entities, same history depth
        ev_key = F.col("user_id") + F.col("rep") * _KEY_OFFSET
        ord_key = F.col("o_custkey") + F.col("rep") * _KEY_OFFSET
        ev_ts, ord_ts = F.col("ts"), F.col("o_orderdate")

    scaled_ev = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("rep") * n_ev).alias("event_id"),
        ev_ts.alias("ts"),
        ev_key.alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    scaled_ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    scaled_ord = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("rep") * n_ord).alias("o_orderkey"),
        ord_key.alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        ord_ts.alias("o_orderdate"),
        "o_orderpriority",
    )
    scaled_ord.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    open(marker, "w").close()
    return out


def hotkey_report(spark, mult: int) -> dict:
    """Unbucketed vs bucketed as-of where the per-key window IS the whole
    query: a synthetic ONE-KEY corpus (left = mult×100k facts at 1s
    spacing, right = mult×10k dim updates at 10s spacing — unique
    timestamps by construction, so no dedup stage dilutes the
    measurement).  The single-window plan sorts the whole union on ONE
    task; the rail (bucket width = 10k seconds → ~10·mult buckets)
    spreads it across the cores.  Both plans are reduced through the same
    checksum aggregate and the checksums are asserted equal — same
    answer, different physical schedule."""
    from pyspark.sql import functions as F

    from chainweb_data_spark.operators import timeseries as tsj

    n_left, n_right = mult * 100_000, mult * 10_000
    US = 1_000_000

    def build(bucket_width):
        left = spark.range(0, n_left, 1, 32).select(
            F.lit(1).alias("k"),
            F.timestamp_micros(F.col("id") * US).alias("ts"),
            F.col("id").alias("lid"),
        )
        right = spark.range(0, n_right, 1, 32).select(
            F.lit(1).alias("k"),
            F.timestamp_micros(F.col("id") * 10 * US + 7).alias("rts"),
            (F.col("id") * 3).cast("double").alias("rv"),
        )
        out = tsj.asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            bucket_width_us=bucket_width,
        )
        return out.agg(
            F.count("*").alias("n"),
            F.sum("rv").alias("sum_rv"),
            F.sum(F.hash("lid", "rv")).alias("chk"),
        )

    def wall(bucket_width):
        build(bucket_width).collect()  # warm
        t0 = time.perf_counter()
        row = build(bucket_width).collect()[0]
        return round(time.perf_counter() - t0, 3), tuple(row)

    t_single, chk_single = wall(None)
    t_rail, chk_rail = wall(10_000 * US)
    assert chk_single == chk_rail, (chk_single, chk_rail)
    return {
        "multiplier": mult,
        "n_left": n_left,
        "n_right": n_right,
        "single_window_s": t_single,
        "bucketed_s": t_rail,
        "speedup": round(t_single / max(t_rail, 1e-9), 2),
        "n_buckets": n_left // 10_000,
    }


def timed(fn, spark, sf_dir) -> float:
    fn(spark, sf_dir).collect()  # warm: codegen + page cache
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from chainweb_data_spark.queries import query_fns
    from chainweb_data_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    deep = "--deep" in sys.argv[1:]
    hotkey = "--hotkey" in sys.argv[1:]
    mult = int(args[0]) if args else 10
    spark = get_spark("cds-ts-rehearsal")
    if hotkey:
        print(json.dumps({
            "regime": "hotkey",
            "asof_hotkey": hotkey_report(spark, mult),
        }))
        return
    fns = query_fns()
    scaled_dir = build_scaled(spark, mult, deep)

    result = {
        "multiplier": mult,
        "regime": "deep" if deep else "wide",
        "base_sf_dir": BASE_SF,
        "queries": {},
    }
    for name in QUERIES:
        t_base = timed(fns[name], spark, BASE_SF)
        t_scaled = timed(fns[name], spark, scaled_dir)
        result["queries"][name] = {
            "base_s": t_base,
            "scaled_s": t_scaled,
            "growth": round(t_scaled / max(t_base, 1e-9), 2),
            "quadratic_would_be": mult * mult,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
