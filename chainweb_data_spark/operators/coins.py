"""Circulating-coins calculation — the semantics of the reference's
``exec/Chainweb/Coins.hs`` (SURVEY §2.4 A8):

    circulating(height, date) = mined(height) + unlocked(date)

- ``mined``: piecewise-LINEAR interpolation over a cumulative
  (blockheight → total-mined) schedule (Coins.hs:126-147 builds the
  cumulative map from the miner-rewards CSV; 118-125 interpolates).
- ``unlocked``: STEP function over a cumulative (date → total-allocated)
  schedule (token-payments CSV, Coins.hs:148-158).

The reference embeds Kadena's schedule CSVs in the binary (S6,
Coins.hs:39-44); this engine treats the schedule as data — a deterministic
synthetic schedule ships for fixtures/tests, production loads real CSVs via
``spark.read.csv`` with the same two-column shapes.

Two execution forms, same math:
- ``circulating_at`` — pure Python scalar (the reference's form; /stats).
- ``with_circulating`` — distributed: broadcast interval-join of the (tiny)
  schedule against any DataFrame of heights; entirely JVM expressions.
"""

from __future__ import annotations

from bisect import bisect_right

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (height, cumulative_mined) breakpoints — strictly increasing both axes.
# Synthetic but Kadena-shaped: early steep emission flattening out.
REWARD_SCHEDULE: list[tuple[int, float]] = [
    (0, 0.0),
    (50, 45_000.0),
    (100, 85_000.0),
    (150, 120_000.0),
    (200, 150_000.0),
    (300, 200_000.0),
    (500, 280_000.0),
    (1_000, 430_000.0),
    (10_000, 1_500_000.0),
    (1_000_000, 40_000_000.0),
]

# (epoch_us, cumulative_unlocked) steps — allocations vest at instants.
GENESIS_US = 1_572_393_600_000_000
DAY_US = 86_400_000_000
ALLOCATION_SCHEDULE: list[tuple[int, float]] = [
    (GENESIS_US, 1_000_000.0),
    (GENESIS_US + 30 * DAY_US, 1_250_000.0),
    (GENESIS_US + 90 * DAY_US, 1_750_000.0),
    (GENESIS_US + 365 * DAY_US, 3_000_000.0),
]


def mined_at(height: int, schedule: list[tuple[int, float]] | None = None) -> float:
    """Linear interpolation on the cumulative reward curve
    (Coins.hs:118-125 ``interpolate``); clamped at both ends."""
    sched = schedule or REWARD_SCHEDULE
    hs = [h for h, _ in sched]
    i = bisect_right(hs, height) - 1
    if i < 0:
        return sched[0][1]
    if i >= len(sched) - 1:
        return sched[-1][1]
    (h0, c0), (h1, c1) = sched[i], sched[i + 1]
    return c0 + (c1 - c0) * (height - h0) / (h1 - h0)


def unlocked_at(ts_us: int, schedule: list[tuple[int, float]] | None = None) -> float:
    """Step lookup on the cumulative allocation curve (Coins.hs:148-158)."""
    sched = schedule or ALLOCATION_SCHEDULE
    ts = [t for t, _ in sched]
    i = bisect_right(ts, ts_us) - 1
    return 0.0 if i < 0 else sched[i][1]


def circulating_at(height: int, ts_us: int) -> float:
    return mined_at(height) + unlocked_at(ts_us)


def _interval_df(spark, schedule: list[tuple[int, float]]):
    """Schedule breakpoints → closed intervals with a precomputed slope."""
    rows = []
    for (h0, c0), (h1, c1) in zip(schedule, schedule[1:]):
        rows.append((h0, h1, c0, (c1 - c0) / (h1 - h0)))
    return spark.createDataFrame(
        rows, "lo long, hi long, cum_lo double, rate double"
    )


def with_circulating(
    df: DataFrame,
    height_col: str = "height",
    ts_us_col: str | None = None,
) -> DataFrame:
    """Append ``mined`` (+ ``unlocked``/``circulating`` when a timestamp
    column is given) to any DataFrame of heights.

    Physical shape: two broadcast range-joins against ≤ dozens of schedule
    rows — a BroadcastNestedLoopJoin whose build side is tiny, so it costs
    one scan of ``df`` regardless of scale; no shuffle."""
    spark = df.sparkSession
    iv = _interval_df(spark, REWARD_SCHEDULE)
    h = F.col(height_col)
    lo_h, lo_c = REWARD_SCHEDULE[0]
    hi_h, hi_c = REWARD_SCHEDULE[-1]
    out = (
        df.join(
            F.broadcast(iv),
            (h >= F.col("lo")) & (h < F.col("hi")),
            "left",
        )
        .withColumn(
            "mined",
            F.when(h < F.lit(lo_h), F.lit(lo_c))
            .when(h >= F.lit(hi_h), F.lit(hi_c))
            .otherwise(F.col("cum_lo") + (h - F.col("lo")) * F.col("rate")),
        )
        .drop("lo", "hi", "cum_lo", "rate")
    )
    if ts_us_col is None:
        return out
    # step function as a searched CASE (schedule is static & tiny — constant
    # folded, stays inside whole-stage codegen; no join needed)
    t = F.col(ts_us_col)
    unlocked = F.lit(0.0)
    for ts, cum in ALLOCATION_SCHEDULE:
        unlocked = F.when(t >= F.lit(ts), F.lit(cum)).otherwise(unlocked)
    return out.withColumn("unlocked", unlocked).withColumn(
        "circulating", F.col("mined") + F.col("unlocked")
    )


def reward_values_sql() -> str:
    """The interval schedule as a SQL VALUES list (for DuckDB oracles).
    Every numeric is CAST to DOUBLE: bare literals parse as DECIMAL in
    DuckDB, and decimal/double mixing reassociates the arithmetic away from
    Spark's pure-IEEE evaluation."""
    rows = []
    for (h0, c0), (h1, c1) in zip(REWARD_SCHEDULE, REWARD_SCHEDULE[1:]):
        rate = (c1 - c0) / (h1 - h0)
        rows.append(
            f"({h0}, {h1}, CAST({c0!r} AS DOUBLE), CAST({rate!r} AS DOUBLE))"
        )
    return ", ".join(rows).replace("'", "")


def allocation_case_sql(ts_expr: str) -> str:
    """The allocation step function as a searched CASE (for oracles)."""
    branches = "".join(
        f" WHEN {ts_expr} >= {ts} THEN CAST({cum!r} AS DOUBLE)"
        for ts, cum in reversed(ALLOCATION_SCHEDULE)
    )
    return f"CASE{branches} ELSE CAST(0.0 AS DOUBLE) END".replace("'", "")
