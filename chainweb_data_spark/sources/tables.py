"""Parquet table loaders for the driver's testdata and chainweb fixture sets.

Equivalent of the reference's Beam table bindings
(``haskell-src/lib/ChainwebDb/Database.hs:37-44``) — here a table is simply a
Parquet-backed DataFrame; Catalyst handles predicate pushdown / column pruning
that Postgres indexes provided there.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

CHAINWEB_TABLES = (
    "blocks",
    "transactions",
    "events",
    "transfers",
    "signers",
    "minerkeys",
)


# Timestamp columns whose physical parquet type has varied across driver
# testdata generations: TIMESTAMP(NANOS) (Spark reads as long under
# spark.sql.legacy.parquet.nanosAsLong) or TIMESTAMP(MICROS,
# isAdjustedToUTC=false) (Spark reads as TIMESTAMP_NTZ).  Both are
# normalized to TimestampType (LTZ): values are µs-aligned and the session
# timezone is UTC, so either conversion is lossless and DuckDB-consistent.
NANO_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        df = spark.read.parquet(path)
    except Exception as e:  # noqa: BLE001 — classify by error code below
        # TIMESTAMP(NANOS) columns need spark.sql.legacy.parquet.nanosAsLong;
        # set it only when a footer actually demands it, so sessions that
        # never touch nano-timestamp files keep pristine conf.  It must then
        # STAY set: executors re-read the conf at scan time, so a
        # save/restore here would break later actions on the (lazy) returned
        # DataFrame (verified empirically — the restored conf fails the scan
        # with the same PARQUET_TYPE_ILLEGAL).
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    for c in NANO_TS_COLS.get(name, ()):
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, (LongType, TimestampNTZType)):
            # The NTZ→LTZ normalization is only lossless when the session
            # renders instants in UTC; guard it rather than assume (ADVICE
            # r03).  Cast to an explicit TimestampType so a caller overriding
            # spark.sql.timestampType=TIMESTAMP_NTZ can't turn the
            # normalization into a no-op.
            tz = spark.conf.get("spark.sql.session.timeZone")
            if tz not in ("UTC", "Etc/UTC", "GMT"):
                raise ValueError(
                    f"load_table requires a UTC session timezone for the "
                    f"NTZ/nanos timestamp normalization of {name}.{c}; "
                    f"spark.sql.session.timeZone is {tz!r}"
                )
        if isinstance(dt, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, TimestampNTZType):
            # session tz is UTC (asserted above), so NTZ wall-clock == the
            # UTC instant
            df = df.withColumn(c, F.col(c).cast(TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Register each table as a temp view (mirrors DuckDB oracle's view set)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
