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


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (spark.sql.legacy.parquet.nanosAsLong); values are µs-aligned, so the
# conversion to TimestampType is lossless and DuckDB-consistent.
NANO_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

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
        if c in df.columns and isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Register each table as a temp view (mirrors DuckDB oracle's view set)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
