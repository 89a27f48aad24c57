"""Bucketed table layout — the co-located-join lever (SURVEY §4 index
analog, the "bucketing for co-located joins" rail of the 100 TB design).

The directory layouts in ``sources/layout.py`` give PRUNING (height-range
directory elimination, sorted row groups); bucketing gives JOIN LOCALITY:
two tables hash-bucketed by the same key into the same bucket count join
bucket-to-bucket with NO shuffle on either side — at 100 TB that removes
the dominant cost of the FK decorations (tx↔block, event↔block: J1–J3) and
of any repeated self-join on requestkey.

Parquet bucketing lives in the session catalog (`bucketBy` requires
``saveAsTable``); tables here are written as EXTERNAL tables (explicit
``path``) so the data sits with the rest of the store and the catalog entry
is just metadata.  ``spark.sql.sources.bucketing.enabled`` (default true)
lets the scan report its hash partitioning; Catalyst then elides both
exchanges when bucket counts match (asserted on the executed plan in
``tests/test_bucketed.py``, not by documentation).

Trade-offs, stated: bucket counts are fixed at write time (repartition =
rewrite — pick counts for the TARGET scale, e.g. 4096 at 100 TB); small
incremental appends multiply files per bucket (compact with
``sources/maintenance.py``); and only equi-joins/aggregations on the
bucket key benefit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table hash-bucketed by
    ``bucket_col`` (optionally sorted inside each bucket — gives sort-merge
    joins pre-sorted input, eliding the sort as well)."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (a plain
    ``spark.read.parquet(path)`` would DROP the bucketing metadata and
    reintroduce the shuffle)."""
    return spark.table(table)
