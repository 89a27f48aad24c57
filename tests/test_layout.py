"""Write-layout tests (SURVEY §4 X1): height-bucket partitioning + sorted
files are the engine's substitute for the reference's covering DESC indexes
(init.sql:41-51,112-118,137-144).  Assertions are on physical behavior:
the bucket conjunct prunes partition directories before IO, and files come
back sorted in cursor order so row-group min/max stats are tight.
"""

import os

import pytest
from pyspark.sql import functions as F

from chainweb_data_spark.sources.layout import (
    HEIGHT_BUCKET_SIZE,
    height_range_pred,
    read_indexed,
    write_indexed,
)


@pytest.fixture(scope="module")
def indexed_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "blocks")
    df = spark.range(0, 100_000).select(
        F.col("id").alias("height"),
        (F.col("id") % 20).alias("chainid"),
        F.md5(F.col("id").cast("string")).alias("hash"),
    )
    write_indexed(
        df, path, sort_cols=[("height", True), ("chainid", False)], bucket_size=10_000
    )
    return path


def test_partition_directories(indexed_path):
    buckets = sorted(
        d for d in os.listdir(indexed_path) if d.startswith("height_bucket=")
    )
    assert buckets == [f"height_bucket={b}" for b in range(10)]


def _sum_scan_metric(df, metric: str) -> int:
    """Sum a runtime metric over every parquet scan in the EXECUTED plan.

    Walks through AQE's QueryStageExec wrappers explicitly: under adaptive
    execution the final plan's collectLeaves() returns the stage wrappers
    themselves (they are LeafExecNodes), NOT the FileSourceScanExec nodes
    inside them — a leaves-only walk silently reports 0 for any plan with
    a shuffle/broadcast stage between scan and result (r9 find: the r8
    probe file-count assertions were vacuous for exactly this reason)."""
    df.collect()  # executes THIS _jdf's queryExecution, populating metrics
    ep = df._jdf.queryExecution().executedPlan()

    total = 0

    def walk(node):
        nonlocal total
        cls = node.getClass().getSimpleName()
        if "AdaptiveSparkPlan" in cls:
            walk(node.executedPlan())
            return
        m = node.metrics()
        if "Scan" in cls and m.contains(metric):
            total += m.apply(metric).value()
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        if "QueryStage" in cls:
            walk(node.plan())

    walk(ep)
    return total


def _scan_files_read(df) -> int:
    """Runtime `number of files read` summed over the plan's parquet scans."""
    return _sum_scan_metric(df, "numFiles")


def test_height_range_prunes_partitions(spark, indexed_path):
    df = read_indexed(spark, indexed_path)
    n_total_files = len(df.inputFiles())
    page = df.filter(height_range_pred(23_000, 41_000, bucket_size=10_000))
    plan = spark._jvm.PythonSQLUtils.explainString(
        page._jdf.queryExecution(), "formatted"
    )
    # the derived bucket conjunct reaches PartitionFilters → directory pruning
    pf_line = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "height_bucket" in pf_line and ">= 2" in pf_line and "<= 4" in pf_line, (
        pf_line
    )
    # physically, only the 3 surviving buckets' files are opened
    assert _scan_files_read(page) == n_total_files * 3 // 10
    # and the result is exactly the closed range
    assert page.count() == 41_000 - 23_000 + 1


def test_files_sorted_in_cursor_order(spark, indexed_path):
    # within any single file, height must be non-increasing (DESC sort) —
    # this is what makes parquet row-group min/max stats tight/disjoint
    files = read_indexed(spark, indexed_path).inputFiles()
    one = [f for f in files if "height_bucket=5" in f][0]
    rows = spark.read.parquet(one).select("height").collect()
    hs = [r.height for r in rows]
    assert hs == sorted(hs, reverse=True)


def test_open_ended_range(spark, indexed_path):
    df = read_indexed(spark, indexed_path)
    n_total_files = len(df.inputFiles())
    lo_only = df.filter(height_range_pred(95_000, None, bucket_size=10_000))
    assert lo_only.count() == 5_000
    assert _scan_files_read(lo_only) == n_total_files // 10
