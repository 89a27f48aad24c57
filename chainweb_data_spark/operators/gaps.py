"""Gap detection over a per-partition dense sequence.

Re-expresses the reference's missing-block finder
(``haskell-src/exec/Chainweb/Gaps.hs:156-188``: ``lead(height,1) OVER
(PARTITION BY chainid ORDER BY height)`` then ``next - height > 1``) and its
coinbase-event twin (``FillEvents.hs:99-119``).

Scale note: the window shuffles once on the partition key (20 chains in the
reference; arbitrary cardinality here).  For a skewed key (one giant chain)
AQE skew-join doesn't help windows — but gap detection only needs (key,
height) pairs, so we project to two long columns before the shuffle, keeping
shuffle bytes minimal even at 100 TB of blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def detect_gaps(
    df: DataFrame,
    partition_col: str,
    seq_col: str,
    min_gap: int = 1,
) -> DataFrame:
    """Rows (partition, gap_start, gap_end, gap_len) for every hole in the
    sequence: consecutive values with ``next - cur > min_gap``.

    ``gap_start``/``gap_end`` are the exclusive bounds' interior:
    [cur+1, next-1], matching the reference's fill ranges.
    """
    w = Window.partitionBy(partition_col).orderBy(seq_col)
    return (
        df.select(partition_col, seq_col)
        .distinct()
        .withColumn("__next", F.lead(seq_col, 1).over(w))
        .filter(F.col("__next") - F.col(seq_col) > min_gap)
        .select(
            F.col(partition_col),
            (F.col(seq_col) + 1).alias("gap_start"),
            (F.col("__next") - 1).alias("gap_end"),
            (F.col("__next") - F.col(seq_col) - 1).alias("gap_len"),
        )
    )
