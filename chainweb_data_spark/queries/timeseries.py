"""Time-series join queries: as-of join and binned range join over the
driver's testdata, each with a DuckDB oracle (DuckDB's native ASOF JOIN /
inequality join are the semantic ground truth the Spark compositions must
reproduce row-for-row).

Beyond-reference extensions: the reference's range predicates are all
bounded-window scans (Lookups.hs block ranges, Coins.hs schedule
intervals); these two queries exercise the generalized operators in
``operators/timeseries.py`` that a training-data pipeline needs for
event/feature alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import timeseries as tsj
from .registry import _t, register

_US_30D = 30 * 86_400 * 1_000_000


@register(
    "asof_join_orders",
    oracle="""
    WITH r AS (
      SELECT o_custkey AS user_id, o_orderdate,
             max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2
    ), rr AS (
      SELECT r.user_id, r.o_orderdate, r.o_orderkey, o.o_totalprice
      FROM r JOIN orders o USING (o_orderkey)
    ), e AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 20 = 0
    )
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS event_us,
           rr.o_orderkey, rr.o_totalprice,
           epoch_us(rr.o_orderdate) AS order_us
    FROM e ASOF LEFT JOIN rr
      ON e.user_id = rr.user_id AND e.ts >= rr.o_orderdate
    ORDER BY event_id
    """,
)
def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each (sampled) event, the user's most recent order as of the
    event time — the canonical feature-alignment as-of join, checked
    against DuckDB's native ASOF LEFT JOIN.  Right-side ties on
    (user, date) are deduplicated deterministically first (max orderkey
    wins) because as-of semantics are only well-defined on unique
    (key, ts).  Plan: one shuffle on user_id, one per-user sort, no join
    operator at all (union–sort–fill)."""
    orders = _t(spark, sf_dir, "orders")
    right = (
        orders.groupBy(
            F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
        )
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    left = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 20 == 0)
        .select("event_id", "user_id", "ts")
    )
    joined = tsj.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="o_orderdate"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("event_us"),
        "o_orderkey",
        "o_totalprice",
        F.unix_micros(F.col("o_orderdate")).alias("order_us"),
    ).orderBy("event_id")


@register(
    "range_join_orders",
    oracle="""
    SELECT p.o_custkey AS custkey,
           p.o_orderkey AS p_orderkey,
           i.o_orderkey AS i_orderkey,
           epoch_us(p.o_orderdate) AS p_us
    FROM orders p JOIN orders i
      ON p.o_custkey = i.o_custkey
     AND p.o_orderdate >= i.o_orderdate
     AND p.o_orderdate <= i.o_orderdate + INTERVAL 30 DAY
     AND p.o_orderkey <> i.o_orderkey
    ORDER BY p_orderkey, i_orderkey
    """,
)
def range_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-customer orders within 30 days: every order (the point) joined
    to every other order of that customer whose 30-day window contains it.
    DuckDB plans the inequality conjuncts natively; Spark would fall back
    to a nested-loop — the binned equi-join makes it a plain shuffle join
    (bin width = the window span, so each interval replicates ≤ 2×), and
    ``test_plan_quality``'s no-cartesian sweep covers this query too."""
    orders = _t(spark, sf_dir, "orders")
    points = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("p_orderkey"),
        F.col("o_orderdate").alias("p_date"),
    )
    intervals = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("i_orderkey"),
        F.col("o_orderdate").alias("i_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("i_end"),
    )
    joined = tsj.binned_range_join(
        points,
        intervals,
        on="custkey",
        point_ts="p_date",
        start_ts="i_start",
        end_ts="i_end",
        bin_width_us=_US_30D,
    ).filter(F.col("p_orderkey") != F.col("i_orderkey"))
    return joined.select(
        "custkey",
        "p_orderkey",
        "i_orderkey",
        F.unix_micros(F.col("p_date")).alias("p_us"),
    ).orderBy("p_orderkey", "i_orderkey")
