"""Bucketed co-located joins (sources/bucketed.py): two tables bucketed by
the same key must join with ZERO shuffle exchanges, and the bucketed join's
result must equal the plain join's.  Asserted on the executed plan — the
point of bucketing is the absent Exchange, so the test looks for exactly
that."""

import pytest

from pyspark.sql import functions as F

from chainweb_data_spark.sources.bucketed import read_bucketed, write_bucketed
from chainweb_data_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    write_bucketed(
        orders,
        "t_orders_bucketed",
        str(base / "orders"),
        "o_custkey",
        N_BUCKETS,
        sort_col="o_custkey",
    )
    write_bucketed(
        customer,
        "t_customer_bucketed",
        str(base / "customer"),
        "c_custkey",
        N_BUCKETS,
        sort_col="c_custkey",
    )
    yield "t_orders_bucketed", "t_customer_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_customer_bucketed")


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_join_has_no_shuffle_and_matches_plain_join(
    spark, bucketed_tables
):
    t_orders, t_customer = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_bucketed(spark, t_orders)
        c = read_bucketed(spark, t_customer)
        # the bare join: bucket-to-bucket, BOTH exchanges elided.  (A
        # downstream groupBy on a different key still shuffles — that
        # shuffle is the aggregation's, not the join's, so the plan
        # assertion targets the join alone.)
        joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
            "o_orderkey", "o_totalprice", "c_mktsegment"
        )
        joined.collect()  # materialize so AQE finalizes the plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert _exchanges(joined) == 0, (
            "bucket-to-bucket join must elide BOTH join-side exchanges\n"
            + plan[:2000]
        )
        assert "Bucketed: true" in plan

        # same join through the non-bucketed path shuffles both sides
        o2 = load_table(spark, SF, "orders")
        c2 = load_table(spark, SF, "customer")
        plain = o2.join(c2, o2["o_custkey"] == c2["c_custkey"]).select(
            "o_orderkey", "o_totalprice", "c_mktsegment"
        )
        plain.collect()
        assert _exchanges(plain) >= 2

        # identical results
        a = sorted(map(tuple, joined.collect()))
        b = sorted(map(tuple, plain.collect()))
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_on_bucket_key_has_no_shuffle(spark, bucketed_tables):
    t_orders, _ = bucketed_tables
    o = read_bucketed(spark, t_orders)
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    agg.collect()
    assert _exchanges(agg) == 0, "aggregation on the bucket key needs no shuffle"
