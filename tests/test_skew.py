"""Salted skew join (operators/skew.py): result equivalence with the plain
join on a synthetically skewed relation (one key holding half the rows),
salt-spread verification on the physical distribution, and determinism
across runs (the salt hashes rows, never rand())."""

import pytest

from pyspark.sql import functions as F

from chainweb_data_spark.operators.skew import salted_join

N_ROWS = 20_000
N_KEYS = 50
N_SALTS = 8


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 owns half the relation; the rest spread over N_KEYS keys
    probe = spark.range(N_ROWS).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % N_KEYS).cast("long"))
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    build = spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return probe.cache(), build.cache()


def test_salted_equals_plain_inner_and_left(spark, skewed):
    probe, build = skewed
    for how in ("inner", "left"):
        plain = probe.join(build, "k", how).select("row_id", "k", "payload", "name")
        salted = salted_join(
            probe, build, "k", N_SALTS, salt_by="row_id", how=how
        ).select("row_id", "k", "payload", "name")
        a = sorted(map(tuple, plain.collect()))
        b = sorted(map(tuple, salted.collect()))
        assert a == b, how


def test_salt_spreads_the_hot_key(spark, skewed):
    probe, _ = skewed
    spread = (
        probe.filter(F.col("k") == 0)
        .withColumn("_salt", F.pmod(F.hash(F.col("row_id")), F.lit(N_SALTS)))
        .groupBy("_salt")
        .count()
        .collect()
    )
    counts = {r["_salt"]: r["count"] for r in spread}
    assert len(counts) == N_SALTS, "hot key must hit every salt"
    hot_total = sum(counts.values())
    assert max(counts.values()) < hot_total / N_SALTS * 1.5, (
        "hot key's rows must spread roughly evenly over the salts: "
        f"{counts}"
    )


def test_salting_is_deterministic(spark, skewed):
    probe, build = skewed
    r1 = sorted(
        map(tuple, salted_join(probe, build, "k", N_SALTS, salt_by="row_id").collect())
    )
    r2 = sorted(
        map(tuple, salted_join(probe, build, "k", N_SALTS, salt_by="row_id").collect())
    )
    assert r1 == r2


def test_rejects_unsupported_join_type(spark, skewed):
    probe, build = skewed
    with pytest.raises(ValueError):
        salted_join(probe, build, "k", N_SALTS, how="full")
