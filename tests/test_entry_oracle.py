"""Every queries() entry with an oracle must hash-match DuckDB at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

import pytest

from tests.oracle_harness import compare, duckdb_con

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare(df, con, ORACLES[name], name)
    else:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_gate_priority_order():
    """The driver gates the FIRST 50 queries() entries: they must be exactly
    GATE_PRIORITY (cw_* domain + §2-unique testdata + pipeline), each with an
    oracle except the documented multimodal rows-only check."""
    from chainweb_data_spark.queries.registry import GATE_PRIORITY

    assert len(GATE_PRIORITY) == 50
    names = list(QUERIES)
    assert names[:50] == list(GATE_PRIORITY)
    # r03: multimodal gained a literal-VALUES oracle — every gated query
    # (and in fact every registered query) now has a hash check
    for n in GATE_PRIORITY:
        assert n in ORACLES, f"gated query {n} lacks an oracle"


def test_harness_catches_int_vs_float():
    """Regression test for the r8 `corpus_report` driver red: DuckDB
    ``SUM(BIGINT)`` is HUGEINT which lands in pandas as float64, so the
    driver's value hash saw ``1435.0`` vs Spark's ``1435`` while the local
    ``%.17g`` canonicalization collapsed them.  The harness must now fail
    the int-vs-float dtype class locally even when values are equal."""
    import pandas as pd

    from tests.oracle_harness import assert_dtypes_compatible

    ints = pd.DataFrame({"total_tokens": pd.Series([1435, 7], dtype="int64")})
    floats = pd.DataFrame(
        {"total_tokens": pd.Series([1435.0, 7.0], dtype="float64")}
    )
    with pytest.raises(AssertionError, match="dtype class mismatch"):
        assert_dtypes_compatible(ints, floats, "int-vs-float")
    # same class on both sides stays green
    assert_dtypes_compatible(ints, ints.copy(), "int-vs-int")
    assert_dtypes_compatible(floats, floats.copy(), "float-vs-float")


def test_harness_catches_wrong_numeric_class_in_literal_values_oracle(
    spark, con
):
    """r10 (r9 verdict #8): the codec queries' oracles are literal VALUES
    rows over real bytes, and a codec edit that regenerates them can
    silently flip a column's numeric class (412 vs 412.0) — exactly the
    int-vs-float shape the dtype-strict harness exists for.  Prove the
    FULL compare() path (not just the dtype helper) fails a
    deliberately-wrong VALUES oracle, and passes the corrected one."""
    df = spark.createDataFrame(
        [(1, 412.0), (2, 96.5)], "sample_id int, rms double"
    )
    wrong = (
        "SELECT * FROM (VALUES (1, 412), (2, 96)) AS t(sample_id, rms)"
    )  # rms as INTEGER: wrong class AND wrong value rendering
    with pytest.raises(AssertionError):
        compare(df, con, wrong, "values-wrong-class")
    # integral-valued doubles against an int VALUES column must ALSO fail
    # on class alone (the driver hashes 412 vs 412.0 differently)
    df_integral = spark.createDataFrame(
        [(1, 412.0), (2, 96.0)], "sample_id int, rms double"
    )
    wrong_integral = (
        "SELECT * FROM (VALUES (1, 412), (2, 96)) AS t(sample_id, rms)"
    )
    with pytest.raises(AssertionError, match="dtype class mismatch"):
        compare(df_integral, con, wrong_integral, "values-integral-collision")
    right = (
        "SELECT * FROM (VALUES (1, CAST(412.0 AS DOUBLE)), "
        "(2, CAST(96.5 AS DOUBLE))) AS t(sample_id, rms)"
    )
    compare(df, con, right, "values-right-class")
