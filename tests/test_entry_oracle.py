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
