"""Small-scale robustness: every registered query must EXECUTE at sf0.001
(50 docs, 1k events — the driver's entry-smoke scale).  No oracle here —
the hash gate runs at sf0.01 — this sweep catches brittle fixture
assumptions (ids that only exist at larger SFs, empty-partition edge
cases, envelope guards tripping on tiny corpora).  Zero-row results are
legitimate; exceptions are not."""

import pytest

from chainweb_data_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_executes_at_sf0001(name, spark):
    rows = QUERIES[name](spark, SF).collect()
    assert rows is not None  # executed without raising; empty is fine
