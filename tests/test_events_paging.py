"""Token-driven keyset pagination over the chainweb fixture — the
Chainweb-Next contract (Server.hs:484-491): walking pages by continuation
token enumerates exactly the unpaginated prefix, with no dropped or
duplicated rows across page boundaries (orphan twins included: the cursor
carries the block tie-break)."""

import pytest

from pyspark.sql import functions as F

from chainweb_data_spark.queries.chainweb import (
    _EVENTS_PAGE_COLS,
    EVENTS_CURSOR,
    _cw,
    events_page,
)


def test_three_pages_equal_unpaginated_prefix(spark):
    pages = []
    token = None
    for _ in range(3):
        rows, token = events_page(spark, token=token, limit=25)
        pages.extend(rows)
        assert token is not None  # fixture has >75 events
    expected = (
        _cw(spark, "events")
        .orderBy(
            F.desc("height"), F.desc("requestkey"), F.asc("idx"), F.asc("block")
        )
        .limit(75)
        .select(*_EVENTS_PAGE_COLS)
        .collect()
    )
    assert [tuple(r) for r in pages] == [tuple(r) for r in expected]


@pytest.mark.heavy
def test_walk_to_exhaustion_no_dups(spark):
    ev = _cw(spark, "events")
    total = ev.count()
    seen = []
    token = None
    limit = 200
    for _ in range(total // limit + 2):
        rows, token = events_page(spark, token=token, limit=limit)
        seen.extend(rows)
        if token is None:
            break
    assert token is None, "walk did not terminate"
    assert len(seen) == total
    keys = [(r["block"], r["requestkey"], r["idx"]) for r in seen]
    assert len(set(keys)) == total, "duplicate rows across page boundaries"


@pytest.mark.heavy
def test_page_boundary_inside_twin_group(spark):
    """Force a page boundary at every position around orphan twins (rows
    sharing (height, requestkey, idx) but differing in block): stepping
    1-by-1 must visit each twin exactly once."""
    ev = _cw(spark, "events")
    twin = (
        ev.groupBy("height", "requestkey", "idx")
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    assert twin, "fixture must contain orphan twins for this test"
    t = twin[0]
    # walk single-row pages across the twin neighborhood
    block_rows = (
        ev.filter(
            (F.col("height") == t["height"])
            & (F.col("requestkey") == t["requestkey"])
            & (F.col("idx") == t["idx"])
        )
        .select("block")
        .collect()
    )
    blocks = sorted(r["block"] for r in block_rows)
    from chainweb_data_spark.operators.cursor import encode_next_token

    # cursor just before the twin group: strictly-after predicate with the
    # first twin's full 4-tuple must yield the SECOND twin next
    cur = [t["height"], t["requestkey"], t["idx"], blocks[0]]
    rows, _ = events_page(spark, token=encode_next_token(cur), limit=1)
    assert rows[0]["block"] == blocks[1]


def test_handler_rejects_bad_limit_and_forged_token(spark):
    """400-contract guards (ADVICE r02): limit=0 must ValueError (not
    IndexError on rows[-1]); a decodable token whose cursor arity doesn't
    match EVENTS_CURSOR must ValueError (not silently page-overlap)."""
    import pytest

    from chainweb_data_spark.operators.cursor import encode_next_token

    with pytest.raises(ValueError):
        events_page(spark, token=None, limit=0)
    with pytest.raises(ValueError):
        events_page(spark, token=None, limit=-3)
    forged_short = encode_next_token([100, "rk"])  # 2 cols, spec has 4
    with pytest.raises(ValueError, match="malformed"):
        events_page(spark, token=forged_short, limit=5)
    forged_empty = encode_next_token([])
    with pytest.raises(ValueError, match="malformed"):
        events_page(spark, token=forged_empty, limit=5)
