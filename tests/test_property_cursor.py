"""Property tests (hypothesis) for the continuation-token codec and the
keyset predicate's tuple-comparison semantics — pure Python, no Spark.

The keyset property mirrors the reference's row-value comparison
(BoundedScan.hs:271-280): a row is "after" the cursor iff it sorts strictly
later under the spec's mixed-direction order.  We evaluate the same
expansion the Column expression builds, against a brute-force sort.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from chainweb_data_spark.operators.cursor import (
    CursorSpec,
    decode_next_token,
    encode_next_token,
)

# JSON-able cursor values the token codec must round-trip
_vals = st.one_of(
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(max_size=40),
    st.booleans(),
    st.none(),
)


@given(st.lists(_vals, max_size=6), st.integers(min_value=0, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_token_round_trip(cursor, offset):
    got, rem = decode_next_token(encode_next_token(cursor, offset))
    assert got == cursor and rem == offset


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_random_tokens_never_crash(token):
    """Arbitrary client input either decodes to the exact [list, int] shape
    or raises ValueError (the 400 contract) — never any other exception."""
    try:
        cursor, rem = decode_next_token(token)
    except ValueError:
        return
    assert isinstance(cursor, list) and isinstance(rem, int)
    # and whatever decodes must re-encode to something that decodes the same
    assert decode_next_token(encode_next_token(cursor, rem)) == (cursor, rem)


def _after(spec: CursorSpec, cursor: tuple, row: tuple) -> bool:
    """Python evaluation of the keyset_predicate expansion."""
    clause = False
    eqs = True
    for desc, cur, val in zip(spec.descs, cursor, row):
        strict = (val < cur) if desc else (val > cur)
        clause = clause or (eqs and strict)
        eqs = eqs and (val == cur)
    return clause


def _sort_key(spec: CursorSpec, row: tuple):
    return tuple((-v if d else v) for v, d in zip(row, spec.descs))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.booleans(), min_size=3, max_size=3),
    st.integers(min_value=0),
)
@settings(max_examples=300, deadline=None)
def test_keyset_after_equals_sorted_suffix(rows, descs, cursor_pick):
    """For any cursor row, the rows satisfying the expansion are EXACTLY the
    rows after it in total sort order — no overlap, no gap (the
    Chainweb-Next walk invariant, engine-independent)."""
    spec = CursorSpec(cols=("a", "b", "c"), descs=tuple(descs))
    ordered = sorted(set(rows), key=lambda r: _sort_key(spec, r))
    cursor = ordered[cursor_pick % len(ordered)]
    idx = ordered.index(cursor)
    expected_after = set(ordered[idx + 1 :])
    got_after = {r for r in set(rows) if _after(spec, cursor, r)}
    assert got_after == expected_after


def test_token_is_url_safe_ascii():
    tok = encode_next_token([123456, "rk/+=?&", 7, None], 42)
    assert tok.strip() == tok and "=" not in tok
    assert all(c.isalnum() or c in "-_" for c in tok)
    assert json.loads(json.dumps(tok)) == tok  # header-safe string
