"""Next-token codec (O8, Server.hs:484-491,550-566): cursor ⇄ base64url.
Pure Python — no Spark session needed."""

import pytest

from chainweb_data_spark.operators.cursor import (
    decode_next_token,
    encode_next_token,
)


def test_round_trip():
    cur = [1722500, "rk-abc_123", 7]
    tok = encode_next_token(cur, remaining_offset=40)
    assert "=" not in tok  # unpadded base64url, like the reference's tokens
    got, rem = decode_next_token(tok)
    assert got == cur and rem == 40


def test_default_offset_zero():
    got, rem = decode_next_token(encode_next_token(["h", 2]))
    assert got == ["h", 2] and rem == 0


def _b64(s: str) -> str:
    import base64

    return base64.urlsafe_b64encode(s.encode()).decode().rstrip("=")


@pytest.mark.parametrize(
    "bad",
    [
        "",
        "!!!!",
        "not-base64*",
        "AAAA",
        # decodable base64 of VALID JSON in the WRONG shape — must still be
        # a 400, not a TypeError/ValueError escaping from tuple unpacking
        _b64("5"),
        _b64("[1]"),
        _b64("[1, 2]"),          # cursor not a list
        _b64('[[1], "x"]'),      # offset not an int
        _b64("[[1], true]"),     # bool is not an offset
        _b64('{"cursor": []}'),  # object, not array
        _b64("[[1], 2, 3]"),     # wrong arity
    ],
)
def test_malformed_token_raises(bad):
    # the reference responds 400 on an undecodable token (Server.hs:267-278)
    with pytest.raises(ValueError):
        decode_next_token(bad)


def test_keyset_predicate_rejects_wrong_arity():
    """A short cursor must raise, never zip-truncate into a weaker predicate
    (overlapping pages); an empty cursor must not IndexError."""
    from chainweb_data_spark.operators.cursor import CursorSpec, keyset_predicate

    spec = CursorSpec(cols=("height", "requestkey", "idx"), descs=(True, True, False))
    for short in ([], [5], [5, "rk"], [5, "rk", 1, "extra"]):
        with pytest.raises(ValueError):
            keyset_predicate(spec, short)
