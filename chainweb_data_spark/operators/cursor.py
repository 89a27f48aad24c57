"""Keyset-cursor ("seek") pagination — the reference's core query pattern.

Re-expresses the row-value comparison machinery of
``haskell-src/lib/ChainwebDb/BoundedScan.hs:256-343`` (``cursorCmp`` /
``tupleCmp``: ``WHERE (height, requestkey, idx) < (:h, :rk, :i)`` with
per-column direction) as a composed boolean Column expression.

Why it matters at scale: a keyset predicate on the leading sort column is a
*range predicate*, so Catalyst pushes it into the Parquet scan (min/max row-
group skipping + partition pruning on the height bucket).  OFFSET pagination
scans O(offset) rows; keyset scans O(page).  Same reasoning as the
reference's covering DESC indexes (SURVEY §4 X1/X3), transplanted to
columnar layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class CursorSpec:
    """Ordered cursor columns with per-column direction.

    ``cols``  — column names, major-to-minor sort order.
    ``descs`` — True where that column sorts DESC (reference sorts
                ``height DESC, requestkey DESC, idx ASC``,
                ``Queries.hs:201-205``).
    """

    cols: Sequence[str]
    descs: Sequence[bool]

    def order_by(self) -> list[Column]:
        return [
            F.col(c).desc() if d else F.col(c).asc()
            for c, d in zip(self.cols, self.descs)
        ]


def keyset_predicate(spec: CursorSpec, cursor: Sequence) -> Column:
    """Rows strictly *after* ``cursor`` in ``spec`` order.

    Expansion of the SQL row-value comparison
    ``(a,b,c) < (x,y,z)``  →  ``a<x OR (a=x AND b<y) OR (a=x AND b=y AND c<z)``
    with ``<`` flipped to ``>`` for ASC columns (DESC order means "after" is
    smaller).  Reference emits this as native row comparison
    (``BoundedScan.hs:271-280``); Spark lacks row-value comparison with mixed
    directions, so we expand.

    The cursor must carry exactly one value per spec column: a short tuple
    would silently zip-truncate to a weaker predicate (overlapping pages) —
    the reference 400s malformed cursors (Server.hs:267-278), so raise.
    """
    if len(cursor) != len(spec.cols):
        raise ValueError(
            f"cursor arity {len(cursor)} does not match cursor spec "
            f"{tuple(spec.cols)}"
        )
    clauses: list[Column] = []
    eqs: list[Column] = []
    for name, desc, cur in zip(spec.cols, spec.descs, cursor):
        col = F.col(name)
        strict = col < F.lit(cur) if desc else col > F.lit(cur)
        clauses.append(strict if not eqs else _and_all(eqs) & strict)
        eqs.append(col == F.lit(cur))
    out = clauses[0]
    for c in clauses[1:]:
        out = out | c
    return out


def _and_all(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def keyset_page(
    df: DataFrame,
    spec: CursorSpec,
    cursor: Sequence | None,
    limit: int,
) -> DataFrame:
    """One page after ``cursor`` (or the first page) in cursor order."""
    if cursor is not None:
        df = df.filter(keyset_predicate(spec, cursor))
    return df.orderBy(*spec.order_by()).limit(limit)


def encode_next_token(cursor: Sequence, remaining_offset: int = 0) -> str:
    """Continuation token: base64url(JSON [cursor..., remaining_offset]) —
    the reference's ``Chainweb-Next`` header codec (Server.hs:484-491,
    550-566): an opaque resumable cursor handed to the client.  Timestamps
    must already be primitive (epoch-µs longs) by the time they reach the
    cursor tuple."""
    import base64
    import json

    payload = json.dumps([list(cursor), remaining_offset], separators=(",", ":"))
    return base64.urlsafe_b64encode(payload.encode()).decode().rstrip("=")


def decode_next_token(token: str) -> tuple[list, int]:
    """Inverse of :func:`encode_next_token`; raises ``ValueError`` on a
    malformed token (the reference 400s, Server.hs:267-278)."""
    import base64
    import binascii
    import json

    pad = "=" * (-len(token) % 4)
    try:
        payload = json.loads(base64.urlsafe_b64decode(token + pad))
    except (binascii.Error, json.JSONDecodeError, UnicodeDecodeError) as e:
        raise ValueError(f"malformed continuation token: {token!r}") from e
    # shape validation: valid JSON that isn't [cursor_list, int_offset] is
    # still a malformed token (must map to the 400 contract, not TypeError)
    if (
        not isinstance(payload, list)
        or len(payload) != 2
        or not isinstance(payload[0], list)
        or not isinstance(payload[1], int)
        or isinstance(payload[1], bool)
    ):
        raise ValueError(f"malformed continuation token: {token!r}")
    return payload[0], payload[1]


def encode_pinned_token(
    cursor: Sequence, version: int, remaining_offset: int = 0
) -> str:
    """Continuation token that ALSO carries the pinned transaction-log
    version (SURVEY X6): base64url(JSON [cursor..., remaining_offset,
    version]).  The reference holds one REPEATABLE READ snapshot across
    the two-phase bounded scan (Server.hs:525); a stateless Spark server
    gets the same isolation by resolving the log version on the first
    request of a pagination session and riding it in the token, so every
    resume reads the same snapshot no matter what committed since."""
    import base64
    import json

    payload = json.dumps(
        [list(cursor), remaining_offset, version], separators=(",", ":")
    )
    return base64.urlsafe_b64encode(payload.encode()).decode().rstrip("=")


def decode_pinned_token(token: str) -> tuple[list, int, int]:
    """Inverse of :func:`encode_pinned_token`; ``ValueError`` on malformed
    tokens (the 400 contract), including a plain unpinned token."""
    import base64
    import binascii
    import json

    pad = "=" * (-len(token) % 4)
    try:
        payload = json.loads(base64.urlsafe_b64decode(token + pad))
    except (binascii.Error, json.JSONDecodeError, UnicodeDecodeError) as e:
        raise ValueError(f"malformed continuation token: {token!r}") from e
    if (
        not isinstance(payload, list)
        or len(payload) != 3
        or not isinstance(payload[0], list)
        or not isinstance(payload[1], int)
        or isinstance(payload[1], bool)
        or not isinstance(payload[2], int)
        or isinstance(payload[2], bool)
    ):
        raise ValueError(f"malformed continuation token: {token!r}")
    return payload[0], payload[1], payload[2]


def offset_page(df: DataFrame, spec: CursorSpec, offset: int, limit: int) -> DataFrame:
    """Classic OFFSET/LIMIT (reference's Unbounded mode,
    ``BoundedScan.hs:232-245``).  Kept for API compat; discouraged at scale —
    the global row_number window is a single-partition sort.
    """
    w = Window.orderBy(*spec.order_by())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )
