"""Skew-salted equi-join — the manual skew rail for when AQE's runtime
skew-split (``spark.sql.adaptive.skewJoin``, on by default in
``session.py``) cannot help: a single hot key whose rows exceed one
executor's memory no matter how the partitions are split, or a build side
that must be shuffled (too big to broadcast).

The classic transform: the PROBE side (the big, skewed relation) gets a
deterministic salt in ``[0, n_salts)``; the BUILD side is replicated once
per salt value.  The join key becomes (key, salt), so one hot key's rows
spread over ``n_salts`` reducers.  Cost: build-side shuffle volume ×
``n_salts`` — the knob trades replication for per-reducer bound, so salt
ONLY skewed joins and keep ``n_salts`` near the skew factor.

The salt must be deterministic for replay/idempotence (this engine's merge
and oracle conventions) — it hashes a per-row tiebreaker column, NOT
rand(): same input ⇒ same salted plan ⇒ same physical distribution.

At the reference's scale this is the account-transfers hot key (an
exchange account with millions of transfer rows joined to blocks,
SURVEY §2.3 J3); the test reproduces that shape synthetically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int,
    salt_by: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``probe`` (big, skewed) with ``build`` (smaller, but not
    broadcastable) on column ``on``, spreading every probe key over
    ``n_salts`` sub-keys.

    ``salt_by`` — a column (or name) whose per-row hash picks the salt;
    defaults to the whole probe row (``struct(*)``), which is deterministic
    but recomputes wide hashes; pass a compact unique column (a PK) when
    one exists.  Supported ``how``: inner / left (semantics preserved
    because every probe row appears exactly once, with one salt, and every
    build row exists for every salt)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_by is None:
        tiebreak = F.struct(*[F.col(c) for c in probe.columns])
    elif isinstance(salt_by, str):
        tiebreak = F.col(salt_by)
    else:
        tiebreak = salt_by
    # collision-free working column: a caller-owned "_salt" would be
    # silently overwritten / made ambiguous otherwise
    salt_col = "_salt"
    taken = set(probe.columns) | set(build.columns)
    while salt_col in taken:
        salt_col = "_" + salt_col
    salted_probe = probe.withColumn(
        salt_col, F.pmod(F.hash(tiebreak), F.lit(n_salts))
    )
    salted_build = build.join(
        F.broadcast(
            build.sparkSession.range(0, n_salts).select(
                F.col("id").cast("int").alias(salt_col)
            )
        )
    )
    out = salted_probe.join(salted_build, [on, salt_col], how)
    return out.drop(salt_col)
