"""Search predicate builders — the reference's LIKE-based search family.

Shapes from ``haskell-src/lib/ChainwebDb/Queries.hs``:
- code search   (150-162): ``COALESCE(code, initial_code, '') LIKE '%s%'``
- event search  (164-188): AND of optional (qualname LIKE OR paramtext LIKE),
  qualname LIKE, paramtext LIKE, module equality.

All are plain Column expressions → Catalyst pushes the non-LIKE conjuncts
(equality, height range) to the Parquet scan and evaluates LIKE in
whole-stage codegen.  ``contains`` compiles to the same JVM predicate as
``LIKE '%s%'`` without wildcard-escaping concerns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def like_escape(s: str) -> str:
    """Escape LIKE metacharacters in a user search string."""
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def like_any(col: Column, needles: list[str]) -> Column:
    out = None
    for n in needles:
        c = col.contains(n)
        out = c if out is None else (out | c)
    return out if out is not None else F.lit(False)


def code_search_predicate(
    code: Column, initial_code: Column, needle: str
) -> Column:
    """``COALESCE(code, initial_code, '') LIKE '%needle%'`` — continuation
    transactions match on their originating exec code (Queries.hs:150-162)."""
    return F.coalesce(code, initial_code, F.lit("")).contains(needle)


def event_search_predicate(
    qualname: Column,
    paramtext: Column,
    module: Column,
    search: str | None = None,
    name: str | None = None,
    param: str | None = None,
    modulename: str | None = None,
) -> Column:
    """Conjunction of optional predicates (Queries.hs:164-188)."""
    pred = F.lit(True)
    if search is not None:
        pred = pred & (qualname.contains(search) | paramtext.contains(search))
    if name is not None:
        pred = pred & qualname.contains(name)
    if param is not None:
        pred = pred & paramtext.contains(param)
    if modulename is not None:
        pred = pred & (module == F.lit(modulename))
    return pred
