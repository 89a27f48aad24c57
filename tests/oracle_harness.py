"""Local replica of the driver's DuckDB-oracle correctness check:
run the Spark query and the oracle SQL on the same parquet, sort columns by
name, sort rows, and compare values.  Keeping this strict locally means the
driver's CORRECTNESS_r{N}.json holds no surprises.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sorting/na handling, numbers canonicalized
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "␀"
        if isinstance(v, float):
            # full precision: the driver's value-hash is presumed exact, so
            # our engine must produce bit-identical doubles
            return f"{v:.17g}"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    out = df.map(cell)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def _dtype_class(dtype) -> str:
    """Coarse numeric class used for the strict int-vs-float check.

    The driver's value hash stringifies cell values per pandas dtype, so a
    BIGINT on one side and a float64 on the other renders ``1435`` vs
    ``1435.0`` and hash-mismatches even when every value is equal.  DuckDB's
    ``SUM`` over integers returns HUGEINT which lands in pandas as float64 —
    r8's ``corpus_report`` red shipped exactly this way because ``_canon``'s
    ``%.17g`` collapsed the two renderings.  Classify dtypes so the local
    harness fails the int-vs-float case the way the driver does.
    """
    kind = getattr(dtype, "kind", None)
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    return "other"


def assert_dtypes_compatible(sp: pd.DataFrame, du: pd.DataFrame, name: str = "?"):
    """Strict numeric-class check: integer-typed on one side and
    float-typed on the other FAILS, even when the stringified values would
    collide (e.g. oracle ``SUM(int)`` → HUGEINT → float64 vs Spark BIGINT).
    Object columns (strings, None-holding numerics) are exempt — pandas
    promotes nullable ints to object/float inconsistently across engines and
    the driver canonicalizes those identically."""
    for c in sp.columns:
        a, b = _dtype_class(sp[c].dtype), _dtype_class(du[c].dtype)
        if "other" in (a, b):
            continue
        if {a, b} == {"int", "float"}:
            # float column that's integral-valued on BOTH sides is how the
            # driver red manifests — flag it loudly either way.
            raise AssertionError(
                f"{name}: column {c!r} dtype class mismatch "
                f"spark={sp[c].dtype} duckdb={du[c].dtype} — add an explicit "
                f"CAST in the oracle (or .cast in Spark) so both sides agree"
            )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    """Raises AssertionError with a diff preview on mismatch."""
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    assert sp.shape[0] == du.shape[0], (
        f"{name}: row count spark={sp.shape[0]} duckdb={du.shape[0]}"
    )
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: columns spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    sp = sp.reindex(sorted(sp.columns), axis=1)
    du = du.reindex(sorted(du.columns), axis=1)
    assert_dtypes_compatible(sp, du, name)
    a, b = _canon(sp), _canon(du)
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch on {int(neq.sum())}/{len(a)} rows\n"
            f"spark:\n{a[neq].head(5)}\nduckdb:\n{b[neq].head(5)}"
        )
