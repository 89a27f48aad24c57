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
    a, b = _canon(sp), _canon(du)
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch on {int(neq.sum())}/{len(a)} rows\n"
            f"spark:\n{a[neq].head(5)}\nduckdb:\n{b[neq].head(5)}"
        )
