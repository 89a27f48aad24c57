from .registry import QUERIES, ORACLES, query_fns, oracle_sqls
from . import pipeline  # noqa: F401 — registers pipeline queries
from . import chainweb  # noqa: F401 — registers chainweb domain queries
from . import timeseries  # noqa: F401 — registers time-series join queries

__all__ = ["QUERIES", "ORACLES", "query_fns", "oracle_sqls"]
