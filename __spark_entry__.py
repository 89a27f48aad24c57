"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — the operator inventory from SURVEY.md §2
re-expressed over the driver's testdata tables, with DuckDB oracle SQL per
query (see chainweb_data_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chainweb_data_spark.queries import oracle_sqls, query_fns


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the event-search family
    (LIKE predicates + cursor order + limit — SURVEY §3.1 / §7.4)."""
    from chainweb_data_spark.queries.registry import like_search

    return like_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query — including the multimodal
    binary-decode ops, whose deterministic stub codecs are evaluated at
    registration time into literal-VALUES oracles (no rows-only checks
    remain)."""
    return oracle_sqls()
