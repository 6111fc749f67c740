"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``seng550_a3_etl_spark``; the suite registry
(seng550_a3_etl_spark/suite/) maps SURVEY.md §2 operators to
oracle-checked queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: zero-preserving per-nation
    order counts (the reference's accidents-per-district shape,
    /root/reference/queries.py:69-77)."""
    from seng550_a3_etl_spark.suite import QUERIES

    return QUERIES["nation_order_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from seng550_a3_etl_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the few
    non-SQL-expressible ops — driver records a rows-only check)."""
    from seng550_a3_etl_spark.suite import ORACLES

    return dict(ORACLES)
