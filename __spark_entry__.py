"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`charlotte_spark`. The driver runs ``entry(spark)``
as a smoke check, runs each ``queries()[name]`` at sf=0.01 and compares
it against the matching ``oracle_sql()[name]`` via DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from charlotte_spark.registry import load_all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    reg = load_all_queries()
    return reg["q1_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each hash-checkable query."""
    return {
        name: q.oracle for name, q in load_all_queries().items() if q.oracle is not None
    }
