"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, as
``(spark, sf_dir) -> DataFrame`` callables.
``oracle_sql()`` — DuckDB twin SQL for each SQL-expressible query.

Backed by the ``updatable_persistent_map_reduce_spark`` package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from updatable_persistent_map_reduce_spark.operators import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["q_group_count"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
