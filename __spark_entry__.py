"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` re-export the engine's query catalog
(:mod:`data_warehouse_spark.queries_catalog`) — one entry per implemented
operator, each with a DuckDB oracle twin where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_spark import queries_catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shape pricing summary) on sf0.001."""
    return queries_catalog.QUERIES["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_catalog.spark_queries()


def oracle_sql() -> dict[str, str]:
    return queries_catalog.oracle_queries()
