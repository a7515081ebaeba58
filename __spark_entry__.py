"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes the
full declared inventory from ``aws_flight_data_pipeline_spark.plans`` (one
entry per implemented operator family from SURVEY.md §2); ``oracle_sql()``
returns the matching DuckDB oracle for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_flight_data_pipeline_spark.plans import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary: scan→filter→hash-agg→sort) on sf0.001."""
    return all_queries()["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
