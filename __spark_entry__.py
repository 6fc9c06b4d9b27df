"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`stellar_etl_spark.plans.registry`, which binds every
implemented operator (SURVEY.md §2) to a Spark dataflow + DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stellar_etl_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: conversation summaries (the TransformLedger analog,
    T1/A1) over the transcripts view derived from sf0.001 events."""
    return _registry.q_conversations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
