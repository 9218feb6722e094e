"""Driver contract for the spark-graft builder (PySpark target).

All queries live in the package registry
(streaming_forex_data_pipeline_spark/plans/) — each SURVEY §2 operator
registers a Spark builder plus its DuckDB oracle SQL, so this module is
a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streaming_forex_data_pipeline_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the D8 quality-scoring
    composite (resample -> per-symbol stats -> gap math -> penalty
    score), the reference's DataValidator pipeline as one lazy plan."""
    return plans.spark_queries()["quality_score"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return plans.oracle_sqls()
