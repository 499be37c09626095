"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship workload-profile composite score
(the reference's headline analytic, workload_profile_scores.py:403-442)
on sf0.001. ``queries()`` / ``oracle_sql()`` expose the full declared
inventory from ``sc_crawler_spark.queries`` (SURVEY.md §2 operator
classes + the training-data pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sc_crawler_spark.queries import REGISTRY
from sc_crawler_spark.queries.domain import workload_scores

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workload_scores(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible)."""
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
