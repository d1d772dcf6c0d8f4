"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``childhoodcancerdatainitiative_prefect_pipeline_spark.queries``).
Each registry entry pairs a Spark callable with a DuckDB oracle; the
driver compares them at sf=0.01 (row count + schema + order-
insensitive value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (catalog stats, SURVEY.md §7.2) on sf0.001."""
    return REGISTRY["catalog_stats"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
