"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (pricing summary) on sf0.001.
``queries()`` — every implemented operator, one callable per name.
``oracle_sql()`` — the DuckDB-equivalent SQL for each query (omitted only
for genuinely non-SQL-expressible operators, which get a rows-only check).

Implementations live in ``pedri_analysis_spark.plans`` — this module is a
thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pedri_analysis_spark.plans.relational import QUERIES

    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pedri_analysis_spark.plans import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL keyed identically to ``queries()``."""
    from pedri_analysis_spark.plans import all_oracle_sql

    return all_oracle_sql()
