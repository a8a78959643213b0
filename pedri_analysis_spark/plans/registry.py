"""Aggregates every query module's QUERIES / ORACLE_SQL into one registry.

Query modules register into module-local dicts; this module unions them and
is the single source the driver contract (``__spark_entry__``) reads.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from pedri_analysis_spark.plans import relational

    mods = [relational]
    for name in (
        "relational_ext",
        "sampling_queries",
        "dedup_queries",
        "text_queries",
        "similarity_queries",
        "streaming_queries",
        "pedri_queries",
    ):
        try:
            mods.append(
                __import__(f"pedri_analysis_spark.plans.{name}", fromlist=[name])
            )
        except ImportError:
            pass
    return mods


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(mod.QUERIES)
    return out


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLE_SQL)
    return out
