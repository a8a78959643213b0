"""Parquet table sources for the synthetic benchmark schema.

Reads are plain ``spark.read.parquet`` — columnar, with predicate pushdown
and column pruning handled by Catalyst.  Keep reads lazy and unmaterialized:
callers compose filters/projections and Catalyst pushes them into the scan
(verify with ``df.explain`` → ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pedri_analysis_spark.schema import ALL_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# SQL confs the engine's semantics depend on, applied defensively to
# whatever session the caller hands us (the correctness driver builds its
# own SparkSession without our factory):
#  - UTC session TZ: NTZ->TIMESTAMP casts are identity, matching the
#    DuckDB oracle's naive timestamps.
#  - nanosAsLong: safety net only — the current events table is
#    timestamp[us] (reads as TIMESTAMP_NTZ), but a NANOS-precision
#    regeneration would be unreadable as timestamps by Spark 4; with this
#    set it degrades to BIGINT epoch-nanos, which events_us handles.
# All are runtime-settable (spark.sql.*), unlike JVM-level settings.
_REQUIRED_SQL_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_session_conf(spark: SparkSession) -> None:
    for k, v in _REQUIRED_SQL_CONF.items():
        spark.conf.set(k, v)


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one synthetic table (``region nation customer supplier part
    orders lineitem events documents embeddings``) as a DataFrame."""
    ensure_session_conf(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in ALL_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so workloads can use spark.sql."""
    for name in ALL_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
