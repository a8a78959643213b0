"""spread()'s split estimator must agree with the physical-plan probe it
replaced (r16: the df.rdd.getNumPartitions() probe forced physical
planning on every call — operators/__init__._estimated_scan_splits now
replays Spark's split-packing arithmetic over the source files instead)."""

from __future__ import annotations

import pytest

from pedri_analysis_spark.operators import _estimated_scan_splits, spread
from pedri_analysis_spark.sources import load_table

from conftest import SF_DIR

TABLES = ["lineitem", "orders", "documents", "embeddings", "customer"]


@pytest.mark.parametrize("table", TABLES)
def test_estimate_matches_exact_probe(spark, table):
    df = load_table(spark, table, SF_DIR)
    est = _estimated_scan_splits(df)
    assert est is not None, "local parquet scan must take the cheap path"
    assert est == df.rdd.getNumPartitions()


def test_estimate_on_projection_and_filter(spark):
    from pyspark.sql import functions as F

    df = load_table(spark, "lineitem", SF_DIR).select("l_orderkey").filter(
        F.col("l_orderkey") > 0
    )
    est = _estimated_scan_splits(df)
    assert est == df.rdd.getNumPartitions()


def test_non_file_frame_falls_back(spark):
    df = spark.range(10)
    assert _estimated_scan_splits(df) is None
    # spread still behaves (falls back to the exact probe)
    out = spread(df)
    assert out.count() == 10


def test_post_shuffle_frame_falls_back(spark):
    """A frame whose partitioning is no longer the scan's split count
    (aggregate / union / repartition downstream) must NOT take the
    file-based estimate — spread() would otherwise insert a pointless
    repartition over an already-parallel frame (the r16 cascade bug)."""
    from pyspark.sql import functions as F

    base = load_table(spark, "documents", SF_DIR)
    agg = base.groupBy("lang").count()
    assert _estimated_scan_splits(agg) is None
    unioned = base.select("doc_id").unionByName(base.select("doc_id"))
    assert _estimated_scan_splits(unioned) is None
    rep = base.repartition(4)
    assert _estimated_scan_splits(rep) is None
    # and spread() on the aggregate matches the old exact-probe decision
    target = spark.sparkContext.defaultParallelism
    n_exact = agg.rdd.getNumPartitions()
    out = spread(agg)
    if n_exact < target:
        assert out.rdd.getNumPartitions() == target
    else:
        assert out is agg


def test_spread_decision_unchanged(spark):
    """spread() must repartition exactly when the old probe would have."""
    target = spark.sparkContext.defaultParallelism
    df = load_table(spark, "documents", SF_DIR)
    n_exact = df.rdd.getNumPartitions()
    out = spread(df)
    if n_exact < target:
        assert out.rdd.getNumPartitions() == target
    else:
        assert out is df
