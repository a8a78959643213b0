"""Incremental MV maintenance: the delta-apply path must (a) produce the
same rollup as a from-scratch recompute and (b) never scan the raw fact
history — only the stored MV, the key-sized stored snapshot, and the
delta batch."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pedri_analysis_spark.plans.resolution_queries import (
    CDC_CUTOFF_US,
    QUERIES,
    apply_rollup_delta,
    rollup_from_snapshot,
)
from pedri_analysis_spark.plans.relational import events_us

SF = "/root/testdata/sf0.01"


def _materialized_inputs(spark, tmp_path):
    """Simulate the stored state a real maintenance cycle starts from:
    MV, base snapshot, and the CDC batch each persisted to parquet."""
    ev = events_us(spark, SF).select("user_id", "event_type", "ts_us", "event_id")
    latest_w = W.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    base_snapshot = (
        ev.filter(F.col("ts_us") < CDC_CUTOFF_US)
        .withColumn("rn", F.row_number().over(latest_w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    changelog = ev.filter(F.col("ts_us") >= CDC_CUTOFF_US)
    paths = {}
    for name, df in (
        ("base_mv", rollup_from_snapshot(base_snapshot)),
        ("base_snapshot", base_snapshot),
        ("changelog", changelog),
    ):
        p = str(tmp_path / name)
        df.write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths


def test_delta_apply_equals_recompute(spark, tmp_path):
    paths = _materialized_inputs(spark, tmp_path)
    maintained = apply_rollup_delta(
        spark.read.parquet(paths["base_mv"]),
        spark.read.parquet(paths["base_snapshot"]),
        spark.read.parquet(paths["changelog"]),
    )
    got = {r["state_type"]: r["n_users"] for r in maintained.collect()}

    ev = events_us(spark, SF).select("user_id", "event_type", "ts_us", "event_id")
    latest_w = W.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    scratch = rollup_from_snapshot(
        ev.withColumn("rn", F.row_number().over(latest_w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    want = {r["state_type"]: r["n_users"] for r in scratch.collect()}
    assert got == want
    assert sum(got.values()) > 0


def test_delta_path_never_scans_base_fact(spark, tmp_path):
    # The whole point of maintenance: the plan over stored inputs must
    # read ONLY those inputs — any events.parquet scan means the
    # "incremental" path silently recomputes from raw history.
    paths = _materialized_inputs(spark, tmp_path)
    maintained = apply_rollup_delta(
        spark.read.parquet(paths["base_mv"]),
        spark.read.parquet(paths["base_snapshot"]),
        spark.read.parquet(paths["changelog"]),
    )
    maintained.collect()
    # toString() truncates long Location fields per line; the formatted
    # explain lists every scan's full path, so both the negative and the
    # positive-control assertions below actually see the locations.
    plan = spark._jvm.PythonSQLUtils.explainString(
        maintained._jdf.queryExecution(), "formatted"
    )
    assert "events.parquet" not in plan, plan
    for name in ("base_mv", "base_snapshot", "changelog"):
        assert name in plan, (name, plan)


def test_registered_query_matches_delta_apply(spark, tmp_path):
    # The registered query (which derives base state inline) must agree
    # with the stored-state maintenance cycle.
    paths = _materialized_inputs(spark, tmp_path)
    stored = {
        r["state_type"]: r["n_users"]
        for r in apply_rollup_delta(
            spark.read.parquet(paths["base_mv"]),
            spark.read.parquet(paths["base_snapshot"]),
            spark.read.parquet(paths["changelog"]),
        ).collect()
    }
    registered = {
        r["state_type"]: r["n_users"]
        for r in QUERIES["incremental_rollup_merge"](spark, SF).collect()
    }
    assert stored == registered
