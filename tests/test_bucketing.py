"""Bucketing: pre-shuffled persistent layout so repeated joins on the
bucket key are co-located — the no-shuffle-join strategy the 100 TB plan
leans on (SURVEY §4: physical strategies the reference lacks)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    from pedri_analysis_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    orders = load_table(spark, "orders", sf)
    customer = load_table(spark, "customer", sf)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        customer.withColumnRenamed("c_custkey", "o_custkey")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_customer")
    )
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
