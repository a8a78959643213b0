"""Bucketed-table co-located join: the persisted co-partitioning must
actually remove the join-side shuffles AND produce results identical to
the raw-parquet join (materialization is an optimization, never a
semantic change)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pedri_analysis_spark.plans.layout_queries import (
    QUERIES,
    bucketed_join_frame,
    ensure_bucketed_tables,
)
from pedri_analysis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_tables_registered_with_buckets(spark):
    orders_tbl, cust_tbl = ensure_bucketed_tables(spark, SF)
    for tbl in (orders_tbl, cust_tbl):
        ddl = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        text = "\n".join(f"{r.col_name} {r.data_type}" for r in ddl)
        assert "Num Buckets 16" in text, text
        assert "Bucket Columns" in text


def test_bucketed_join_has_no_exchange_or_sort(spark):
    # At test scale the dim fits a broadcast, so the planner (correctly)
    # prefers BHJ and ignores bucketing.  The property bucketing buys is
    # for the both-sides-big case — pin it by disabling auto-broadcast,
    # which is exactly the 100 TB fact⋈fact planning situation.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join_frame(spark, SF)
        j.collect()
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    assert "SelectedBucketsCount: 16 out of 16" in plan, plan
    # Co-located: neither side may shuffle.  (A per-partition Sort node
    # remains: Spark ignores sortBy ordering on read unless the legacy
    # spark.sql.legacy.bucketedTableScan.outputOrdering flag is set —
    # SPARK-28632 — because >1 file per bucket would need a merge read.
    # The sort is exchange-free and in-memory-run-sorted; the shuffle is
    # the cost bucketing exists to remove.)
    assert "Exchange" not in plan, plan


def test_existing_bucketed_dir_is_reregistered_not_rewritten(spark):
    # A later PROCESS (fresh in-memory catalog) must reuse a complete
    # on-disk bucketed table by registering it externally — not rmtree it
    # (clobbering a sibling session mid-read) and re-shuffle the fact
    # table.  Simulate the fresh-catalog state: stash the files, drop the
    # managed table (which deletes them), restore the files, re-ensure.
    import os
    import shutil

    orders_tbl, _ = ensure_bucketed_tables(spark, SF)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    on_disk = os.path.join(wh, orders_tbl.lower())
    stash = on_disk + ".stash"
    shutil.copytree(on_disk, stash)
    try:
        # DROP deletes the files only for a MANAGED table; if a prior
        # ensure already re-registered it as EXTERNAL the files survive —
        # remove them explicitly so the restore below is the only copy.
        spark.sql(f"DROP TABLE {orders_tbl}")
        shutil.rmtree(on_disk, ignore_errors=True)
        shutil.move(stash, on_disk)
        ensure_bucketed_tables(spark, SF)
        ddl = spark.sql(f"DESCRIBE TABLE EXTENDED {orders_tbl}").collect()
        text = "\n".join(f"{r.col_name} {r.data_type}" for r in ddl)
        assert "EXTERNAL" in text, text
        assert "Num Buckets 16" in text, text
        n = spark.table(orders_tbl).count()
        assert n == load_table(spark, "orders", SF).count()
    finally:
        shutil.rmtree(stash, ignore_errors=True)


def test_mismatched_spec_is_rewritten_not_trusted(spark):
    # A dir whose spec marker disagrees with the current code (changed
    # bucket count, key, or schema — or a foreign parquet dir squatting
    # on the path with _SUCCESS but no marker) must be REWRITTEN, never
    # re-registered: catalog bucket DDL over wrong-hashed files silently
    # drops join matches.
    import json
    import os
    import shutil

    from pedri_analysis_spark.plans.layout_queries import BUCKET_SPEC_MARKER

    orders_tbl, _ = ensure_bucketed_tables(spark, SF)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    on_disk = os.path.join(wh, orders_tbl.lower())
    marker = os.path.join(on_disk, BUCKET_SPEC_MARKER)
    with open(marker) as f:
        good = json.load(f)

    # Simulate a fresh process whose warehouse holds a dir written under
    # a DIFFERENT bucketing (e.g. an older JOIN_BUCKETS).
    spark.sql(f"DROP TABLE {orders_tbl}")  # external: files survive
    bad = dict(good, n_buckets=8)
    with open(marker, "w") as f:
        json.dump(bad, f)
    ensure_bucketed_tables(spark, SF)
    with open(marker) as f:
        assert json.load(f) == good  # rewritten under the current spec
    assert os.path.isfile(os.path.join(on_disk, "_SUCCESS"))
    n = spark.table(orders_tbl).count()
    assert n == load_table(spark, "orders", SF).count()

    # And a legacy/foreign dir with _SUCCESS but NO marker is also
    # rewritten rather than trusted.
    spark.sql(f"DROP TABLE {orders_tbl}")
    os.remove(marker)
    ensure_bucketed_tables(spark, SF)
    assert os.path.isfile(marker)
    assert spark.table(orders_tbl).count() == n
    shutil.rmtree(on_disk + ".stash", ignore_errors=True)


def test_bucketed_join_matches_raw_join(spark):
    got = {
        r["c_mktsegment"]: (r["n_orders"], r["revenue"])
        for r in QUERIES["bucketed_join_segment_revenue"](spark, SF).collect()
    }
    o = load_table(spark, "orders", SF)
    c = load_table(spark, "customer", SF)
    want = {
        r["c_mktsegment"]: (r["n"], r["rev"])
        for r in (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                .cast("double")
                .alias("rev"),
            )
            .collect()
        )
    }
    assert got == want
