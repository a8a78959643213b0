"""AQE skew-join handling: data_skew_report *finds* skewed keys; this
pins that the engine *handles* one — a join whose shuffle lands ~90% of
the fact rows on a single key must be split by AQE's skew-join rule
(``SortMergeJoin(skew=true)`` / ``AQEShuffleRead skewed`` in the final
adaptive plan), not run as one straggler task.  This is the runtime
half of the salting story: at 100 TB the documented path is AQE first
(no code change, no key rewrite), manual salting only where AQE can't
see the skew (e.g. pre-shuffle aggregation keys).

Two mechanics this test encodes for the 100 TB reader:

* AQE splits a skewed REDUCE partition at MAPPER-output boundaries, so
  the skewed stage's input must arrive from >1 map task (one giant
  unsplittable file upstream ⇒ one mapper ⇒ nothing to split — at
  cluster scale inputs always have many splits; at test scale we
  repartition first to reproduce that).
* The rule pattern-matches SMJ over Sort-over-shuffle-stage on BOTH
  sides; an aggregate sitting between the dim's shuffle and the join
  (e.g. distinct()) opts that side's plan shape out of skew handling.

Complements tests/test_plans.py::test_aqe_skew_join_splits_hot_partition
(synthetic spark.range): this one drives the REAL fact table through
the parquet scan path, where the one-file/one-mapper pitfall actually
bites.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pedri_analysis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"

# Production knobs scaled to sf0.01's shuffle sizes — the *mechanism*
# under test is scale-free.  Originals restored after the test.
_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    # Both sides must stay shuffle-joined for the skew rule to apply.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # Coalescing can merge away the partition-size evidence at this SF.
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_skewed_join(spark):
    prev = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, "lineitem", SF)
        # Synthetic hot key: ~90% of fact rows collapse onto key 1 —
        # the shape data_skew_report exists to catch in real corpora.
        # repartition(8): give the join shuffle >1 mapper (see module
        # docstring) the way any cluster-scale scan would.
        fact = li.select(
            F.when(F.col("l_suppkey") % 10 != 0, F.lit(1))
            .otherwise(F.col("l_suppkey"))
            .alias("k"),
            "l_extendedprice",
            # widen rows so the hot partition clears the byte threshold
            F.concat_ws("|", "l_orderkey", "l_partkey", "l_returnflag",
                        "l_linestatus", "l_shipdate").alias("pad"),
        ).repartition(8)
        # Plain range dim (NOT distinct(): its post-shuffle aggregate
        # would break the skew rule's plan-shape match — see docstring).
        mx = li.agg(F.max("l_suppkey")).collect()[0][0]
        dim = spark.range(0, mx + 1).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
        )
        j = fact.join(dim, "k")
        # Execute THIS frame (count() would build its own plan and leave
        # j's adaptive plan unfinalized).
        n = len(j.collect())
        assert n == fact.count()  # every fact key exists in the dim
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
