"""Cross-validate the zone_map_skipping_audit (draft_r13) against REAL
Spark partition pruning: write the same orders under both audited
layouts as partitioned parquet, run the audit's 1996-Q1 predicate, and
read the scan's own metrics.  The audit's claim — the date layout reads
its calendar share, the natural layout reads everything — must hold in
the engine's actual file listing, not just in the audit's arithmetic.

Block-boundary note: partition pruning keeps every week directory whose
WEEK INDEX intersects the range, while the audit consults present-day
min/max zone maps — a boundary week whose present days all fall outside
the range is pruned by the audit but listed by the directory filter, so
the engine may read up to 2 more blocks (one per edge) than the audit
predicts, never fewer."""

from __future__ import annotations

ZM_PRED = (9496, 9586)  # 1996-Q1 in epoch days (ZM_PREDICATES pid=2)
SF_DIR = "/root/testdata/sf0.001"


def _scan_metrics(df) -> dict:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "FileSourceScan" in node.getClass().getSimpleName():
            mets = node.metrics()
            out = {}
            it = mets.keys().iterator()
            while it.hasNext():
                k = it.next()
                out[k] = mets.apply(k).value()
            return out
    raise AssertionError("no FileSourceScanExec leaf found")


def test_zone_map_audit_matches_real_partition_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    from pedri_analysis_spark.plans import draft_r13 as d
    from pedri_analysis_spark.plans.draft_r13 import ZM_BLOCK_DAYS, ZM_BLOCK_KEYS

    audit = {
        (r["layout"], r["pid"]): r
        for r in d.QUERIES["zone_map_skipping_audit"](spark, SF_DIR).collect()
    }
    lo, hi = ZM_PRED
    a_nat, a_byd = audit[("natural", 2)], audit[("bydate", 2)]

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    day = F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    nat_dir, byd_dir = str(tmp_path / "nat"), str(tmp_path / "byd")
    o.withColumn("pblock", F.expr(f"o_orderkey div {ZM_BLOCK_KEYS}")).write.partitionBy(
        "pblock"
    ).parquet(nat_dir)
    o.withColumn("pweek", (day / ZM_BLOCK_DAYS).cast("bigint")).write.partitionBy(
        "pweek"
    ).parquet(byd_dir)

    pred = (
        f"o_orderdate >= TIMESTAMP'1996-01-01' AND "
        f"o_orderdate <= TIMESTAMP'1996-03-31'"
    )
    # the natural layout cannot map the date predicate to its partition
    # column — the engine lists every block, exactly as the audit scores
    m_nat = _scan_metrics(spark.read.parquet(nat_dir).filter(pred))
    assert m_nat["numPartitions"] == a_nat["n_blocks"] == a_nat["blocks_read"]

    # the date layout maps the predicate to a week range — partition
    # pruning reads the audit's blocks (± the boundary-week slack)
    wlo, whi = lo // ZM_BLOCK_DAYS, hi // ZM_BLOCK_DAYS
    m_byd = _scan_metrics(
        spark.read.parquet(byd_dir).filter(
            f"pweek >= {wlo} AND pweek <= {whi} AND {pred}"
        )
    )
    assert m_byd["numPartitions"] < a_byd["n_blocks"]  # pruning happened
    assert (
        a_byd["blocks_read"]
        <= m_byd["numPartitions"]
        <= a_byd["blocks_read"] + 2
    )
    # both plans return the same answer
    n1 = spark.read.parquet(nat_dir).filter(pred).count()
    n2 = spark.read.parquet(byd_dir).filter(pred).count()
    assert n1 == n2 > 0
