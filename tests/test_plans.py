"""Physical-plan assertions: the properties that make these queries scale
(pushdown, broadcast, top-k heap, no accidental cartesian products) are
pinned here so a refactor that silently loses them fails CI."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark):
    from pedri_analysis_spark.plans.relational import QUERIES

    plan = _plan(QUERIES["filter_project"](spark, SF))
    assert "PushedFilters: [" in plan
    # the pushed-filter list must actually contain our predicates
    assert "GreaterThanOrEqual(l_shipdate" in plan or "IsNotNull(l_shipdate)" in plan
    # column pruning: untouched wide columns are absent from ReadSchema
    assert "l_returnflag" not in plan.split("ReadSchema")[-1]


def test_star_join_broadcasts_dims(spark):
    from pedri_analysis_spark.plans.relational import QUERIES

    plan = _plan(QUERIES["join_star_region_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "SortMergeJoin" not in plan  # the fact table must not shuffle-join


def test_topk_uses_heap_not_global_sort(spark):
    from pedri_analysis_spark.plans.relational import QUERIES

    plan = _plan(QUERIES["topk_orders"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_semi_join_is_semi(spark):
    from pedri_analysis_spark.plans.relational import QUERIES

    plan = _plan(QUERIES["semi_join_big_spenders"](spark, SF))
    assert "LeftSemi" in plan


def test_pricing_summary_partial_agg(spark):
    from pedri_analysis_spark.plans.relational import QUERIES

    plan = _plan(QUERIES["pricing_summary"](spark, SF))
    # two-phase hash aggregation (map-side partial combine before shuffle);
    # with AQE the pre-execution plan string hides codegen markers, so we
    # assert on the partial aggregate directly
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_no_python_udf_in_relational_suite(spark):
    """Everything in the relational/dedup/text suites is pure Column
    expressions — Python must not appear in the row path (similarity's
    vectorized cosine is the one deliberate ArrowEvalPython)."""
    from pedri_analysis_spark.plans import (
        dedup_queries,
        pipeline_queries,
        relational,
        relational_ext,
        sampling_queries,
        text_queries,
    )

    for mod in (
        relational,
        relational_ext,
        sampling_queries,
        dedup_queries,
        text_queries,
        pipeline_queries,
    ):
        for name, fn in mod.QUERIES.items():
            plan = _plan(fn(spark, SF))
            assert "BatchEvalPython" not in plan, f"row-at-a-time python UDF in {name}"


def test_band_join_broadcasts_never_cartesian(spark):
    from pedri_analysis_spark.plans.relational_ext import QUERIES

    plan = _plan(QUERIES["band_join_event_values"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # tiny band dim broadcast
    assert "CartesianProduct" not in plan
    # extreme pruning: only the join column is read from the fact table
    read = plan.split("ReadSchema")[-1]
    assert "value" in read and "props" not in read and "event_type" not in read


def test_moving_average_single_shuffle(spark):
    from pedri_analysis_spark.plans.relational_ext import QUERIES

    plan = _plan(QUERIES["window_moving_average"](spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle on user_id
    assert "RowFrame, -6" in plan  # bounded frame, not unbounded


def test_stats_moments_partial_agg_single_shuffle(spark):
    from pedri_analysis_spark.plans.relational_ext import QUERIES

    plan = _plan(QUERIES["stats_moments_exact"](spark, SF))
    assert "partial_sum" in plan  # map-side combine of the moments
    assert plan.count("Exchange hashpartitioning") == 1
    read = plan.split("ReadSchema")[-1]
    assert "l_orderkey" not in read  # untouched columns pruned


def test_sampling_is_pure_scan_predicate(spark):
    from pedri_analysis_spark.plans.sampling_queries import QUERIES

    plan = _plan(QUERIES["sample_hash_bernoulli"](spark, SF))
    assert "Exchange" not in plan  # no shuffle to sample
    read = plan.split("ReadSchema")[-1]
    assert "text" not in read  # decision needs doc_id only; text never read


def test_ivf_partitioned_probe_prunes(spark, tmp_path):
    """The written IVF index is partitioned by cluster and a probe scan
    prunes to exactly the probed buckets (PartitionFilters, not a
    post-scan filter)."""
    from pedri_analysis_spark.operators import similarity as sim
    from pedri_analysis_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", SF).select("vec_id", "embedding")
    centroids = emb.filter(emb.vec_id < 4).select(
        emb.vec_id.alias("cid"), "embedding"
    )
    assigned = sim.ivf_assign(emb, centroids)
    path = str(tmp_path / "ivf_index")
    sim.write_ivf_index(assigned, path)

    probe = sim.read_ivf_candidates(spark, path, [1, 3])
    plan = _plan(probe)
    # pruning happens at the partition level, inside the scan node
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters")[1][:120]
    # and the probed scan returns only the two buckets' vectors
    clusters = {r.cluster for r in probe.select("cluster").distinct().collect()}
    assert clusters == {1, 3}
    total = load_table(spark, "embeddings", SF).count()
    assert probe.count() < total


def test_contamination_matches_grams_via_hash_join(spark):
    """Eval-gram matching must be an EQUI-join on the gram key — never a
    per-row intersect against a broadcast array (the r7 design: its cost
    was |corpus| × |eval grams|, measured 40× for 10× data in the r8
    scaling decade) and never a cartesian/BNLJ."""
    from pedri_analysis_spark.plans.pipeline_queries import QUERIES

    plan = _plan(QUERIES["contamination_ngram_overlap"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the quadratic per-row scoring primitive must be gone
    assert "array_intersect" not in plan
    # gram match + the left join-back of per-doc hit counts are both
    # proper equi-joins (hash or sort-merge, planner's choice)
    assert plan.count("HashJoin") + plan.count("SortMergeJoin") >= 2


def test_sq_recall_single_ranking_shuffle(spark):
    """Both per-query rankings (exact + quantized) share one window
    partition key, so they must plan over a single qid exchange; the
    query side joins via broadcast."""
    from pedri_analysis_spark.plans.similarity_queries import QUERIES

    plan = _plan(QUERIES["sq_recall_at_k"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    # one hash exchange on qid feeds both window sorts
    import re

    qid_exchanges = len(re.findall(r"Exchange hashpartitioning\(qid", plan))
    assert qid_exchanges == 1, f"expected 1 qid exchange, got {qid_exchanges}"


def test_sequence_packing_shuffles_only_on_shard(spark):
    """Packing must never shuffle document text — only the narrow
    (doc_id, shard, n_tok) projection reaches the exchange."""
    from pedri_analysis_spark.plans.pipeline_queries import QUERIES

    plan = _plan(QUERIES["sequence_packing"](spark, SF))
    assert "CartesianProduct" not in plan
    # plans print top-down: everything before the Exchange line is above
    # the shuffle — the text column must not survive past the map side
    assert "text#" not in plan.split("Exchange", 1)[0]
    assert plan.count("Exchange hashpartitioning") == 1  # shard only


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Scale feature: for a selective dim filter joined against a big
    fact, Spark injects a runtime bloom filter on the probe side (rows
    failing might_contain never reach the shuffle). Pinned here with the
    size thresholds lowered — at 100 TB the defaults trigger it on real
    fact/dim sizes."""
    from pyspark.sql import functions as F

    keep = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for k in keep:
        keep[k] = spark.conf.get(k)
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        assert "bloom_filter_agg" in plan  # built on the selective side
        assert "partial_bloom_filter_agg" in plan  # distributed, two-phase
    finally:
        for k, v in keep.items():
            spark.conf.set(k, v)


def test_events_us_handles_both_parquet_ts_encodings(spark, tmp_path):
    """Regression (round-4 outage): events_us must yield identical epoch-µs
    whether the events parquet stores timestamp[us] (reads as
    TIMESTAMP_NTZ) or timestamp[ns] (BIGINT epoch-nanos under the
    session's nanosAsLong) — a testdata regeneration flipped the encoding
    once and silently broke every event-time query."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pedri_analysis_spark.plans.relational import events_us

    ts_us_vals = [1_700_000_000_000_000 + i * 1_234_567 for i in range(10)]
    base = {
        "event_id": pa.array(range(10), pa.int64()),
        "user_id": pa.array([i % 3 for i in range(10)], pa.int64()),
        "event_type": pa.array(["click"] * 10),
        "value": pa.array([float(i) for i in range(10)]),
        "props": pa.array(["{}"] * 10),
    }

    us_dir = tmp_path / "us"
    ns_dir = tmp_path / "ns"
    for d, ts_arr in (
        (us_dir, pa.array(ts_us_vals, pa.timestamp("us"))),
        (ns_dir, pa.array([v * 1000 for v in ts_us_vals], pa.timestamp("ns"))),
    ):
        d.mkdir()
        pq.write_table(
            pa.table({**base, "ts": ts_arr}), str(d / "events.parquet")
        )

    got_us = events_us(spark, str(us_dir))
    got_ns = events_us(spark, str(ns_dir))
    assert dict(got_us.dtypes)["ts_us"] == "bigint"
    assert dict(got_ns.dtypes)["ts_us"] == "bigint"
    for got in (got_us, got_ns):
        rows = {r["event_id"]: r["ts_us"] for r in got.select("event_id", "ts_us").collect()}
        assert rows == dict(enumerate(ts_us_vals))


def test_load_table_rejects_undispatched_nanos_ts(spark, tmp_path):
    """Close the nanosAsLong global-conf hole (r5 verdict): a FUTURE
    nanos-precision timestamp column in any table other than events.ts has
    no dtype-dispatch handler, so load_table must fail with a pointed
    message instead of letting it silently arrive as BIGINT epoch-nanos."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pedri_analysis_spark.sources.tables import load_table, parquet_ts_unit

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_placed_at": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")),
            }
        ),
        str(d / "orders.parquet"),
    )
    with pytest.raises(AssertionError, match="nanosecond-precision"):
        load_table(spark, "orders", str(d))

    # events.ts nanos IS dispatched (events_us / with_event_time) — loads fine.
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([1_700_000_000_000_000_000], pa.timestamp("ns")),
            }
        ),
        str(d / "events.parquet"),
    )
    assert load_table(spark, "events", str(d)).count() == 1
    # footer-probe helper the streaming tests use to verify the on-disk
    # encoding matches EVENTS_TABLE_SCHEMA before a schema'd readStream
    assert parquet_ts_unit(str(d / "events.parquet"), "ts") == "ns"
    assert parquet_ts_unit(str(d / "orders.parquet"), "o_orderkey") is None


def test_training_shuffle_single_exchange_pruned_scan(spark):
    """The shard manifest must be one partial-agg shuffle over a scan
    pruned to (doc_id, n_chars) — no sort, no join."""
    from pedri_analysis_spark.plans.sampling_queries import QUERIES

    plan = _plan(QUERIES["training_shuffle_shards"](spark, SF))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    read = plan.split("ReadSchema")[-1]
    assert "doc_id" in read and "n_chars" in read and "text" not in read


def test_semantic_dedup_no_cartesian(spark):
    """SemDeDup's pair generation must be keyed on the cluster (blocked
    self-join), never a cartesian product; centroid assignment is a
    broadcast-free literal argmin map."""
    from pedri_analysis_spark.plans.similarity_queries import QUERIES

    plan = _plan(QUERIES["semantic_dedup_prune"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_layout_broadcasts_bounds_single_rollup_shuffle(spark):
    """Z-order manifest: the quantization bounds join must be a broadcast
    of the 1-row aggregate (never a shuffle join) and the per-bucket
    rollup the only wide exchange."""
    from pedri_analysis_spark.plans.layout_queries import QUERIES

    plan = _plan(QUERIES["zorder_layout_orders"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_salted_skew_join_stays_sort_merge_with_exploded_dim(spark):
    """The salting demo must keep its shuffle-join shape: a sort-merge
    join on (jkey, salt) with the dim side exploded per salt — if it
    silently became a broadcast join the salting would demonstrate
    nothing."""
    from pedri_analysis_spark.plans.relational_ext import QUERIES

    plan = _plan(QUERIES["salted_skew_join"](spark, SF))
    assert "SortMergeJoin" in plan
    assert "Generate explode" in plan or "Expand" in plan or "explode" in plan
    assert "BroadcastHashJoin" not in plan.split("SortMergeJoin")[0]


def test_aqe_coalesces_shuffle_partitions_at_runtime(spark):
    """AQE must be live, not just configured: after execution the final
    adaptive plan coalesces the low-cardinality aggregate's shuffle
    partitions (the runtime re-plan that keeps small-group stages from
    scheduling one task per static shuffle partition)."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()
    plan = _plan(df)
    assert "AdaptiveSparkPlan isFinalPlan=true" in plan
    assert "AQEShuffleRead" in plan and "coalesced" in plan


def test_weighted_sample_heap_no_shuffle(spark):
    """A-ES weighted sampling must be a per-row priority + top-K heap
    (TakeOrderedAndProject) — no global sort, no Exchange beyond the
    K-row driver merge."""
    from pedri_analysis_spark.plans.sampling_queries import QUERIES

    plan = _plan(QUERIES["weighted_sample_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # never a global sort


def test_mixture_plan_single_aggregate(spark):
    """Mixture planning is ONE partial+final aggregate on source plus
    literal arithmetic — a single Exchange, no join."""
    from pedri_analysis_spark.plans.sampling_queries import QUERIES

    plan = _plan(QUERIES["mixture_plan"](spark, SF))
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """SCALE.md's automatic-skew claim, proven: on a planted hot key,
    AQE rewrites the shuffle join to SortMergeJoin(skew=true) with an
    AQEShuffleRead-skewed input — the runtime complement to the manual
    salting demo (salted_skew_join).

    Two pinned gotchas: the plan must be read from the EXECUTED
    QueryExecution of the collected frame (a .write clones the QE and
    hides the adaptive result), and the consumer must not require hash
    distribution on the join key (a groupBy(join_key) forbids the split
    — exactly the case where manual salting remains necessary)."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    keep = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(400_000).select(
            F.when(F.col("id") % 50 == 0, F.col("id") % 32 + 1)
            .otherwise(0)
            .alias("k"),
            F.repeat(
                F.concat(F.lit("payload-"), F.col("id").cast("string")), 8
            ).alias("payload"),
        )
        dim = spark.range(33).select(F.col("id").alias("k"), F.lit("d").alias("dval"))

        # global agg consumer: no distribution requirement -> split allowed
        free = fact.join(dim, "k").groupBy().count()
        assert free.collect()[0][0] == 400_000
        plan = _plan(free)
        assert "skew=true" in plan, "AQE did not split the hot partition"
        assert "AQEShuffleRead skewed" in plan

        # groupBy on the join key: required distribution forbids the split
        # (50n mod 32 spans only the 16 even residues, so 17 keys join)
        bound = fact.join(dim, "k").groupBy("k").count()
        assert bound.count() == 17
        assert "skew=true" not in _plan(bound)
    finally:
        for k, v in keep.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_feature_queries_single_fact_scan(spark):
    """The r6 featurizers must keep their single-scan shapes: the
    groupwise argmin is ONE struct-min aggregate over one lineitem scan
    (not the two-scan join-back the oracle uses), the target encoder
    derives global totals from a window over segment rows (not a second
    aggregate branch rescanning the join), and the bigram LM derives
    context counts from a window over the bigram rows (not a second
    explode of the corpus)."""
    from pedri_analysis_spark.plans.feature_queries import QUERIES

    plan = _plan(QUERIES["cheapest_supplier_per_part"](spark, SF))
    assert plan.count("lineitem.parquet") == 1
    # one shuffle (the partkey agg); the dims arrive via BroadcastExchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan

    plan = _plan(QUERIES["target_encode_mktsegment"](spark, SF))
    assert plan.count("orders.parquet") == 1
    assert plan.count("customer.parquet") == 1
    assert "Window" in plan and "CartesianProduct" not in plan

    plan = _plan(QUERIES["bigram_lm_topk"](spark, SF))
    assert plan.count("documents.parquet") == 1
    assert plan.count("Generate") == 1  # one explode of the corpus
    assert "TakeOrderedAndProject" in plan


def test_feature_hash_partial_aggregates(spark):
    """The hashing trick must partial-aggregate map-side: the plan's
    first HashAggregate runs before the exchange so the shuffle carries
    <= buckets rows per task, and the hash itself is JVM expressions
    (no Python boundary)."""
    from pedri_analysis_spark.plans.feature_queries import QUERIES

    plan = _plan(QUERIES["feature_hash_buckets"](spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_q19_disjunction_pushes_union_bounds_to_both_scans(spark):
    """The OR-of-conjunctions predicate must not stay post-join only:
    Catalyst extracts each side's union-of-branches implication and
    pushes it into that side's parquet scan (quantity bounds to
    lineitem, brand/size disjunction to part)."""
    import io
    from contextlib import redirect_stdout

    from pedri_analysis_spark.plans.advanced_queries import QUERIES

    # _plan()'s toString() truncates long pushed-filter lists; formatted
    # explain keeps them whole.
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES["disjunctive_revenue_q19"](spark, SF).explain("formatted")
    plan = buf.getvalue()
    # lineitem scan: the union quantity envelope [1, 30] as an OR chain
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan
    # part scan: the brand/size disjunction
    assert "EqualTo(p_brand,Brand#12)" in plan
    # and column pruning still holds on the fact side
    read = plan.split("ReadSchema")[1]
    assert "l_shipdate" not in read and "l_returnflag" not in read


def test_q21_per_order_aggregate_has_no_expand(spark):
    """sole_blame_suppliers must keep the two-stage-distinct shape: a
    double countDistinct would reintroduce an Expand (2x row
    multiplication) into the per-order aggregate."""
    from pedri_analysis_spark.plans.advanced_queries import QUERIES

    plan = _plan(QUERIES["sole_blame_suppliers"](spark, SF))
    assert "Expand" not in plan
    assert "TakeOrderedAndProject" in plan  # deterministic top-20 heap


def test_skyline_window_runs_over_distinct_points_only(spark):
    """The skyline's single-partition window is legal ONLY because it
    runs over the distinct (price, size) grid, never raw part rows — pin
    that the aggregate sits below the window."""
    from pedri_analysis_spark.plans.advanced_queries import QUERIES

    plan = _plan(QUERIES["skyline_parts_2d"](spark, SF))
    win = plan.index("Window")
    # a hash aggregate (the distinct-points groupBy) must feed the window
    assert "HashAggregate" in plan[win:], plan


def test_lift_deciles_rank_is_banded_never_global_sort_window(spark):
    """lift_decile_gains must compute its global rank with the banded
    distributed-rank trick: the fact-table window partitions by the band
    key (hashpartitioning on band), and NO Window node runs over an
    unpartitioned fact-sized input — the single-partition windows in the
    plan may only sit above the 10-row decile rollup / bounded band
    frame."""
    from pedri_analysis_spark.plans.feature_queries import QUERIES

    plan = _plan(QUERIES["lift_decile_gains"](spark, SF))
    assert "hashpartitioning(band" in plan
    # the fact row_number must be partitioned by band
    assert "row_number" in plan
    # every fact-side row_number Window must carry the band partition
    # spec — a global-sort ntile would plan an unpartitioned
    # row_number/ntile Window instead
    for line in plan.splitlines():
        if "row_number()" in line and "Window" in line:
            assert "band#" in line.split("windowspecdefinition")[1], line
    # and NO single-partition exchange may move fact-sized input: each
    # one must sit directly above a HashAggregate (the 10-row decile /
    # band rollups and global counts) or the allowlisted 1-row-broadcast
    # cross join over the decile rollup, mirroring test_skyline's
    # position-based check (r9 ADVICE fix — presence-only assertions
    # let a reintroduced global ntile slip through; a global sort/ntile
    # would put a Sort/Project/Scan child here instead)
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            nxt = lines[i + 1] if i + 1 < len(lines) else ""
            assert (
                "HashAggregate" in nxt or "BroadcastNestedLoopJoin" in nxt
            ), (
                "single-partition exchange over non-aggregated input:\n"
                + "\n".join(lines[i : i + 2])
            )


def test_attribution_windows_share_one_user_exchange(spark):
    """attribution_linear_touch's two windows (remaining-purchases scan,
    per-conversion touch count) must reuse ONE user_id hash exchange —
    Catalyst plans the (user_id, conv_rem) partition as a child of the
    user_id partitioning without a second fact shuffle."""
    from pedri_analysis_spark.plans.governance_queries import QUERIES

    plan = _plan(QUERIES["attribution_linear_touch"](spark, SF))
    n_user_exchanges = plan.count("hashpartitioning(user_id")
    assert n_user_exchanges == 1, plan[:2000]


def test_abc_cumulative_window_runs_post_rollup(spark):
    """abc_classification_suppliers: the fact table folds to the
    supplier rollup BEFORE the ranking window — the plan's only wide
    fact exchange is the suppkey aggregate, and the grand total joins
    back as a broadcast (never a shuffle join)."""
    from pedri_analysis_spark.plans.advanced_queries import QUERIES

    plan = _plan(QUERIES["abc_classification_suppliers"](spark, SF))
    assert "hashpartitioning(l_suppkey" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_snapshot_diff_is_one_full_outer_key_join(spark):
    """snapshot_diff_audit must plan as ONE FullOuter key join (hash or
    sort-merge — broadcastable at test SF) with no nested-loop fallback:
    the per-column drift flags are computed inline from the joined row,
    never as per-column subquery joins."""
    from pedri_analysis_spark.plans.resolution_queries import QUERIES

    plan = _plan(QUERIES["snapshot_diff_audit"](spark, SF))
    assert "FullOuter" in plan
    assert plan.count("FullOuter") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_nelson_aalen_fact_folds_before_windows(spark):
    """nelson_aalen_hazard: the fact join folds to the per-order
    min-shipdate rollup (one orderkey aggregate) BEFORE any window —
    the cumulative windows run on the horizon-bounded latency frame,
    never on fact-sized input."""
    from pedri_analysis_spark.plans.governance_queries import QUERIES

    plan = _plan(QUERIES["nelson_aalen_hazard"](spark, SF))
    assert "hashpartitioning(l_orderkey" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_adaptive_chunk_plan(spark, monkeypatch):
    """ngram_jaccard_near_dups (r9 chunk-cap, r10 adaptive + hashed):
    at the default cap every sf0.01 block fits, so the plan-time peek
    must emit the literally-UNCHUNKED plan — no chunk column, no
    rollup join (the isolated A/B measured the always-on chunk join at
    +0.45 s at sf0.1).  With the cap forced tiny the pair join must
    key on the hashed chunk cell (the O(N·CHUNK) bound) and the md5
    residue must appear in the plan."""
    from pedri_analysis_spark.plans import dedup_queries as dq
    from pedri_analysis_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sizes = (
        load_table(spark, "documents", SF)
        .groupBy("lang", F.expr("n_chars div 100").alias("bucket"))
        .count()
        .collect()
    )
    assert max(r["count"] for r in sizes) <= dq.NGRAM_CHUNK
    plan = _plan(dq.QUERIES["ngram_jaccard_near_dups"](spark, SF))
    assert "chunk" not in plan  # unchunked branch: bit-identical to r8
    assert "CartesianProduct" not in plan

    monkeypatch.setattr(dq, "NGRAM_CHUNK", 8)
    tiny = _plan(dq.QUERIES["ngram_jaccard_near_dups"](spark, SF))
    assert "chunk" in tiny and "md5" in tiny and "% nch" in tiny
    assert "CartesianProduct" not in tiny


def test_embedding_near_dups_adaptive_chunk_plan(spark, monkeypatch):
    """embedding_near_dups: same adaptive pin for the label block —
    sf0.01 plan unchunked, tiny cap keys the pair join on the hashed
    chunk cell."""
    from pedri_analysis_spark.plans import similarity_queries as sq
    from pedri_analysis_spark.sources.tables import load_table

    sizes = load_table(spark, "embeddings", SF).groupBy("label").count().collect()
    assert max(r["count"] for r in sizes) <= sq.EMBDUP_CHUNK
    plan = _plan(sq.QUERIES["embedding_near_dups"](spark, SF))
    assert "chunk" not in plan
    assert "CartesianProduct" not in plan

    monkeypatch.setattr(sq, "EMBDUP_CHUNK", 8)
    tiny = _plan(sq.QUERIES["embedding_near_dups"](spark, SF))
    assert "chunk" in tiny and "md5" in tiny and "% nch" in tiny
    assert "CartesianProduct" not in tiny


def test_record_linkage_adaptive_chunk_plan(spark, monkeypatch):
    """record_linkage_suppliers: nations are a fixed 25, so unchunked
    in-nation pairs grow O(N²) (51x on the r9 full-chain synth decade)
    — the sf0.01 register fits the cap (unchunked plan), and a tiny
    cap must key the cross-register join on the hashed chunk of the
    SHARED s_suppkey (co-chunked ground truth ⇒ no recall loss)."""
    from pedri_analysis_spark.plans import relational_ext as rx
    from pedri_analysis_spark.sources.tables import load_table

    sizes = load_table(spark, "supplier", SF).groupBy("s_nationkey").count().collect()
    assert max(r["count"] for r in sizes) <= rx.LINKAGE_CHUNK
    plan = _plan(rx.QUERIES["record_linkage_suppliers"](spark, SF))
    assert "chunk" not in plan
    assert "CartesianProduct" not in plan

    monkeypatch.setattr(rx, "LINKAGE_CHUNK", 4)
    tiny = _plan(rx.QUERIES["record_linkage_suppliers"](spark, SF))
    assert "chunk" in tiny and "md5" in tiny and "% nch" in tiny
    assert "CartesianProduct" not in tiny
