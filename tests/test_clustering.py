"""K-means semantics: deterministic init, full assignment coverage,
decimal-exact centroid means (order-independent across partitionings)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    from pedri_analysis_spark.sources.tables import load_table

    return load_table(spark, "embeddings", SF).select("vec_id", "embedding")


def test_kmeans_partitions_everything(spark, emb):
    from pedri_analysis_spark.operators.clustering import kmeans_fit

    cents, assigned = kmeans_fit(emb, k=4, iters=2)
    assert len(cents) == 4 and all(len(c) == 64 for c in cents)
    sizes = {r.cluster: r.n for r in assigned.groupBy("cluster").count()
             .withColumnRenamed("count", "n").collect()}
    assert set(sizes) == {0, 1, 2, 3}
    assert sum(sizes.values()) == emb.count()


def test_kmeans_centroids_partitioning_invariant(spark, emb):
    """The decimal-sum mean makes the model independent of physical
    partitioning — the 100 TB determinism property."""
    from pedri_analysis_spark.operators.clustering import kmeans_fit

    c1, _ = kmeans_fit(emb.repartition(1), k=3, iters=1)
    c32, _ = kmeans_fit(emb.repartition(32), k=3, iters=1)
    assert c1 == c32  # bit-identical, not approx


def test_kmeans_iterations_monotone_inertia(spark, emb):
    """More Lloyd rounds never increase total within-cluster distance."""
    from pyspark.sql import functions as F

    from pedri_analysis_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    def inertia(centroids):
        assigned = kmeans_assign(emb, centroids)
        from pedri_analysis_spark.operators.clustering import _dist2

        d = assigned.select(
            F.least(
                *[_dist2("embedding", c) for c in centroids]
            ).alias("d")
        )
        return d.agg(F.sum("d")).collect()[0][0]

    c1, _ = kmeans_fit(emb, k=4, iters=1)
    c3, _ = kmeans_fit(emb, k=4, iters=3)
    assert inertia(c3) <= inertia(c1) + 1e-9


def test_kmeans_centroids_drive_partitioned_ivf_index(spark, tmp_path):
    """Integration: kmeans_fit centroids feed ivf_assign and the written
    index partition-prunes probes — the honest 100 TB ANN layout
    (sampled-kmeans centroids + cluster-partitioned index)."""
    from pedri_analysis_spark.operators import similarity as sim
    from pedri_analysis_spark.operators.clustering import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    centroids, _assigned = kmeans_fit(emb, k=4, iters=2)
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, embedding array<float>",
    )
    assigned = sim.ivf_assign(emb, cent_df)
    path = str(tmp_path / "ivf_kmeans")
    sim.write_ivf_index(assigned, path)

    probe = sim.read_ivf_candidates(spark, path, [0, 2])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got = {r.cluster for r in probe.select("cluster").distinct().collect()}
    assert got <= {0, 2} and got  # only probed buckets are read
    assert probe.count() < emb.count()


def test_kmeans_empty_cluster_keeps_id_stable(spark):
    """Duplicate vectors in the init set empty a cluster after the first
    assignment; its id must survive with the previous centroid rather
    than silently renumbering the model."""
    from pedri_analysis_spark.operators.clustering import kmeans_fit

    rows = [(i, [1.0, 1.0]) for i in range(3)] + [
        (3, [9.0, 9.0]),
        (4, [9.5, 9.5]),
        (5, [1.1, 1.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids, assigned = kmeans_fit(df, k=4, iters=2)
    assert len(centroids) == 4  # ids 0..3 all present, none dropped
    got = {r.cluster for r in assigned.collect()}
    assert got <= {0, 1, 2, 3}
    # the duplicate-init clusters (1, 2) kept their original centroid
    assert centroids[1] == [1.0, 1.0] and centroids[2] == [1.0, 1.0]


def test_semantic_dedup_chunk_cap_bounds_pair_work(spark):
    """The SemDeDup pair stage must never compare across sub-chunks:
    clusters split into ceil(|cluster|/SEMDEDUP_CHUNK) cells by
    seeded_hash64(vec_id) (the r10 hashed MOD form — no per-cluster
    rank sort, only a k-row count rollup, and balance independent of
    id layout), so pair volume is O(N·CHUNK) — the linear-scale
    property the r8 sf0.1→sf1.0 decade measured (17x unchunked → ~5x
    chunked).  At the default 512 the sf0.01 corpus has nch == 1 for
    every cluster (all smaller than the cap), so the adaptive helper
    emits the unchunked plan (chunk == 0 literal) and results are
    bit-identical at correctness SFs.  With the cap forced tiny,
    hashed cells stay within ~2x of the cap and pairs only form within
    a cell."""
    from pedri_analysis_spark.operators.chunking import mod_chunk
    from pedri_analysis_spark.operators.clustering import kmeans_fit
    from pedri_analysis_spark.plans import similarity_queries as sq
    from pedri_analysis_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", SF).select("vec_id", "embedding")
    _, assigned = kmeans_fit(emb, k=sq.SEMDEDUP_K, iters=2)

    def chunk_sizes(cap):
        return (
            mod_chunk(assigned, ["cluster"], "vec_id", cap)
            .groupBy("cluster", "chunk")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    # default cap leaves the sf0.01 correctness corpus unchunked
    sizes = chunk_sizes(sq.SEMDEDUP_CHUNK)
    assert all(r.chunk == 0 for r in sizes)
    # a tiny cap actually splits, and hashed cells stay near the cap
    tiny = chunk_sizes(16)
    assert any(r.chunk > 0 for r in tiny)
    assert max(r.n for r in tiny) <= 2 * 16
