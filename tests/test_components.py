"""The two connected-components paths (driver union-find for small
candidate graphs, distributed min-label propagation for large ones) must
produce identical clusterings — the size threshold is a physical choice,
never a semantic one."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_unionfind_and_propagation_agree(spark):
    from pedri_analysis_spark.plans.dedup_queries import (
        QUERIES,
        _components_propagate,
        _components_unionfind,
    )

    # same pair source the registered CC query composes (capped LSH)
    pairs = (
        QUERIES["minhash_near_dups"](spark, SF_DIR)
        .select("a", "b")
        .localCheckpoint()
    )
    assert pairs.count() > 0
    uf = {(r.doc_id, r.cluster_id) for r in _components_unionfind(spark, pairs).collect()}
    prop = {
        (r.doc_id, r.cluster_id) for r in _components_propagate(spark, pairs).collect()
    }
    assert uf == prop


def test_propagation_handles_chains(spark):
    """A pure chain (worst-case diameter) must still converge to one
    component labeled by its minimum."""
    from pedri_analysis_spark.plans.dedup_queries import (
        _components_propagate,
        _components_unionfind,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 20)], "a long, b long"
    )
    for fn in (_components_unionfind, _components_propagate):
        got = {(r.doc_id, r.cluster_id) for r in fn(spark, chain).collect()}
        assert got == {(i, 10) for i in range(10, 21)}
