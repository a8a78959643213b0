"""The mod-chunk pair-work cap (operators/chunking.py) — both branches.

The registry parity sweep only ever exercises the UNCHUNKED branch
(every real SF has nch == 1), so without these tests the chunked plan —
the one that actually runs at the synthetic decades and at cluster
scale — would never be cross-engine-proven.  Forcing each *_CHUNK
constant tiny makes nch > 1 on the sf0.01 fixtures and runs the full
query-vs-oracle comparison through the chunked join, hashed residue and
all (the same assert the driver's CORRECTNESS gate applies).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_query_matches_oracle

SF = SF_DIR


def test_mod_chunk_unchunked_branch_is_literal_zero(spark):
    """When every block fits the cap, mod_chunk must add chunk = 0
    WITHOUT a rollup join (the plan-time peek's whole point — the
    always-on join measured +0.45/+0.7 s at sf0.1 in the r10 isolated
    A/B) so downstream joins constant-fold the chunk key away."""
    from pedri_analysis_spark.operators.chunking import mod_chunk

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, block long"
    )
    out = mod_chunk(df, ["block"], "id", cap=100)
    assert out.select(F.collect_set("chunk")).first()[0] == [0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # literal column, no rollup join


def test_mod_chunk_chunked_branch_bounds_cells(spark):
    """Past the cap every (block, chunk) cell must stay near the cap —
    the hashed residue makes this independent of id layout (the ADVICE
    r10 collapse scenario: ids congruent mod a factor of nch).  Ids
    here are deliberately all-even with cap 2 — raw id % nch would
    leave every odd cell empty and double the even cells."""
    from pedri_analysis_spark.operators.chunking import mod_chunk

    df = spark.createDataFrame(
        [(2 * i, 0) for i in range(64)], "id long, block long"
    )
    out = mod_chunk(df, ["block"], "id", cap=8)
    sizes = [r["n"] for r in out.groupBy("chunk").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) >= 4  # hashed residues hit many cells despite even ids
    assert max(sizes) <= 2 * 8


def test_mod_chunk_chunked_branch_keeps_plan_statistics(spark):
    """The chunked branch must join the COMPUTED rollup, never a
    createDataFrame of the collected rows: a local relation plans as
    `Scan ExistingRDD` with the DEFAULT size estimate, which poisons
    the downstream pair-join statistics and forces SortMergeJoin over
    the payload even when one side should broadcast (r10 measured:
    ngram at sf1.0synth 56 s forced-SMJ vs 36 s with honest stats)."""
    from pedri_analysis_spark.operators.chunking import mod_chunk

    # range() input: the INPUT itself must not be an ExistingRDD leaf,
    # or the assert below could never distinguish helper from fixture
    df = spark.range(64).selectExpr("id", "id % 2 AS block")
    out = mod_chunk(df, ["block"], "id", cap=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "chunk" in plan  # the cap engaged
    assert "ExistingRDD" not in plan


def test_ngram_jaccard_chunked_branch_matches_oracle(spark, duck, monkeypatch):
    from pedri_analysis_spark.plans import dedup_queries as dq

    monkeypatch.setattr(dq, "NGRAM_CHUNK", 8)
    assert_query_matches_oracle(
        spark, duck, dq.QUERIES["ngram_jaccard_near_dups"], dq._ngram_jaccard_oracle()
    )


def test_embedding_near_dups_chunked_branch_matches_oracle(spark, duck, monkeypatch):
    from pedri_analysis_spark.plans import similarity_queries as sq

    monkeypatch.setattr(sq, "EMBDUP_CHUNK", 8)
    assert_query_matches_oracle(
        spark, duck, sq.QUERIES["embedding_near_dups"], sq._embdup_oracle()
    )


def test_semantic_dedup_chunked_branch_matches_oracle(spark, duck, monkeypatch):
    from pedri_analysis_spark.plans import similarity_queries as sq

    monkeypatch.setattr(sq, "SEMDEDUP_CHUNK", 8)
    assert_query_matches_oracle(
        spark, duck, sq.QUERIES["semantic_dedup_prune"], sq._semantic_dedup_oracle()
    )


def test_ann_lsh_chunked_branch_matches_oracle(spark, duck, monkeypatch):
    """Adaptive k/L (r11) keeps MEAN occupancy at OCC_TARGET but hot
    cluster-sized buckets still mod-chunk past ANN_CHUNK.  Force the
    cap tiny so sf0.01 buckets actually chunk and prove the chunked
    branch cross-engine — through the adaptive params CTE too."""
    from pedri_analysis_spark.plans import similarity_queries as sq

    monkeypatch.setattr(sq, "ANN_CHUNK", 4)
    assert_query_matches_oracle(
        spark, duck, sq.QUERIES["ann_lsh_near_dups"], sq._ann_lsh_oracle()
    )


def test_record_linkage_chunked_branch_matches_oracle(spark, duck, monkeypatch):
    from pedri_analysis_spark.plans import relational_ext as rx

    monkeypatch.setattr(rx, "LINKAGE_CHUNK", 4)
    assert_query_matches_oracle(
        spark, duck, rx.QUERIES["record_linkage_suppliers"], rx._linkage_oracle()
    )
