"""Retrieval-family semantics beyond oracle parity: the properties a
user of a search API relies on (term-bearing docs outrank term-free
ones; fusion ranks come from real candidate lists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pedri_analysis_spark.functions import textexpr as tx
from pedri_analysis_spark.plans.retrieval_queries import (
    BM25_TERMS,
    RRF_CAND,
    QUERIES,
    _bm25_scored,
)

SF = "/root/testdata/sf0.001"


def test_bm25_zero_iff_no_query_term(spark):
    """A document scores > 0 exactly when it contains at least one query
    term (rational idf is positive for df < N/2 vocab terms here), and
    never negative."""
    scored = _bm25_scored(spark, SF)
    from pedri_analysis_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).select(
        "doc_id", F.expr(tx.tokens(tx.SPARK, "text")).alias("toks")
    )
    has_term = F.expr(
        " OR ".join(f"array_contains(toks, '{t}')" for t in BM25_TERMS)
    )
    joined = scored.join(docs, "doc_id").select(
        "bm25r_micros", has_term.alias("has_term")
    )
    rows = joined.collect()
    assert rows
    for r in rows:
        assert r["bm25r_micros"] >= 0
        assert (r["bm25r_micros"] > 0) == bool(r["has_term"]), r


def test_bm25_more_occurrences_rank_higher_same_length(spark):
    """tf monotonicity: among equal-length docs, more occurrences of a
    query term never score lower (k1 saturation is monotone)."""
    scored = _bm25_scored(spark, SF)
    from pedri_analysis_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).select(
        "doc_id", F.expr(tx.tokens(tx.SPARK, "text")).alias("toks")
    )
    t0 = BM25_TERMS[0]
    j = (
        scored.join(docs, "doc_id")
        .select(
            "bm25r_micros",
            F.size("toks").alias("dl"),
            F.expr(f"size(filter(toks, _t -> _t = '{t0}'))").alias("tf0"),
            *[
                F.expr(f"size(filter(toks, _t -> _t = '{t}'))").alias(f"tf_{i}")
                for i, t in enumerate(BM25_TERMS[1:], 1)
            ],
        )
        # isolate the t0 contribution: other terms absent
        .filter((F.col("tf_1") == 0) & (F.col("tf_2") == 0) & (F.col("tf_3") == 0))
        .collect()
    )
    by_dl: dict[int, list[tuple[int, int]]] = {}
    for r in j:
        by_dl.setdefault(r["dl"], []).append((r["tf0"], r["bm25r_micros"]))
    checked = 0
    for pairs in by_dl.values():
        pairs.sort()
        for (tf_a, s_a), (tf_b, s_b) in zip(pairs, pairs[1:]):
            if tf_b > tf_a:
                assert s_b >= s_a, (tf_a, s_a, tf_b, s_b)
                checked += 1
    assert checked > 0, "no comparable same-length doc pairs at this SF"


def test_rrf_ranks_are_bounded_candidate_ranks(spark):
    rows = QUERIES["rrf_fusion_topk"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["r_lex"] <= RRF_CAND
        assert 0 <= r["r_vec"] <= RRF_CAND
        # a fused row must come from at least one ranker's candidates
        assert r["r_lex"] > 0 or r["r_vec"] > 0
        assert r["rrf_score"] > 0.0
