"""Property tests for the deterministic sampling operators
(plans/sampling_queries.py) — the guarantees that justify hash-based
sampling over RNG sampling, beyond the oracle hash-match:

- determinism: identical selection across runs and partitionings;
- nested samples: raising the rate keeps every previously selected row;
- split independence: sample membership and train/test membership are
  decided by independent hashes;
- class-balance cap honored exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _bernoulli_ids(spark, rate_bp: int) -> set[int]:
    from pedri_analysis_spark.plans import sampling_queries as sq
    from pedri_analysis_spark.sources.tables import load_table

    d = load_table(spark, "documents", SF_DIR)
    return {
        r.doc_id
        for r in d.filter(F.expr(sq._SB) < rate_bp).select("doc_id").collect()
    }


def test_sample_deterministic_across_partitionings(spark):
    from pedri_analysis_spark.plans import sampling_queries as sq
    from pedri_analysis_spark.sources.tables import load_table

    d = load_table(spark, "documents", SF_DIR)
    base = {
        r.doc_id
        for r in d.filter(F.expr(sq._SB) < sq.SAMPLE_RATE_BP)
        .select("doc_id")
        .collect()
    }
    repart = {
        r.doc_id
        for r in d.repartition(13)
        .filter(F.expr(sq._SB) < sq.SAMPLE_RATE_BP)
        .select("doc_id")
        .collect()
    }
    assert base == repart and base


def test_samples_nest_as_rate_grows(spark):
    small = _bernoulli_ids(spark, 1_000)
    mid = _bernoulli_ids(spark, 2_000)
    big = _bernoulli_ids(spark, 5_000)
    assert small <= mid <= big
    # rates are roughly honored (hash-uniformity sanity, generous bounds)
    n = len(_bernoulli_ids(spark, 10_000))
    assert 0.05 * n <= len(small) <= 0.15 * n
    assert 0.35 * n <= len(big) <= 0.65 * n


def test_split_independent_of_sample_hash(spark):
    """The 20% sample must hit the test split at ≈ the test rate — if the
    two decisions shared a hash, the sample would align with one split."""
    from pedri_analysis_spark.plans import sampling_queries as sq
    from pedri_analysis_spark.sources.tables import load_table

    d = load_table(spark, "documents", SF_DIR)
    sampled_test = d.filter(
        (F.expr(sq._SB) < sq.SAMPLE_RATE_BP)
        & (F.expr(sq._SSPLIT) < sq.TEST_RATE_BP)
    ).count()
    sampled = d.filter(F.expr(sq._SB) < sq.SAMPLE_RATE_BP).count()
    assert sampled > 0
    frac = sampled_test / sampled
    assert 0.03 <= frac <= 0.25  # ≈10%, generous for a 500-doc corpus


def test_class_balanced_cap(spark):
    from pedri_analysis_spark.plans import sampling_queries as sq

    out = sq.QUERIES["class_balanced_sample"](spark, SF_DIR)
    per_lang = {
        r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert per_lang
    assert all(n <= sq.BALANCED_PER_CLASS for n in per_lang.values())
    # classes larger than the cap are clipped exactly to it ('en' has 200+)
    assert per_lang.get("en") == sq.BALANCED_PER_CLASS
