"""Degenerate-input guards found in the round-6 code review: the ANSI
div-by-zero / negative-radicand / zero-mass cases that diverge between
Spark (throw or NaN) and DuckDB (NULL or throw) must be excluded by the
same predicate on both engines."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gini_zero_mass_group_yields_null_not_error(spark):
    from pedri_analysis_spark.plans.advanced_queries import gini_by_group

    df = spark.createDataFrame(
        [("empty", 0), ("empty", 0), ("ok", 3), ("ok", 1)], ["grp", "x"]
    )
    rows = {r.grp: r for r in gini_by_group(df, "grp", "x").collect()}
    assert rows["empty"].gini is None
    assert rows["ok"].gini is not None


def test_zscore_single_day_and_zero_variance_groups_are_filtered(spark, tmp_path):
    """An event_type with one day (n-1 = 0) or identical totals every day
    (radicand rounds to <= 0) must be excluded, not crash Spark's
    ANSI-default session or emit NaN z-scores."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # "single": one day only
    rows.append((1, t0, 1, "single", 5.0, "{}"))
    # "flat": same total (0.01) on five days -> zero variance
    for d in range(5):
        rows.append((10 + d, t0 + dt.timedelta(days=d), 2, "flat", 0.01, "{}"))
    # "ok": clearly varying totals across five days
    for d in range(5):
        rows.append((20 + d, t0 + dt.timedelta(days=d), 3, "ok", float(d * d), "{}"))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "sf_guard"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    from pedri_analysis_spark.plans.advanced_queries import QUERIES

    out = QUERIES["anomaly_zscore_daily"](spark, str(d)).collect()
    types = {r.event_type for r in out}
    assert "single" not in types and "flat" not in types
    assert all(r.zscore == r.zscore for r in out)  # no NaN survived


def test_empty_document_tokenizes_to_zero_and_chunks_to_zero(spark, tmp_path):
    """Empty/whitespace docs: tokens() yields [] (not ['']), so token
    counts aren't inflated and an n_tokens=0 gate is reachable; the
    chunk manifest emits ZERO rows (Spark's sequence(0,-1) would have
    fabricated [0,-1] phantom chunks where DuckDB emits none)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["", "   ", "two tokens"], pa.string()),
            "lang": pa.array(["en", "en", "en"], pa.string()),
            "source": pa.array(["s", "s", "s"], pa.string()),
            "n_chars": pa.array([0, 3, 10], pa.int64()),
        }
    )
    d = tmp_path / "sf_docs"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    from pyspark.sql import functions as F

    from pedri_analysis_spark.functions import textexpr as tx
    from pedri_analysis_spark.plans.text_queries import QUERIES
    from pedri_analysis_spark.sources.tables import load_table

    tok_sizes = {
        r.doc_id: r.n
        for r in load_table(spark, "documents", str(d))
        .select("doc_id", F.expr(f"size({tx.tokens(tx.SPARK, 'text')})").alias("n"))
        .collect()
    }
    assert tok_sizes == {1: 0, 2: 0, 3: 2}

    chunks = QUERIES["binary_payload_chunks"](spark, str(d)).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc  # zero-byte payload -> zero chunk rows
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1
    assert all(r.chunk_idx >= 0 and r.start_byte >= 0 for r in chunks)


def test_minhash_tolerates_docs_shorter_than_shingle_width(spark):
    """Docs with fewer tokens than the shingle width have all-NULL
    minhash signatures; before the guards they all collided into one ''
    LSH bucket (concat_ws folds NULLs) and the 0/0 Jaccard threw
    DIVIDE_BY_ZERO under the ANSI session.  Now: no candidate pairs from
    empty signatures, no crash, and real near-dups still verify."""
    from pedri_analysis_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [
            (1, "hello"),
            (2, "world"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, "the quick brown fox jumps over the lazy cat"),
        ],
        ["doc_id", "text"],
    )
    pairs = dd.minhash_near_dups(df, threshold=0.5).collect()
    assert {(r.a, r.b) for r in pairs} == {(3, 4)}


def test_lsh_bands_must_divide_hashes(spark):
    import pytest

    from pedri_analysis_spark.operators import dedup as dd

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="must divide"):
        dd.minhash_near_dups(df, n_hashes=16, bands=5)


def test_incremental_dedup_validates_bands_before_any_spark_work(spark):
    """An invalid bands value must raise BEFORE the tokenize/shingle/hash
    job runs (and before the signature frame is persisted — a late raise
    leaked the cache). The text column here raises on execution, so if
    the operator did any Spark work first we'd see a Spark error, not
    the ValueError from the eager precondition."""
    import pytest
    from pyspark.sql import functions as F

    from pedri_analysis_spark.operators import dedup as dd

    poison = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.expr("raise_error('should not execute')").alias("text"),
    )
    with pytest.raises(ValueError, match="must divide"):
        dd.incremental_minhash_dedup(poison, poison, n_hashes=16, bands=5)


def test_interval_join_rejects_sub_microsecond_bounds(spark):
    """Bounds below the µs resolution of Spark INTERVAL literals must
    raise instead of silently formatting to INTERVAL 0.000000 SECONDS
    (which would change the join window with no error)."""
    import pytest

    from pedri_analysis_spark.streaming.windows import interval_join_stream

    from pyspark.sql import functions as F

    def frame(sec):
        return spark.createDataFrame([(1, sec)], ["k", "s"]).select(
            "k", F.timestamp_seconds(F.col("s")).alias("t")
        )

    left, right = frame(0.0), frame(1.0)
    with pytest.raises(ValueError, match="microsecond"):
        interval_join_stream(left, right, "k", "t", "t", 1e-7, 1.0)
    # representable bounds still build a joinable condition
    out = interval_join_stream(left, right, "k", "t", "t", 0.0, 1.5)
    assert out.count() == 1
