"""Kernel-level properties for the round-6 additions: the real WAV
feature decoder (pure function — testable without Spark), the Morton
interleave used by the Z-order layout (exhaustively bijective), and the
A-ES weighted-sampling key (full-column cross-engine parity, not just
the top-K the query returns)."""

from __future__ import annotations

import io
import struct
import wave

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"


def _wav_bytes(samples, framerate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


@settings(max_examples=60, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=400
    ),
    dim=st.integers(min_value=1, max_value=16),
)
def test_wav_features_bounded_and_deterministic(samples, dim):
    """For ANY int16 signal: the RMS profile has exactly ``dim`` entries,
    every value lies in [0, 1], and decoding is deterministic."""
    from pedri_analysis_spark.operators.multimodal import _wav_features

    payload = _wav_bytes(samples)
    feats = _wav_features(payload, dim)
    assert len(feats) == dim
    assert all(0.0 <= float(v) <= 1.0 for v in feats)
    again = _wav_features(payload, dim)
    assert list(feats) == list(again)


@settings(max_examples=30, deadline=None)
@given(
    amp=st.integers(min_value=0, max_value=32767),
    n=st.integers(min_value=4, max_value=256),
)
def test_wav_features_constant_amplitude_exact(amp, n):
    """A constant-magnitude square wave has RMS exactly amp/32768 in
    every chunk (float32-rounded) — the closed-form anchor the e2e test
    uses at 0.5, generalized to arbitrary amplitude."""
    import numpy as np

    from pedri_analysis_spark.operators.multimodal import _wav_features

    signal = [amp if i % 2 == 0 else -amp for i in range(n)]
    feats = _wav_features(_wav_bytes(signal), 4)
    expected = np.float32(amp / 32768.0)
    assert all(v == pytest.approx(float(expected), abs=1e-7) for v in feats)


def test_morton_interleave_bijective_exhaustive():
    """The generated Morton-interleave SQL is a BIJECTION on the full
    8-bit × 8-bit grid — all 65 536 (qx, qy) cells map to 65 536 distinct
    z values matching the textbook bit-interleave, evaluated through the
    same dialect template the oracle runs."""
    from pedri_analysis_spark.plans.layout_queries import Z_BITS, _interleave

    con = duckdb.connect()
    z_sql = _interleave("duck", "qx", "qy")
    rows = con.sql(
        f"""
        SELECT qx, qy, {z_sql} AS z
        FROM (SELECT unnest(range(256)) AS qx), (SELECT unnest(range(256)) AS qy)
        """
    ).fetchall()
    assert len(rows) == 1 << (2 * Z_BITS)

    def ref(qx: int, qy: int) -> int:
        z = 0
        for i in range(Z_BITS):
            z |= ((qx >> i) & 1) << (2 * i)
            z |= ((qy >> i) & 1) << (2 * i + 1)
        return z

    seen = set()
    for qx, qy, z in rows:
        assert z == ref(qx, qy)
        seen.add(z)
    assert len(seen) == 1 << (2 * Z_BITS)


def test_aes_key_full_column_cross_engine(spark):
    """The A-ES priority agrees between engines for EVERY document (the
    registered query only exposes the top-K; this pins the whole
    column, so a divergence outside the sample can't hide)."""
    from pyspark.sql import functions as F

    from pedri_analysis_spark.functions import textexpr as tx
    from pedri_analysis_spark.plans.sampling_queries import _aes_key
    from pedri_analysis_spark.sources.tables import load_table

    d = load_table(spark, "documents", SF).select("doc_id", "n_chars")
    got = {
        r.doc_id: r.k
        for r in d.withColumn(
            "k", F.floor(F.expr(_aes_key(tx.SPARK)) * 1e9) / 1e9
        ).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.sql(
            f"""
            SELECT doc_id, floor(({_aes_key(tx.DUCK)}) * 1000000000.0) / 1000000000.0
            FROM read_parquet('{SF}/documents.parquet')
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


@settings(max_examples=25, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_skyline_window_pass_equals_bruteforce(spark, pts):
    """For ANY distinct 2-D point set: the single-window-pass skyline
    (sort + running max) returns exactly the brute-force non-dominated
    set under (minimize x, maximize y)."""
    from pedri_analysis_spark.plans.advanced_queries import skyline_2d

    df = spark.createDataFrame(pts, ["price", "psize"])
    got = {(r.price, r.psize) for r in skyline_2d(df).collect()}
    want = {
        (x, y)
        for x, y in pts
        if not any(
            bx <= x and by >= y and (bx < x or by > y) for bx, by in pts
        )
    }
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=1, max_value=500), min_size=2, max_size=60
    )
)
def test_gini_rank_formula_equals_pairwise_definition(spark, vals):
    """For ANY positive integer sample: the rank-formulation Gini the
    query computes equals the mean-absolute-difference definition
    G = ΣΣ|xᵢ−xⱼ| / (2n²·mean) to float tolerance — including under
    ties, where Σ(i·x) must be tie-order invariant."""
    from pedri_analysis_spark.plans.advanced_queries import gini_by_group

    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "x"])
    got = gini_by_group(df, "grp", "x").collect()[0].gini
    n, total = len(vals), sum(vals)
    want = sum(abs(a - b) for a in vals for b in vals) / (2 * n * total)
    assert abs(got - want) < 1e-9


@settings(max_examples=20, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),   # day
            st.integers(min_value=0, max_value=8),    # user
        ),
        min_size=1,
        max_size=60,
    ),
    window=st.integers(min_value=1, max_value=7),
)
def test_rolling_distinct_equals_bruteforce(spark, pairs, window):
    """For ANY (day, user) event set and window length: the explode-based
    rolling distinct equals the brute-force 'users with ≥1 event in
    [d−w+1, d]' per observed day."""
    from pedri_analysis_spark.plans.advanced_queries import rolling_distinct

    df = spark.createDataFrame(pairs, ["day_idx", "user_id"])
    got = {
        (r.report_day, r.active)
        for r in rolling_distinct(df, window_days=window).collect()
    }
    days = sorted({d for d, _ in pairs})
    want = {
        (d, len({u for dd, u in pairs if d - window + 1 <= dd <= d}))
        for d in days
    }
    assert got == want
