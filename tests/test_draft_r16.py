"""The r16-staged draft queries (plans/draft_r16.py) must already pass
the driver-identical oracle comparison — registration in r16 is then a
registry toggle, not new risk.  The module is intentionally NOT in
``registry._modules``: the r14/r15 windows are spoken for (COVERAGE.md
"Registration-window plan")."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_query_matches_oracle


def _pairs():
    from pedri_analysis_spark.plans import draft_r16 as d

    return [(n, d.QUERIES[n], d.ORACLE_SQL[n]) for n in sorted(d.QUERIES)]


def test_drafts_are_not_registered():
    from pedri_analysis_spark.plans import draft_r16 as d
    from pedri_analysis_spark.plans import registry

    registered = set(registry.all_queries())
    assert not (set(d.QUERIES) & registered), (
        "r16 draft queries leaked into the registry early — they must not "
        "displace the r14/r15-wave first-contact / stale-drain window slots"
    )
    assert set(d.ORACLE_SQL) == set(d.QUERIES)


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_draft_matches_oracle(spark, duck, name, qfn, sql):
    assert_query_matches_oracle(spark, duck, qfn, sql)


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_draft_plan_invariants(spark, name, qfn, sql):
    """The drafts must already satisfy the catalog plan rules
    (tools/plan_lint.py): no CartesianProduct, Python boundaries only
    for pre-allowlisted justified Arrow kernels, BNLJ only for
    pre-allowlisted bounded build sides."""
    from tools.plan_lint import _BNLJ_ALLOWED, _PYTHON_ALLOWED, lint_plan

    facts = lint_plan(
        qfn(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not facts["cartesian"]
    if facts["python"]:
        assert name in _PYTHON_ALLOWED, (
            f"{name}: Python boundary without a pre-staged Arrow-kernel entry"
        )
    if facts["bnlj"]:
        assert name in _BNLJ_ALLOWED, f"{name}: BNLJ without a pre-staged allowlist entry"


# ---------------------------------------------------------------------------
# Hilbert curve: the two defining properties, pinned over the WHOLE grid
# ---------------------------------------------------------------------------


def test_hilbert_bijective_and_continuous(duck):
    """The unrolled SQL xy2d transform must be (a) a bijection from the
    256×256 grid onto [0, 65536) and (b) CONTINUOUS — consecutive curve
    positions are grid-adjacent (|Δx|+|Δy| = 1).  Together these ARE
    the Hilbert-curve contract (z-order fails (b): Morton codes jump);
    any orientation variant passing both is a valid Hilbert curve, so
    the pin verifies the transform itself, not a transcription of it."""
    from pedri_analysis_spark.plans.draft_r16 import HB_BITS, _hb_levels
    from pedri_analysis_spark.functions import textexpr as tx

    n = 1 << HB_BITS
    sql = f"""
    WITH cells AS (
      SELECT x.i AS qx, y.i AS qy
      FROM (SELECT unnest(range({n})) AS i) x,
           (SELECT unnest(range({n})) AS i) y
    ),
    h0 AS (SELECT qx, qy, qx AS x0, qy AS y0, 0 AS d0 FROM cells),
    {_hb_levels(tx.DUCK)},
    keyed AS (SELECT qx, qy, d{HB_BITS} AS d FROM h{HB_BITS}),
    lagged AS (
      SELECT d, qx, qy,
             lag(qx) OVER (ORDER BY d) AS px,
             lag(qy) OVER (ORDER BY d) AS py
      FROM keyed
    )
    SELECT
      (SELECT count(DISTINCT d) FROM keyed) AS n_distinct,
      (SELECT min(d) FROM keyed) AS d_min,
      (SELECT max(d) FROM keyed) AS d_max,
      (SELECT count(*) FROM lagged
       WHERE px IS NOT NULL AND abs(qx - px) + abs(qy - py) <> 1) AS n_jumps
    """
    nd, dmin, dmax, jumps = duck.sql(sql).fetchone()
    assert nd == n * n and dmin == 0 and dmax == n * n - 1, "not a bijection"
    assert jumps == 0, f"curve jumps {jumps} times — not a Hilbert curve"


def test_hilbert_buckets_conserve_rows(spark, duck):
    from pedri_analysis_spark.plans import draft_r16 as d

    rows = d.QUERIES["hilbert_layout_orders"](spark, SF_DIR).collect()
    n_orders = duck.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == n_orders
    assert all(r["covered_cells"] >= 1 for r in rows)


# ---------------------------------------------------------------------------
# TV distance: brute-force cross-validation of the analytic shortcut
# ---------------------------------------------------------------------------


def test_tv_distance_matches_bruteforce(spark, duck):
    """The registered form adds the uncovered mass (n − covered)·n_s
    ANALYTICALLY instead of materializing the source × full-vocab
    frame; the naive full-outer-join form must agree exactly."""
    from pedri_analysis_spark.functions import textexpr as tx
    from pedri_analysis_spark.plans import draft_r16 as d

    got = {
        r["source"]: (r["n_tokens_src"], r["tv_micro"])
        for r in d.QUERIES["tv_distance_sources"](spark, SF_DIR).collect()
    }
    toks = tx.tokens(tx.DUCK, "text")
    fsd = tx.floor_scaled_div(tx.DUCK, "sum_abs", "2 * n_s * n_total", 1_000_000)
    brute = duck.sql(
        f"""
    WITH tok AS (SELECT source, unnest({toks}) AS tok FROM documents),
    st AS (SELECT source, tok, count(*)::BIGINT AS c_ts FROM tok GROUP BY 1, 2),
    gt AS (SELECT tok, sum(c_ts)::BIGINT AS c_t FROM st GROUP BY 1),
    tot AS (SELECT sum(c_t)::BIGINT AS n_total FROM gt),
    srcs AS (SELECT source, sum(c_ts)::BIGINT AS n_s FROM st GROUP BY 1),
    full_grid AS (
      SELECT s.source, s.n_s, g.tok, g.c_t, coalesce(st.c_ts, 0) AS c_ts
      FROM srcs s CROSS JOIN gt g
      LEFT JOIN st ON st.source = s.source AND st.tok = g.tok
    ),
    dev AS (
      SELECT source, n_s,
             sum(abs(c_ts * t.n_total - c_t * n_s))::BIGINT AS sum_abs
      FROM full_grid CROSS JOIN tot t
      GROUP BY source, n_s
    )
    SELECT source, n_s, CAST({fsd} AS BIGINT) AS tv_micro
    FROM dev CROSS JOIN tot
    """
    ).fetchall()
    assert len(brute) == len(got)
    for source, n_s, tv in brute:
        assert got[source] == (n_s, tv), (source, got[source], (n_s, tv))


# ---------------------------------------------------------------------------
# MWU / Cliff's delta: exact identities and bounds
# ---------------------------------------------------------------------------


def test_mwu_bounds(spark):
    from pedri_analysis_spark.plans import draft_r16 as d

    r = d.QUERIES["mann_whitney_u_values"](spark, SF_DIR).collect()[0]
    assert 0 <= r["u1_x2"] <= 2 * r["n1"] * r["n2"]
    assert r["z2_micro"] >= 0
    assert r["tie_term"] >= 0
    assert r["significant"] in (0, 1)


def test_cliffs_pair_partition(spark):
    """#(x>y) + #(x<y) + ties must partition the n1·n2 pair space, and
    δ must land in [-1, 1] micro."""
    from pedri_analysis_spark.plans import draft_r16 as d

    r = d.QUERIES["cliffs_delta_values"](spark, SF_DIR).collect()[0]
    assert r["n_gt"] + r["n_lt"] + r["n_ties"] == r["n1"] * r["n2"]
    assert -1_000_000 <= r["delta_micro"] <= 1_000_000


def test_mwu_cliffs_direction_agree(spark):
    """Sign coherence: U1 above its null mean iff purchases outrank
    clicks more often than not (δ > 0) — the two statistics measure the
    same dominance and must point the same way (modulo exact zero)."""
    from pedri_analysis_spark.plans import draft_r16 as d

    u = d.QUERIES["mann_whitney_u_values"](spark, SF_DIR).collect()[0]
    c = d.QUERIES["cliffs_delta_values"](spark, SF_DIR).collect()[0]
    diff2 = u["u1_x2"] - u["n1"] * u["n2"]
    dm = c["delta_micro"]
    assert (diff2 > 0) == (dm > 0) or dm == 0 or diff2 == 0


# ---------------------------------------------------------------------------
# Chao1: estimator bounds
# ---------------------------------------------------------------------------


def test_chao1_bounds(spark):
    from pedri_analysis_spark.plans import draft_r16 as d

    rows = d.QUERIES["chao1_vocab_richness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # the estimator only ADDS unseen mass
        assert r["chao1_est"] >= r["v_distinct"]
        # singletons+doubletons cannot exceed the token mass they carry
        assert r["f1"] + 2 * r["f2"] <= r["n_tokens"]
        assert r["v_distinct"] <= r["n_tokens"]


# ---------------------------------------------------------------------------
# KMV Jaccard: small-cardinality exactness + accuracy band
# ---------------------------------------------------------------------------


def test_kmv_jaccard_band(spark):
    from pedri_analysis_spark.plans import draft_r16 as d

    r = d.QUERIES["kmv_jaccard_sources"](spark, SF_DIR).collect()[0]
    assert r["k_used"] <= d.KMVJ_K
    assert r["inter_n"] <= min(r["n_a"], r["n_b"])
    assert r["union_n"] <= r["n_a"] + r["n_b"]
    if r["union_n"] <= d.KMVJ_K:
        # sketch holds the whole union: the estimate IS the exact value
        assert r["j_kmv_ppm"] == r["j_exact_ppm"]
    else:
        # KMV(k) Jaccard worst-case relative band ~ 2/sqrt(k) ≈ 0.125
        # at k=256 on the INTERSECTION share; allow an absolute 0.15
        # ppm-share band (generous, deterministic data)
        assert abs(r["j_kmv_ppm"] - r["j_exact_ppm"]) <= 150_000


# ---------------------------------------------------------------------------
# Harmonic centrality: Python BFS cross-validation at sf0.001
# ---------------------------------------------------------------------------


def test_harmonic_matches_python_bfs(spark):
    from pedri_analysis_spark.plans import draft_r16 as d
    from pedri_analysis_spark.plans.resolution_queries import _copurchase_edges

    sf = "/root/testdata/sf0.001"
    edges = _copurchase_edges(spark, sf).collect()
    adj: dict[int, set[int]] = {}
    for e in edges:
        adj.setdefault(e["pa"], set()).add(e["pb"])
        adj.setdefault(e["pb"], set()).add(e["pa"])
    deg = sorted(((len(v), k) for k, v in adj.items()), key=lambda t: (-t[0], t[1]))
    seeds = [k for _, k in deg[: d.HC_SEEDS]]
    want = {}
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for hop in (1, 2, 3):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):  # noqa: B905
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            frontier = nxt
        n1 = sum(1 for x in dist.values() if x == 1)
        n2 = sum(1 for x in dist.values() if x == 2)
        n3 = sum(1 for x in dist.values() if x == 3)
        want[s] = (n1, n2, n3, 6 * n1 + 3 * n2 + 2 * n3)
    got = {
        r["seed"]: (r["n1"], r["n2"], r["n3"], r["hc_sixths"])
        for r in d.QUERIES["harmonic_centrality_seeds"](spark, sf).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# JL distortion: conservation and ratio sanity
# ---------------------------------------------------------------------------


def test_jl_conservation(spark, duck):
    from pedri_analysis_spark.plans import draft_r16 as d

    rows = d.QUERIES["jl_projection_distortion"](spark, SF_DIR).collect()
    assert rows
    n_pairs_expected = duck.sql(
        "SELECT count(*) FROM embeddings a JOIN embeddings b "
        "ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0"
    ).fetchone()[0]
    # all real pairs are distinct vectors here, so dx2 > 0 keeps them all
    assert sum(r["n_pairs"] for r in rows) <= n_pairs_expected
    for r in rows:
        assert 0 <= r["min_ratio_ppm"] <= r["max_ratio_ppm"]
        assert r["decile"] == r["min_ratio_ppm"] // 100_000 or r["n_pairs"] > 1


def test_jl_ratios_center_near_one(spark):
    """E[||PΔ||²] = k·||Δ||² for ±1 rows: the pair-count-weighted mean
    ratio must sit near 1.0 (generous ±35% band — k=16 is coarse)."""
    from pedri_analysis_spark.plans import draft_r16 as d

    rows = d.QUERIES["jl_projection_distortion"](spark, SF_DIR).collect()
    n = sum(r["n_pairs"] for r in rows)
    mid = sum(((r["min_ratio_ppm"] + r["max_ratio_ppm"]) // 2) * r["n_pairs"] for r in rows)
    mean_ppm = mid // n
    assert 650_000 <= mean_ppm <= 1_350_000, mean_ppm


# ---------------------------------------------------------------------------
# RBO: exact Python cross-validation at both SFs
# ---------------------------------------------------------------------------


def test_rbo_matches_python(spark):
    """Recompute RBO from first principles — exact Fraction arithmetic
    over the two independently-rebuilt rankings — and require the
    query's single-division micro quantization to match the floored
    exact rational."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from pedri_analysis_spark.functions import textexpr as tx
    from pedri_analysis_spark.plans import draft_r16 as d
    from pedri_analysis_spark.plans.retrieval_queries import (
        BM25_TERMS,
        _bm25_scored,
        _tf,
    )
    from pedri_analysis_spark.sources.tables import load_table

    got = d.QUERIES["rbo_rankings_eval"](spark, SF_DIR).collect()[0][
        "rbo_p9_micro"
    ]

    bm = (
        _bm25_scored(spark, SF_DIR)
        .orderBy(F.col("bm25r_micros").desc(), F.col("doc_id").asc())
        .limit(d.RBO_DEPTH)
        .collect()
    )
    tf_sum = " + ".join(_tf(tx.SPARK, t) for t in BM25_TERMS)
    tf = (
        load_table(spark, "documents", SF_DIR)
        .select("doc_id", F.expr(tx.tokens(tx.SPARK, "text")).alias("toks"))
        .select("doc_id", F.expr(tf_sum).alias("s"))
        .orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(d.RBO_DEPTH)
        .collect()
    )
    a = [r["doc_id"] for r in bm]
    b = [r["doc_id"] for r in tf]
    p = Fraction(9, 10)
    rbo = Fraction(0)
    for depth in range(1, d.RBO_DEPTH + 1):
        ov = len(set(a[:depth]) & set(b[:depth]))
        rbo += (1 - p) * p ** (depth - 1) * Fraction(ov, depth)
    want = (rbo * 1_000_000).numerator // (rbo * 1_000_000).denominator
    assert got == want, (got, want, a, b)


def test_wsr_matches_python_mirror(spark, duck):
    """Recompute the whole Wilcoxon signed-rank chain (daily pairing,
    zero-drop, midranks, tie correction, micro floor) in sequential
    pure Python from the raw rows and require EXACT equality with the
    engine row — the merge-order-free proof of the doubled-rank
    integerization."""
    from collections import Counter

    from pedri_analysis_spark.plans import draft_r16 as d

    row = d.QUERIES["wilcoxon_signed_rank_daily"](spark, SF_DIR).collect()[0]

    in_a = "', '".join(d.WSR_GROUP_A)
    in_b = "', '".join(d.WSR_GROUP_B)
    cents = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    raw = duck.sql(
        f"""
        SELECT sum(CASE WHEN o_orderpriority IN ('{in_a}')
                        THEN {cents} ELSE 0 END),
               sum(CASE WHEN o_orderpriority IN ('{in_b}')
                        THEN {cents} ELSE 0 END)
        FROM orders GROUP BY o_orderdate
        """
    ).fetchall()
    ds = [a - b for a, b in raw if a != b]
    n = len(ds)
    cnt = Counter(abs(x) for x in ds)
    c_before, r2 = 0, {}
    for v in sorted(cnt):
        t = cnt[v]
        r2[v] = 2 * c_before + t + 1
        c_before += t
    wp_x2 = sum(r2[abs(x)] for x in ds if x > 0)
    tie_t = sum(t**3 - t for t in cnt.values())
    a_stat = 2 * wp_x2 - n * (n + 1)
    den = 2 * n * (n + 1) * (2 * n + 1) - tie_t
    z2 = 0 if n == 0 or den <= 0 else (3 * a_stat * a_stat * 1_000_000) // den
    assert (row["n"], row["n_pos"], row["w" + "p_x2"], row["tie_term"]) == (
        n,
        sum(1 for x in ds if x > 0),
        wp_x2,
        tie_t,
    )
    assert row["z2_micro"] == z2
    assert row["significant"] == (1 if z2 >= d.WSR_CHI2_CRIT_MICRO else 0)


def test_wsr_bounds(spark):
    """Structural bounds: 0 ≤ n_pos ≤ n; the doubled positive rank sum
    wp_x2 = 2·W⁺ sits in [0, n(n+1)] (W⁺ ≤ n(n+1)/2); tie_term ≥ 0;
    z² ≥ 0."""
    from pedri_analysis_spark.plans import draft_r16 as d

    r = d.QUERIES["wilcoxon_signed_rank_daily"](spark, SF_DIR).collect()[0]
    assert 0 <= r["n_pos"] <= r["n"]
    assert 0 <= r["wp_x2"] <= r["n"] * (r["n"] + 1)
    assert r["tie_term"] >= 0
    assert r["z2_micro"] >= 0
