"""The r17-staged draft queries (plans/draft_r17.py) must already pass
the driver-identical oracle comparison — registration in r17 is then a
registry toggle, not new risk.  The module is intentionally NOT in
``registry._modules``: the r14–r16 windows are spoken for (COVERAGE.md
"Registration-window plan")."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_query_matches_oracle


def _pairs():
    from pedri_analysis_spark.plans import draft_r17 as d

    return [(n, d.QUERIES[n], d.ORACLE_SQL[n]) for n in sorted(d.QUERIES)]


def test_drafts_are_not_registered():
    from pedri_analysis_spark.plans import draft_r17 as d
    from pedri_analysis_spark.plans import registry

    registered = set(registry.all_queries())
    assert not (set(d.QUERIES) & registered), (
        "r17 draft queries leaked into the registry early — they must not "
        "displace the r14–r16 first-contact / stale-drain window slots"
    )
    assert set(d.ORACLE_SQL) == set(d.QUERIES)


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_draft_matches_oracle(spark, duck, name, qfn, sql):
    assert_query_matches_oracle(spark, duck, qfn, sql)


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_draft_plan_invariants(spark, name, qfn, sql):
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
# RANGE frame: gap correctness cross-validated against Python
# ---------------------------------------------------------------------------


def test_trailing_range_frame_matches_python(spark, duck):
    """Recompute the trailing-30-day sums from the raw daily series in
    Python (value-based day arithmetic) — the RANGE frame must agree on
    every day, including across gaps where a ROWS frame would diverge."""
    from pedri_analysis_spark.plans import draft_r17 as d

    rows = d.QUERIES["range_frame_trailing_30d"](spark, SF_DIR).collect()
    daily = duck.sql(
        """
        SELECT o_orderdate AS day,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS ed,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2 ORDER BY 2
        """
    ).fetchall()
    by_ed = {ed: cents for _, ed, cents in daily}
    eds = sorted(by_ed)
    want = {}
    for ed in eds:
        span = [e for e in eds if ed - (d.TRAIL_DAYS - 1) <= e <= ed]
        want[ed] = (sum(by_ed[e] for e in span), len(span))
    got = {}
    ed_of_day = {day: ed for day, ed, _ in daily}
    for r in rows:
        got[ed_of_day[r["day"]]] = (r["trail30_cents"], r["n_days_present"])
    assert got == want


# ---------------------------------------------------------------------------
# Bag set ops: the multiplicity identities pin the engine operators
# ---------------------------------------------------------------------------


def test_bag_setops_multiplicity_identities(spark):
    """INTERSECT ALL must keep min(c_a, c_b) copies and EXCEPT ALL
    max(c_a − c_b, 0) — checked value by value against the plain
    counts in the SAME result row, so Spark's intersectAll/exceptAll
    physical operators are cross-validated against count arithmetic."""
    from pedri_analysis_spark.plans import draft_r17 as d

    rows = d.QUERIES["setops_bag_orders"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        na, nb = r[f"n_{d.BAG_YEAR_A}"], r[f"n_{d.BAG_YEAR_B}"]
        assert r["n_intersect_all"] == min(na, nb), r
        assert r["n_except_all"] == max(na - nb, 0), r


# ---------------------------------------------------------------------------
# Clustering coefficient: corner-sum identity vs the global count
# ---------------------------------------------------------------------------


def test_cc_corner_sum_is_three_triangles(spark, duck):
    """Every triangle has exactly 3 corners, so Σ_v T(v) = 3·T — with
    T recomputed independently in DuckDB from the same edge CTE.  Also
    cc ≤ 1 (ppm) per bucket."""
    from pedri_analysis_spark.plans import draft_r17 as d
    from pedri_analysis_spark.plans.resolution_queries import _copurchase_edges_sql

    rows = d.QUERIES["clustering_coefficient_degree"](spark, SF_DIR).collect()
    assert rows
    corner_sum = sum(r["sum_triangles"] for r in rows)
    t_global = duck.sql(
        f"""
        WITH {_copurchase_edges_sql()}
        SELECT count(*) FROM e e1
        JOIN e e2 ON e2.pa = e1.pb
        JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
        """
    ).fetchone()[0]
    # deg < 2 nodes are excluded from the rollup but a triangle corner
    # always has deg >= 2, so the identity holds exactly
    assert corner_sum == 3 * t_global
    for r in rows:
        assert 0 <= r["avg_cc_ppm"] <= 1_000_000
        assert r["sum_triangles"] * 1 <= r["sum_wedges"] * 1 or r["sum_wedges"] == 0


# ---------------------------------------------------------------------------
# RFM: quintile balance and population conservation
# ---------------------------------------------------------------------------


def test_rfm_quintiles_balanced(spark, duck):
    from pedri_analysis_spark.plans import draft_r17 as d

    rows = d.QUERIES["rfm_customer_segments"](spark, SF_DIR).collect()
    n_cust = duck.sql("SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    for axis in ("r_score", "f_score", "m_score"):
        marg = {}
        for r in rows:
            marg[r[axis]] = marg.get(r[axis], 0) + r["n_customers"]
        assert set(marg) <= set(range(1, d.RFM_K + 1)), (axis, sorted(marg))
        lo, hi = n_cust // d.RFM_K, n_cust // d.RFM_K + (n_cust % d.RFM_K > 0)
        for score, cnt in marg.items():
            assert lo <= cnt <= hi, (axis, score, cnt, lo, hi)


# ---------------------------------------------------------------------------
# Seasonal residual outliers: report shape and ordering
# ---------------------------------------------------------------------------


def test_sro_report_ordered(spark):
    from pedri_analysis_spark.plans import draft_r17 as d

    rows = d.QUERIES["seasonal_residual_outliers"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= d.SRO_TOPK
    zs = [r["robust_z_micro"] for r in rows]
    assert all(z is not None and z >= 0 for z in zs)
    assert zs == sorted(zs, reverse=True)


# ---------------------------------------------------------------------------
# Kruskal-Wallis / Welch: cross-validated against independent Python (r14)
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_python_reference(spark, duck):
    """Recompute tie-corrected H from the raw rows in pure Python
    (average ranks via sorting — an independent path from the SQL's
    doubled-rank grid algebra) and require agreement within the
    documented per-group micro floors."""
    from pedri_analysis_spark.plans import draft_r17 as d

    rows = duck.sql(
        "SELECT event_type, value FROM events WHERE value IS NOT NULL"
    ).fetchall()
    vals = sorted(set(v for _, v in rows))
    # average rank per distinct value (1-based)
    from collections import Counter

    tv = Counter(v for _, v in rows)
    avg_rank, c = {}, 0
    for v in vals:
        avg_rank[v] = c + (tv[v] + 1) / 2.0
        c += tv[v]
    n = len(rows)
    groups: dict[str, list[float]] = {}
    for g, v in rows:
        groups.setdefault(g, []).append(avg_rank[v])
    h = (12.0 / (n * (n + 1))) * sum(
        (sum(r) ** 2) / len(r) for r in groups.values()
    ) - 3 * (n + 1)
    tie_t = sum(t**3 - t for t in tv.values())
    h_tc = h / (1 - tie_t / (n**3 - n)) if tie_t < n**3 - n else h

    got = d.QUERIES["kruskal_wallis_h_values"](spark, SF_DIR).collect()[0]
    assert got["n"] == n and got["k_groups"] == len(groups)
    assert got["tie_term"] == tie_t
    # k per-group floors + 1 final floor of slack
    assert abs(got["h_micro"] - h * 1e6) <= len(groups) + 2
    assert abs(got["h_tc_micro"] - h_tc * 1e6) <= len(groups) + 4


def test_welch_t2_matches_python_reference(spark, duck):
    """Welch t^2 recomputed from raw cents in float Python; the SQL's
    three documented quantizations (milli-cent mean diff, micro-cent^2
    variance-of-mean, final micro floor) bound the divergence."""
    from pedri_analysis_spark.plans import draft_r17 as d

    rows = duck.sql(
        "SELECT event_type, CAST(CAST(value AS DECIMAL(12,2))*100 AS BIGINT) "
        "FROM events WHERE value IS NOT NULL "
        f"AND event_type IN ('{d.WELCH_GROUP_A}', '{d.WELCH_GROUP_B}')"
    ).fetchall()
    a = [c for g, c in rows if g == d.WELCH_GROUP_A]
    b = [c for g, c in rows if g == d.WELCH_GROUP_B]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    md = sum(a) / len(a) - sum(b) / len(b)
    vm = var(a) / len(a) + var(b) / len(b)
    t2 = md * md / vm

    got = d.QUERIES["welch_t2_values"](spark, SF_DIR).collect()[0]
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert abs(got["mean_diff_milli"] - md * 1e3) <= 1
    # quantization slack: vm_sum floors twice (one per group); t2 is a
    # ratio of quantized terms — allow 0.1% relative plus 2 micro
    assert abs(got["t2_micro"] - t2 * 1e6) <= max(2, 0.001 * t2 * 1e6)


def test_welch_degenerate_single_group_guarded(spark, duck, tmp_path):
    """Zero click rows: both engines must take the n2 < 2 guard branch
    (t2_micro = 0, significant = 0) instead of dividing by zero."""
    import duckdb
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pedri_analysis_spark.plans import draft_r17 as d

    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    deg = t.filter(pc.not_equal(t.column("event_type"), d.WELCH_GROUP_B))
    pq.write_table(deg, str(tmp_path / "events.parquet"))

    srow = d.QUERIES["welch_t2_values"](spark, str(tmp_path)).collect()[0]
    assert srow["n2"] == 0 and srow["t2_micro"] == 0 and srow["significant"] == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    q = con.sql(d.ORACLE_SQL["welch_t2_values"])
    drow = dict(zip(list(q.columns), q.fetchall()[0]))
    con.close()
    assert drow["n2"] == 0 and drow["t2_micro"] == 0 and drow["significant"] == 0


def test_hrw_minimal_disruption_and_python_recompute(spark, duck):
    """moved_elsewhere must be exactly 0 (the HRW guarantee measured),
    the moved fraction must sit near 1/17, and the whole audit must
    equal a Python recomputation of the same md5 argmax."""
    import hashlib

    from pedri_analysis_spark.plans import draft_r17 as d

    keys = [r[0] for r in duck.sql("SELECT c_custkey FROM customer").fetchall()]

    def h(kk, s):
        return int(
            hashlib.md5(f"hrw:{kk}#{s}".encode()).hexdigest()[:15], 16
        )

    moved = elsewhere = 0
    from collections import Counter

    bal = Counter()
    for k in keys:
        kk = str(k)
        hs = [(h(kk, s), s) for s in range(d.HRW_SHARDS + 1)]
        s_before = max(hs[: d.HRW_SHARDS])[1]
        s_after = max(hs)[1]
        bal[s_before] += 1
        if s_after != s_before:
            moved += 1
            if s_after != d.HRW_SHARDS:
                elsewhere += 1
    got = d.QUERIES["rendezvous_shard_rebalance"](spark, SF_DIR).collect()[0]
    assert got["n_keys"] == len(keys)
    assert got["moved"] == moved and got["moved_elsewhere"] == elsewhere == 0
    assert got["max_shard_n"] == max(bal.values())
    assert got["min_shard_n"] == min(bal.values())
    # the 1/17 expectation, generously banded for small key counts
    frac = moved / len(keys)
    assert 0.2 / (d.HRW_SHARDS + 1) <= frac <= 3.0 / (d.HRW_SHARDS + 1)


def test_jonckheere_terpstra_matches_python_reference(spark, duck):
    """Recompute doubled-JT, tie-corrected variance, and the
    residue-decomposed z^2 from raw order rows in pure Python."""
    from collections import defaultdict

    from pedri_analysis_spark.plans import draft_r17 as d

    r = d.QUERIES["jonckheere_terpstra_trend"](spark, SF_DIR).collect()[0]
    base = duck.sql(
        """
        SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT),
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 // 100000
        FROM orders
        WHERE substr(o_orderpriority, 1, 1) IN ('1','2','3','4','5')
        """
    ).fetchall()
    grid = defaultdict(lambda: [0] * 5)
    for g, v in base:
        grid[v][g - 1] += 1
    c = [0] * 5
    j2 = ta = tc = te = 0
    gtot = [0] * 5
    for v in sorted(grid):
        nv = grid[v]
        for h in range(1, 5):
            j2 += nv[h] * (2 * sum(c[:h]) + sum(nv[:h]))
        t = sum(nv)
        ta += t * (t - 1) * (2 * t + 5)
        tc += t * (t - 1) * (t - 2)
        te += t * (t - 1)
        for g in range(5):
            c[g] += nv[g]
            gtot[g] += nv[g]
    n = sum(gtot)
    mu4 = n * n - sum(g * g for g in gtot)
    a = n * (n - 1) * (2 * n + 5) - sum(
        g * (g - 1) * (2 * g + 5) for g in gtot
    ) - ta
    b = sum(g * (g - 1) * (g - 2) for g in gtot)
    dd = sum(g * (g - 1) for g in gtot)
    var = (
        (a * 10**6) // 72
        + (b * tc * 10**6) // (36 * n * (n - 1) * (n - 2))
        + (dd * te * 10**6) // (8 * n * (n - 1))
    )
    x2 = (2 * j2 - mu4) ** 2
    z2 = (x2 // var) * 62_500_000_000 + ((x2 % var) * 62_500_000_000) // var
    assert r["n"] == n and r["jt_x2"] == j2 and r["mu_x4"] == mu4
    assert r["var_pp_micro"] == (2 * var) // (n * (n - 1))
    assert r["z2_micro"] == z2
    assert r["significant"] == (1 if z2 >= d.JT_CHI2_CRIT_MICRO else 0)
    # float sanity: micro z^2 within 2 micro of the float statistic
    zf = ((j2 / 2 - mu4 / 4) ** 2) / (var / 1e6)
    assert abs(z2 / 1e6 - zf) < 2e-5 * max(1.0, zf) + 2e-6


def test_cramers_v2_matches_python_reference(spark, duck):
    """Recompute the per-cell-floored chi^2 and V^2 from the raw
    contingency table; pin the floor loss under the 125-cell bound."""
    from collections import defaultdict

    from pedri_analysis_spark.plans import draft_r17 as d

    r = d.QUERIES["cramers_v2_segments"](spark, SF_DIR).collect()[0]
    cells = duck.sql(
        "SELECT c_mktsegment, c_nationkey, count(*) FROM customer GROUP BY 1, 2"
    ).fetchall()
    rm = defaultdict(int)
    cm = defaultdict(int)
    n = 0
    for rr, cc, o in cells:
        rm[rr] += o
        cm[cc] += o
        n += o
    s = sum((10**6 * n * o * o) // (rm[rr] * cm[cc]) for rr, cc, o in cells)
    chi2 = s - 10**6 * n
    v2 = (1000 * chi2) // (n * (min(len(rm), len(cm)) - 1))
    assert r["n"] == n
    assert (r["n_rows"], r["n_cols"]) == (len(rm), len(cm))
    assert r["chi2_micro"] == chi2 and r["v2_nano"] == v2
    # exact float chi^2 (zero cells contribute E) within the 125-floor loss
    chi2f = sum(
        (o - rm[rr] * cm[cc] / n) ** 2 / (rm[rr] * cm[cc] / n)
        for rr, cc, o in cells
    )
    seen = {(rr, cc) for rr, cc, _ in cells}
    chi2f += sum(
        rm[rr] * cm[cc] / n
        for rr in rm
        for cc in cm
        if (rr, cc) not in seen
    )
    assert 0 <= chi2f - chi2 / 1e6 <= len(rm) * len(cm) * 1e-6 + 1e-9
    assert 0 <= r["v2_nano"] <= 10**9  # V^2 in [0, 1]
