"""The r20-staged draft queries (plans/draft_r20.py) must already pass
the driver-identical oracle comparison — registration in r20 is then a
registry toggle, not new risk.  The module is intentionally NOT in
``registry._modules`` (COVERAGE.md "Registration-window plan")."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_query_matches_oracle


def _pairs():
    from pedri_analysis_spark.plans import draft_r20 as d

    return [(n, d.QUERIES[n], d.ORACLE_SQL[n]) for n in sorted(d.QUERIES)]


def test_drafts_are_not_registered():
    from pedri_analysis_spark.plans import draft_r20 as d
    from pedri_analysis_spark.plans import registry

    registered = set(registry.all_queries())
    assert not (set(d.QUERIES) & registered)
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
        assert name in _PYTHON_ALLOWED
    if facts["bnlj"]:
        assert name in _BNLJ_ALLOWED, f"{name}: BNLJ without allowlist entry"


def test_ltv_consistent_with_retention_population(spark, duck):
    """Offset-0 active counts must equal each cohort's size (every
    customer is active in their own first month), and the cumulative
    column must telescope exactly."""
    from pedri_analysis_spark.plans import draft_r20 as d

    rows = d.QUERIES["cohort_ltv_cents"](spark, SF_DIR).collect()
    assert rows
    coh_size = dict(
        duck.sql(
            """
            SELECT cmi, count(*) FROM (
              SELECT min(date_part('year', o_orderdate) * 12
                         + date_part('month', o_orderdate) - 1) AS cmi
              FROM orders GROUP BY o_custkey
            ) GROUP BY cmi
            """
        ).fetchall()
    )
    cum = {}
    for r in rows:
        if r["off"] == 0:
            assert r["n_active"] == coh_size[r["cohort_mi"]], r
        prev = cum.get(r["cohort_mi"], 0)
        assert r["cum_revenue_cents"] == prev + r["revenue_cents"], r
        cum[r["cohort_mi"]] = r["cum_revenue_cents"]


def test_session_bigrams_never_cross_sessions(spark, duck):
    """Total bigram occurrences must equal Σ_sessions (len − 1) — the
    exact count of in-session adjacencies, proving no transition leaks
    across a session boundary (the defect this query exists to avoid)."""
    from pedri_analysis_spark.plans import draft_r13 as d13
    from pedri_analysis_spark.plans import draft_r20 as d

    rows = d.QUERIES["session_bigram_support"](spark, SF_DIR).collect()
    total_occ = sum(r["n_occurrences"] for r in rows)
    want = duck.sql(
        f"""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
        g AS (
          SELECT user_id,
                 CASE WHEN lag(t) OVER w IS NULL
                           OR t - lag(t) OVER w > {d13.SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_s,
                 t, event_id
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        ),
        s AS (
          SELECT user_id,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM g
        )
        SELECT sum(n - 1) FROM (
          SELECT user_id, sid, count(*) AS n FROM s GROUP BY user_id, sid
        )
        """
    ).fetchone()[0]
    assert total_occ == want
    for r in rows:
        assert 1 <= r["support_sessions"] <= r["n_occurrences"]


def test_page_hinkley_matches_python(spark, duck):
    """Recompute the PH ladder in pure Python with the same one-floor-
    per-step quantization and require the same top rows."""
    from pedri_analysis_spark.plans import draft_r20 as d

    rows = d.QUERIES["page_hinkley_drift"](spark, SF_DIR).collect()
    daily = duck.sql(
        f"""
        SELECT o_orderdate AS day,
               (sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                // {d.PH_UNIT_DIV})::BIGINT AS v
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    s = 0
    frac = 0
    m = {}
    for i, (day, v) in enumerate(daily, start=1):
        s += v
        frac += s * 1_000_000 // i
        m[day] = s * 1_000_000 - frac
    run_min = None
    ph = {}
    for day, _ in daily:
        run_min = m[day] if run_min is None else min(run_min, m[day])
        ph[day] = m[day] - run_min
    want = sorted(ph.items(), key=lambda t: (-t[1], t[0]))[: d.PH_TOPK]
    got = [(r["day"], r["ph_q"]) for r in rows]
    assert got == [(day, phq) for day, phq in want]


def test_cvm_and_ks_agree_on_extremes(spark, duck):
    """CvM and KS measure the same CDF discrepancy in different norms:
    a pair with ZERO KS distance must have zero CvM, and the CvM
    statistic is bounded by the KS sup-norm squared (∫(F1−F2)²dH ≤
    D_KS² since the integrand never exceeds the sup)."""
    from pedri_analysis_spark.plans import draft_r20 as d
    from pedri_analysis_spark.plans import draft_r13 as d13
    from pedri_analysis_spark.plans import registry

    cvm = {
        (r["src_a"], r["src_b"]): r["cvm_micro"]
        for r in d.QUERIES["cvm_drift_doclen"](spark, SF_DIR).collect()
    }
    ks = {
        (r["src_a"], r["src_b"]): r["ks_micro"]
        for r in registry.all_queries()["ks_drift_doclen"](spark, SF_DIR).collect()
    }
    assert set(cvm) == set(ks)
    for pair, c in cvm.items():
        k = ks[pair]
        if k == 0:
            assert c == 0, pair
        # c (micro of the integral) <= micro(D^2) + quantization slack:
        # D^2 in micro is k^2 / 1e6
        assert c <= (k * k) // 1_000_000 + 2, (pair, c, k)


def test_kaplan_meier_matches_python_reference(spark, duck):
    """Recompute the KM staircase sequentially in Python (integer
    per-step ppm floors, the documented quantization) from raw per-user
    lifetimes — bit-identical to the recursive-CTE result."""
    from pedri_analysis_spark.plans import draft_r20 as d

    rows = duck.sql(
        f"""SELECT min(epoch_us(ts)) // {d.KM_DAY_US},
                   max(epoch_us(ts)) // {d.KM_DAY_US}
            FROM events GROUP BY user_id"""
    ).fetchall()
    horizon = max(l for _, l in rows) - d.KM_CENSOR_DAYS
    from collections import Counter

    dcnt, ccnt = Counter(), Counter()
    for f, l in rows:
        if l > horizon:
            ccnt[l - f] += 1
        else:
            dcnt[l - f] += 1
    got = d.QUERIES["kaplan_meier_churn"](spark, SF_DIR).collect()
    grid = sorted(set(dcnt) | set(ccnt))[: d.KM_MAX_STEPS]
    assert [r["lifetime_days"] for r in got] == grid
    n_risk, s = len(rows), 1_000_000
    prev = None
    for r, t in zip(got, grid):
        assert r["n_risk"] == n_risk
        assert r["n_churned"] == dcnt.get(t, 0)
        assert r["n_censored"] == ccnt.get(t, 0)
        s = (s * (n_risk - dcnt.get(t, 0))) // n_risk
        assert r["survival_ppm"] == s
        if prev is not None:
            assert r["survival_ppm"] <= prev  # monotone staircase
        prev = r["survival_ppm"]
        n_risk -= dcnt.get(t, 0) + ccnt.get(t, 0)
    assert got[-1]["survival_ppm"] >= 0


def test_logrank_matches_python_reference(spark, duck):
    """Recompute the log-rank O-E / V sums sequentially in Python with
    the same per-row micro floors — exact equality — and the float
    chi-square within 2 micro."""
    from pedri_analysis_spark.plans import draft_r20 as d

    rows = duck.sql(
        f"""SELECT min(epoch_us(ts)) // {d.KM_DAY_US},
                   max(epoch_us(ts)) // {d.KM_DAY_US},
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            FROM events GROUP BY user_id"""
    ).fetchall()
    horizon = max(l for _, l, _ in rows) - d.KM_CENSOR_DAYS
    from collections import defaultdict

    g = defaultdict(lambda: [0, 0, 0, 0])  # d1, c1, d2, c2
    for f, l, coh1 in rows:
        t = l - f
        idx = (1 if l > horizon else 0) + (0 if coh1 else 2)
        g[t][idx] += 1
    n1 = sum(v[0] + v[1] for v in g.values())
    n2 = sum(v[2] + v[3] for v in g.values())
    tot1, tot2 = n1, n2
    oe = vs = 0
    for t in sorted(g):
        d1, c1, d2, c2 = g[t]
        dt, n = d1 + d2, n1 + n2
        if n > 0:
            oe += d1 * 1_000_000 - (dt * n1 * 1_000_000) // n
        if n > 1 and dt > 0:
            vs += (dt * n1 * n2 * (n - dt) * 1_000_000) // (n * n * (n - 1))
        n1 -= d1 + c1
        n2 -= d2 + c2
    got = d.QUERIES["logrank_churn_cohorts"](spark, SF_DIR).collect()[0]
    assert got["n_users1"] == tot1 and got["n_users2"] == tot2
    assert got["oe_micro"] == oe and got["v_sum_micro"] == vs
    assert got["chi2_micro"] == (oe * oe) // vs if vs > 0 else got["chi2_micro"] == 0


def test_dtw_matches_python_dp(spark, duck):
    """Recompute DTW with the textbook row-by-row DP in Python (an
    independent path from the SQL's anti-diagonal arrays) — exact
    equality on the integer distance."""
    from pedri_analysis_spark.plans import draft_r20 as d

    def series(t):
        return [
            r[0]
            for r in duck.sql(
                f"""SELECT CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100
                     AS BIGINT)) AS BIGINT)
                FROM events
                WHERE event_type = '{t}' AND value IS NOT NULL
                GROUP BY epoch_us(ts) // {d.KM_DAY_US}
                ORDER BY epoch_us(ts) // {d.KM_DAY_US}"""
            ).fetchall()
        ]

    a, b = series(d.DTW_TYPE_A), series(d.DTW_TYPE_B)
    assert a and b
    INF = float("inf")
    m, n = len(a), len(b)
    dp = [[INF] * (n + 1) for _ in range(m + 1)]
    dp[0][0] = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
            )
    got = d.QUERIES["dtw_daily_revenue_shapes"](spark, SF_DIR).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["len_a"], r["len_b"]) == (m, n)
    assert r["dtw_cents"] == dp[m][n]
    assert r["dtw_per_step_milli"] == dp[m][n] * 1000 // (m + n)


def test_holt_matches_python_reference(spark, duck):
    """Replay the exact cents-integer Holt recurrence (truncating
    division, negative trends included) and the linear forecast."""
    from pedri_analysis_spark.plans import draft_r20 as d

    rows = d.QUERIES["holt_linear_forecast"](spark, SF_DIR).collect()
    ys = [
        r[1]
        for r in duck.sql(
            """
            SELECT date_trunc('month', o_orderdate),
                   sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT))
            FROM orders GROUP BY 1 ORDER BY 1
            """
        ).fetchall()
    ]

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    a_, b_, ppm = d.HOLT_ALPHA_PPM, d.HOLT_BETA_PPM, d.HOLT_PPM
    l, b = ys[0], ys[1] - ys[0]
    path = [(1, ys[0], l, b)]
    for t in range(1, min(len(ys), d.HOLT_MAX_STEPS)):
        ln = tdiv(a_ * ys[t] + (ppm - a_) * (l + b), ppm)
        b = tdiv(b_ * (ln - l) + (ppm - b_) * b, ppm)
        l = ln
        path.append((t + 1, ys[t], l, b))
    fit_rows = rows[: len(path)]
    assert [
        (r["month_idx"], r["y_cents"], r["level_cents"], r["trend_cents"])
        for r in fit_rows
    ] == path
    assert all(r["forecast_cents"] is None for r in fit_rows)
    fc_rows = rows[len(path):]
    assert len(fc_rows) == d.HOLT_HORIZON
    assert [r["forecast_cents"] for r in fc_rows] == [
        l + h * b for h in range(1, d.HOLT_HORIZON + 1)
    ]
    # forecast rows are NULL on the fit columns, and the horizon is linear:
    deltas = {
        fc_rows[i + 1]["forecast_cents"] - fc_rows[i]["forecast_cents"]
        for i in range(len(fc_rows) - 1)
    }
    assert deltas == {b}


def test_pettitt_matches_textbook_double_sum(spark, duck):
    """Recompute K = max_t |U_t| by the TEXTBOOK O(n²) sign double-sum
    (numpy block prefix over the full sign matrix — no rank identity
    anywhere) and require the engine's (n, k_stat, change_day,
    u_at_change, significant) row to match exactly."""
    import numpy as np

    from pedri_analysis_spark.plans import draft_r20 as d

    row = d.QUERIES["pettitt_changepoint_daily"](spark, SF_DIR).collect()[0]

    raw = duck.sql(
        """
        SELECT o_orderdate,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT)
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    days = [r[0] for r in raw]
    xs = np.array([r[1] for r in raw], dtype=np.int64)
    n = len(xs)
    sign = np.sign(xs[None, :] - xs[:, None]).astype(np.int64)  # s[i,j]=sgn(xj-xi)
    pref = sign.cumsum(axis=0).cumsum(axis=1)
    # U_t = sum_{i<t_rows, j>=t_rows} s[i,j], t_rows = prefix length 1..n-1
    best = None
    for t in range(1, n):
        ut = int(pref[t - 1, n - 1] - pref[t - 1, t - 1])
        au = abs(ut)
        if best is None or au > best[0]:
            best = (au, days[t - 1], ut)
    sig = 1 if 6 * best[0] ** 2 * 10**6 >= d.PETTITT_LN40_MICRO * (n**3 + n**2) else 0
    assert (
        row["n"],
        row["k_stat"],
        row["change_day"],
        row["u_at_change"],
        row["significant"],
    ) == (n, best[0], best[1], best[2], sig)


def test_yules_k_invariances(spark, duck):
    """Yule's K on a doubled corpus (every doc twice) must move toward
    its repetitive limit — structurally: each c doubles, N doubles, so
    K' = 10⁴·(4S₂−2N)/4N² > K when S₂ > N... pinned instead via exact
    recomputation: duplicate every document and check the closed-form
    update K' = 10⁴·(2S₂−N)/(2N²) holds row by row (exact integers),
    plus the basic bounds V₁ ≤ V ≤ N and S₂ ≥ N."""
    from pedri_analysis_spark.plans import draft_r20 as d

    rows = d.QUERIES["yules_k_per_source"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["v1_hapax"] <= r["v_types"] <= r["n_tokens"]
        assert r["s2_sum"] >= r["n_tokens"]
        assert r["k_micro"] == (10**10 * (r["s2_sum"] - r["n_tokens"])) // (
            r["n_tokens"] * r["n_tokens"]
        )
    # doubled-corpus closed form on the oracle side: c -> 2c exactly
    from pedri_analysis_spark.functions import textexpr as tx

    toks = tx.tokens(tx.DUCK, "text")
    dbl = {
        src: (n2, s22)
        for src, n2, s22 in duck.sql(
            f"""
            WITH twice AS (
              SELECT source, text FROM documents
              UNION ALL SELECT source, text FROM documents
            ),
            tc AS (
              SELECT source, tok, count(*) AS c
              FROM (SELECT source, unnest({toks}) AS tok FROM twice)
              GROUP BY source, tok
            )
            SELECT source,
                   CAST(sum(c) AS BIGINT), CAST(sum(c*c) AS BIGINT)
            FROM tc GROUP BY source
            """
        ).fetchall()
    }
    for r in rows:
        n2, s22 = dbl[r["source"]]
        assert n2 == 2 * r["n_tokens"] and s22 == 4 * r["s2_sum"]
