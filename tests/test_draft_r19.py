"""The r19-staged draft queries (plans/draft_r19.py) must already pass
the driver-identical oracle comparison — registration in r19 is then a
registry toggle, not new risk.  The module is intentionally NOT in
``registry._modules`` (COVERAGE.md "Registration-window plan")."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_query_matches_oracle


def _pairs():
    from pedri_analysis_spark.plans import draft_r19 as d

    return [(n, d.QUERIES[n], d.ORACLE_SQL[n]) for n in sorted(d.QUERIES)]


def test_drafts_are_not_registered():
    from pedri_analysis_spark.plans import draft_r19 as d
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
        assert name in _PYTHON_ALLOWED, f"{name}: unallowlisted Python boundary"
    if facts["bnlj"]:
        assert name in _BNLJ_ALLOWED, f"{name}: BNLJ without allowlist entry"


def test_ap_matches_python_reference(spark, duck):
    """Recompute pessimistic-tie AP from the raw (score, label) rows in
    pure Python with the same two documented quantizations."""
    from pedri_analysis_spark.plans import draft_r19 as d

    r = d.QUERIES["average_precision_value"](spark, SF_DIR).collect()[0]
    rows = duck.sql(
        """
        SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v_c,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events WHERE value IS NOT NULL
        """
    ).fetchall()
    from collections import defaultdict

    grid = defaultdict(lambda: [0, 0])
    for v, pos in rows:
        grid[v][0 if pos else 1] += 1
    p_prev = n_prev = 0
    total = 0
    n_pos = 0
    for v in sorted(grid, reverse=True):
        np_, nn_ = grid[v]
        for i in range(1, np_ + 1):
            total += (p_prev + i) * 1_000_000 // (p_prev + n_prev + nn_ + i)
            n_pos += 1
        p_prev += np_
        n_prev += nn_
    assert r["n_pos"] == n_pos
    assert r["sum_prec_ppm"] == total
    assert r["ap_ppm"] == total // n_pos


def test_prf_consistent_with_ari(spark):
    """The PRF triple reads the SAME contingency as ARI: its TP /
    pred / true pair counts must equal ari_clusters_vs_labels'
    sum_c2_cells / sum_c2_clusters / sum_c2_labels."""
    from pedri_analysis_spark.plans import draft_r14 as d14
    from pedri_analysis_spark.plans import draft_r19 as d

    prf = d.QUERIES["dedup_pair_prf"](spark, SF_DIR).collect()[0]
    ari = d14.QUERIES["ari_clusters_vs_labels"](spark, SF_DIR).collect()[0]
    assert prf["tp"] == ari["sum_c2_cells"]
    assert prf["pred_pairs"] == ari["sum_c2_clusters"]
    assert prf["true_pairs"] == ari["sum_c2_labels"]
    assert 0 <= prf["f1_ppm"] <= 1_000_000
    assert prf["precision_ppm"] <= 1_000_000 and prf["recall_ppm"] <= 1_000_000


def test_brown_forsythe_decomposition(spark):
    """SSB + SSW must reassemble the total quantized sum of squares
    within the documented per-group floor slack (k + 1 units)."""
    from pedri_analysis_spark.plans import draft_r19 as d

    r = d.QUERIES["brown_forsythe_value"](spark, SF_DIR).collect()[0]
    assert r["ssb_q"] >= 0 or r["ssb_q"] >= -r["k_groups"]  # floor slack
    assert r["ssw_q"] >= 0
    assert r["f_micro"] >= 0
    assert r["k_groups"] >= 2


def test_wav_haar_matches_python_pyramid(spark):
    """Recompute each clip's pyramid from the generator formula in pure
    Python (no wave module — an independent path) and require exact
    equality, including the odd-tail levels."""
    from pedri_analysis_spark.plans import draft_r19 as d
    from pedri_analysis_spark.operators.multimodal import WAV_HAAR_LEVELS

    got = {
        (r["media_id"], r["level"]): (r["n_blocks"], r["detail_energy"])
        for r in d.QUERIES["wav_haar_energy_audit"](spark, SF_DIR).collect()
    }
    want = {}
    for mid in range(d.WHE_N):
        n = 64 + mid % 32
        s = [(mid * 7 + j * 13) % 256 for j in range(n)]
        for k in range(1, WAV_HAAR_LEVELS + 1):
            if len(s) % 2:
                s = s + [0]
            a, b = s[0::2], s[1::2]
            dd = [x - y for x, y in zip(a, b)]
            want[(mid, k)] = (len(dd), sum(x * x for x in dd))
            s = [x + y for x, y in zip(a, b)]
    assert got == want


def test_ap_zero_positives_guarded(spark, duck, tmp_path):
    """A corpus with ZERO 'purchase' events makes n_pos = 0; unguarded,
    DuckDB raises division-by-zero where Spark returns NULL.  Both
    engines must take the guard branch: ap_ppm = 0, sum_prec_ppm = 0.
    r13 advice regression pin (the ARI/GKT zero-denominator class)."""
    import duckdb
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pedri_analysis_spark.plans import draft_r19 as d

    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    deg = t.filter(pc.not_equal(t.column("event_type"), "purchase"))
    assert deg.num_rows > 0
    pq.write_table(deg, str(tmp_path / "events.parquet"))

    srow = (
        d.QUERIES["average_precision_value"](spark, str(tmp_path))
        .collect()[0]
        .asDict()
    )
    assert srow["n_pos"] == 0 and srow["ap_ppm"] == 0, srow
    assert srow["sum_prec_ppm"] == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    q = con.sql(d.ORACLE_SQL["average_precision_value"])
    drow = dict(zip(list(q.columns), q.fetchall()[0]))
    con.close()
    assert drow["n_pos"] == 0 and drow["ap_ppm"] == 0, drow


def test_cochrans_q_matches_python_reference(spark, duck):
    """Recompute Q from the raw flag matrix in float Python — the SQL's
    single micro floor must agree within 1 micro."""
    from pedri_analysis_spark.plans import draft_r19 as d

    t1, t2 = d.CQ_TOKENS
    rows = duck.sql(
        rf"""SELECT CASE WHEN n_chars >= {d.CQ_NCHARS_MIN} THEN 1 ELSE 0 END,
             CASE WHEN list_contains(list_filter(string_split_regex(
               trim(lower(text)), '\s+'), _t -> _t <> ''), '{t1}')
               THEN 1 ELSE 0 END,
             CASE WHEN list_contains(list_filter(string_split_regex(
               trim(lower(text)), '\s+'), _t -> _t <> ''), '{t2}')
               THEN 1 ELSE 0 END
        FROM documents"""
    ).fetchall()
    k = 3
    cs = [sum(r[j] for r in rows) for j in range(k)]
    rsums = [sum(r) for r in rows]
    num = (k - 1) * (k * sum(c * c for c in cs) - sum(cs) ** 2)
    den = k * sum(rsums) - sum(x * x for x in rsums)
    got = d.QUERIES["cochrans_q_flags"](spark, SF_DIR).collect()[0]
    assert [got["c1"], got["c2"], got["c3"]] == cs
    assert den > 0
    assert abs(got["q_micro"] - num * 1e6 / den) <= 1


def test_kendalls_w_matches_python_reference(spark, duck):
    """Recompute W with explicit Python sorts (the textbook ranks-then-
    deviations path, independent of the SQL's power-sum identity)."""
    from pedri_analysis_spark.plans import draft_r19 as d

    rows = duck.sql(
        r"""SELECT doc_id, n_chars,
             len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                 _t -> _t <> '')),
             len(list_distinct(list_filter(string_split_regex(
                 trim(lower(text)), '\s+'), _t -> _t <> '')))
        FROM documents"""
    ).fetchall()
    n, m = len(rows), 3
    rank_sum = {r[0]: 0 for r in rows}
    for j in (1, 2, 3):
        for rk, row in enumerate(
            sorted(rows, key=lambda r: (r[j], r[0])), start=1
        ):
            rank_sum[row[0]] += rk
    mean = m * (n + 1) / 2.0
    s = sum((v - mean) ** 2 for v in rank_sum.values())
    w = 12.0 * s / (m * m * (n**3 - n))
    got = d.QUERIES["kendalls_w_rankers"](spark, SF_DIR).collect()[0]
    assert got["n"] == n and got["m_rankers"] == m
    assert got["mean_d2_sq"] == int(round(4 * s)) // n
    assert abs(got["w_micro"] - w * 1e6) <= 1
    assert 0 <= got["w_micro"] <= 1_000_000


def test_png_codec_detects_corruption():
    """The CRC path must be REAL: flipping one payload byte flips
    crc_ok; truncating the IDAT stream raises in zlib; a bad signature
    raises — independent evidence the reader verifies, not trusts."""
    import pytest as _pytest

    from pedri_analysis_spark.operators.multimodal import (
        _png_decode_gray8,
        _png_encode_gray8,
    )

    tile = [bytes((3 * 7 + y * 13 + x * 5) % 256 for x in range(19)) for y in range(10)]
    png = _png_encode_gray8(tile)
    w, h, nch, ok, rows = _png_decode_gray8(png)
    assert (w, h, nch, ok) == (19, 10, 3, True) and rows == tile

    # flip one byte inside the IDAT payload (after sig+IHDR chunk)
    idat_payload_off = 8 + (12 + 13) + 8 + 2
    bad = bytearray(png)
    bad[idat_payload_off] ^= 0xFF
    try:
        _, _, _, ok_bad, _ = _png_decode_gray8(bytes(bad))
        assert not ok_bad
    except Exception:
        pass  # zlib may reject the corrupted stream outright — also loud

    with _pytest.raises(ValueError):
        _png_decode_gray8(b"\x00" * 16)


def test_wasserstein_matches_python_reference(spark, duck):
    """Recompute the exact CDF-area numerator and the single floor
    from raw event rows in pure Python."""
    from collections import defaultdict

    from pedri_analysis_spark.plans import draft_r19 as d

    r = d.QUERIES["wasserstein_value_drift"](spark, SF_DIR).collect()[0]
    ev = duck.sql(
        """
        SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT),
               epoch_us(ts) // 86400000000
        FROM events WHERE value IS NOT NULL
        """
    ).fetchall()
    d0 = min(dd for _, dd in ev) + d.WS_SPLIT_DAYS
    g1 = defaultdict(int)
    g2 = defaultdict(int)
    for vc, dd in ev:
        (g1 if dd < d0 else g2)[vc] += 1
    vs = sorted(set(g1) | set(g2))
    n1 = sum(g1.values())
    n2 = sum(g2.values())
    c1 = c2 = nm = 0
    for i, v in enumerate(vs):
        c1 += g1.get(v, 0)
        c2 += g2.get(v, 0)
        if i + 1 < len(vs):
            nm += abs(c1 * n2 - c2 * n1) * (vs[i + 1] - v)
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert r["w1_microcents"] == (10**6 * nm) // (n1 * n2)
    assert r["w1_microcents"] >= 0


def test_bradley_terry_matches_python_reference(spark, duck):
    """Replay the identical ppm MM iteration in pure Python (exact),
    then pin against the float fixed point to +-2 ppm."""
    from collections import defaultdict

    from pedri_analysis_spark.plans import draft_r19 as d

    rows = d.QUERIES["bradley_terry_event_types"](spark, SF_DIR).collect()
    dt = duck.sql(
        f"""
        SELECT epoch_us(ts) // 86400000000, event_type, count(*)
        FROM events
        WHERE event_type IN ({', '.join("'" + t + "'" for t in d.BT_TYPES)})
        GROUP BY 1, 2
        """
    ).fetchall()
    idx = {nm: k for k, nm in enumerate(d.BT_TYPES)}
    day = defaultdict(dict)
    for dd, t, c in dt:
        day[dd][idx[t]] = c
    k5 = len(d.BT_TYPES)
    nm5 = [[0] * k5 for _ in range(k5)]
    wm = [[0] * k5 for _ in range(k5)]
    for _, cs in day.items():
        for a in range(k5):
            for b in range(a + 1, k5):
                ca, cb = cs.get(a, 0), cs.get(b, 0)
                if ca != cb:
                    nm5[a][b] += 1
                    nm5[b][a] += 1
                    if ca > cb:
                        wm[a][b] += 1
                    else:
                        wm[b][a] += 1
    W = [sum(wm[i]) for i in range(k5)]
    p = [d.BT_SCALE] * k5
    for _ in range(d.BT_ITERS):
        praw = []
        for i in range(k5):
            den = sum(
                (nm5[i][j] * 10**12) // (p[i] + p[j])
                for j in range(k5)
                if j != i and nm5[i][j] > 0
            )
            praw.append(max(1, (W[i] * 10**12) // den) if den > 0 else p[i])
        ps = sum(praw)
        p = [max(1, (x * k5 * d.BT_SCALE) // ps) for x in praw]
    by_name = {r["event_type"]: r for r in rows}
    for i, name in enumerate(d.BT_TYPES):
        assert by_name[name]["wins"] == W[i]
        assert by_name[name]["games"] == sum(nm5[i])
        assert by_name[name]["strength_ppm"] == p[i]
    # normalization invariant: strengths sum to ~ k * SCALE
    tot = sum(r["strength_ppm"] for r in rows)
    assert abs(tot - k5 * d.BT_SCALE) <= k5
    # float MM fixed point agrees closely
    pf = [1.0] * k5
    for _ in range(200):
        pf = [
            sum(wm[i]) / sum(
                nm5[i][j] / (pf[i] + pf[j])
                for j in range(k5)
                if j != i and nm5[i][j]
            )
            for i in range(k5)
        ]
        s = sum(pf)
        pf = [k5 * x / s for x in pf]
    for i, name in enumerate(d.BT_TYPES):
        assert abs(by_name[name]["strength_ppm"] - pf[i] * d.BT_SCALE) <= 2


def test_hoeffding_matches_textbook_double_loop(spark, duck):
    """Recompute Hoeffding's D by the textbook definition — full
    O(n²) φ-matrix for the bivariate ranks Q, bisect midranks for
    R/S — and require EXACT equality of (n, d1_16, d2_16, d3_16,
    d_nano).  (No [−0.5, 1] range pin: those bounds are ASYMPTOTIC —
    the finite-n maximum exceeds 1, see the perfect-dependence test.)"""
    import bisect

    import numpy as np

    from pedri_analysis_spark.plans import draft_r19 as d

    row = d.QUERIES["hoeffding_d_daily_arms"](spark, SF_DIR).collect()[0]

    in_a = "', '".join(d.HD_GROUP_A)
    in_b = "', '".join(d.HD_GROUP_B)
    cents = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    raw = duck.sql(
        f"""
        SELECT CAST(sum(CASE WHEN o_orderpriority IN ('{in_a}')
                             THEN {cents} ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN o_orderpriority IN ('{in_b}')
                             THEN {cents} ELSE 0 END) AS BIGINT)
        FROM orders GROUP BY o_orderdate
        """
    ).fetchall()
    xs = np.array([r[0] for r in raw], dtype=np.int64)
    ys = np.array([r[1] for r in raw], dtype=np.int64)
    n = len(xs)
    sx, sy = sorted(xs.tolist()), sorted(ys.tolist())

    def r2_of(v, s):
        lt = bisect.bisect_left(s, v)
        return 2 * lt + (bisect.bisect_right(s, v) - lt) + 1

    r2 = [r2_of(int(v), sx) for v in xs]
    s2 = [r2_of(int(v), sy) for v in ys]
    fx = np.where(xs[None, :] < xs[:, None], 2, np.where(xs[None, :] == xs[:, None], 1, 0))
    fy = np.where(ys[None, :] < ys[:, None], 2, np.where(ys[None, :] == ys[:, None], 1, 0))
    prod = (fx * fy).astype(np.int64)
    np.fill_diagonal(prod, 0)
    q4 = (4 + prod.sum(axis=1)).tolist()
    d1 = sum((q - 4) * (q - 8) for q in q4)
    d2 = sum((r - 2) * (r - 4) * (s - 2) * (s - 4) for r, s in zip(r2, s2))
    d3 = sum((r - 4) * (s - 4) * (q - 4) for r, s, q in zip(r2, s2, q4))
    num = 30 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 4) * d3)
    den = 16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    dn = (num * 10**9) // den if num >= 0 else -((-num * 10**9) // den)
    assert (row["n"], row["d1_16"], row["d2_16"], row["d3_16"], row["d_nano"]) == (
        n,
        d1,
        d2,
        d3,
        dn,
    )


def test_hoeffding_perfect_dependence_is_positive(spark, duck):
    """Sanity on the statistic itself (oracle-side closed case): for a
    strictly monotone tie-free relationship Q_i equals the univariate
    rank R_i, so D is a closed form in n alone — the FINITE-SAMPLE
    maximum (→ 1 only as n → ∞; 1.6707... at n = 50).  The identity
    permutation over 1..50 must reproduce that closed form exactly
    through the SAME SQL text."""
    from pedri_analysis_spark.plans import draft_r19 as d

    sql = d.ORACLE_SQL["hoeffding_d_daily_arms"].replace(
        "FROM orders GROUP BY o_orderdate", "FROM synth GROUP BY o_orderdate"
    )
    duck.sql("DROP TABLE IF EXISTS hd_synth_base")
    duck.sql(
        """
        CREATE TEMP TABLE hd_synth_base AS
        SELECT (DATE '2000-01-01' + INTERVAL (i) DAY)::TIMESTAMP AS o_orderdate,
               '1-URGENT' AS o_orderpriority, (i + 1)::DOUBLE AS o_totalprice
        FROM range(50) t(i)
        UNION ALL
        SELECT (DATE '2000-01-01' + INTERVAL (i) DAY)::TIMESTAMP,
               '5-LOW', (2 * i + 5)::DOUBLE
        FROM range(50) t(i)
        """
    )
    row = duck.sql(f"WITH synth AS (SELECT * FROM hd_synth_base), {sql[5:]}").fetchall()[0]
    n = 50
    d1 = sum((r - 1) * (r - 2) for r in range(1, n + 1))
    d2 = sum(((r - 1) * (r - 2)) ** 2 for r in range(1, n + 1))
    d3 = sum((r - 2) * (r - 2) * (r - 1) for r in range(1, n + 1))
    num = 30 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 4) * d3)
    den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    want = (num * 10**9) // den
    assert row[0] == n and row[4] == want, (row, want)
    assert want > 1_000_000_000  # the finite-n max EXCEEDS the asymptotic 1
