"""Draft queries staged for r20 registration (NOT in the registry).

Staged-draft protocol (established r10→r19): fully implemented,
oracle-paired, plan-invariant-pinned and proven green by
tests/test_draft_r20.py under the driver-identical comparison in the
round that stages them; registering later is one line in
``registry._modules`` (see COVERAGE.md "Registration-window plan").

Families and the public designs they implement:
- cohort_ltv_cents — cohort lifetime-value triangle: cumulative revenue
  per first-order-month cohort by month offset, the MONEY companion to
  cohort_retention's user counts (the pair every growth dashboard
  shows side by side).
- session_bigram_support — session-bounded sequential pattern support
  (the length-2 core of GSP / PrefixSpan): which event-type
  transitions happen INSIDE a 30-minute session, supported by how many
  distinct sessions — markov_transition_probs without the
  session-boundary leakage.
- page_hinkley_drift — Page-Hinkley cumulative drift statistic (Page
  1954; Hinkley 1971) over daily revenue: m_t = Σ(x_i − x̄_i) against
  its running minimum — the sequential mean-shift detector that flags
  WHERE the series departed from its own history, complementing
  cusum_changepoint_daily's fixed-mean CUSUM.
- cvm_drift_doclen — two-sample Cramér-von Mises drift per source
  pair: the integral-norm companion to ks_drift_doclen's sup-norm,
  catching broad low-amplitude CDF shifts a single worst-gap misses;
  pinned coherent with KS (zero-KS ⇒ zero-CvM, CvM ≤ KS²).

Added in the r15 session (same staging discipline):
- holt_linear_forecast — double exponential smoothing + 6-month linear
  forecast, the third recursive-CTE query (array-carrying state).
- pettitt_changepoint_daily — Pettitt rank-based changepoint (1979):
  the distribution-free member of the changepoint family (binseg =
  mean-shift gain, CUSUM/Page-Hinkley = cumulative mean departure),
  via the doubled-midrank identity U_t = t(n+1) − Σ_{i≤t}R2_i that
  replaces the textbook O(n²) sign double-sum with two window passes.
- yules_k_per_source — Yule's characteristic K (1944) per source: the
  REPETITIVENESS of each source's vocabulary (scale-invariant in
  sample size), the companion axis to chao1's per-lang richness.

Added in the r14 session (same staging discipline):
- kaplan_meier_churn — Kaplan-Meier product-limit survival of user
  lifetimes with right-censoring; the catalog's first RECURSIVE CTE.
- logrank_churn_cohorts — Mantel log-rank test comparing purchaser vs
  non-purchaser survival, the hypothesis test on top of KM.
- dtw_daily_revenue_shapes — exact DTW distance between the purchase
  and click daily revenue shapes via RECURSIVE anti-diagonal DP (each
  step carries two bounded diagonals as arrays in one row — no
  aggregate over the recursive reference, no join in the recursive
  term).

Reference parity: none of these exist in the reference engine — they
extend the training-data-pipeline / analytics surface per SURVEY.md
§2's "beyond the reference" mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pedri_analysis_spark.functions import textexpr as tx
from pedri_analysis_spark.plans.relational import QueryFn
from pedri_analysis_spark.sources.tables import load_table

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


_IDIV = {tx.DUCK: "//", tx.SPARK: "div"}


# ---------------------------------------------------------------------------
# Cohort lifetime-value triangle (revenue per cohort x month offset)
# ---------------------------------------------------------------------------

LTV_MAX_OFFSET = 12


def _ltv_sql(dialect: str) -> str:
    if dialect == tx.DUCK:
        mi = "(date_part('year', o_orderdate) * 12 + date_part('month', o_orderdate) - 1)"
    else:
        mi = "(year(o_orderdate) * 12 + month(o_orderdate) - 1)"
    cents = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    return f"""
    WITH o AS (
      SELECT o_custkey AS ck, {mi} AS mi, {cents} AS cents FROM orders
    ),
    coh AS (SELECT ck, min(mi) AS cmi FROM o GROUP BY ck),
    j AS (
      SELECT c.cmi AS cohort_mi, o.mi - c.cmi AS off, o.ck, o.cents
      FROM o JOIN coh c ON c.ck = o.ck
      WHERE o.mi - c.cmi <= {LTV_MAX_OFFSET}
    ),
    cell AS (
      SELECT cohort_mi, off,
             CAST(count(DISTINCT ck) AS BIGINT) AS n_active,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM j GROUP BY cohort_mi, off
    )
    SELECT CAST(cohort_mi AS BIGINT) AS cohort_mi, CAST(off AS BIGINT) AS off,
           n_active, revenue_cents,
           CAST(sum(revenue_cents) OVER (PARTITION BY cohort_mi ORDER BY off
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
    FROM cell
    ORDER BY cohort_mi, off
    """


@_register("cohort_ltv_cents", _ltv_sql(tx.DUCK))
def q_cohort_ltv_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by first-order
    month, revenue summed per month offset 0..{LTV_MAX_OFFSET} and
    accumulated along the offset axis — the MONEY half of the classic
    growth dashboard whose user-count half is cohort_retention (an LTV
    curve that flattens while retention holds means shrinking basket
    sizes, which neither query shows alone).

    Determinism: month index = year·12 + month − 1, exact integers in
    both engines; money is exact DECIMAL→BIGINT cents; the cumulative
    window is integer sums over a calendar-bounded frame.

    Scale: the cohort min and the order join both hash on o_custkey
    (one reused exchange — the cohort_retention plan shape); the cell
    rollup shuffles (cohort, offset) pairs only, and the cumulative
    window runs on the months × {LTV_MAX_OFFSET + 1} frame."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    o.createOrReplaceTempView("orders_ltv")
    return spark.sql(
        _ltv_sql(tx.SPARK).replace("FROM orders", "FROM orders_ltv")
    )


# ---------------------------------------------------------------------------
# Session-bounded bigram support (GSP length-2 over 30-min sessions)
# ---------------------------------------------------------------------------


def _sbs_sql(dialect: str) -> str:
    from pedri_analysis_spark.plans.draft_r13 import SESSION_GAP_US

    ts_us = "epoch_us(ts)" if dialect == tx.DUCK else "ts_us"
    src = "events" if dialect == tx.DUCK else "events_sbs"
    return f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, {ts_us} AS t FROM {src}
    ),
    g AS (
      SELECT user_id, event_id, event_type, t,
             CASE WHEN lag(t) OVER w IS NULL
                       OR t - lag(t) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    s AS (
      SELECT user_id, event_id, event_type, t,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    big AS (
      SELECT user_id, sid, event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id, sid
                                    ORDER BY t, event_id) AS b
      FROM s
    ),
    occ AS (
      SELECT a, b, user_id, sid, count(*) AS n
      FROM big WHERE b IS NOT NULL
      GROUP BY a, b, user_id, sid
    )
    SELECT a, b,
           CAST(count(*) AS BIGINT) AS support_sessions,
           CAST(sum(n) AS BIGINT) AS n_occurrences
    FROM occ
    GROUP BY a, b
    ORDER BY support_sessions DESC, n_occurrences DESC, a ASC, b ASC
    """


@_register("session_bigram_support", _sbs_sql(tx.DUCK))
def q_session_bigram_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-bounded sequential patterns — the length-2 core of GSP /
    PrefixSpan sequence mining: consecutive event-type transitions
    INSIDE a 30-minute session (the sessionization_gap_stats spine),
    each bigram supported by how many distinct sessions and how many
    raw occurrences.  markov_transition_probs computes transition
    PROBABILITIES over the unsegmented stream; this query refuses to
    count the overnight "error → signup" pseudo-transition at all —
    session support is the number sequence-mining thresholds on.

    Determinism: the in-session order is totalized by (ts_us,
    event_id) exactly as in sessionization_gap_stats; support is a
    two-level exact count (per-(bigram, session) rollup first, never a
    corpus count(DISTINCT)); the final order is total.

    Scale: every window and both rollups partition by user/session —
    ONE user_id shuffle end to end, then the ≤|types|² output frame."""
    from pedri_analysis_spark.plans.relational import events_us

    ev = events_us(spark, sf_dir).select("user_id", "event_id", "event_type", "ts_us")
    ev.createOrReplaceTempView("events_sbs")
    return spark.sql(_sbs_sql(tx.SPARK))


# ---------------------------------------------------------------------------
# Page-Hinkley drift statistic over daily revenue
# ---------------------------------------------------------------------------

PH_UNIT_DIV = 1000  # daily revenue in $10 quanta (the r15 convention)
PH_TOPK = 8


def _ph_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    fsd = tx.floor_scaled_div
    cents = "sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
    return f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(({cents}) {d} {PH_UNIT_DIV} AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate
    ),
    pre AS (
      SELECT day, v,
             CAST(sum(v) OVER w AS BIGINT) AS s,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM daily
      WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
    ),
    m AS (
      SELECT day, v,
             s * 1000000 - CAST(sum({fsd(dialect, "s", "i", 1_000_000)})
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS m_q
      FROM pre
    ),
    ph AS (
      SELECT day, v, m_q,
             m_q - CAST(min(m_q) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS ph_q
      FROM m
    )
    SELECT day, v AS v_units, CAST(m_q AS BIGINT) AS m_q,
           CAST(ph_q AS BIGINT) AS ph_q
    FROM ph
    ORDER BY ph_q DESC, day ASC
    LIMIT {PH_TOPK}
    """


@_register("page_hinkley_drift", _ph_sql(tx.DUCK))
def q_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift statistic (Page 1954; Hinkley 1971)
    over daily revenue: m_t = Σ_{{i≤t}} (x_i − x̄_i) with x̄_i the
    RUNNING prefix mean, and PH_t = m_t − min_{{j≤t}} m_j — the
    sequential detector that flags where the series departs from its
    own history, complementing cusum_changepoint_daily (fixed global
    mean) and binseg (single retrospective split).  δ = 0 (report the
    raw statistic; a deployment thresholds it).

    Determinism: the only fractions are the prefix means S_i/i, each
    quantized with ONE documented floor to micro units (the Shapley
    v(S) discipline); everything else — prefix sums, running minimum,
    the final top-k — is exact BIGINT arithmetic with day tie-breaks.

    BIGINT bound (wave convention): S_t·10⁶ wraps past ~9e12 revenue
    units (~$9e14); coarser PH_UNIT_DIV or DECIMAL(38,0) is the escape
    hatch.

    Scale: one day rollup; three stacked windows on the
    calendar-bounded day frame (the repo's domain-bounded
    single-partition contract); output is TakeOrdered({PH_TOPK})."""
    o = load_table(spark, "orders", sf_dir).select("o_orderdate", "o_totalprice")
    o.createOrReplaceTempView("orders_ph")
    return spark.sql(
        _ph_sql(tx.SPARK).replace("FROM orders GROUP BY", "FROM orders_ph GROUP BY")
    )


# ---------------------------------------------------------------------------
# Two-sample Cramér-von Mises drift on binned document lengths
# ---------------------------------------------------------------------------

CVM_BIN = 64  # same n_chars bin width as ks_drift_doclen


def _hug(dialect: str, expr: str) -> str:
    if dialect == tx.DUCK:
        return f"CAST({expr} AS HUGEINT)"
    return f"CAST({expr} AS DECIMAL(38,0))"


def _cvm_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    diff = "(cum1 * n_b - cum2 * n_a)"
    num = f"sum({h(diff)} * {h(diff)} * {h('(c1 + c2)')})"
    den = f"({h('n_a + n_b')} * {h('n_a * n_b')} * {h('n_a * n_b')})"
    return f"""
    WITH c AS (
      SELECT source, (n_chars {d} {CVM_BIN}) AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY source, (n_chars {d} {CVM_BIN})
    ),
    tot AS (
      SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.n AS n_a, b.n AS n_b
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    sides AS (
      SELECT p.src_a, p.src_b, c.bin, c.cnt AS c1, CAST(0 AS BIGINT) AS c2
      FROM pairs p JOIN c ON c.source = p.src_a
      UNION ALL
      SELECT p.src_a, p.src_b, c.bin, CAST(0 AS BIGINT), c.cnt
      FROM pairs p JOIN c ON c.source = p.src_b
    ),
    g AS (
      SELECT src_a, src_b, bin,
             CAST(sum(c1) AS BIGINT) AS c1, CAST(sum(c2) AS BIGINT) AS c2
      FROM sides GROUP BY src_a, src_b, bin
    ),
    cum AS (
      SELECT src_a, src_b, c1, c2,
             CAST(sum(c1) OVER w AS BIGINT) AS cum1,
             CAST(sum(c2) OVER w AS BIGINT) AS cum2
      FROM g
      WINDOW w AS (PARTITION BY src_a, src_b ORDER BY bin
                   ROWS UNBOUNDED PRECEDING)
    ),
    stat AS (
      SELECT c.src_a, c.src_b, p.n_a, p.n_b,
             {num} AS num
      FROM cum c
      JOIN pairs p ON p.src_a = c.src_a AND p.src_b = c.src_b
      GROUP BY c.src_a, c.src_b, p.n_a, p.n_b
    )
    SELECT src_a, src_b, n_a, n_b,
           CAST((num * 1000000) {d} {den} AS BIGINT) AS cvm_micro
    FROM stat
    ORDER BY cvm_micro DESC, src_a ASC, src_b ASC
    """


@_register("cvm_drift_doclen", _cvm_sql(tx.DUCK))
def q_cvm_drift_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises drift over the binned document-length
    CDFs of every source pair: the INTEGRAL-norm companion to
    ks_drift_doclen's sup-norm — KS sees only the single worst CDF gap,
    CvM integrates (F_a − F_b)² against the pooled mass and so catches
    broad low-amplitude distribution shifts a one-point spike hides.
    Statistic (documented quantized objective, the binseg discipline):
    cvm = Σ_bins (c1+c2)·(F_a − F_b)² / (n_a + n_b), with the CDF
    difference carried as the exact integer cross product
    cum1·n_b − cum2·n_a over the common denominator n_a·n_b.

    Determinism: identical bin/cumulative spine as the registered KS
    query (value-bounded bin domain); the squared sum accumulates in
    HUGEINT / DECIMAL(38,0) — diff² is corpus⁴ magnitude, far past
    BIGINT (the brown_forsythe lesson applied at design time) — and the
    single division is 128-bit truncating in both engines.

    Scale: one (source, bin) rollup; the pair expansion is
    |sources|²-bounded; cumulative windows run per pair over the
    value-bounded bin domain."""
    docs = load_table(spark, "documents", sf_dir).select("source", "n_chars")
    docs.createOrReplaceTempView("documents_cvm")
    return spark.sql(
        _cvm_sql(tx.SPARK).replace("FROM documents GROUP BY", "FROM documents_cvm GROUP BY")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier user-churn survival curve via RECURSIVE CTE (added r14)
# ---------------------------------------------------------------------------

KM_DAY_US = 86_400_000_000
KM_CENSOR_DAYS = 7  # last activity within this window of corpus end => censored
KM_MAX_STEPS = 95  # defensive, mirrored cap under Spark's default
#                    cteRecursionLevelLimit=100; the day-granular grid is
#                    calendar-bounded (~30 at every SF)


def _km_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    ts_us = "epoch_us(ts)" if dialect == tx.DUCK else "ts_us"
    src = "events" if dialect == tx.DUCK else "km_events"
    if dialect == tx.DUCK:
        el = lambda arr, k: f"list_extract({arr}, {k})"  # noqa: E731
        ln = "len"
        mklist = lambda v: f"(SELECT list({v} ORDER BY life_d) FROM grid)"  # noqa: E731
    else:
        el = lambda arr, k: f"element_at({arr}, CAST({k} AS INT))"  # noqa: E731
        ln = "size"
        mklist = lambda v: (  # noqa: E731
            f"(SELECT transform(array_sort(collect_list("
            f"named_struct('k', life_d, 'v', {v}))), s -> s.v) FROM grid)"
        )
    # the recursion carries the whole bounded grid as four arrays in its
    # state row: a static CTE joined in the recursive term is
    # RE-EVALUATED on every step (the holt_linear_forecast finding —
    # here that was one per-user aggregate over the events corpus per
    # step, corpus x steps at scale)
    return f"""
    WITH RECURSIVE u AS (
      SELECT user_id,
             min({ts_us}) {d} {KM_DAY_US} AS first_d,
             max({ts_us}) {d} {KM_DAY_US} AS last_d
      FROM {src}
      GROUP BY user_id
    ),
    lab AS (
      SELECT CAST(last_d - first_d AS BIGINT) AS life_d,
             CASE WHEN last_d > (SELECT max(last_d) FROM u) - {KM_CENSOR_DAYS}
                  THEN 1 ELSE 0 END AS censored
      FROM u
    ),
    grid0 AS (
      SELECT life_d,
             CAST(sum(1 - censored) AS BIGINT) AS d_t,
             CAST(sum(censored) AS BIGINT) AS c_t
      FROM lab GROUP BY life_d
    ),
    grid AS (
      SELECT life_d, d_t, c_t,
             CAST((SELECT count(*) FROM lab) AS BIGINT)
               - CAST(coalesce(sum(d_t + c_t) OVER (ORDER BY life_d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_risk
      FROM grid0
    ),
    arr AS (
      SELECT la, na, da, ca FROM (
        SELECT {mklist('life_d')} AS la, {mklist('n_risk')} AS na,
               {mklist('d_t')} AS da, {mklist('c_t')} AS ca
      ) z WHERE {ln}(la) >= 1
    ),
    km AS (
      SELECT CAST(1 AS BIGINT) AS idx, la, na, da, ca,
             CAST((1000000 * ({el('na', '1')} - {el('da', '1')}))
                  {d} {el('na', '1')} AS BIGINT) AS s_ppm
      FROM arr
      UNION ALL
      SELECT idx + 1, la, na, da, ca,
             CAST((s_ppm * ({el('na', 'idx + 1')} - {el('da', 'idx + 1')}))
                  {d} {el('na', 'idx + 1')} AS BIGINT)
      FROM km
      WHERE idx < {ln}(la) AND idx < {KM_MAX_STEPS}
    )
    SELECT {el('la', 'idx')} AS lifetime_days,
           {el('na', 'idx')} AS n_risk,
           {el('da', 'idx')} AS n_churned,
           {el('ca', 'idx')} AS n_censored,
           s_ppm AS survival_ppm
    FROM km
    ORDER BY lifetime_days
    """


@_register("kaplan_meier_churn", _km_sql(tx.DUCK))
def q_kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival curve (1958) of user
    LIFETIMES (days between first and last event): users whose last
    activity falls within {KM_CENSOR_DAYS} days of the corpus end are
    right-CENSORED (still alive — they leave the risk set without a
    churn event), everyone else churned at their observed lifetime —
    the estimator retention analytics is built on, and the first
    catalog query on Spark 4's RECURSIVE CTE surface (the product
    chain S(t) = S(t-) * (n_t - d_t)/n_t is inherently sequential;
    recursion expresses it exactly where window algebra cannot without
    libm log/exp).

    Determinism: day-granular lifetimes are exact integers off the
    shared epoch-µs spine (events_us / epoch_us — both parquet ts
    encodings); each product step floors once to ppm (per-step
    quantization, documented — the monotone non-increasing staircase
    survives flooring since (n-d)/n <= 1); n_risk comes from prefix
    sums on the grid, so Σ(d+c) telescopes to the user count exactly.

    Scale: the corpus reduces to ONE per-user min/max aggregate; the
    lifetime grid is CALENDAR-bounded (~30 day-values at every SF —
    the recursion depth is structural, never corpus-sized; capped at
    {KM_MAX_STEPS} in BOTH dialects under Spark's default recursion
    limit of 100, mirrored so a hypothetical longer calendar truncates
    identically and loudly in the parity gate).  The recursion carries
    the grid as four bounded arrays in its single state row (r15
    rewrite): the earlier form joined the grid CTE in the recursive
    term, and Spark RE-EVALUATES a joined static CTE every step — one
    per-user corpus aggregate x ~30 steps (the holt_linear_forecast
    measurement; 3.05 -> 1.52 s at sf0.1 here under co-tenant load),
    corpus-linear x steps at 100 TB instead of corpus-linear + steps."""
    from pedri_analysis_spark.plans.relational import events_us

    ev = events_us(spark, sf_dir).select("user_id", "ts_us")
    ev.createOrReplaceTempView("km_events")
    return spark.sql(_km_sql(tx.SPARK))


# ---------------------------------------------------------------------------
# Log-rank test: purchaser vs non-purchaser churn curves (added r14)
# ---------------------------------------------------------------------------

LR_CHI2_CRIT_MICRO = 3_841_459  # chi^2_{1, 0.05} micro


def _lr_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    ts_us = "epoch_us(ts)" if dialect == tx.DUCK else "ts_us"
    src = "events" if dialect == tx.DUCK else "lr_events"
    e1 = f"(({h('d_t')} * n1 * 1000000) {d} (n1 + n2))"
    v = (
        f"(({h('d_t')} * n1 * n2 * (n1 + n2 - d_t) * 1000000)"
        f" {d} ({h('n1 + n2')} * (n1 + n2) * (n1 + n2 - 1)))"
    )
    return f"""
    WITH u AS (
      SELECT user_id,
             min({ts_us}) {d} {KM_DAY_US} AS first_d,
             max({ts_us}) {d} {KM_DAY_US} AS last_d,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS coh1
      FROM {src}
      GROUP BY user_id
    ),
    lab AS (
      SELECT CAST(last_d - first_d AS BIGINT) AS life_d, coh1,
             CASE WHEN last_d > (SELECT max(last_d) FROM u) - {KM_CENSOR_DAYS}
                  THEN 1 ELSE 0 END AS censored
      FROM u
    ),
    grid0 AS (
      SELECT life_d,
             CAST(sum(coh1 * (1 - censored)) AS BIGINT) AS d1,
             CAST(sum(coh1 * censored) AS BIGINT) AS c1,
             CAST(sum((1 - coh1) * (1 - censored)) AS BIGINT) AS d2,
             CAST(sum((1 - coh1) * censored) AS BIGINT) AS c2
      FROM lab GROUP BY life_d
    ),
    grid AS (
      SELECT life_d, d1, d2, d1 + d2 AS d_t,
             CAST(sum(d1 + c1) OVER () AS BIGINT) AS t1,
             CAST(sum(d2 + c2) OVER () AS BIGINT) AS t2,
             CAST(sum(d1 + c1) OVER () AS BIGINT)
               - CAST(coalesce(sum(d1 + c1) OVER (ORDER BY life_d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n1,
             CAST(sum(d2 + c2) OVER () AS BIGINT)
               - CAST(coalesce(sum(d2 + c2) OVER (ORDER BY life_d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n2
      FROM grid0
    ),
    terms AS (
      SELECT t1, t2,
             CASE WHEN n1 + n2 > 0
                  THEN d1 * 1000000 - CAST({e1} AS BIGINT) ELSE 0 END AS oe,
             CASE WHEN n1 + n2 > 1 AND d_t > 0
                  THEN CAST({v} AS BIGINT) ELSE 0 END AS v_micro
      FROM grid
    ),
    s AS (
      SELECT max(t1) AS n_users1, max(t2) AS n_users2,
             CAST(sum(oe) AS BIGINT) AS oe_micro,
             CAST(sum(v_micro) AS BIGINT) AS v_sum_micro
      FROM terms
    )
    SELECT n_users1, n_users2, oe_micro, v_sum_micro,
           CAST(CASE WHEN v_sum_micro > 0
                THEN ({h('oe_micro')} * oe_micro) {d} v_sum_micro
                ELSE 0 END AS BIGINT) AS chi2_micro,
           CAST(CASE WHEN v_sum_micro > 0
                     AND ({h('oe_micro')} * oe_micro) {d} v_sum_micro
                         >= {LR_CHI2_CRIT_MICRO}
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM s
    """


@_register("logrank_churn_cohorts", _lr_sql(tx.DUCK))
def q_logrank_churn_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test (Mantel 1966) comparing the churn survival curves
    of PURCHASERS (>= 1 purchase event) vs non-purchasers — "does
    buying extend a user's lifetime", the hypothesis test on top of
    kaplan_meier_churn's estimator (same lifetimes, same right-
    censoring): at every distinct lifetime the observed cohort-1 deaths
    are compared with the hypergeometric expectation E1 = d*n1/n and
    variance V = d*n1*n2*(n-d) / (n^2 (n-1)); chi^2_1 = (sum O-E)^2 /
    sum V.

    Determinism: E1 and V floor once each per grid row to micro (the
    per-term quantization convention); O-E sums SIGNED micro integers
    (no division on a negative — the final chi-square squares first);
    n_t = 1 rows take the V := 0 guard branch in both dialects.

    Scale: one per-user aggregate, then everything lives on the
    CALENDAR-bounded lifetime grid (~30 rows) — the cohort risk sets
    are two prefix windows on that grid, the cohort totals ride the
    same bounded window (no 1-row cross join anywhere), and the final
    statistic is ONE 4-sum aggregate.  128-bit ceilings (wave
    convention, loud): the V numerator d*n1*n2*(n-d)*1e6 ~ n^4 * 1e6
    binds first at n ~ 1e8 users; oe^2 holds to ~1e13."""
    from pedri_analysis_spark.plans.relational import events_us

    ev = events_us(spark, sf_dir).select("user_id", "event_type", "ts_us")
    ev.createOrReplaceTempView("lr_events")
    return spark.sql(_lr_sql(tx.SPARK))


# ---------------------------------------------------------------------------
# Exact DTW distance between two daily revenue shapes via RECURSIVE
# anti-diagonal DP (added r14)
# ---------------------------------------------------------------------------

DTW_TYPE_A = "purchase"
DTW_TYPE_B = "click"


def _dtw_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    ts_us = "epoch_us(ts)" if dialect == tx.DUCK else "ts_us"
    src = "events" if dialect == tx.DUCK else "dtw_events"
    if dialect == tx.DUCK:
        idx = lambda arr, k: f"list_extract({arr}, {k})"  # noqa: E731
        trans = lambda L, body: (  # noqa: E731
            f"list_transform(generate_series(1, {L}), k -> {body})"
        )
        ln = "len"
        nullarr = "CAST(NULL AS BIGINT[])"
        mklist = lambda t: f"(SELECT list(c ORDER BY day) FROM {t})"  # noqa: E731
    else:
        idx = lambda arr, k: (  # noqa: E731
            f"try_element_at({arr}, CAST({k} AS INT))"
        )
        trans = lambda L, body: f"transform(sequence(1, {L}), k -> {body})"  # noqa: E731
        ln = "size"
        nullarr = "CAST(NULL AS ARRAY<BIGINT>)"
        mklist = lambda t: (  # noqa: E731
            f"(SELECT transform(array_sort(collect_list(struct(day, c))),"
            f" s -> s.c) FROM {t})"
        )
    # building diagonal d+1 from cur (diag d) and prev (diag d-1)
    i = "(greatest(1, d + 1 - n) + k - 1)"
    j = f"(d + 1 - {i})"
    cost = f"abs({idx('a', i)} - {idx('b', j)})"
    p1 = (
        f"(CASE WHEN {i} - 1 >= 1 THEN "
        f"{idx('cur', f'({i} - 1) - greatest(1, d - n) + 1')} END)"
    )
    p2 = (
        f"(CASE WHEN {j} - 1 >= 1 THEN "
        f"{idx('cur', f'{i} - greatest(1, d - n) + 1')} END)"
    )
    p3 = (
        f"(CASE WHEN {i} - 1 >= 1 AND {j} - 1 >= 1 AND prev IS NOT NULL THEN "
        f"{idx('prev', f'({i} - 1) - greatest(1, d - 1 - n) + 1')} END)"
    )
    body = f"CAST({cost} + least({p1}, {p2}, {p3}) AS BIGINT)"
    new_len = "(least(m, d) - greatest(1, d + 1 - n) + 1)"
    cents = "CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)"
    return f"""
    WITH RECURSIVE sa AS (
      SELECT {ts_us} {d} {KM_DAY_US} AS day, {cents} AS c
      FROM {src}
      WHERE event_type = '{DTW_TYPE_A}' AND value IS NOT NULL
      GROUP BY 1
    ),
    sb AS (
      SELECT {ts_us} {d} {KM_DAY_US} AS day, {cents} AS c
      FROM {src}
      WHERE event_type = '{DTW_TYPE_B}' AND value IS NOT NULL
      GROUP BY 1
    ),
    ab AS (
      SELECT a, b, CAST({ln}(a) AS BIGINT) AS m, CAST({ln}(b) AS BIGINT) AS n
      FROM (SELECT {mklist('sa')} AS a, {mklist('sb')} AS b) z
    ),
    dp AS (
      SELECT CAST(2 AS BIGINT) AS d,
             {trans('1', f"CAST(abs({idx('a', '1')} - {idx('b', '1')}) AS BIGINT)")}
               AS cur,
             {nullarr} AS prev, a, b, m, n
      FROM ab WHERE m >= 1 AND n >= 1
      UNION ALL
      SELECT d + 1, {trans(new_len, body)}, cur, a, b, m, n
      FROM dp WHERE d < m + n
    )
    SELECT m AS len_a, n AS len_b,
           CAST({idx('cur', '1')} AS BIGINT) AS dtw_cents,
           CAST(({idx('cur', '1')} * 1000) {d} (m + n) AS BIGINT)
             AS dtw_per_step_milli
    FROM dp WHERE d = m + n
    """


@_register("dtw_daily_revenue_shapes", _dtw_sql(tx.DUCK))
def q_dtw_daily_revenue_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Dynamic Time Warping distance (Sakoe & Chiba 1978, the
    sequence-similarity workhorse) between the daily purchase- and
    click-revenue shapes: unlike the registered lagged-CCF (one global
    shift), DTW finds the optimal MONOTONE alignment of the two series
    — "do the curves have the same shape under local time stretch" —
    the time-series dedup/matching primitive.

    Engine shape (the novel part): the DP runs as a RECURSIVE CTE over
    ANTI-DIAGONALS — each recursion step carries the whole previous two
    diagonals as BOUNDED BIGINT arrays in ONE row and computes the next
    diagonal with a pure higher-order transform() (no aggregate over
    the recursive reference, which Spark prohibits; no join in the
    recursive term at all).  dp(i,j) = |a_i - b_j| + least of the three
    predecessors, with index arithmetic mapping diagonal offsets and
    out-of-range lookups NULL-safe (try_element_at / list_extract);
    every cell has >= 1 valid predecessor by construction.

    Determinism: cents costs are exact integers; least() over BIGINT is
    exact; the anti-diagonal order is structural.  The single final
    floor is the per-step milli normalization.

    Scale: series are CALENDAR-bounded (~30 points), so the recursion
    depth m + n <= ~60 sits under Spark's default recursion limit of
    100 and each step is ONE row with <= 31-element arrays — model-
    sized state, never corpus-sized; the corpus reduces via two daily
    rollups before any of it."""
    from pedri_analysis_spark.plans.relational import events_us

    ev = events_us(spark, sf_dir).select("event_type", "value", "ts_us")
    ev.createOrReplaceTempView("dtw_events")
    return spark.sql(_dtw_sql(tx.SPARK))


# ---------------------------------------------------------------------------
# Holt linear-trend exponential smoothing + 6-month forecast (added r15)
# ---------------------------------------------------------------------------

HOLT_ALPHA_PPM = 300_000  # level smoothing alpha = 0.3
HOLT_BETA_PPM = 100_000  # trend smoothing beta = 0.1
HOLT_PPM = 1_000_000
HOLT_HORIZON = 6
HOLT_MAX_STEPS = 99  # mirrored literal cap < Spark's recursion limit 100


def _holt_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    if dialect == tx.DUCK:
        hgen = "unnest(generate_series(1, %d))" % HOLT_HORIZON
        el = lambda k: f"list_extract(ys, {k})"  # noqa: E731
        ln = "len"
        mklist = "(SELECT list(y ORDER BY mo) FROM mg)"
    else:
        hgen = "explode(sequence(1, %d))" % HOLT_HORIZON
        el = lambda k: f"element_at(ys, CAST({k} AS INT))"  # noqa: E731
        ln = "size"
        mklist = (
            "(SELECT transform(array_sort(collect_list(struct(mo, y))),"
            " s -> s.y) FROM mg)"
        )
    # y_{t+1} is read from the bounded series array carried in the
    # recursion state — NO join in the recursive term: Spark re-evaluates
    # a joined static CTE on EVERY step (measured 82 s at sf1.0synth for
    # 80 steps x one orders-wide aggregate); the array form computes the
    # grid once in the anchor.
    ynext = el("hh.idx + 1")
    lnew = (
        f"({HOLT_ALPHA_PPM} * {h(ynext)} "
        f"+ {HOLT_PPM - HOLT_ALPHA_PPM} * ({h('hh.l')} + hh.b)) {d} {HOLT_PPM}"
    )
    return f"""
    WITH RECURSIVE mg AS (
      SELECT mo, CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                              AS BIGINT)) AS BIGINT) AS y
      FROM (SELECT date_trunc('month', o_orderdate) AS mo, o_totalprice
            FROM orders) t
      GROUP BY mo
    ),
    arr AS (
      SELECT ys FROM (SELECT {mklist} AS ys) z WHERE {ln}(ys) >= 2
    ),
    holt AS (
      SELECT CAST(1 AS BIGINT) AS idx, ys,
             {el('1')} AS y, {el('1')} AS l,
             {el('2')} - {el('1')} AS b
      FROM arr
      UNION ALL
      SELECT hh.idx + 1, ys, {ynext},
             CAST({lnew} AS BIGINT),
             CAST(({HOLT_BETA_PPM} * (({lnew}) - hh.l)
                   + {HOLT_PPM - HOLT_BETA_PPM} * {h('hh.b')}) {d} {HOLT_PPM}
               AS BIGINT)
      FROM holt hh
      WHERE hh.idx < {ln}(ys) AND hh.idx < {HOLT_MAX_STEPS}
    ),
    fin AS (SELECT idx, l, b FROM holt ORDER BY idx DESC LIMIT 1)
    SELECT idx AS month_idx, y AS y_cents, l AS level_cents, b AS trend_cents,
           CAST(NULL AS BIGINT) AS forecast_cents
    FROM holt
    UNION ALL
    SELECT f.idx + f.hh, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(f.l + f.hh * f.b AS BIGINT)
    FROM (SELECT idx, l, b, {hgen} AS hh FROM fin) f
    ORDER BY month_idx
    """


@_register("holt_linear_forecast", _holt_sql(tx.DUCK))
def q_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (1957) over the
    80-month revenue series, plus the {HOLT_HORIZON}-month linear
    forecast l_T + h*b_T - the classic trending-series forecaster
    next to forecast_revenue_q6's OLS line (which fits ONE global
    line; Holt adapts level and slope recency-weighted).  alpha = 0.3,
    beta = 0.1 in exact ppm integers.

    Determinism: the recurrence l_t = alpha y_t + (1-alpha)(l+b),
    b_t = beta (l_t - l) + (1-beta) b is inherently sequential - the
    third catalog query on Spark 4's RECURSIVE CTE surface, in the DTW
    bounded-array pattern: the anchor computes the month series ONCE
    and carries it as a <=99-element array in the recursion state, so
    the recursive term is a pure 1-row transform (a static CTE joined
    in the recursive term is re-evaluated EVERY step - measured 82 s
    at sf1.0synth before this form).  Monthly revenue sums are exact
    cents; each step floors l then b ONCE to cents (two documented
    per-step quantizations; products widened 128-bit first).  The
    trend can go NEGATIVE: integer division truncates toward zero in
    BOTH dialects on these types (r14-advice-verified), and the Python
    parity pin mirrors exactly that.  Init l_1 = y_1, b_1 = y_2 - y_1
    (classic); depth capped at {HOLT_MAX_STEPS} in BOTH dialects under
    Spark's default recursion limit 100, so a hypothetical longer
    calendar truncates identically and loudly in the parity gate.

    Scale: the corpus reduces in ONE groupBy to the CALENDAR-bounded
    month grid (80 rows at every SF - recursion depth is structural,
    never corpus-sized); 128-bit step products overflow only past
    ~9e12 dollars of monthly revenue (loud BIGINT output cast).  The
    forecast leg explodes a literal {HOLT_HORIZON}-element horizon off
    the 1-row final state - a generator, not a join."""
    ord_df = load_table(spark, "orders", sf_dir)
    ord_df.createOrReplaceTempView("orders")
    return spark.sql(_holt_sql(tx.SPARK))


# ---------------------------------------------------------------------------
# Pettitt rank-based changepoint test (added r15 session)
# ---------------------------------------------------------------------------

# ceil(-ln(0.025) * 1e6): the alpha = 0.05 two-sided constant of the
# Pettitt approximation p = 2*exp(-6K^2/(n^3+n^2)).  CEILED so the
# integer inequality 6K^2*1e6 >= C*(n^3+n^2) claims significance only
# when the real-valued one certainly holds (conservative side).
PETTITT_LN40_MICRO = 3_688_880


def _pettitt_sql(dialect: str) -> str:
    """Identical text in both dialects except idiv / 128-bit spellings.

    Rank identity (no quadratic pair join): with doubled midranks
    R2_i = 2·c_lt + t_i + 1 (exact integers for any tie group),
        Σ_j sign(x_i − x_j) = 2R_i − (n+1)  ⇒
        U_t = Σ_{i≤t} Σ_{j>t} sign(x_j − x_i) = t(n+1) − Σ_{i≤t} R2_i
    because the within-prefix double sum cancels by antisymmetry."""
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    cents = "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)"
    return f"""
    daily AS (
      SELECT o_orderdate AS day, {cents} AS v
      FROM orders GROUP BY o_orderdate
    ),
    ranked AS (
      SELECT day, v,
             2 * (CAST(rank() OVER (ORDER BY v) AS BIGINT) - 1)
               + CAST(count(*) OVER (PARTITION BY v) AS BIGINT) + 1 AS r2,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    u AS (
      SELECT day, n,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) * (n + 1)
               - CAST(sum(r2) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ut,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM ranked
    ),
    best AS (
      SELECT day, n, ut,
             CASE WHEN ut >= 0 THEN ut ELSE -ut END AS au
      FROM u WHERE t < n
      ORDER BY CASE WHEN ut >= 0 THEN ut ELSE -ut END DESC, day ASC
      LIMIT 1
    )
    SELECT CAST(n AS BIGINT) AS n, day AS change_day,
           CAST(ut AS BIGINT) AS u_at_change, CAST(au AS BIGINT) AS k_stat,
           CAST(CASE WHEN {h('6 * au')} * au * 1000000
                     >= {h(str(PETTITT_LN40_MICRO))}
                        * ({h('n')} * n * n + {h('n')} * n)
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM best"""


@_register("pettitt_changepoint_daily", f"WITH {_pettitt_sql(tx.DUCK)}")
def q_pettitt_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based changepoint test (Pettitt 1979) on daily
    revenue: K = max_t |U_t| with U_t the Mann-Whitney-style statistic
    comparing the first t days against the rest — the DISTRIBUTION-FREE
    member of the changepoint family (binseg splits on mean-shift gain,
    CUSUM/Page-Hinkley track cumulative mean departures; Pettitt is
    what a pipeline runs when daily revenue is heavy-tailed enough
    that mean-based detectors chase outliers).

    Determinism: midranks enter DOUBLED (2·c_lt + t + 1), and the rank
    identity U_t = t(n+1) − Σ_{{i≤t}} R2_i turns the textbook O(n²)
    sign double-sum into two exact-integer window passes — zero
    divisions, zero floats.  The argmax row is total-ordered (|U|
    DESC, day ASC).  Significance inverts the Pettitt approximation
    p = 2·exp(−6K²/(n³+n²)) ≤ 0.05 into the integer inequality
    6K²·10⁶ ≥ ceil(ln(40)·10⁶)·(n³+n²) — the CEILED literal keeps the
    claim conservative, the McNemar literal-constant discipline.

    128-bit ceiling (wave convention): 6K²·10⁶ ≈ 1.5n⁴·10⁶ overflows
    past n ≈ 1e8 days — five orders beyond the calendar-bounded frame;
    loud ANSI/HUGEINT failure, never silent.

    Scale: ONE day rollup reduces the corpus; the value-rank and
    day-prefix windows both run on the calendar-bounded day frame (the
    adjudicated domain-bounded single-partition contract), and the
    final argmax is a LIMIT 1 TakeOrdered."""
    o = load_table(spark, "orders", sf_dir).select("o_orderdate", "o_totalprice")
    o.createOrReplaceTempView("orders_pettitt")
    return spark.sql(
        f"WITH orders AS (SELECT * FROM orders_pettitt), {_pettitt_sql(tx.SPARK)}"
    )


# ---------------------------------------------------------------------------
# Yule's characteristic K per source (added r15 session)
# ---------------------------------------------------------------------------


def _yulek_sql(dialect: str) -> str:
    toks = tx.tokens(dialect, "text")
    unnest = (
        f"SELECT source, unnest({toks}) AS tok FROM documents"
        if dialect == tx.DUCK
        else f"SELECT source, explode({toks}) AS tok FROM documents"
    )
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    return f"""
    tok AS ({unnest}),
    tc AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tok
    ),
    agg AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS v_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS v1_hapax,
             CAST(sum(c * c) AS BIGINT) AS s2_sum
      FROM tc GROUP BY source
    )
    SELECT source, n_tokens, v_types, v1_hapax, s2_sum,
           CAST(CASE WHEN n_tokens = 0 THEN 0
                ELSE ({h('10000000000')} * (s2_sum - n_tokens))
                     {d} ({h('n_tokens')} * n_tokens) END AS BIGINT)
             AS k_micro
    FROM agg
    ORDER BY source"""


@_register("yules_k_per_source", f"WITH {_yulek_sql(tx.DUCK)}")
def q_yules_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K (Yule 1944) of each source's token
    stream: K = 10⁴·(Σ_t c_t² − N)/N² — the classic REPETITIVENESS
    constant (the chance two random tokens are the same type, with the
    1/N self-pairing removed, scaled by 10⁴).  Unlike raw TTR it is
    approximately sample-size invariant, which is why stylometry uses
    it as a fingerprint; in a corpus pipeline it is the per-source
    "template mill" detector that complements chao1_vocab_richness
    (how many types remain unseen) and simpson_diversity_sources
    (whole-corpus concentration over sources, not tokens within one).

    Determinism: exact integer counts; c² and Σc² are exact BIGINTs;
    the single division is ONE 128-bit truncating floor to micro-K
    (numerator 10¹⁰·(S₂−N) widened BEFORE multiplying).

    128-bit ceiling (wave convention): 10¹⁰·S₂ ~ 10¹⁰·N² overflows
    past N ≈ 5e13 tokens per source — beyond any per-source shard a
    real layout would allow; loud ANSI/HUGEINT failure, never silent.
    BIGINT S₂ itself wraps first at a single type repeated ~3e9 times
    — also loud (the sum is BIGINT-exact in Spark ANSI, HUGEINT-summed
    then BIGINT-cast in DuckDB).

    Scale: one explode + one map-side-combinable groupBy(source, tok),
    then a 20-row source rollup — no windows, no joins; the same
    topology as chao1 so the two audits share a shuffle when run in
    one plan."""
    docs = load_table(spark, "documents", sf_dir).select("source", "text")
    docs.createOrReplaceTempView("documents_yk")
    return spark.sql(
        f"WITH documents AS (SELECT * FROM documents_yk), {_yulek_sql(tx.SPARK)}"
    )
