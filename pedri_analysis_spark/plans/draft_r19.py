"""Draft queries staged for r19 registration (NOT in the registry).

Staged-draft protocol (established r10→r18): fully implemented,
oracle-paired, plan-invariant-pinned and proven green by
tests/test_draft_r19.py under the driver-identical comparison in the
round that stages them; registering later is one line in
``registry._modules`` (see COVERAGE.md "Registration-window plan").

Families and the public designs they implement:
- average_precision_value — exact Average Precision (the PR-curve
  summary next to auc_purchase_value's ROC summary) under the
  documented PESSIMISTIC tie convention (ties rank negatives first),
  computed from the same value-grid spine as the AUC — per-positive
  precision@k expanded with one sequence() explode, never a global
  sort.
- dedup_pair_prf — pairwise precision / recall / F1 of the LSH-plane
  clustering against the gold labels (the standard dedup-evaluation
  triple; Menestrina et al. 2010): the ARI contingency re-read as
  TP / predicted-pairs / true-pairs.
- brown_forsythe_value — Brown-Forsythe robust variance-equality
  statistic (1974) across the five event types: the ANOVA F on
  |x − group median|, with medians on the exact 0.005 interpolation
  grid and the F ratio as binseg-style quantized integer sums.
- wav_haar_energy_audit — REAL audio decode (stdlib ``wave`` RIFF
  round trip) feeding an EXACT integer Haar energy pyramid per clip,
  with the DuckDB oracle predicting every level's detail energy
  analytically from the PCM generator formula — the multimodal
  feature-extraction story (decode → spectral features) under the
  full hash-match gate, not a rows-only check.

Added in the r15 session (same staging discipline):
- wasserstein_value_drift — exact earth-mover (CDF-area) drift between
  the first-15-days and remaining event-value distributions.
- bradley_terry_event_types — MM-fitted pairwise-comparison strengths
  from daily event-type duels, ppm integers in a bounded-array
  recursive CTE.
- hoeffding_d_daily_arms — Hoeffding's D test statistic (1948) for
  GENERAL (non-monotone) dependence between the urgent-arm and
  low-arm daily revenue series: the rank statistic Spearman/Kendall
  cannot replace (they see only monotone association), carried in
  exact doubled-rank / quadrupled-bivariate-rank integers over the
  calendar-bounded daily pair frame (SF-INVARIANT quadratic: day
  count does not grow with corpus size).

Added in the r14 session (same staging discipline):
- cochrans_q_flags — Cochran's Q across three correlated document
  quality flags, the k >= 3 generalization of McNemar.
- kendalls_w_rankers — Kendall's W concordance of three document-size
  rankers with DISTRIBUTED exact ranks (value-grid prefix counts, no
  corpus-sized window).
- png_roundtrip_energy_audit — REAL PNG codec round trip built from
  stdlib zlib/CRC32 (the container has no Pillow): encode with the SUB
  row filter, decode with signature + per-chunk CRC verification +
  inflate + per-pixel un-filtering, stats hash-matched against an
  analytic oracle.

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
# Exact Average Precision (pessimistic ties) of value vs purchase
# ---------------------------------------------------------------------------


def _ap_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    fsd = tx.floor_scaled_div
    seq = (
        "unnest(generate_series(1, np))"
        if dialect == tx.DUCK
        else "explode(sequence(1, CAST(np AS INT)))"
    )
    prec = fsd(dialect, "(p_prev + i)", "(p_prev + n_prev + nn + i)", 1_000_000)
    return f"""
    WITH e AS (
      SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v_c,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT v_c, CAST(sum(pos) AS BIGINT) AS np,
             CAST(sum(1 - pos) AS BIGINT) AS nn
      FROM e GROUP BY v_c
    ),
    c AS (
      SELECT v_c, np, nn,
             CAST(coalesce(sum(np) OVER (ORDER BY v_c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS p_prev,
             CAST(coalesce(sum(nn) OVER (ORDER BY v_c DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_prev
      FROM g
    ),
    per_pos AS (
      SELECT p_prev, n_prev, nn, {seq} AS i
      FROM c WHERE np > 0
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pos,
             CAST(sum({prec}) AS BIGINT) AS sum_prec_ppm
      FROM per_pos
    )
    SELECT n_pos,
           (SELECT CAST(coalesce(sum(nn), 0) AS BIGINT) FROM g) AS n_neg,
           coalesce(sum_prec_ppm, 0) AS sum_prec_ppm,
           CASE WHEN n_pos > 0
                THEN CAST({fsd(dialect, "sum_prec_ppm", "n_pos", 1)} AS BIGINT)
                ELSE 0 END AS ap_ppm
    FROM s
    """


@_register("average_precision_value", _ap_sql(tx.DUCK))
def q_average_precision_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Average Precision of the event value as a predictor of
    'purchase' — the PR-curve summary that complements
    auc_purchase_value's ROC summary and behaves differently under
    class imbalance (the metric retrieval and filtering pipelines
    actually tune on).

    Tie convention (documented, mirrored): PESSIMISTIC — within a tied
    score group the negatives rank first, so the i-th positive of a
    group with prefix counts (P_prev, N_prev) sits at rank
    P_prev + N_prev + nn + i and contributes precision
    (P_prev + i) / rank.  Each per-positive precision floors to ppm
    and the mean floors once more (two documented quantizations — the
    Shapley v(S) discipline).

    Scale: the same value-grid spine as the AUC (ONE groupBy on
    quantized cents, domain-bounded cumulative window), then one
    sequence() explode producing exactly n_pos rows — linear, never a
    per-row global sort."""
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    ev.createOrReplaceTempView("events_ap")
    return spark.sql(
        _ap_sql(tx.SPARK).replace("FROM events WHERE", "FROM events_ap WHERE")
    )


# ---------------------------------------------------------------------------
# Pairwise precision / recall / F1 of clusters vs gold labels
# ---------------------------------------------------------------------------


def _prf_sql(dialect: str) -> str:
    from pedri_analysis_spark.plans.draft_r14 import _ari_cluster

    d = _IDIV[dialect]
    fsd = tx.floor_scaled_div
    c2 = f"{{x}} * ({{x}} - 1) {d} 2"
    return f"""
    WITH asg AS (
      SELECT vec_id, label, {_ari_cluster(dialect)} AS cluster
      FROM embeddings
    ),
    cont AS (
      SELECT cluster, label, CAST(count(*) AS BIGINT) AS nij
      FROM asg GROUP BY cluster, label
    ),
    pieces AS (
      SELECT
        (SELECT CAST(sum({c2.format(x="nij")}) AS BIGINT) FROM cont) AS tp,
        (SELECT CAST(sum({c2.format(x="a")}) AS BIGINT) FROM (
           SELECT CAST(sum(nij) AS BIGINT) AS a FROM cont GROUP BY cluster)
        ) AS pred_pairs,
        (SELECT CAST(sum({c2.format(x="b")}) AS BIGINT) FROM (
           SELECT CAST(sum(nij) AS BIGINT) AS b FROM cont GROUP BY label)
        ) AS true_pairs
    )
    SELECT tp, pred_pairs, true_pairs,
           CAST(CASE WHEN pred_pairs > 0
                THEN {fsd(dialect, "tp", "pred_pairs", 1_000_000)}
                ELSE 0 END AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN true_pairs > 0
                THEN {fsd(dialect, "tp", "true_pairs", 1_000_000)}
                ELSE 0 END AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN pred_pairs + true_pairs > 0
                THEN {fsd(dialect, "2 * tp", "pred_pairs + true_pairs", 1_000_000)}
                ELSE 0 END AS BIGINT) AS f1_ppm
    FROM pieces
    """


@_register("dedup_pair_prf", _prf_sql(tx.DUCK))
def q_dedup_pair_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise precision / recall / F1 of the LSH-plane clustering
    against the gold labels (Menestrina et al. 2010's pairwise metrics
    — THE reporting triple for entity-resolution / dedup quality):
    TP = ΣC(n_ij,2) same-cluster-same-label pairs, precision over
    predicted pairs ΣC(a_i,2), recall over true pairs ΣC(b_j,2),
    F1 = 2TP/(pred+true) without ever forming P·R/(P+R) (one guarded
    floor each — no nested quantization).  Complements
    ari_clusters_vs_labels: ARI is chance-corrected agreement, the PRF
    triple is what a dedup run reports to its operators.

    Determinism: identical contingency machinery as the ARI query
    (sequential-fold literal-plane cluster ids; exact pair
    combinatorics); guards branch BEFORE any division in both engines.

    Scale: one embeddings rollup to the (cluster × label) contingency
    (domain-bounded: 2^bits × labels), then literal arithmetic."""
    from pedri_analysis_spark.plans.draft_r14 import _ari_cluster

    emb = load_table(spark, "embeddings", sf_dir)
    emb.createOrReplaceTempView("embeddings_prf")
    return spark.sql(
        _prf_sql(tx.SPARK).replace("FROM embeddings", "FROM embeddings_prf")
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe robust variance-equality statistic across event types
# ---------------------------------------------------------------------------


def _bf_sql(dialect: str) -> str:
    d = _IDIV[dialect]

    def _hug(e: str) -> str:
        return (
            f"CAST({e} AS HUGEINT)"
            if dialect == tx.DUCK
            else f"CAST({e} AS DECIMAL(38,0))"
        )

    # 128-bit cross-multiplied F: ssb/ssw are corpus-magnitude sums of
    # squares (~1e15 at sf0.1), so BOTH the n-fold products and the
    # micro scaling wrap BIGINT — fsd's residue trick is insufficient
    # here (its residue·k bound is den·1e6 ~ 5e21); widen every factor
    f_micro = (
        f"({_hug('ssb_q')} * {_hug('n - k')} * 1000000) "
        f"{d} ({_hug('ssw_q')} * {_hug('k - 1')})"
    )
    med = (
        "quantile_cont(v_c, 0.5)"
        if dialect == tx.DUCK
        else "percentile(v_c, 0.5D)"
    )
    return f"""
    WITH ec AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v_c
      FROM events WHERE value IS NOT NULL
    ),
    med AS (
      -- interpolated median of integer cents lands on the half-cent
      -- grid; x2 makes it an EXACT integer (no double->int cast of a
      -- fractional value anywhere: DuckDB's cast rounds where Spark's
      -- truncates — the divergence this dodges by construction)
      SELECT event_type, CAST({med} * 2 AS BIGINT) AS med2 FROM ec
      GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type,
             CAST(abs(2 * e.v_c - m.med2) AS BIGINT) AS z200
      FROM ec e JOIN med m ON m.event_type = e.event_type
    ),
    grp AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(z200) AS BIGINT) AS s_g,
             CAST(sum(z200 * z200) AS BIGINT) AS ss_g
      FROM z GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS BIGINT) AS s,
             CAST(sum(ss_g) AS BIGINT) AS ss,
             CAST(sum((s_g * s_g) {d} n_g) AS BIGINT) AS sq_over_n
      FROM grp
    ),
    q AS (
      SELECT k, n,
             sq_over_n - (s * s) {d} n AS ssb_q,
             ss - sq_over_n AS ssw_q
      FROM tot
    )
    SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_rows,
           CAST(ssb_q AS BIGINT) AS ssb_q, CAST(ssw_q AS BIGINT) AS ssw_q,
           CAST(CASE WHEN ssw_q > 0 AND k > 1 AND ssb_q > 0
                THEN {f_micro}
                ELSE 0 END AS BIGINT) AS f_micro
    FROM q
    """


@_register("brown_forsythe_value", _bf_sql(tx.DUCK))
def q_brown_forsythe_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe robust variance-equality test statistic (1974)
    across the five event types' value distributions: the ANOVA F
    computed on z = |x − group MEDIAN| — the heteroscedasticity check
    run before trusting any pooled-variance analysis, with the median
    centering making it robust where Levene's mean version is not.

    Determinism: values quantize to exact integer cents FIRST; the
    interpolated group median of integers (Spark percentile ≡ DuckDB
    quantile_cont, index p·(n−1)) lands on the half-cent grid, so
    med·2 is an exactly-representable integral double and z = |2v−med2|
    is pure BIGINT — no double→int cast of a fractional value anywhere
    (DuckDB's cast ROUNDS where Spark's TRUNCATES; the first draft hit
    exactly that and was redesigned to dodge the cast by construction).
    The sums of squares use the binseg quantized-objective identity
    (S_g²/n_g with one floor per group, documented) and the F ratio is
    one guarded 128-bit truncating cross-multiplication — ssb·(n−k)
    is corpus² magnitude (~1e20 at sf0.1), past BIGINT and past fsd's
    residue bound, so every factor widens BEFORE multiplying.

    BIGINT bound (wave convention): Σ z200² wraps past ~4e9 rows per
    group at this value range; DECIMAL(38,0)/HUGEINT sums are the
    escape hatch.

    Scale: one medians rollup (k-row frame broadcast back), one linear
    pass for the z sums — the fact table is touched twice, shuffled
    never (both aggregations combine map-side on event_type)."""
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    ev.createOrReplaceTempView("events_bf")
    return spark.sql(
        _bf_sql(tx.SPARK).replace("FROM events WHERE", "FROM events_bf WHERE")
    )


# ---------------------------------------------------------------------------
# Real-decode Haar energy pyramid per WAV clip, analytically oracled
# ---------------------------------------------------------------------------

WHE_N = 64  # clip ids (the wav_roundtrip_stats sample)


def _whe_oracle() -> str:
    """Predict each clip's per-level Haar detail energies ANALYTICALLY
    from the PCM generator formula (sample j = (id·7 + 13·j) % 256,
    n = 64 + id % 32): block sum s_{{k}}(b) = Σ x over the b-th 2^k
    block (missing tail = 0), detail d_k(b) = s_{{k-1}}(2b−1) −
    s_{{k-1}}(2b), energy = Σ d² — the same ceil-block arithmetic the
    kernel's zero-padded numpy pyramid computes."""
    from pedri_analysis_spark.operators.multimodal import WAV_HAAR_LEVELS

    def bs(level: int, b_expr: str) -> str:
        size = 1 << level
        lo = f"(({b_expr}) - 1) * {size} + 1"
        hi = f"least(({b_expr}) * {size}, n)"
        return (
            f"coalesce(list_sum(list_slice(x, {lo}, {hi})), 0)"
        )

    legs = []
    for k in range(1, WAV_HAAR_LEVELS + 1):
        d = f"({bs(k - 1, '2 * b - 1')} - {bs(k - 1, '2 * b')})"
        legs.append(
            f"""
      SELECT doc_id AS media_id, CAST({k} AS BIGINT) AS level,
             CAST((n + {(1 << k) - 1}) // {1 << k} AS BIGINT) AS n_blocks,
             CAST(list_sum(list_transform(
               generate_series(1, (n + {(1 << k) - 1}) // {1 << k}),
               b -> {d} * {d})) AS BIGINT) AS detail_energy
      FROM clips"""
        )
    body = "\n      UNION ALL\n".join(legs)
    return f"""
    WITH clips AS (
      SELECT doc_id, 64 + doc_id % 32 AS n,
             list_transform(generate_series(0, 64 + doc_id % 32 - 1),
                            j -> (doc_id * 7 + j * 13) % 256) AS x
      FROM documents WHERE doc_id < {WHE_N}
    )
    SELECT media_id, level, n_blocks, detail_energy FROM ({body})
    ORDER BY media_id, level
    """


@_register("wav_haar_energy_audit", _whe_oracle())
def q_wav_haar_energy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode feeding EXACT spectral features under the full
    hash-match gate: each clip round-trips through stdlib ``wave``
    (actual RIFF bytes, same codec path as wav_roundtrip_stats) and the
    DECODED samples run a 3-level integer Haar energy pyramid
    (operators/multimodal.py: wav_haar_energy) — "which time scales
    carry this clip's energy", the coarse spectral signature an audio
    curation pipeline buckets on.  The DuckDB oracle predicts every
    level's detail energy analytically from the PCM generator formula,
    so a codec bug (header math, sample width, frame truncation) or a
    pyramid bug (block alignment, odd-tail handling) breaks the match —
    this extends the multimodal story from "decode round-trips" to
    "decode feeds exact features".

    Determinism: samples are uint8 integers; the pyramid is int64
    block sums with the haar_energy_daily odd-tail convention (zero
    padding ≡ ceil-block sums, mirrored as list_slice arithmetic in
    the oracle); no float exists anywhere in the lineage.

    Scale: one Arrow-batched mapInPandas pass over the fixed
    {WHE_N}-clip sample (codec audits run on samples); payloads never
    leave the executor — {3} integer rows per clip travel; the final
    sort is bounded."""
    from pedri_analysis_spark.operators import multimodal as mm, spread

    ids = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < WHE_N)
        .select(F.col("doc_id").alias("media_id"))
    )
    return mm.wav_haar_energy(spread(ids)).orderBy("media_id", "level")


# ---------------------------------------------------------------------------
# Cochran's Q over three correlated document quality flags (added r14)
# ---------------------------------------------------------------------------

CQ_NCHARS_MIN = 306  # literal threshold (~median at every SF)
CQ_TOKENS = ("the", "spark")  # presence flags 2 and 3
CQ_CHI2_CRIT_MICRO = 5_991_465  # chi^2_{2, 0.05} micro (df = k-1 = 2)


def _cq_hug(dialect: str, expr: str) -> str:
    if dialect == tx.DUCK:
        return f"CAST({expr} AS HUGEINT)"
    return f"CAST({expr} AS DECIMAL(38,0))"


def _cq_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _cq_hug(dialect, e)  # noqa: E731
    has = "list_contains" if dialect == tx.DUCK else "array_contains"
    t1, t2 = CQ_TOKENS
    num = (
        f"(2 * (3 * ({h('c1')} * c1 + {h('c2')} * c2 + {h('c3')} * c3)"
        f" - {h('c1 + c2 + c3')} * (c1 + c2 + c3)))"
    )
    den = f"(3 * rs - rs2)"
    return f"""
    WITH f AS (
      SELECT CASE WHEN n_chars >= {CQ_NCHARS_MIN} THEN 1 ELSE 0 END AS f1,
             CASE WHEN {has}(toks, '{t1}') THEN 1 ELSE 0 END AS f2,
             CASE WHEN {has}(toks, '{t2}') THEN 1 ELSE 0 END AS f3
      FROM (SELECT n_chars, {tx.tokens(dialect, "text")} AS toks
            FROM documents) tk
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(f1) AS BIGINT) AS c1,
             CAST(sum(f2) AS BIGINT) AS c2,
             CAST(sum(f3) AS BIGINT) AS c3,
             CAST(sum(f1 + f2 + f3) AS BIGINT) AS rs,
             CAST(sum((f1 + f2 + f3) * (f1 + f2 + f3)) AS BIGINT) AS rs2
      FROM f
    )
    SELECT n, c1, c2, c3,
           CAST(CASE WHEN {den} > 0
                THEN ({num} * 1000000) {d} {den} ELSE 0 END AS BIGINT)
             AS q_micro,
           CAST(CASE WHEN {den} > 0
                     AND ({num} * 1000000) {d} {den} >= {CQ_CHI2_CRIT_MICRO}
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM s
    """


@_register("cochrans_q_flags", _cq_sql(tx.DUCK))
def q_cochrans_q_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q (1950) across three CORRELATED binary document
    quality flags — "do the k flag criteria fire at different rates on
    the SAME documents", the k >= 3 generalization of the registered
    McNemar pair test (and the within-subjects complement to the
    independence chi-square): Q = (k-1)[k sum C_j^2 - (sum C_j)^2] /
    [k sum R_i - sum R_i^2] ~ chi^2_(k-1), with C_j the per-flag totals
    and R_i each document's flag count.

    Flags (deterministic literals): n_chars >= {CQ_NCHARS_MIN}
    (~median), token '{CQ_TOKENS[0]}' present, token '{CQ_TOKENS[1]}'
    present — all three derived from the one tokenize pass.

    Determinism: pure integer counting; the single division floors to
    micro with the numerator 128-bit widened (C_j^2 is corpus-squared);
    the all-rows-degenerate case (every R_i = 0 or k, denominator 0)
    branches BEFORE dividing in both dialects.

    Scale: one scan, ONE 6-sum aggregate row — no joins, no windows;
    the cheapest shape in the catalog.  128-bit ceiling ~1e18 docs
    (loud, wave convention)."""
    docs = load_table(spark, "documents", sf_dir).select("n_chars", "text")
    docs.createOrReplaceTempView("cq_documents")
    return spark.sql(
        _cq_sql(tx.SPARK).replace("FROM documents) tk", "FROM cq_documents) tk")
    )


# ---------------------------------------------------------------------------
# Kendall's W concordance of three document-size rankers (added r14)
# ---------------------------------------------------------------------------

KW_M = 3  # rankers: n_chars, token count, distinct-token count


def _kw_rank_cte(dialect: str, j: int, key: str) -> str:
    """Distributed exact rank under the strict total order ({key},
    doc_id): prefix counts over the domain-bounded value grid (the MWU
    c_before pattern) plus row_number INSIDE each value group — never a
    corpus-sized single window partition."""
    return f"""
    g{j} AS (SELECT {key} AS k{j}, CAST(count(*) AS BIGINT) AS cnt
             FROM m GROUP BY {key}),
    c{j} AS (
      SELECT k{j},
             CAST(coalesce(sum(cnt) OVER (ORDER BY k{j}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cb
      FROM g{j}
    ),
    r{j} AS (
      SELECT m.doc_id,
             c{j}.cb + row_number() OVER (PARTITION BY m.{key}
                                          ORDER BY m.doc_id) AS r
      FROM m JOIN c{j} ON c{j}.k{j} = m.{key}
    )"""


def _kww_sql(dialect: str) -> str:
    h = lambda e: _cq_hug(dialect, e)  # noqa: E731
    fsd = tx.floor_scaled_div
    uniq = "list_distinct" if dialect == tx.DUCK else "array_distinct"
    ln = "len" if dialect == tx.DUCK else "size"
    # sum d2^2 = 4*sum(rsum^2) - 9*n*(n+1)^2 (sum(rsum) = 3n(n+1)/2
    # identically), so no per-row n is ever needed
    ssum = f"(4 * q - 9 * {h('n')} * (n + 1) * (n + 1))"
    wden = f"(3 * ({h('n')} * {h('n')} * {h('n')} - {h('n')}))"
    return f"""
    WITH m AS (
      SELECT doc_id, n_chars,
             CAST({ln}(toks) AS BIGINT) AS n_toks,
             CAST({ln}({uniq}(toks)) AS BIGINT) AS n_uniq
      FROM (SELECT doc_id, n_chars, {tx.tokens(dialect, "text")} AS toks
            FROM documents) tk
    ),
    {_kw_rank_cte(dialect, 1, "n_chars").lstrip()},
    {_kw_rank_cte(dialect, 2, "n_toks").lstrip()},
    {_kw_rank_cte(dialect, 3, "n_uniq").lstrip()},
    j AS (
      SELECT r1.r + r2.r + r3.r AS rsum
      FROM r1
      JOIN r2 ON r2.doc_id = r1.doc_id
      JOIN r3 ON r3.doc_id = r1.doc_id
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum({h('rsum')} * rsum) AS q
      FROM j
    )
    SELECT n,
           CAST({KW_M} AS BIGINT) AS m_rankers,
           CAST(CASE WHEN n > 0 THEN ({ssum}) {_IDIV[dialect]} n
                ELSE {h('0')} END AS BIGINT) AS mean_d2_sq,
           CAST(CASE WHEN n >= 2
                THEN {fsd(dialect, ssum, wden, 1_000_000)}
                ELSE 0 END AS BIGINT) AS w_micro
    FROM s
    """


@_register("kendalls_w_rankers", _kww_sql(tx.DUCK))
def q_kendalls_w_rankers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W coefficient of concordance (1939) across {KW_M}
    document-size rankers — chars, tokens, distinct tokens: "do the
    size criteria agree on the corpus ordering" (W = 1 perfect
    agreement, 0 none), the m-ranker generalization of the registered
    pairwise kendall_tau_daily and the ranking-stability audit next to
    rbo_rankings_eval (which compares two EXTERNAL rankings top-k).

    Determinism: each ranker is the STRICT total order (metric ASC,
    doc_id ASC) — row_number semantics, no ties by construction, so
    the no-tie W formula is exact; with doubled deviations d2_i =
    2*rsum_i - 3(n+1), sum d2^2 = 4*sum(rsum^2) - 9n(n+1)^2 follows
    from sum(rsum) = 3n(n+1)/2 identically — ONE widened power sum,
    no per-row n, and w_micro is a single overflow-safe floor via the
    residue decomposition.

    Scale: the three global ranks use the distributed-exact pattern
    (the MWU/zipf band discipline): per-metric value grids are
    domain-bounded (chars/token counts), prefix counts ride the grid
    window, and row_number runs only INSIDE value groups — never a
    corpus-sized single window partition; then two hash joins on
    doc_id and one 2-sum aggregate.  128-bit ceilings (wave
    convention, loud): the fsd residue product den*1e6 = 3n^3*1e6
    binds first at n ~ 4e10 docs; the raw sum d2^2 (<= 36n^3) is
    reported as its per-doc MEAN (one documented floor) so the output
    BIGINT cast holds to n ~ 5e8 rather than ~6e5."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "n_chars", "text"
    )
    docs.createOrReplaceTempView("kww_documents")
    return spark.sql(
        _kww_sql(tx.SPARK).replace("FROM documents) tk", "FROM kww_documents) tk")
    )


# ---------------------------------------------------------------------------
# REAL PNG codec round trip -> exact pixel statistics (added r14)
# ---------------------------------------------------------------------------

PNG_N = 24  # image ids (codec audits run on samples)


def _png_oracle() -> str:
    # pixel(x, y) = (id*7 + y*13 + x*5) % 256 over w = 16 + id%16,
    # h = 8 + id%8 — the exact generator the kernel synthesizes, so the
    # oracle predicts the DECODED stats analytically (no PNG anywhere)
    return f"""
    WITH imgs AS (
      SELECT doc_id AS media_id,
             16 + doc_id % 16 AS w, 8 + doc_id % 8 AS h
      FROM documents WHERE doc_id < {PNG_N}
    ),
    px AS (
      SELECT media_id, w, h,
             (media_id * 7 + y.y * 13 + x.x * 5) % 256 AS p
      FROM imgs,
           LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) y,
           LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) x
    )
    SELECT media_id, CAST(max(w) AS BIGINT) AS width,
           CAST(max(h) AS BIGINT) AS height,
           CAST(3 AS BIGINT) AS n_chunks,
           CAST(1 AS BIGINT) AS crc_ok,
           CAST(sum(p) AS BIGINT) AS sum_px,
           CAST(sum(p * p) AS BIGINT) AS sum_px_sq
    FROM px
    GROUP BY media_id
    ORDER BY media_id
    """


@_register("png_roundtrip_energy_audit", _png_oracle())
def q_png_roundtrip_energy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the full hash-match gate, extending the
    multimodal story to a SECOND modality with a real codec (the
    container has no Pillow, so the registered image path is
    import-gated — this query instead builds the codec from stdlib
    primitives): each tile round-trips through ACTUAL PNG bytes — zlib
    deflate, per-chunk CRC32, SUB row filter — and the reader verifies
    the signature, every chunk's CRC, inflates, and undoes the
    per-pixel filter arithmetic before emitting exact integer pixel
    stats (operators/multimodal.py: png_roundtrip_stats).  The DuckDB
    oracle predicts the decoded stats analytically from the tile
    generator, so any codec bug — chunk framing, CRC math, deflate
    round trip, filter reconstruction — breaks the match.

    Determinism: pixels are uint8 integers; stats are exact int64
    sums; no float anywhere.

    Scale: one Arrow-batched mapInPandas pass over the fixed
    {PNG_N}-image sample; payload bytes never leave the executor —
    only a 7-integer row per image travels; the final sort is
    bounded."""
    from pedri_analysis_spark.operators import spread
    from pedri_analysis_spark.operators import multimodal as mm

    ids = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < PNG_N)
        .select(F.col("doc_id").alias("media_id"))
    )
    return mm.png_roundtrip_stats(spread(ids)).orderBy("media_id")


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) drift, first vs second half (added r15)
# ---------------------------------------------------------------------------

WS_DAY_US = 86_400_000_000
WS_SPLIT_DAYS = 15


def _hug19(dialect: str, expr: str) -> str:
    if dialect == tx.DUCK:
        return f"CAST({expr} AS HUGEINT)"
    return f"CAST({expr} AS DECIMAL(38,0))"


def _ws_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug19(dialect, e)  # noqa: E731
    ts_us = "epoch_us(ts)" if dialect == tx.DUCK else "ts_us"
    src = "events" if dialect == tx.DUCK else "ws_events"
    diff = f"{h('c1')} * n2 - {h('c2')} * n1"
    return f"""
    WITH ev AS (
      SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc,
             CASE WHEN {ts_us} {d} {WS_DAY_US} <
                       (SELECT min({ts_us} {d} {WS_DAY_US}) + {WS_SPLIT_DAYS}
                        FROM {src} WHERE value IS NOT NULL)
                  THEN 1 ELSE 2 END AS half
      FROM {src} WHERE value IS NOT NULL
    ),
    grid AS (
      SELECT vc,
             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
             CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS a2
      FROM ev GROUP BY vc
    ),
    cum AS (
      SELECT vc, lead(vc) OVER (ORDER BY vc) AS nxt,
             CAST(sum(a1) OVER (ORDER BY vc) AS BIGINT) AS c1,
             CAST(sum(a2) OVER (ORDER BY vc) AS BIGINT) AS c2,
             CAST(sum(a1) OVER () AS BIGINT) AS n1,
             CAST(sum(a2) OVER () AS BIGINT) AS n2
      FROM grid
    ),
    num AS (
      SELECT max(n1) AS n1, max(n2) AS n2,
             sum(CASE WHEN nxt IS NULL THEN {h('0')}
                  ELSE (CASE WHEN {diff} < 0 THEN -({diff}) ELSE {diff} END)
                       * (nxt - vc) END) AS nm
      FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(CASE WHEN n1 > 0 AND n2 > 0
                THEN (1000000 * nm) {d} ({h('n1')} * n2)
                ELSE 0 END AS BIGINT) AS w1_microcents
    FROM num
    """


@_register("wasserstein_value_drift", _ws_sql(tx.DUCK))
def q_wasserstein_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth-mover) distance between the event-value
    distributions of the corpus' FIRST {WS_SPLIT_DAYS} days and the
    rest - the drift metric that, unlike the registered KS statistic
    (sup gap) and chi-square (binned), weights HOW FAR mass moved:
    W1 = integral |F1 - F2| dx, the area between the two CDFs.

    Determinism: on the bounded 2-decimal value grid the integral is
    the EXACT sum  sum_v |c1(v) n2 - c2(v) n1| * gap(v)  over grid
    gaps, cross-multiplied to avoid rationals (the MWU |s1 n2 - s2 n1|
    discipline, sign branched before negation as defense-in-depth);
    ONE final floor to micro-cents.  128-bit ceiling: the numerator is
    bounded by n1*n2*range_cents ~ 5e4 n^2 - saturates ~1.8e16 events
    (loud ANSI/HUGEINT failure).  The split day comes off the shared
    epoch-us spine (events_us / epoch_us), so both engines bucket
    identically; empty halves are guarded to 0 in both dialects.

    Scale: corpus reduces in ONE groupBy to the domain-bounded value
    grid (<= 49002 rows at any SF); the CDF window runs on that grid
    (the adjudicated score-domain single-partition pattern, see
    ks_drift_doclen / mann_whitney_u_values); one 1-row frame after."""
    from pedri_analysis_spark.plans.relational import events_us

    ev = events_us(spark, sf_dir).select("ts_us", "value")
    ev.createOrReplaceTempView("ws_events")
    return spark.sql(_ws_sql(tx.SPARK))


# ---------------------------------------------------------------------------
# Bradley-Terry strengths from daily event-type duels (added r15)
# ---------------------------------------------------------------------------

BT_TYPES = ["click", "error", "purchase", "signup", "view"]
BT_ITERS = 30
BT_SCALE = 1_000_000  # strengths in ppm, mean 1.0 => sum 5e6


def _bt_praw(dialect: str, i: int) -> str:
    """Un-normalized MM update for strength i (Zermelo/Hunter 2004):
    praw_i = W_i / sum_{j != i} n_ij / (p_i + p_j), all in integer ppm
    with per-term floors mirrored across dialects."""
    if dialect == tx.DUCK:
        el = lambda arr, k: f"list_extract({arr}, {k})"  # noqa: E731
        body = (
            f"CASE WHEN j = {i} OR list_extract(nm, ({i} - 1) * 5 + j) = 0 "
            f"THEN CAST(0 AS BIGINT) "
            f"ELSE (list_extract(nm, ({i} - 1) * 5 + j) * 1000000000000) "
            f"// (list_extract(p, {i}) + list_extract(p, j)) END"
        )
        den = f"list_sum(list_transform(generate_series(1, 5), j -> {body}))"
    else:
        el = lambda arr, k: f"element_at({arr}, {k})"  # noqa: E731
        body = (
            f"CASE WHEN j = {i} OR element_at(nm, ({i} - 1) * 5 + j) = 0 "
            f"THEN CAST(0 AS BIGINT) "
            f"ELSE (element_at(nm, ({i} - 1) * 5 + j) * 1000000000000) "
            f"div (element_at(p, {i}) + element_at(p, j)) END"
        )
        den = (
            f"aggregate(transform(sequence(1, 5), j -> {body}), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    d = _IDIV[dialect]
    return (
        f"CASE WHEN {den} > 0 THEN greatest(CAST(1 AS BIGINT), "
        f"({el('w', i)} * 1000000000000) {d} {den}) "
        f"ELSE {el('p', i)} END"
    )


def _bt_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    ts_us = "epoch_us(ts)" if dialect == tx.DUCK else "ts_us"
    src = "events" if dialect == tx.DUCK else "bt_events"
    types = ", ".join(f"'{t}'" for t in BT_TYPES)
    tcase = " ".join(f"WHEN '{t}' THEN {k + 1}" for k, t in enumerate(BT_TYPES))
    ncase = " ".join(f"WHEN {k + 1} THEN '{t}'" for k, t in enumerate(BT_TYPES))
    if dialect == tx.DUCK:
        el = lambda arr, k: f"list_extract({arr}, {k})"  # noqa: E731
        zgen = "unnest(generate_series(0, 24))"
        igen = "unnest(generate_series(1, 5))"
        mk = lambda t, key, val: f"(SELECT list({val} ORDER BY {key}) FROM {t})"  # noqa: E731
        norm = lambda lst: (  # noqa: E731
            f"list_transform({lst}, x -> greatest(CAST(1 AS BIGINT), "
            f"(x * {5 * BT_SCALE}) // list_sum({lst})))"
        )
        games_i = (
            "list_sum(list_transform(generate_series(1, 5), "
            "j -> list_extract(nm, (i - 1) * 5 + j)))"
        )
    else:
        el = lambda arr, k: f"element_at({arr}, {k})"  # noqa: E731
        zgen = "explode(sequence(0, 24))"
        igen = "explode(sequence(1, 5))"
        mk = lambda t, key, val: (  # noqa: E731
            f"(SELECT transform(array_sort(collect_list(struct({key}, {val}))),"
            f" s -> s.{val}) FROM {t})"
        )
        norm = lambda lst: (  # noqa: E731
            f"transform({lst}, x -> greatest(CAST(1 AS BIGINT), "
            f"(x * {5 * BT_SCALE}) div "
            f"aggregate({lst}, CAST(0 AS BIGINT), (acc, y) -> acc + y)))"
        )
        games_i = (
            "aggregate(transform(sequence(1, 5), "
            "j -> element_at(nm, (i - 1) * 5 + j)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    praw = "[" if dialect == tx.DUCK else "array("
    praw += ", ".join(_bt_praw(dialect, i) for i in range(1, 6))
    praw += "]" if dialect == tx.DUCK else ")"
    return f"""
    WITH RECURSIVE dt AS (
      SELECT {ts_us} {d} {WS_DAY_US} AS day,
             CASE event_type {tcase} END AS i,
             CAST(count(*) AS BIGINT) AS c
      FROM {src}
      WHERE event_type IN ({types})
      GROUP BY 1, 2
    ),
    duel AS (
      SELECT a.i AS i, b.i AS j,
             CAST(sum(CASE WHEN a.c <> b.c THEN 1 ELSE 0 END) AS BIGINT)
               AS games,
             CAST(sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS BIGINT)
               AS wins_i
      FROM dt a JOIN dt b ON a.day = b.day AND a.i < b.i
      GROUP BY a.i, b.i
    ),
    dm AS (
      SELECT i, j, games, wins_i FROM duel
      UNION ALL
      SELECT j, i, games, games - wins_i FROM duel
    ),
    cell AS (
      SELECT g.i, g.j,
             CAST(coalesce(max(dm.games), 0) AS BIGINT) AS games,
             CAST(coalesce(max(dm.wins_i), 0) AS BIGINT) AS wins_i
      FROM (SELECT z {d} 5 + 1 AS i, z % 5 + 1 AS j
            FROM (SELECT {zgen} AS z) zz) g
      LEFT JOIN dm ON dm.i = g.i AND dm.j = g.j
      GROUP BY g.i, g.j
    ),
    init AS (
      SELECT
        {mk('(SELECT i * 5 + j - 5 AS ij, games FROM cell)', 'ij', 'games')}
          AS nm,
        {mk('(SELECT i, CAST(sum(wins_i) AS BIGINT) AS wi FROM cell GROUP BY i)',
            'i', 'wi')} AS w,
        {'[' if dialect == tx.DUCK else 'array('}CAST({BT_SCALE} AS BIGINT),
          {BT_SCALE}, {BT_SCALE}, {BT_SCALE},
          {BT_SCALE}{']' if dialect == tx.DUCK else ')'} AS p
    ),
    bt AS (
      SELECT 0 AS step, nm, w, p FROM init
      UNION ALL
      SELECT step + 1, nm, w, {norm(praw)}
      FROM bt WHERE step < {BT_ITERS}
    )
    SELECT CASE i {ncase} END AS event_type,
           CAST({el('w', 'i')} AS BIGINT) AS wins,
           CAST({games_i} AS BIGINT) AS games,
           CAST({el('p', 'i')} AS BIGINT) AS strength_ppm
    FROM (SELECT {igen} AS i, nm, w, p FROM bt WHERE step = {BT_ITERS}) z
    ORDER BY event_type
    """


@_register("bradley_terry_event_types", _bt_sql(tx.DUCK))
def q_bradley_terry_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry (1952) pairwise-comparison strengths for the five
    event types, fit on DAILY DUELS: on each calendar day, of each
    type pair, the type with more events wins (ties void).  The
    canonical paired-preference model (and the L2R / chess-rating
    primitive); strengths are the MM fixed point p_i = W_i /
    sum_j n_ij/(p_i+p_j) (Zermelo 1929, Hunter 2004).

    Determinism: the duel matrix is exact integers off the shared
    epoch-us day spine; {BT_ITERS} MM iterations run in ppm integer
    arithmetic inside a recursive CTE carrying the (nm, w, p) arrays
    in ONE row per step (the DTW bounded-array pattern - transform
    lambdas only, no join or aggregate over the recursive reference;
    the denominator/normalizer reductions are dialect-paired list_sum
    vs aggregate() with identical per-term floors).  Each step floors
    the MM update then re-normalizes to sum ~ 5e6 ppm; a zero
    denominator (winless type) keeps its previous strength, and every
    strength is clamped >= 1 ppm BOTH before and after normalization
    (the post-normalization floor can zero a dominated strength on
    degenerate one-type-always-wins data, making a later p_i + p_j
    division-by-zero reachable) - guards mirrored in both dialects.
    The parity pin recomputes the identical integer iteration in
    Python and matches bit-for-bit; the float MM fixed point agrees to
    +-2 ppm at sf0.01.

    Scale: the corpus reduces in ONE groupBy to the (day x 5)-bounded
    dt grid; the duel join is day-equi over that bounded grid; the
    recursion is {BT_ITERS} steps over ONE row carrying 35 BIGINTs -
    structural cost, flat in corpus size.  All intermediates bounded
    by n_ij <= calendar days (~30): no overflow at any SF."""
    from pedri_analysis_spark.plans.relational import events_us

    ev = events_us(spark, sf_dir).select("ts_us", "event_type")
    ev.createOrReplaceTempView("bt_events")
    return spark.sql(_bt_sql(tx.SPARK))


# ---------------------------------------------------------------------------
# Hoeffding's D general-dependence statistic (added r15 session)
# ---------------------------------------------------------------------------

HD_GROUP_A = ("1-URGENT", "2-HIGH")  # X arm (the wilcoxon pairing, reused)
HD_GROUP_B = ("4-NOT SPECIFIED", "5-LOW")  # Y arm


def _hd_sql(dialect: str) -> str:
    """Identical text in both dialects except idiv / 128-bit spellings.

    Tie-exact integerization: midranks doubled (r2 = 2R, s2 = 2S exact
    integers), bivariate ranks QUADRUPLED — q4 = 4Q = 4 + Σ_{j≠i}
    (2φ(x_j,x_i))·(2φ(y_j,y_i)) with 2φ ∈ {0,1,2} — so Hoeffding's
    D1 = Σ(Q−1)(Q−2), D2 = Σ(R−1)(R−2)(S−1)(S−2), D3 = Σ(R−2)(S−2)(Q−1)
    carry EXACTLY as the 16-scaled integer sums
      d1_16 = Σ(q4−4)(q4−8),
      d2_16 = Σ(r2−2)(r2−4)(s2−2)(s2−4),
      d3_16 = Σ(r2−4)(s2−4)(q4−4),
    and the common /16 cancels between numerator and denominator."""
    d = _IDIV[dialect]

    def h(e: str) -> str:
        return (
            f"CAST({e} AS HUGEINT)"
            if dialect == tx.DUCK
            else f"CAST({e} AS DECIMAL(38,0))"
        )

    cents = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    in_a = "', '".join(HD_GROUP_A)
    in_b = "', '".join(HD_GROUP_B)
    num = (
        f"(30 * ({h('(n - 2) * (n - 3)')} * d1_16 + {h('d2_16')}"
        f" - 2 * {h('n - 4')} * d3_16))"
    )
    den = f"({h('16 * n * (n - 1) * (n - 2)')} * (n - 3) * (n - 4))"
    return f"""
    daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CASE WHEN o_orderpriority IN ('{in_a}')
                           THEN {cents} ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN o_orderpriority IN ('{in_b}')
                           THEN {cents} ELSE 0 END) AS BIGINT) AS y
      FROM orders GROUP BY o_orderdate
    ),
    ranked AS (
      SELECT day, x, y,
             2 * (CAST(rank() OVER (ORDER BY x) AS BIGINT) - 1)
               + CAST(count(*) OVER (PARTITION BY x) AS BIGINT) + 1 AS r2,
             2 * (CAST(rank() OVER (ORDER BY y) AS BIGINT) - 1)
               + CAST(count(*) OVER (PARTITION BY y) AS BIGINT) + 1 AS s2,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    rankedr AS (
      SELECT /*+ REPARTITION(16) */ day, x, y, r2, s2, n FROM ranked
    ),
    q AS (
      SELECT a.day, a.r2, a.s2, a.n,
             4 + CAST(sum(
                   (CASE WHEN b.x < a.x THEN 2 WHEN b.x = a.x THEN 1
                         ELSE 0 END)
                 * (CASE WHEN b.y < a.y THEN 2 WHEN b.y = a.y THEN 1
                         ELSE 0 END)) AS BIGINT) AS q4
      FROM rankedr a JOIN daily b ON a.day <> b.day
      GROUP BY a.day, a.r2, a.s2, a.n
    ),
    sums AS (
      SELECT max(n) AS n,
             sum({h('(q4 - 4)')} * (q4 - 8)) AS d1_16,
             sum({h('(r2 - 2) * (r2 - 4)')} * (s2 - 2) * (s2 - 4)) AS d2_16,
             sum({h('(r2 - 4) * (s2 - 4)')} * (q4 - 4)) AS d3_16
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(d1_16 AS BIGINT) AS d1_16,
           CAST(d2_16 AS BIGINT) AS d2_16,
           CAST(d3_16 AS BIGINT) AS d3_16,
           CAST(CASE WHEN n < 5 THEN 0
                     WHEN {num} >= 0 THEN ({num} * 1000000000) {d} {den}
                     ELSE -((-({num}) * 1000000000) {d} {den})
                END AS BIGINT) AS d_nano
    FROM sums"""


@_register("hoeffding_d_daily_arms", f"WITH {_hd_sql(tx.DUCK)}")
def q_hoeffding_d_daily_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D statistic (Hoeffding 1948) for GENERAL dependence
    between the urgent+high and not-specified+low daily revenue arms —
    the test that catches U-shaped, clustered, or any other
    non-monotone dependence structure that Spearman (registered) and
    Kendall (registered) are blind to by construction.  D → [−0.5, 1]
    ASYMPTOTICALLY with 0 under independence (the finite-n maximum
    exceeds 1 — the identity permutation at n = 50 scores exactly
    1.6707...; pinned); reported as the exact statistic (its null
    quantiles are a lookup a deployment thresholds against).

    Determinism: midranks enter DOUBLED and bivariate ranks QUADRUPLED
    (q4 = 4 + Σ_{{j≠i}} (2φx)(2φy), 2φ ∈ {{0,1,2}}), making all three
    Hoeffding sums exact 16-scaled integers with the /16 cancelling
    between numerator and denominator; ONE sign-split truncating
    128-bit division floors D to nano.  n < 5 (denominator zero)
    branches BEFORE dividing, mirrored in both dialects.

    128-bit ceiling (wave convention): num·10⁹ ≈ 30·16n⁵·10⁹ overflows
    past n ≈ 6e4 days (~160 calendar years) — loud ANSI/HUGEINT
    failure, never silent; d2_16 terms widen INSIDE the sum (a BIGINT
    accumulator would wrap first at n ≈ 7e3 days).

    Scale: ONE day rollup reduces the corpus to the calendar-bounded
    daily frame, and the quadratic bivariate-rank pair join runs on
    THAT — an SF-INVARIANT ≤2.6k-row broadcast side (day count does
    not grow with corpus size), the adjudicated bounded-build-side
    non-equi BNLJ (isotonic_calibration_pava precedent); the rank
    windows ride the same bounded frame."""
    o = load_table(spark, "orders", sf_dir).select("o_orderdate", "o_orderpriority", "o_totalprice")
    o.createOrReplaceTempView("orders_hd")
    return spark.sql(
        f"WITH orders AS (SELECT * FROM orders_hd), {_hd_sql(tx.SPARK)}"
    )
