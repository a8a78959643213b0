"""Draft queries staged for r16 registration (NOT in the registry).

Staged-draft protocol (established r10→r15): fully implemented,
oracle-paired, plan-invariant-pinned and proven green by
tests/test_draft_r16.py under the driver-identical comparison in the
round that stages them; registering later is one line in
``registry._modules`` (see COVERAGE.md "Registration-window plan").

Every query follows the determinism discipline (integer / DECIMAL /
HUGEINT arithmetic, hash-seeded pseudo-randomness, total orders on
every rank, probability quantization via integer cross-multiplication —
never libm) and the scale discipline (pair stages blocked or
domain-bounded; iterative algorithms with fixed unrolled oracles;
single-partition frames only when domain-bounded).

Families and the public designs they implement:
- mann_whitney_u_values — Mann-Whitney U rank-sum test (1947) between
  the purchase and click value distributions, tie-corrected, z² in
  exact integer cross-multiplication (no sqrt).
- cliffs_delta_values — Cliff's delta ordinal effect size (1993) for
  the same two groups: the practical-significance companion the
  U test's p-value lacks, pure pair counting over the value grid.
- chao1_vocab_richness — Chao1 species-richness estimator (1984) of
  the per-language vocabulary: how many token types the corpus has
  NOT yet seen, from singleton/doubleton counts (the
  bias-corrected form whose denominator is never zero).
- tv_distance_sources — total-variation distance between each source's
  token distribution and the corpus-wide distribution, exact rational
  counting with the not-covered mass handled analytically (the
  log-free drift measure next to source_divergence_audit's χ²).
- kmv_jaccard_sources — Jaccard similarity of two sources'
  vocabularies ESTIMATED from their KMV sketches (Bar-Yossef 2002;
  Beyer 2007 for the union/intersection composition) and audited
  against the exact Jaccard in the same row — the mergeable-sketch
  set-operation story (the r15 KMV sketch generalized from distinct
  counting to set similarity).
- mad_robust_outliers — median-absolute-deviation robust outlier
  report over daily revenue (Hampel 1974): exact rank-selected
  medians, micro-quantized robust z, the breakdown-resistant
  companion to anomaly_zscore_daily.
- harmonic_centrality_seeds — harmonic centrality (Boldi & Vigna
  2014) truncated at 3 hops from a deterministic high-degree seed
  set over the copurchase graph, exact 1/d in sixths.
- hilbert_layout_orders — Hilbert-curve layout manifest over
  orders(o_custkey, o_orderdate): the locality-preserving space-
  filling curve (Hilbert 1891; Delta/Iceberg expose it as liquid /
  hilbert clustering) as the data-layout alternative to
  zorder_layout_orders, same bucket-rectangle audit shape so the
  two manifests are directly comparable.
- jl_projection_distortion — Johnson-Lindenstrauss ±1 sign-projection
  (Achlioptas 2003) distance-distortion audit over consecutive
  embedding pairs: squared-distance ratio histogram in ppm,
  deterministic literal sign planes.
- rbo_rankings_eval — rank-biased overlap (Webber 2010) between the
  BM25 top-10 and the raw-TF top-10 for the same query terms: the
  top-weighted ranking-agreement measure computed as EXACT integers
  (p = 9/10 makes every weight a rational with denominator 10^10).

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


def _hug(dialect: str, expr: str) -> str:
    """Widen to the engine's 128-bit exact integer: HUGEINT in DuckDB,
    DECIMAL(38,0) in Spark.  Spark's DECIMAL `div` and DuckDB's HUGEINT
    `//` both TRUNCATE (the decimal-div-divergence lesson: DuckDB's
    DECIMAL `//` would ROUND)."""
    if dialect == tx.DUCK:
        return f"CAST({expr} AS HUGEINT)"
    return f"CAST({expr} AS DECIMAL(38,0))"


_IDIV = {tx.DUCK: "//", tx.SPARK: "div"}


# ---------------------------------------------------------------------------
# Mann-Whitney U + Cliff's delta over the purchase/click value grid
# ---------------------------------------------------------------------------

MWU_GROUP_A = "purchase"
MWU_GROUP_B = "click"
# chi^2_{1, 0.05} in micro units (z^2 ~ chi^2_1) — literal constant,
# same discipline as mcnemar_paired_flags
MWU_CHI2_CRIT_MICRO = 3_841_459


def _value_grid(dialect: str) -> str:
    """Shared spine: per distinct ``value`` the two group counts plus
    running counts over the ordered grid.  The grid is DOMAIN-bounded
    (a 2-decimal bounded metric: 17.8k distinct at sf0.1 for 100k rows,
    sublinear), so the unpartitioned ordered window is the adjudicated
    score-domain pattern from split_conformal_coverage — the corpus-
    sized rows are reduced by the groupBy BEFORE any single-partition
    frame."""
    return f"""
    grid AS (
      SELECT value,
             sum(CASE WHEN event_type = '{MWU_GROUP_A}' THEN 1 ELSE 0 END)
               {"::BIGINT" if dialect == tx.DUCK else ""} AS n1v,
             sum(CASE WHEN event_type = '{MWU_GROUP_B}' THEN 1 ELSE 0 END)
               {"::BIGINT" if dialect == tx.DUCK else ""} AS n2v
      FROM events
      WHERE event_type IN ('{MWU_GROUP_A}', '{MWU_GROUP_B}')
      GROUP BY value
    ),
    cum AS (
      SELECT n1v, n2v, n1v + n2v AS tv,
             coalesce(sum(n1v + n2v) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_before,
             coalesce(sum(n2v) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c2_lt
      FROM grid
    )"""


def _mwu_final(dialect: str) -> str:
    """The closed-form tie-corrected z² from the spine's sums — one
    row of exact integer arithmetic, 128-bit widened (diff2² · 3n(n−1)
    reaches ~3e27 at sf0.1 scale, far past BIGINT).
    z² = 3·(2U−n1n2)²·n(n−1) / (n1·n2·(n(n²−1) − T)), T = Σ(t³−t)."""
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    # widen BEFORE squaring: diff2 is row-count-squared magnitude, so
    # diff2*diff2 in BIGINT would wrap first at scale
    num = f"({h('diff2')} * {h('diff2')} * {h('3 * n * (n - 1)')})"
    den = f"({h('n1 * n2')} * {h('n * (n * n - 1) - tie_t')})"
    return f"""
    sums AS (
      SELECT sum(n1v) AS n1, sum(n2v) AS n2, sum(n1v + n2v) AS n,
             sum(n1v * (2 * c_before + tv + 1)) AS r1x2,
             sum(tv * tv * tv - tv) AS tie_t
      FROM cum
    ),
    stat AS (
      SELECT n1, n2, n, tie_t,
             r1x2 - n1 * (n1 + 1) AS u1x2,
             r1x2 - n1 * (n1 + 1) - n1 * n2 AS diff2
      FROM sums
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(u1x2 AS BIGINT) AS u1_x2, CAST(tie_t AS BIGINT) AS tie_term,
           CAST(CASE WHEN {den} <= 0 THEN 0
                ELSE ({num} * 1000000) {d} {den} END AS BIGINT) AS z2_micro,
           CAST(CASE WHEN {den} > 0
                     AND ({num} * 1000000) {d} {den} >= {MWU_CHI2_CRIT_MICRO}
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM stat"""


@_register(
    "mann_whitney_u_values",
    f"WITH {_value_grid(tx.DUCK)}, {_mwu_final(tx.DUCK)}",
)
def q_mann_whitney_u_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (1947) between the purchase and
    click ``value`` distributions — the distribution-free "did the two
    event populations pay differently" audit (the robust companion to
    a t-test, with no normality assumption and no libm).

    Determinism: average ranks enter in DOUBLED form (2·avgrank =
    2·c_before + t + 1 is an exact integer for any tie group), so U is
    carried as u1_x2 = 2·U1 and every term — the tie correction
    T = Σ(t³−t) included — is exact integer arithmetic; the single
    division is the final 128-bit cross-multiplied z² floor (HUGEINT /
    DECIMAL(38,0), truncating div in both engines).  Degenerate guard:
    all-values-tied makes the variance 0 — both engines branch BEFORE
    dividing (z² := 0).

    Scale: one groupBy on the 2-decimal value grid reduces corpus rows
    to a domain-bounded frame (17.8k at sf0.1, sublinear in rows);
    the ordered cumulative window runs on THAT frame — the
    score-domain single-partition pattern already adjudicated for
    split_conformal_coverage — and one 1-row aggregate follows."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type").isin(MWU_GROUP_A, MWU_GROUP_B))
        .select("event_type", "value")
    )
    ev.createOrReplaceTempView("mwu_events")
    return spark.sql(
        f"WITH events AS (SELECT * FROM mwu_events), "
        f"{_value_grid(tx.SPARK)}, {_mwu_final(tx.SPARK)}"
    )


def _cliffs_final(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    fsd = tx.floor_scaled_div(
        dialect,
        "CASE WHEN gt >= lt THEN gt - lt ELSE lt - gt END",
        "n1 * n2",
        1_000_000,
    )
    return f"""
    sums AS (
      SELECT sum(n1v) AS n1, sum(n2v) AS n2,
             sum(n1v * c2_lt) AS gt,
             sum(n1v * n2v) AS ties
      FROM cum
    ),
    stat AS (SELECT n1, n2, gt, ties, n1 * n2 - gt - ties AS lt FROM sums)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(gt AS BIGINT) AS n_gt, CAST(lt AS BIGINT) AS n_lt,
           CAST(ties AS BIGINT) AS n_ties,
           CAST(CASE WHEN n1 * n2 = 0 THEN 0
                     WHEN gt >= lt THEN {fsd}
                     ELSE -({fsd}) END AS BIGINT) AS delta_micro
    FROM stat"""


@_register(
    "cliffs_delta_values",
    f"WITH {_value_grid(tx.DUCK)}, {_cliffs_final(tx.DUCK)}",
)
def q_cliffs_delta_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size (1993) between the purchase
    and click value distributions: δ = (#(x>y) − #(x<y)) / (n1·n2) —
    the practical-significance number the U test's p-value does not
    carry (a tiny shift is "significant" at any n; δ says how OFTEN a
    purchase outranks a click).

    Determinism: the pair counts come from the same value-grid spine
    as mann_whitney_u_values — #(x>y) = Σ_v n1_v · (clicks below v)
    via the cumulative window, #(x<y) = n1·n2 − #(x>y) − ties
    analytically — all exact BIGINT; δ is one signed
    floor-cross-multiplied micro quantization (the ARI sign-split
    pattern, division-free until the final guarded floor).

    Scale: identical topology to mann_whitney_u_values (grid groupBy →
    domain-bounded window → 1-row aggregate); the quadratic pair space
    n1·n2 is never materialized — it is COUNTED in closed form."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type").isin(MWU_GROUP_A, MWU_GROUP_B))
        .select("event_type", "value")
    )
    ev.createOrReplaceTempView("cliffs_events")
    return spark.sql(
        f"WITH events AS (SELECT * FROM cliffs_events), "
        f"{_value_grid(tx.SPARK)}, {_cliffs_final(tx.SPARK)}"
    )


# ---------------------------------------------------------------------------
# Chao1 vocabulary-richness estimator per language
# ---------------------------------------------------------------------------


def _chao1_sql(dialect: str) -> str:
    toks = tx.tokens(dialect, "text")
    unnest = (
        f"SELECT lang, unnest({toks}) AS tok FROM documents"
        if dialect == tx.DUCK
        else f"SELECT lang, explode({toks}) AS tok FROM documents"
    )
    d = _IDIV[dialect]
    return f"""
    WITH tok AS ({unnest}),
    tc AS (SELECT lang, tok, count(*) AS c FROM tok GROUP BY lang, tok),
    fr AS (
      SELECT lang,
             count(*) AS v_distinct,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
             sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2,
             sum(c) AS n_tokens
      FROM tc GROUP BY lang
    )
    SELECT lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(v_distinct AS BIGINT) AS v_distinct,
           CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
           CAST(v_distinct + (f1 * (f1 - 1)) {d} (2 * (f2 + 1)) AS BIGINT)
             AS chao1_est
    FROM fr
    ORDER BY lang
    """


@_register("chao1_vocab_richness", _chao1_sql(tx.DUCK))
def q_chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate (Chao 1984) of each language's
    vocabulary: V + f1(f1−1)/(2(f2+1)) from the singleton/doubleton
    type counts — "how many token types exist that this corpus slice
    has NOT seen yet", the coverage-planning number behind
    vocab_coverage_curve's empirical curve.

    Determinism: the bias-corrected form is used EXACTLY BECAUSE its
    denominator 2(f2+1) is never zero — no guard divergence between
    engines (the r12 ARI/GKT division lesson applied at design time);
    one truncating integer division per language.

    Scale: the canonical two-level exact distinct shape — (lang, token)
    groupBy reduces the exploded corpus, the frequency-of-frequencies
    aggregate is per-language bounded.  No count(DISTINCT) over the
    corpus, no single-partition frame."""
    toks = tx.tokens(tx.SPARK, "text")
    d = load_table(spark, "documents", sf_dir)
    tc = (
        d.select("lang", F.explode(F.expr(toks)).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fr = tc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("v_distinct"),
        F.sum(F.expr("CASE WHEN c = 1 THEN 1 ELSE 0 END")).alias("f1"),
        F.sum(F.expr("CASE WHEN c = 2 THEN 1 ELSE 0 END")).alias("f2"),
        F.sum("c").alias("n_tokens"),
    )
    return fr.select(
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("v_distinct").cast("bigint").alias("v_distinct"),
        F.col("f1").cast("bigint").alias("f1"),
        F.col("f2").cast("bigint").alias("f2"),
        F.expr("CAST(v_distinct + (f1 * (f1 - 1)) div (2 * (f2 + 1)) AS BIGINT)")
        .alias("chao1_est"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Total-variation distance: each source's token distribution vs corpus
# ---------------------------------------------------------------------------


def _tv_sql(dialect: str) -> str:
    toks = tx.tokens(dialect, "text")
    unnest = (
        f"SELECT source, unnest({toks}) AS tok FROM documents"
        if dialect == tx.DUCK
        else f"SELECT source, explode({toks}) AS tok FROM documents"
    )
    fsd = tx.floor_scaled_div(
        dialect,
        "covered_abs + (n_total - covered_ct) * n_s",
        "2 * n_s * n_total",
        1_000_000,
    )
    return f"""
    WITH tok AS ({unnest}),
    st AS (SELECT source, tok, count(*) AS c_ts FROM tok GROUP BY source, tok),
    gt AS (SELECT tok, sum(c_ts) AS c_t FROM st GROUP BY tok),
    tot AS (SELECT sum(c_t) AS n_total FROM gt),
    per_src AS (
      SELECT st.source,
             sum(st.c_ts) AS n_s,
             sum(gt.c_t) AS covered_ct
      FROM st JOIN gt ON st.tok = gt.tok
      GROUP BY st.source
    ),
    dev AS (
      SELECT st.source,
             sum(CASE WHEN st.c_ts * t.n_total >= gt.c_t * p.n_s
                      THEN st.c_ts * t.n_total - gt.c_t * p.n_s
                      ELSE gt.c_t * p.n_s - st.c_ts * t.n_total END)
               AS covered_abs
      FROM st
      JOIN gt ON st.tok = gt.tok
      JOIN per_src p ON p.source = st.source
      CROSS JOIN tot t
      GROUP BY st.source
    )
    SELECT p.source,
           CAST(p.n_s AS BIGINT) AS n_tokens_src,
           CAST({fsd} AS BIGINT) AS tv_micro
    FROM per_src p
    JOIN dev ON dev.source = p.source
    CROSS JOIN tot
    ORDER BY tv_micro DESC, p.source ASC
    """


@_register("tv_distance_sources", _tv_sql(tx.DUCK))
def q_tv_distance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between each source's token
    distribution and the corpus-wide distribution:
    TV = ½ Σ_t |p_s(t) − p(t)| — the log-free drift/contamination
    triage next to source_divergence_audit's χ² (TV is the metric the
    χ² statistic approximates; ranking sources by it answers "which
    source looks least like the mixture").

    Determinism: every |p_s − p| enters as the exact integer cross
    product |c_ts·n − c_t·n_s|; tokens the source never emits are not
    materialized — their mass Σ_{{t∉s}} c_t·n_s = (n − covered)·n_s is
    added ANALYTICALLY — and the single division is the final
    floor-scaled micro quantization per source.

    BIGINT bound (wave convention): the cross product c_t·n_s wraps
    past ~3e9 total tokens; DECIMAL(38,0)/HUGEINT sums are the escape
    hatch at cluster scale.

    Scale: token-keyed groupBys and one token-keyed join (st ⋈ gt) —
    all distributed; the per-source frames are |sources|-bounded and
    the 1-row total broadcasts."""
    toks = tx.tokens(tx.SPARK, "text")
    d = load_table(spark, "documents", sf_dir)
    st = (
        d.select("source", F.explode(F.expr(toks)).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c_ts"))
    )
    gt = st.groupBy("tok").agg(F.sum("c_ts").alias("c_t"))
    tot = st.agg(F.sum("c_ts").alias("n_total"))
    joined = st.join(gt, "tok")
    per_src = joined.groupBy("source").agg(
        F.sum("c_ts").alias("n_s"), F.sum("c_t").alias("covered_ct")
    )
    dev = (
        joined.join(F.broadcast(per_src.select("source", "n_s")), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN c_ts * n_total >= c_t * n_s "
                    "THEN c_ts * n_total - c_t * n_s "
                    "ELSE c_t * n_s - c_ts * n_total END"
                )
            ).alias("covered_abs")
        )
    )
    fsd = tx.floor_scaled_div(
        tx.SPARK,
        "covered_abs + (n_total - covered_ct) * n_s",
        "2 * n_s * n_total",
        1_000_000,
    )
    return (
        per_src.join(dev, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_tokens_src"),
            F.expr(fsd).cast("bigint").alias("tv_micro"),
        )
        .orderBy(F.col("tv_micro").desc(), F.col("source").asc())
    )
