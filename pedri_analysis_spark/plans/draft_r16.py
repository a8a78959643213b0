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

Added in the r15 session (same staging discipline):
- wilcoxon_signed_rank_daily — Wilcoxon signed-rank test (1945) on
  paired daily revenue (urgent+high vs not-specified+low arms of the
  same order day), midrank ties in doubled-integer form, tie-corrected
  z² as one 128-bit truncating floor — the PAIRED companion to
  mann_whitney_u_values' independent-groups U.

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
    z² = 3·(2U−n1n2)²·n(n−1) / (n1·n2·(n(n²−1) − T)), T = Σ(t³−t).

    The ·10⁶ micro-scaling goes through a RESIDUE DECOMPOSITION
    (q = num div den; z2_micro = q·10⁶ + (rem·10⁶) div den — exactly
    equal to (num·10⁶) div den for non-negative operands under the
    truncating 128-bit div both engines share) so the largest
    intermediate is num = 3·diff2²·n(n−1) ≈ 3n⁶/16 rather than 10⁶×
    that: the 128-bit ceiling sits at ~3.1M filtered purchase+click
    rows (~sf10synth) instead of ~310k (~sf1.0).  Past it both engines
    fail LOUDLY (Spark ANSI decimal overflow / DuckDB HUGEINT error),
    never a silent cross-engine divergence — bound (wave convention).

    T = Σ(t³−t) is widened to 128-bit INSIDE the sum (a single tied
    value group above ~2.1M rows overflows tv³ in BIGINT); only the
    reported tie_term OUTPUT column casts back to BIGINT, a loud ANSI/
    HUGEINT cast error past Σ(t³−t) ≥ 2⁶³ — bound (wave convention)."""
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    # widen BEFORE squaring: diff2 is row-count-squared magnitude, so
    # diff2*diff2 in BIGINT would wrap first at scale
    num = f"({h('diff2')} * {h('diff2')} * {h('3 * n * (n - 1)')})"
    # n(n²−1) widened factor-by-factor: in BIGINT it wraps at n>2.1M
    den = (
        f"({h('n1 * n2')} * "
        f"({h('n')} * {h('n')} * {h('n')} - {h('n')} - tie_t))"
    )
    return f"""
    sums AS (
      SELECT sum(n1v) AS n1, sum(n2v) AS n2, sum(n1v + n2v) AS n,
             sum(n1v * (2 * c_before + tv + 1)) AS r1x2,
             sum({h('tv')} * tv * tv - tv) AS tie_t
      FROM cum
    ),
    stat AS (
      SELECT n1, n2, n, tie_t,
             r1x2 - n1 * (n1 + 1) AS u1x2,
             r1x2 - n1 * (n1 + 1) - n1 * n2 AS diff2
      FROM sums
    ),
    quot AS (
      SELECT n1, n2, u1x2, tie_t, {num} AS numw, {den} AS denw
      FROM stat
    ),
    res AS (
      SELECT n1, n2, u1x2, tie_t, denw,
             CASE WHEN denw <= 0 THEN {h('0')}
                  ELSE numw {d} denw END AS q,
             CASE WHEN denw <= 0 THEN {h('0')}
                  ELSE numw - (numw {d} denw) * denw END AS rem
      FROM quot
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(u1x2 AS BIGINT) AS u1_x2, CAST(tie_t AS BIGINT) AS tie_term,
           CAST(CASE WHEN denw <= 0 THEN 0
                ELSE q * 1000000 + (rem * 1000000) {d} denw
                END AS BIGINT) AS z2_micro,
           CAST(CASE WHEN denw > 0
                     AND q * 1000000 + (rem * 1000000) {d} denw
                         >= {MWU_CHI2_CRIT_MICRO}
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM res"""


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


# ---------------------------------------------------------------------------
# KMV-sketch Jaccard between two sources' vocabularies, audited exact
# ---------------------------------------------------------------------------

KMVJ_K = 256
KMVJ_SRC_A = "src0"
KMVJ_SRC_B = "src1"


def _kmvj_sql(dialect: str) -> str:
    toks = tx.tokens(dialect, "text")
    unnest = (
        f"SELECT source, unnest({toks}) AS tok FROM documents"
        if dialect == tx.DUCK
        else f"SELECT source, explode({toks}) AS tok FROM documents"
    )
    h = tx.seeded_hash64(dialect, "tok", "kmvj")
    fsd = tx.floor_scaled_div
    return f"""
    WITH tok AS ({unnest}),
    th AS (
      SELECT {h} AS h,
             max(CASE WHEN source = '{KMVJ_SRC_A}' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN source = '{KMVJ_SRC_B}' THEN 1 ELSE 0 END) AS in_b
      FROM tok
      WHERE source IN ('{KMVJ_SRC_A}', '{KMVJ_SRC_B}')
      GROUP BY {h}
    ),
    topk AS (SELECT in_a, in_b FROM th ORDER BY h ASC LIMIT {KMVJ_K}),
    sk AS (
      SELECT count(*) AS k_used,
             sum(in_a * in_b) AS both_in_k
      FROM topk
    ),
    ex AS (
      SELECT count(*) AS union_n,
             sum(in_a * in_b) AS inter_n,
             sum(in_a) AS n_a, sum(in_b) AS n_b
      FROM th
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(union_n AS BIGINT) AS union_n,
           CAST(inter_n AS BIGINT) AS inter_n,
           CAST(k_used AS BIGINT) AS k_used,
           CAST({fsd(dialect, "inter_n", "union_n", 1_000_000)} AS BIGINT)
             AS j_exact_ppm,
           CAST({fsd(dialect, "both_in_k", "k_used", 1_000_000)} AS BIGINT)
             AS j_kmv_ppm
    FROM sk CROSS JOIN ex
    """


@_register("kmv_jaccard_sources", _kmvj_sql(tx.DUCK))
def q_kmv_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard similarity of two sources' vocabularies estimated from a
    k-minimum-values sketch (Bar-Yossef et al. 2002; the union /
    intersection composition per Beyer et al. 2007) and AUDITED against
    the exact Jaccard in the same row — the r15 KMV sketch generalized
    from distinct counting to the set-operation algebra a dedup
    pipeline actually needs ("how much does crawl B overlap crawl A"
    without materializing either vocabulary).

    The estimator is exact-by-construction on sketch membership: an
    element of the union's k minima that belongs to set A is
    necessarily among A's own k minima (A ⊆ A∪B preserves hash order),
    so the indicator in_a·in_b over the union sketch IS the
    intersection indicator — j_est = |union_k ∩ A ∩ B| / k.

    Determinism: seeded_hash64 totally orders the hash domain
    identically in both engines; the k minima come from ORDER BY h
    LIMIT k (TakeOrderedAndProject in Spark — never a global sort);
    small vocabularies degrade gracefully (k_used = |union| < k makes
    the estimate exact).  Like the r15 KMV, the ESTIMATE ITSELF
    hash-matches the oracle — a sketch the gate verifies, not bounds.

    Scale: one (source-filtered) token explode + groupBy on the hash;
    the sketch is k-bounded, the exact audit is one aggregate over the
    distinct-hash frame.  Sketches MERGE by re-taking k minima of
    unioned sketches (re-aggregatable)."""
    toks = tx.tokens(tx.SPARK, "text")
    h = tx.seeded_hash64(tx.SPARK, "tok", "kmvj")
    d = load_table(spark, "documents", sf_dir)
    th = (
        d.filter(F.col("source").isin(KMVJ_SRC_A, KMVJ_SRC_B))
        .select("source", F.explode(F.expr(toks)).alias("tok"))
        .select(F.expr(h).alias("h"), "source")
        .groupBy("h")
        .agg(
            F.max(
                F.expr(f"CASE WHEN source = '{KMVJ_SRC_A}' THEN 1 ELSE 0 END")
            ).alias("in_a"),
            F.max(
                F.expr(f"CASE WHEN source = '{KMVJ_SRC_B}' THEN 1 ELSE 0 END")
            ).alias("in_b"),
        )
    )
    topk = th.orderBy(F.asc("h")).limit(KMVJ_K)
    sk = topk.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum(F.expr("in_a * in_b")).alias("both_in_k"),
    )
    ex = th.agg(
        F.count(F.lit(1)).alias("union_n"),
        F.sum(F.expr("in_a * in_b")).alias("inter_n"),
        F.sum("in_a").alias("n_a"),
        F.sum("in_b").alias("n_b"),
    )
    fsd = tx.floor_scaled_div
    return sk.crossJoin(F.broadcast(ex)).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("union_n").cast("bigint").alias("union_n"),
        F.col("inter_n").cast("bigint").alias("inter_n"),
        F.col("k_used").cast("bigint").alias("k_used"),
        F.expr(fsd(tx.SPARK, "inter_n", "union_n", 1_000_000))
        .cast("bigint")
        .alias("j_exact_ppm"),
        F.expr(fsd(tx.SPARK, "both_in_k", "k_used", 1_000_000))
        .cast("bigint")
        .alias("j_kmv_ppm"),
    )


# ---------------------------------------------------------------------------
# Truncated harmonic centrality from high-degree seeds (copurchase graph)
# ---------------------------------------------------------------------------

HC_SEEDS = 8
HC_MAX_HOPS = 3  # 1/d weights in sixths: 6, 3, 2 (lcm(1,2,3) = 6)


def _hc_oracle() -> str:
    from pedri_analysis_spark.plans.resolution_queries import _copurchase_edges_sql

    return f"""
    WITH {_copurchase_edges_sql()},
    sym AS (
      SELECT pa AS u, pb AS v FROM e
      UNION ALL
      SELECT pb AS u, pa AS v FROM e
    ),
    deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
    seeds AS (
      SELECT node AS seed FROM deg ORDER BY deg DESC, node ASC LIMIT {HC_SEEDS}
    ),
    h1 AS (
      SELECT DISTINCT s.seed, sym.v AS node
      FROM seeds s JOIN sym ON sym.u = s.seed
    ),
    h2 AS (
      SELECT DISTINCT h1.seed, sym.v AS node
      FROM h1 JOIN sym ON sym.u = h1.node
      WHERE NOT EXISTS (
        SELECT 1 FROM h1 p WHERE p.seed = h1.seed AND p.node = sym.v
      ) AND sym.v <> h1.seed
    ),
    h3 AS (
      SELECT DISTINCT h2.seed, sym.v AS node
      FROM h2 JOIN sym ON sym.u = h2.node
      WHERE NOT EXISTS (
        SELECT 1 FROM h1 p WHERE p.seed = h2.seed AND p.node = sym.v
      ) AND NOT EXISTS (
        SELECT 1 FROM h2 p WHERE p.seed = h2.seed AND p.node = sym.v
      ) AND sym.v <> h2.seed
    ),
    counts AS (
      SELECT s.seed,
             (SELECT count(*) FROM h1 WHERE h1.seed = s.seed) AS n1,
             (SELECT count(*) FROM h2 WHERE h2.seed = s.seed) AS n2,
             (SELECT count(*) FROM h3 WHERE h3.seed = s.seed) AS n3
      FROM seeds s
    )
    SELECT seed::BIGINT AS seed, n1::BIGINT AS n1, n2::BIGINT AS n2,
           n3::BIGINT AS n3,
           (6 * n1 + 3 * n2 + 2 * n3)::BIGINT AS hc_sixths
    FROM counts
    ORDER BY seed ASC
    """


@_register("harmonic_centrality_seeds", _hc_oracle())
def q_harmonic_centrality_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality (Boldi & Vigna 2014) truncated at
    {HC_MAX_HOPS} hops for the {HC_SEEDS} highest-degree nodes of the
    copurchase graph: HC(s) = Σ_{{d(s,t)≤3}} 1/d(s,t), carried in exact
    SIXTHS (lcm(1,2,3)) so 1/d never touches a float — the
    "which hub items reach the catalog fastest" rollup, truncated
    exactly the way large-graph HC is computed in practice (bounded
    frontier instead of all-pairs shortest paths).

    Determinism: the seed set is a TakeOrdered({HC_SEEDS}) total order
    (degree DESC, node ASC); each hop-d set is DISTINCT nodes minus
    all earlier frontiers (exact set algebra, no weights); the sixths
    ladder is pure integers.

    Scale: the frontier frames are (seeds × reached-nodes)-bounded —
    {HC_SEEDS}·|V| worst case, never |V|²; each hop is one
    shuffle-join against the symmetrized edge list plus an anti-join
    dedup against the union of earlier hops (the standard distributed
    BFS step, cf. pregel/graphframes' aggregate-messages shape).  At
    cluster scale the edge list is partitioned by u and the frontier
    broadcast while it fits — exactly what AQE picks here."""
    from pedri_analysis_spark.plans.resolution_queries import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    sym = (
        e.select(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .unionByName(e.select(F.col("pb").alias("u"), F.col("pa").alias("v")))
        .persist()
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    seeds = (
        deg.orderBy(F.col("deg").desc(), F.col("node").asc())
        .limit(HC_SEEDS)
        .select(F.col("node").alias("seed"))
    )
    h1 = (
        seeds.join(sym, seeds["seed"] == sym["u"])
        .select("seed", F.col("v").alias("node"))
        .distinct()
        .persist()
    )
    h2 = (
        h1.join(sym, h1["node"] == sym["u"])
        .select("seed", F.col("v").alias("node"))
        .distinct()
        .join(h1, ["seed", "node"], "left_anti")
        .join(seeds.withColumnRenamed("seed", "node").withColumn(
            "seed", F.col("node")), ["seed", "node"], "left_anti")
        .persist()
    )
    h3 = (
        h2.join(sym, h2["node"] == sym["u"])
        .select("seed", F.col("v").alias("node"))
        .distinct()
        .join(h1, ["seed", "node"], "left_anti")
        .join(h2, ["seed", "node"], "left_anti")
        .join(seeds.withColumnRenamed("seed", "node").withColumn(
            "seed", F.col("node")), ["seed", "node"], "left_anti")
    )
    n1 = h1.groupBy("seed").agg(F.count(F.lit(1)).alias("n1"))
    n2 = h2.groupBy("seed").agg(F.count(F.lit(1)).alias("n2"))
    n3 = h3.groupBy("seed").agg(F.count(F.lit(1)).alias("n3"))
    out = (
        seeds.join(n1, "seed", "left")
        .join(n2, "seed", "left")
        .join(n3, "seed", "left")
        .select(
            F.col("seed").cast("bigint").alias("seed"),
            F.coalesce("n1", F.lit(0)).cast("bigint").alias("n1"),
            F.coalesce("n2", F.lit(0)).cast("bigint").alias("n2"),
            F.coalesce("n3", F.lit(0)).cast("bigint").alias("n3"),
        )
        .withColumn(
            "hc_sixths",
            F.expr("CAST(6 * n1 + 3 * n2 + 2 * n3 AS BIGINT)"),
        )
        .orderBy("seed")
    )
    return out


# ---------------------------------------------------------------------------
# Hilbert-curve layout manifest over orders (the z-order alternative)
# ---------------------------------------------------------------------------

HB_BITS = 8  # per-dimension quantization (16-bit hilbert key), = Z_BITS
HB_GRID = 1 << HB_BITS
HB_BUCKETS = 64


def _hb_levels(dialect: str) -> str:
    """The unrolled xy2d Hilbert transform (Wikipedia's canonical
    algorithm, reflection by GRID-1) as a chain of 8 level CTEs: each
    consumes (x_i, y_i, d_i) and emits the rotated frame plus the
    quadrant contribution s²·((3·rx) XOR ry), with the XOR written as
    the branch-free CASE ladder rx=0→ry, rx=1→3−ry.  Pure integer
    div/mod bit tests — no engine-specific bitwise operators."""
    from pedri_analysis_spark.plans.layout_queries import _idiv

    dl = "spark" if dialect == tx.SPARK else "duck"
    out = []
    for i in range(HB_BITS):
        s = HB_GRID >> (i + 1)
        rx = f"(({_idiv(dl, f'x{i}', s)}) % 2)"
        ry = f"(({_idiv(dl, f'y{i}', s)}) % 2)"
        out.append(
            f"""
    h{i + 1} AS (
      SELECT qx, qy,
             CASE WHEN {ry} = 1 THEN x{i}
                  WHEN {rx} = 1 THEN {HB_GRID - 1} - y{i}
                  ELSE y{i} END AS x{i + 1},
             CASE WHEN {ry} = 1 THEN y{i}
                  WHEN {rx} = 1 THEN {HB_GRID - 1} - x{i}
                  ELSE x{i} END AS y{i + 1},
             d{i} + {s * s} * (CASE WHEN {rx} = 0 THEN {ry}
                               ELSE 3 - {ry} END) AS d{i + 1}
      FROM h{i}
    )"""
        )
    return ",".join(out)


def _hilbert_sql(dialect: str) -> str:
    from pedri_analysis_spark.plans.layout_queries import (
        _epoch_day,
        _idiv,
        _quantize,
    )

    dl = "spark" if dialect == tx.SPARK else "duck"
    day = _epoch_day(dl, "o_orderdate")
    qx = _quantize(dl, "o_custkey", "b.min_ck", "b.max_ck")
    qy = _quantize(dl, day, "b.min_day", "b.max_day")
    bucket = _idiv(dl, f"d{HB_BITS}", (1 << (2 * HB_BITS)) // HB_BUCKETS)
    cast_big = "CAST({} AS BIGINT)" if dl == "spark" else "({})::BIGINT"
    return f"""
    WITH b AS (
      SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
             min({_epoch_day(dl, 'o_orderdate')}) AS min_day,
             max({_epoch_day(dl, 'o_orderdate')}) AS max_day
      FROM orders
    ),
    h0 AS (
      SELECT qx, qy, qx AS x0, qy AS y0, 0 AS d0
      FROM (SELECT {qx} AS qx, {qy} AS qy FROM orders CROSS JOIN b)
    ),
    {_hb_levels(dialect)}
    SELECT {cast_big.format(bucket)} AS h_bucket,
           {cast_big.format('count(*)')} AS n_orders,
           {cast_big.format('min(qx)')} AS min_qx,
           {cast_big.format('max(qx)')} AS max_qx,
           {cast_big.format('min(qy)')} AS min_qy,
           {cast_big.format('max(qy)')} AS max_qy,
           {cast_big.format('(max(qx) - min(qx) + 1) * (max(qy) - min(qy) + 1)')}
               AS covered_cells
    FROM h{HB_BITS}
    GROUP BY 1
    """


@_register("hilbert_layout_orders", _hilbert_sql(tx.DUCK))
def q_hilbert_layout_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout manifest over orders(o_custkey,
    o_orderdate) — the locality-preserving space-filling curve (the
    clustering Databricks ships as liquid clustering and Iceberg as a
    sort-order transform) in the same bucket-rectangle audit shape as
    zorder_layout_orders, so the two manifests compare directly: the
    Hilbert curve never jumps (consecutive keys are always
    grid-adjacent, pinned in tests/test_draft_r16.py for the WHOLE
     65 536-cell grid), so its per-bucket (custkey × day) rectangles
    are tighter than Morton's at the same bucket count — fewer files
    overlap a point predicate.

    Determinism: the unrolled 8-level xy2d transform is pure integer
    div/mod/CASE generated from one template for both dialects; bucket
    boundaries are exact integer division of the 16-bit key.

    Scale: identical topology to zorder_layout_orders — a 1-row bounds
    aggregate broadcast into a narrow per-row integer map (the 8-level
    chain is ~40 integer ops/row, all inside whole-stage codegen), then
    ONE shuffle on h_bucket for the rollup."""
    o = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")
    o.createOrReplaceTempView("orders_hilbert")
    return spark.sql(
        _hilbert_sql(tx.SPARK).replace("FROM orders", "FROM orders_hilbert")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign-projection distortion audit
# ---------------------------------------------------------------------------

JL_K = 16  # projection dimensions (64 -> 16)
JL_Q = 1000  # component quantization: milli-units, exact BIGINT after


def _jl_signs(j: int, dim: int) -> list[int]:
    """Deterministic ±1 signs for projection row j — the sign pattern
    of the shared LSH literal plane family (lshplanes.plane), so both
    engines embed byte-identical constants."""
    from pedri_analysis_spark.functions import lshplanes as lp

    return [1 if v >= 0.0 else -1 for v in lp.plane(j, dim)]


def _jl_sql(dialect: str) -> str:
    from pedri_analysis_spark.plans.similarity_queries import EMB_DIM

    idx = (lambda i: f"qd[{i + 1}]") if dialect == tx.DUCK else (
        lambda i: f"qd[{i}]"
    )
    quant = "CAST(floor(CAST({v} AS DOUBLE) * {q} + 0.5) AS BIGINT)"
    if dialect == tx.DUCK:
        qd = (
            f"list_transform(list_zip(a.embedding, b.embedding), "
            f"t -> {quant.format(v='t[1]', q=JL_Q)} "
            f"- {quant.format(v='t[2]', q=JL_Q)})"
        )
    else:
        qd = (
            f"zip_with(a.embedding, b.embedding, "
            f"(x, y) -> {quant.format(v='x', q=JL_Q)} "
            f"- {quant.format(v='y', q=JL_Q)})"
        )
    dx2 = " + ".join(f"{idx(i)} * {idx(i)}" for i in range(EMB_DIM))
    y_terms = []
    for j in range(JL_K):
        signs = _jl_signs(j, EMB_DIM)
        t = " + ".join(
            (idx(i) if s > 0 else f"- {idx(i)}") for i, s in enumerate(signs)
        )
        y_terms.append(f"(({t}) * ({t}))")
    dy2 = " + ".join(y_terms)
    fsd = tx.floor_scaled_div(dialect, "dy2", f"{JL_K} * dx2", 1_000_000)
    return f"""
    WITH pairs AS (
      SELECT a.vec_id AS pa, {qd} AS qd
      FROM embeddings a JOIN embeddings b
        ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
    ),
    norms AS (
      SELECT pa, ({dx2}) AS dx2, ({dy2}) AS dy2 FROM pairs
    ),
    ratios AS (
      SELECT pa, CAST({fsd} AS BIGINT) AS ratio_ppm
      FROM norms WHERE dx2 > 0
    )
    SELECT CAST(ratio_ppm {_IDIV[dialect]} 100000 AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
           CAST(max(ratio_ppm) AS BIGINT) AS max_ratio_ppm
    FROM ratios
    GROUP BY 1
    ORDER BY 1
    """


@_register("jl_projection_distortion", _jl_sql(tx.DUCK))
def q_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 sign-projection (Achlioptas 2003)
    distance-distortion audit: project the 64-dim embeddings to
    {JL_K} dims with deterministic ±1 rows (the sign patterns of the
    shared LSH literal plane family) and report the squared-distance
    ratio ||PΔ||²/(k·||Δ||²) over consecutive-id vector pairs as a
    decile histogram in ppm — the measured "can we afford 4× cheaper
    distance math" number for the ANN stack (E[ratio] = 1 under JL;
    spread quantifies the k=16 distortion).

    Determinism — quantize FIRST, then every downstream op is exact
    integer arithmetic: components are floored to milli-units
    (floor(v·1000 + 0.5), identical IEEE double op in both engines),
    the projection is ±1-weighted integer sums (linearity lets it run
    on the DIFF vector once), norms are integer squares, and the ratio
    is one floor-scaled division.  Integer addition is associative, so
    NO fold-order contract is needed anywhere — the HOF fold (Spark)
    and unrolled sum (DuckDB) cannot diverge.  Zero-distance pairs
    (identical embeddings) are filtered by an explicit dx2 > 0 branch
    in both engines: no 0/0, and they carry no distortion signal.

    Scale: the pair join is id-adjacent (one shuffle, 1:1), the
    projection is a per-row map inside codegen; output is
    decile-bounded (≤ ~20 rows)."""
    emb = load_table(spark, "embeddings", sf_dir)
    emb.createOrReplaceTempView("embeddings_jl")
    return spark.sql(
        _jl_sql(tx.SPARK).replace("FROM embeddings a", "FROM embeddings_jl a")
        .replace("JOIN embeddings b", "JOIN embeddings_jl b")
    )


# ---------------------------------------------------------------------------
# Rank-biased overlap between the BM25 and raw-TF top-10 rankings
# ---------------------------------------------------------------------------

RBO_DEPTH = 10
RBO_P_NUM, RBO_P_DEN = 9, 10  # p = 0.9
_RBO_LCM = 2520  # lcm(1..10)
# exact integer weight of ov_d: (1-p)·p^(d-1)·(1/d) over the common
# denominator LCM·DEN^DEPTH — w_d = DEN^(DEPTH-d)·NUM^(d-1)·(LCM/d)
_RBO_W = [
    (RBO_P_DEN ** (RBO_DEPTH - d)) * (RBO_P_NUM ** (d - 1)) * (_RBO_LCM // d)
    for d in range(1, RBO_DEPTH + 1)
]
_RBO_DEN = _RBO_LCM * (RBO_P_DEN ** RBO_DEPTH)


def _rbo_sql(dialect: str) -> str:
    from pedri_analysis_spark.plans.retrieval_queries import (
        BM25_TERMS,
        _bm25_total,
        _df_agg,
        _tf,
    )

    h = lambda e: _hug(dialect, e)  # noqa: E731
    d = _IDIV[dialect]
    dfs = ", ".join(
        f"{_df_agg(dialect, t)} AS df_{i}" for i, t in enumerate(BM25_TERMS)
    )
    tf_sum = " + ".join(_tf(dialect, t) for t in BM25_TERMS)
    toks = tx.tokens(dialect, "text")
    ov_terms = " + ".join(
        f"{w} * sum(CASE WHEN md <= {dd} THEN 1 ELSE 0 END)"
        for dd, w in zip(range(1, RBO_DEPTH + 1), _RBO_W)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ),
    t2 AS (SELECT doc_id, toks, {"len" if dialect == tx.DUCK else "size"}(toks)
             {"::BIGINT" if dialect == tx.DUCK else ""} AS dl FROM toks),
    stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS total_dl, {dfs}
      FROM t2
    ),
    scored AS (
      SELECT doc_id, ({_bm25_total(dialect)}) AS bm25,
             ({tf_sum}) AS tf_sum
      FROM t2 CROSS JOIN stats
    ),
    ra AS (
      SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r
      FROM (SELECT doc_id, bm25 FROM scored
            ORDER BY bm25 DESC, doc_id ASC LIMIT {RBO_DEPTH})
    ),
    rb AS (
      SELECT doc_id, row_number() OVER (ORDER BY tf_sum DESC, doc_id ASC) AS r
      FROM (SELECT doc_id, tf_sum FROM scored
            ORDER BY tf_sum DESC, doc_id ASC LIMIT {RBO_DEPTH})
    ),
    md AS (
      SELECT CASE WHEN ra.r >= rb.r THEN ra.r ELSE rb.r END AS md
      FROM ra JOIN rb ON ra.doc_id = rb.doc_id
    ),
    acc AS (
      SELECT coalesce({ov_terms}, 0) AS wsum,
             coalesce(sum(CASE WHEN md <= {RBO_DEPTH} THEN 1 ELSE 0 END), 0)
               AS n_overlap
      FROM md
    )
    SELECT CAST(n_overlap AS BIGINT) AS n_overlap_top{RBO_DEPTH},
           CAST(({h('wsum')} * 1000000) {d} {_RBO_DEN} AS BIGINT)
             AS rbo_p9_micro
    FROM acc
    """


@_register("rbo_rankings_eval", _rbo_sql(tx.DUCK))
def q_rbo_rankings_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between the
    BM25 top-{RBO_DEPTH} and the raw term-frequency top-{RBO_DEPTH}
    for the same fixed query terms — the top-weighted "how much does
    idf actually change the ranking" agreement audit, and the
    ranking-comparison primitive an eval pipeline reuses for any two
    rankers (truncated RBO_min: depths beyond {RBO_DEPTH} contribute
    nothing; no extrapolation term).

    Determinism: with p = 9/10, every weight (1−p)·p^(d−1)/d is an
    exact rational over LCM(1..10)·10^{RBO_DEPTH}; the per-depth
    overlaps ov_d = #{{doc : max(rank_A, rank_B) ≤ d}} are exact
    integers from the joined rank pairs, so RBO is ONE 128-bit
    truncating division at the end.  Both rankings are total orders
    (score DESC, doc_id ASC), and both scores are already-quantized
    integers (bm25r micros; raw tf counts).

    Scale: one corpus scan scores both rankers (the BM25 stats frame
    broadcasts, same plan as bm25_topk_docs); both top-10s are
    TakeOrdered; everything after runs on ≤ {RBO_DEPTH} rows."""
    docs = load_table(spark, "documents", sf_dir)
    docs.createOrReplaceTempView("documents_rbo")
    return spark.sql(
        _rbo_sql(tx.SPARK).replace("FROM documents", "FROM documents_rbo")
    )


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test over paired daily revenue (added r15 session)
# ---------------------------------------------------------------------------

WSR_GROUP_A = ("1-URGENT", "2-HIGH")  # treatment arm of the daily pairing
WSR_GROUP_B = ("4-NOT SPECIFIED", "5-LOW")  # control arm
# chi^2_{1, 0.05} in micro units (z^2 ~ chi^2_1) — the literal-constant
# discipline shared with mann_whitney_u_values / mcnemar_paired_flags
WSR_CHI2_CRIT_MICRO = 3_841_459


def _wsr_sql(dialect: str) -> str:
    """Identical text in both dialects except idiv / 128-bit spellings.

    z² closed form on DOUBLED ranks: with W2 = 2·W⁺ (an exact integer
    for any midrank tie group: 2·avgrank = 2·c_before + t + 1) and
    A = 2·W2 − n(n+1) = 4W⁺ − n(n+1),
        z² = 3A² / (2n(n+1)(2n+1) − T),   T = Σ(t³ − t) over |d| ties
    — multiply (W⁺ − n(n+1)/4)²/σ² through by 48; σ² is the
    tie-corrected n(n+1)(2n+1)/24 − T/48 (Wilcoxon 1945; the normal
    approximation with the standard tie correction)."""
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    cents = "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    in_a = "', '".join(WSR_GROUP_A)
    in_b = "', '".join(WSR_GROUP_B)
    # A² is day-count⁴ magnitude (≈3e13 at 2.4k days) — widen BEFORE
    # squaring, then ×3·10⁶ stays far under the 128-bit ceiling
    num = f"({h('a')} * {h('a')} * 3000000)"
    den = f"({h('2 * n * (n + 1)')} * (2 * n + 1) - tie_t)"
    return f"""
    daily AS (
      SELECT o_orderdate AS day,
             CAST(sum(CASE WHEN o_orderpriority IN ('{in_a}')
                           THEN {cents} ELSE 0 END) AS BIGINT) AS ac,
             CAST(sum(CASE WHEN o_orderpriority IN ('{in_b}')
                           THEN {cents} ELSE 0 END) AS BIGINT) AS bc
      FROM orders GROUP BY o_orderdate
    ),
    diffs AS (
      SELECT CASE WHEN ac >= bc THEN ac - bc ELSE bc - ac END AS adv,
             CASE WHEN ac > bc THEN 1 ELSE 0 END AS pos
      FROM daily WHERE ac <> bc
    ),
    grid AS (
      SELECT adv, count(*) AS tv, sum(pos) AS pv
      FROM diffs GROUP BY adv
    ),
    cum AS (
      SELECT adv, tv, pv,
             coalesce(sum(tv) OVER (ORDER BY adv
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS c_before
      FROM grid
    ),
    sums AS (
      SELECT CAST(sum(tv) AS BIGINT) AS n,
             CAST(sum(pv) AS BIGINT) AS n_pos,
             CAST(sum(pv * (2 * c_before + tv + 1)) AS BIGINT) AS wp_x2,
             sum({h('tv')} * tv * tv - tv) AS tie_t
      FROM cum
    ),
    stat AS (
      SELECT n, n_pos, wp_x2, tie_t,
             2 * wp_x2 - n * (n + 1) AS a
      FROM sums
    )
    SELECT n, n_pos, wp_x2, CAST(tie_t AS BIGINT) AS tie_term,
           CAST(CASE WHEN n = 0 OR {den} <= 0 THEN 0
                ELSE {num} {d} {den} END AS BIGINT) AS z2_micro,
           CAST(CASE WHEN n > 0 AND {den} > 0
                     AND {num} {d} {den} >= {WSR_CHI2_CRIT_MICRO}
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM stat"""


@_register("wilcoxon_signed_rank_daily", f"WITH {_wsr_sql(tx.DUCK)}")
def q_wilcoxon_signed_rank_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) on PAIRED daily
    revenue: for each order day, the urgent+high arm's revenue cents
    against the not-specified+low arm's — "do urgent-priority orders
    move more money than low-priority ones, judged within the same
    day" — the paired companion to mann_whitney_u_values (independent
    groups), completing the nonparametric pair the way Welch/KW
    complete the parametric one.  Zero differences are DROPPED before
    ranking (the Wilcoxon convention; documented, mirrored in both
    dialects), |d| ties get midranks with the standard tie-corrected
    variance.

    Determinism: midranks enter DOUBLED (2·avgrank = 2·c_before + t +
    1 — exact integers), so W⁺ is carried as wp_x2 = 2·W⁺ and the
    closed form z² = 3·(2·wp_x2 − n(n+1))² / (2n(n+1)(2n+1) − T) with
    T = Σ(t³−t) is exact integer cross-multiplication; ONE truncating
    128-bit division floors z² to micro.  Degenerate guards mirrored
    in both dialects: n = 0 (every day's arms tied) and a
    defense-in-depth den ≤ 0 branch (algebraically den = 3n³+6n²+3n −
    (T_max-slack) > 0 for n ≥ 1) both pin z² := 0 BEFORE dividing.

    128-bit ceiling (wave convention): A² ≈ n⁴ at ×3e6 micro overflows
    DECIMAL(38,0)/HUGEINT past n ≈ 3e7 paired DAYS — five orders of
    magnitude beyond the calendar-bounded day frame; both engines fail
    loudly (ANSI overflow / HUGEINT error), never silently.

    Scale: one day rollup reduces the corpus before anything else; the
    |d| grid is day-bounded (≤ one row per distinct |d| ≤ 2.4k), so
    the single-partition cumulative window rides the adjudicated
    domain-bounded-frame contract (mann_whitney_u_values precedent);
    one 1-row aggregate follows.  No joins, no corpus windows."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    o.createOrReplaceTempView("orders_wsr")
    return spark.sql(
        f"WITH orders AS (SELECT * FROM orders_wsr), {_wsr_sql(tx.SPARK)}"
    )
