"""Draft queries staged for r18 registration (NOT in the registry).

Staged-draft protocol (established r10→r17): fully implemented,
oracle-paired, plan-invariant-pinned and proven green by
tests/test_draft_r18.py under the driver-identical comparison in the
round that stages them; registering later is one line in
``registry._modules`` (see COVERAGE.md "Registration-window plan").

Families and the public designs they implement:
- shapley_attribution_exact — EXACT Shapley-value marketing attribution
  (Shapley 1953; Zhao et al. 2018 for the exposure-set formulation):
  with a fixed 4-channel universe the 2⁴ coalition values are
  domain-bounded, so the factorial-weighted sum runs in exact integer
  rationals over 24 — no sampling, no approximation.  The principled
  alternative to attribution_linear_touch's equal split.
- selfjoin_cardinality_estimate — equi-join output-size estimation from
  a deterministic hash sample of keys (the planner's join-cardinality
  problem): Σ c(k)² estimated from a 1/64 key sample, audited against
  the exact sum in the same row.
- bloom_semijoin_reduction — runtime-filter effectiveness audit: push
  the r13 Bloom filter (same m/k/seeds) from a dimension's keys into a
  FACT-table scan and measure rows passed vs the exact semi-join —
  the measured version of Spark's own runtime bloom-filter join
  pruning, with the false-pass rate among true non-matches.

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
# Exact Shapley-value channel attribution over exposure sets
# ---------------------------------------------------------------------------

SHAP_CHANNELS = ("click", "view", "signup", "error")  # bit 0..3
SHAP_CONVERT = "purchase"
# |S|!·(n-1-|S|)! for n = 4 — the Shapley weight numerators over n! = 24
_SHAP_W = {0: 6, 1: 2, 2: 2, 3: 6}


def _shap_mask(dialect: str) -> str:
    bits = " + ".join(
        f"(CASE WHEN max(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END) = 1 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, ch in enumerate(SHAP_CHANNELS)
    )
    return f"({bits})"


def _shap_sql(dialect: str) -> str:
    n_ch = len(SHAP_CHANNELS)
    n_masks = 1 << n_ch
    fsd = tx.floor_scaled_div
    d = _IDIV[dialect]
    # one row per user -> exposure mask + converted flag
    per_mask_cols = ", ".join(
        f"sum(CASE WHEN mask = {m} THEN 1 ELSE 0 END) AS u{m}, "
        f"sum(CASE WHEN mask = {m} AND conv = 1 THEN 1 ELSE 0 END) AS c{m}"
        for m in range(n_masks)
    )
    # v(S) in ppm; empty-population coalitions contribute 0 (documented
    # convention, mirrored verbatim in both dialects)
    v = {
        m: f"(CASE WHEN u{m} > 0 THEN {fsd(dialect, f'c{m}', f'u{m}', 1_000_000)} ELSE 0 END)"
        for m in range(n_masks)
    }
    legs = []
    for i, ch in enumerate(SHAP_CHANNELS):
        terms = []
        for m in range(n_masks):
            if m & (1 << i):
                continue
            w = _SHAP_W[bin(m).count("1")]
            terms.append(f"{w} * (({v[m | (1 << i)]}) - ({v[m]}))")
        num = " + ".join(terms)
        phi = (
            f"CAST(CASE WHEN ({num}) >= 0 THEN ({num}) {d} 24 "
            f"ELSE -((-({num})) {d} 24) END AS BIGINT)"
        )
        legs.append(
            f"SELECT '{ch}' AS channel, CAST({1 << i} AS BIGINT) AS bit, "
            f"{phi} AS shapley_ppm FROM cells"
        )
    body = "\n      UNION ALL\n".join(legs)
    return f"""
    WITH usr AS (
      SELECT user_id, {_shap_mask(dialect)} AS mask,
             max(CASE WHEN event_type = '{SHAP_CONVERT}' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id
    ),
    cells AS (SELECT {per_mask_cols} FROM usr)
    SELECT channel, bit, shapley_ppm FROM ({body})
    ORDER BY bit
    """


@_register("shapley_attribution_exact", _shap_sql(tx.DUCK))
def q_shapley_attribution_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution (Shapley 1953; the
    exposure-set game of Zhao et al. 2018): each user's touched
    channel set is a 4-bit mask, v(S) is the observed conversion rate
    of users exposed to exactly S, and channel c's credit is
    φ_c = Σ_S |S|!·(3−|S|)!/4! · (v(S∪c) − v(S)) — the fairness-
    axiomatic alternative to attribution_linear_touch's equal split,
    computed EXACTLY because the 4-channel universe bounds the
    coalition lattice at 16 cells (no Monte-Carlo permutations).

    Determinism: v(S) quantizes to ppm with one documented floor per
    coalition (empty coalitions contribute v := 0 by the mirrored
    convention); the factorial weights are integer numerators over
    4! = 24 and the final division is sign-split truncating (the ARI
    pattern) so negative credits cannot round differently across
    engines.

    Scale: one groupBy user (map-side combinable CASE maxes), one
    16-cell rollup, then pure literal arithmetic — the coalition
    lattice is CONSTANT in corpus size; at k channels the 2^k cells
    stay driver-free as one aggregate row until k ~ 20 (the named
    lever: beyond that, sampled-permutation Shapley)."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type")
    ev.createOrReplaceTempView("events_shap")
    return spark.sql(
        _shap_sql(tx.SPARK).replace("FROM events GROUP BY", "FROM events_shap GROUP BY")
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation from a deterministic key sample
# ---------------------------------------------------------------------------

SJC_SAMPLE_MOD = 64  # 1-in-64 key sample (seeded hash), scale-up factor


def _sjc_sql(dialect: str) -> str:
    cast = "STRING" if dialect == tx.SPARK else "VARCHAR"
    h = tx.seeded_hash64(dialect, f"CAST(user_id AS {cast})", "sjc")
    fsd = tx.floor_scaled_div
    return f"""
    WITH kc AS (
      SELECT user_id, count(*) AS c, ({h} % {SJC_SAMPLE_MOD}) AS cell
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT sum(c * c) AS exact_pairs,
             sum(CASE WHEN cell = 0 THEN c * c ELSE 0 END)
               * {SJC_SAMPLE_MOD} AS est_pairs,
             count(*) AS n_keys,
             sum(CASE WHEN cell = 0 THEN 1 ELSE 0 END) AS n_sampled
      FROM kc
    )
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_sampled AS BIGINT) AS n_sampled,
           CAST(exact_pairs AS BIGINT) AS exact_pairs,
           CAST(est_pairs AS BIGINT) AS est_pairs,
           CAST({fsd(dialect,
                     "CASE WHEN est_pairs >= exact_pairs THEN est_pairs - exact_pairs ELSE exact_pairs - est_pairs END",
                     "exact_pairs", 1_000_000)} AS BIGINT) AS err_ppm
    FROM agg
    """


@_register("selfjoin_cardinality_estimate", _sjc_sql(tx.DUCK))
def q_selfjoin_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join output-cardinality estimation — the cost-model number
    every join reorder decision hangs on: |R ⋈_k R| = Σ_k c(k)²,
    estimated from a deterministic 1-in-{SJC_SAMPLE_MOD} HASH sample of
    the key domain (sampling KEYS, not rows — row sampling biases c²
    estimates downward; key sampling is unbiased for Σc² because each
    key's full count survives or not as a unit), audited against the
    exact sum in the same row.  The estimator a planner would run on
    the events.user_id self-join (skew-driven: hot users dominate Σc²).

    Determinism: the sample is seeded_hash64 % {SJC_SAMPLE_MOD} = 0 —
    both engines pick the identical key subset; counts and squares are
    exact integers; the error column is one floor-scaled division.

    Scale: one groupBy on the key with map-side combine; the estimate
    needs only the sampled cell, so a production planner computes it
    from the 1/{SJC_SAMPLE_MOD} slice WITHOUT the full rollup — here
    both run to make the audit exact."""
    ev = load_table(spark, "events", sf_dir).select("user_id")
    ev.createOrReplaceTempView("events_sjc")
    return spark.sql(
        _sjc_sql(tx.SPARK).replace("FROM events GROUP BY", "FROM events_sjc GROUP BY")
    )


# ---------------------------------------------------------------------------
# Bloom runtime-filter semi-join reduction audit
# ---------------------------------------------------------------------------


def _bsr_sql(dialect: str) -> str:
    from pedri_analysis_spark.plans.draft_r13 import (
        BLOOM_BUILD_SEG,
        BLOOM_K,
        _bloom_pos,
    )

    fsd = tx.floor_scaled_div
    probe_pos = " UNION ALL ".join(
        f"SELECT o_orderkey, o_custkey, {_bloom_pos(dialect, 'o_custkey', i)} AS pos "
        f"FROM orders"
        for i in range(BLOOM_K)
    )
    build_pos = " UNION ALL ".join(
        f"SELECT {_bloom_pos(dialect, 'c_custkey', i)} AS pos FROM build"
        for i in range(BLOOM_K)
    )
    return f"""
    WITH build AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = '{BLOOM_BUILD_SEG}'
    ),
    bits AS (SELECT DISTINCT pos FROM ({build_pos})),
    pp AS ({probe_pos}),
    passed AS (
      SELECT p.o_orderkey, p.o_custkey
      FROM pp p JOIN bits b ON b.pos = p.pos
      GROUP BY p.o_orderkey, p.o_custkey
      HAVING count(*) = {BLOOM_K}
    ),
    truth AS (
      SELECT o.o_orderkey
      FROM orders o JOIN build d ON d.c_custkey = o.o_custkey
    ),
    stats AS (
      SELECT (SELECT count(*) FROM orders) AS n_fact,
             (SELECT count(*) FROM build) AS n_dim,
             (SELECT count(*) FROM truth) AS n_true_match,
             (SELECT count(*) FROM passed) AS n_pass_bloom
    )
    SELECT CAST(n_fact AS BIGINT) AS n_fact,
           CAST(n_dim AS BIGINT) AS n_dim,
           CAST(n_true_match AS BIGINT) AS n_true_match,
           CAST(n_pass_bloom AS BIGINT) AS n_pass_bloom,
           CAST(n_pass_bloom - n_true_match AS BIGINT) AS n_false_pass,
           CAST({fsd(dialect, "n_fact - n_pass_bloom", "n_fact", 1_000_000)}
             AS BIGINT) AS scan_reduction_ppm,
           CAST(CASE WHEN n_fact - n_true_match > 0
                THEN {fsd(dialect, "n_pass_bloom - n_true_match",
                          "n_fact - n_true_match", 1_000_000)}
                ELSE 0 END AS BIGINT) AS false_pass_ppm
    FROM stats
    """


@_register("bloom_semijoin_reduction", _bsr_sql(tx.DUCK))
def q_bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join-pruning effectiveness: build the r13
    Bloom filter (same m/k/seeds as bloom_filter_fpr_audit) over the
    BUILDING customers and push it into the orders scan, then report
    rows passed vs the EXACT semi-join — the measured version of the
    runtime row-filter Spark injects under
    spark.sql.optimizer.runtime.bloomFilter (and Delta/Iceberg dynamic
    file pruning): scan_reduction is what the filter saves,
    false_pass_ppm (false passes over true non-matches) is what its
    FPR costs, and a deployment tunes m against exactly these two.

    Determinism: identical seeded positions in both engines; a fact
    row passes iff all {3} of its positions hit the DISTINCT-position
    table (an exact bit-set representation); every output is integer
    counting with two guarded floor divisions.

    Scale: the bit table is ≤ m rows, broadcast; the probe side is one
    linear pass with a k-way position expansion and a per-row rollup
    keyed on (orderkey, custkey) — one shuffle; the truth side is one
    broadcast semi-join.  Exactly the topology the engine's own
    runtime filter compiles to."""
    from pedri_analysis_spark.plans.draft_r13 import (
        BLOOM_BUILD_SEG,
        BLOOM_K,
        _bloom_pos,
    )

    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    build = cust.filter(F.col("c_mktsegment") == BLOOM_BUILD_SEG).select("c_custkey")
    bpos = F.array(
        *[F.expr(_bloom_pos(tx.SPARK, "c_custkey", i)) for i in range(BLOOM_K)]
    )
    opos = F.array(
        *[F.expr(_bloom_pos(tx.SPARK, "o_custkey", i)) for i in range(BLOOM_K)]
    )
    bits = build.select(F.explode(bpos).alias("pos")).distinct()
    pp = orders.select("o_orderkey", "o_custkey", F.explode(opos).alias("pos"))
    passed = (
        pp.join(F.broadcast(bits.withColumnRenamed("pos", "bpos")),
                F.col("pos") == F.col("bpos"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == BLOOM_K)
    )
    truth = orders.join(F.broadcast(build),
                        orders["o_custkey"] == build["c_custkey"], "left_semi")
    stats = (
        orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_fact"))
        .crossJoin(F.broadcast(build.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dim"))))
        .crossJoin(F.broadcast(truth.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true_match"))))
        .crossJoin(F.broadcast(passed.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pass_bloom"))))
    )
    fsd = tx.floor_scaled_div
    return stats.select(
        "n_fact", "n_dim", "n_true_match", "n_pass_bloom",
        F.expr("CAST(n_pass_bloom - n_true_match AS BIGINT)").alias("n_false_pass"),
        F.expr(
            f"CAST({fsd(tx.SPARK, 'n_fact - n_pass_bloom', 'n_fact', 1_000_000)} "
            f"AS BIGINT)"
        ).alias("scan_reduction_ppm"),
        F.expr(
            f"CAST(CASE WHEN n_fact - n_true_match > 0 THEN "
            f"{fsd(tx.SPARK, 'n_pass_bloom - n_true_match', 'n_fact - n_true_match', 1_000_000)} "
            f"ELSE 0 END AS BIGINT)"
        ).alias("false_pass_ppm"),
    )
