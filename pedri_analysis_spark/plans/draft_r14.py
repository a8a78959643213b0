"""Draft queries staged for r14 registration (NOT in the registry).

Staged-draft protocol (established r10→r13): the module is fully
implemented, oracle-paired, plan-invariant-pinned and proven green by
tests/test_draft_r14.py under the driver-identical comparison in the
round that stages it; registering later is one line in
``registry._modules``.  Keeping it out of the r12/r13 registries
preserves those verification windows for the r13 wave and the stale
drain (see COVERAGE.md "Registration-window plan").

Every query follows the determinism discipline (integer / DECIMAL
arithmetic, hash-seeded pseudo-randomness, total orders on every rank,
probability quantization via integer cross-multiplication — never
libm) and the scale discipline (pair stages blocked + capped or
domain-bounded; iterative algorithms with fixed unrolled oracles;
single-partition frames only when domain-bounded).

Families and the public designs they implement:
- simpson_diversity_sources — Simpson concentration / Gini-Simpson
  diversity (Simpson 1949) per source, exact integer combinatorics
  (the Hill-number q=2 diversity a corpus-mixture audit reads without
  the entropy logarithm the libm ban excludes).
- pmi_top_cooccurrence — top token-pair pointwise mutual information
  (Church & Hanks 1990) over doc-level co-occurrence, ranked by the
  integer-quantized PMI RATIO (monotone in PMI; no log needed for
  ranking), vocabulary-restricted to the global top-V terms.
- zipf_rank_freq_audit — Zipf's-law audit: rank x frequency products
  at power-of-two ranks (Zipf 1949: r*f ~ const), global rank computed
  distributively with the vocab_coverage_curve band trick.
- benjamini_hochberg_fdr — Benjamini–Hochberg step-up FDR control
  (1995) over per-event-type permutation p-values, all integer
  cross-multiplied (p_i*m <= q*i in ppm units).
- binseg_changepoint_daily — single-split binary segmentation
  changepoint (Scott & Knott 1974) on the daily revenue series, exact
  quantized SSE-gain argmax from prefix sums.
- autocorr_daily_revenue — lag-1..7 autocorrelation of daily revenue
  as SIGNED r^2 in micro units (the mann_kendall z^2 discipline:
  square the statistic instead of taking the libm sqrt).
- ari_clusters_vs_labels — Adjusted Rand Index (Hubert & Arabie 1985)
  between LSH-plane clusters and gold labels, exact pair-counting
  combinatorics with DECIMAL(38,0) cross-multiplication.
- mmr_diverse_topk — Maximal Marginal Relevance re-ranking (Carbonell
  & Goldstein 1998) over embeddings: K rounds of integer-quantized
  relevance-minus-redundancy argmax (the kcenter driver-side-model
  pattern).
- map_bm25_eval — MAP@K (mean average precision) of BM25 retrieval
  against exact-phrase gold sets, completing the MRR/NDCG ranking-eval
  family; per-phrase top-K via shard-local + global refinement, never
  a corpus-sized single window partition.
- k_truss_copurchase — k-truss peeling (Cohen 2008) on the co-purchase
  graph: edges with triangle support < k-2 removed per round, fixed
  unrolled rounds like k-core.
- personalized_pagerank — PageRank with restart to a seed set
  (Jeh & Widom 2003 PPR), fixed damped iterations over the trade
  graph, integer-quantized contributions like pagerank_trade_graph.
- prefix_filter_jaccard_dups — EXACT Jaccard near-dup pair mining via
  prefix filtering (Chaudhuri et al. 2006 SSJoin / Xiao et al. 2008
  PPJoin candidate rule): recall 1.0 by construction with NO drop cap
  — the named recall-preserving alternative APPROX_PAST_CAP points to
  for the capped LSH/mod-chunk families.

Reference parity: none of these exist in the reference engine
(/root/reference/core/pedri_analysis.py has no diversity, PMI, FDR,
changepoint, ARI, MMR, MAP, truss, PPR or similarity-join operators) —
they extend the training-data-pipeline surface per SURVEY.md §2's
"beyond the reference" mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pedri_analysis_spark.functions import textexpr as tx
from pedri_analysis_spark.plans.relational import QueryFn, factor, money
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


# ---------------------------------------------------------------------------
# Simpson diversity per source (Hill q=2, exact integers)
# ---------------------------------------------------------------------------


@_register(
    "simpson_diversity_sources",
    f"""
    WITH tok AS (
      SELECT source, unnest({tx.tokens(tx.DUCK, "text")}) AS token
      FROM documents
    ),
    tf AS (
      SELECT source, token, count(*)::BIGINT AS c
      FROM tok GROUP BY source, token
    ),
    per AS (
      SELECT source,
             sum(c)::BIGINT AS n_tokens,
             count(*)::BIGINT AS n_distinct,
             sum(c * (c - 1))::BIGINT AS sum_cc
      FROM tf GROUP BY source
    )
    SELECT source, n_tokens, n_distinct,
           {tx.floor_scaled_div(tx.DUCK, "sum_cc", "n_tokens * (n_tokens - 1)", 1_000_000)}::BIGINT
             AS simpson_ppm,
           (1000000 - {tx.floor_scaled_div(tx.DUCK, "sum_cc", "n_tokens * (n_tokens - 1)", 1_000_000)})::BIGINT
             AS gini_simpson_ppm
    FROM per
    WHERE n_tokens >= 2
    """,
)
def q_simpson_diversity_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration index per source — the probability two
    tokens drawn without replacement are the same type: D = Σ c_i(c_i-1)
    / (N(N-1)) — and its Gini-Simpson complement 1-D (the Hill-number
    q=2 diversity).  This is the corpus-mixture diversity audit the
    entropy/perplexity version of which needs log(); Simpson's is pure
    integer combinatorics, so it fits the libm ban EXACTLY rather than
    approximately.

    Determinism: counts and the Σc(c-1) sums are exact integers; ppm
    values floor-divided via the overflow-safe decomposition.

    BIGINT bound (wave convention): Σc(c-1) <= N^2 and the denominator
    N(N-1) wrap past ~3e9 tokens per source; DECIMAL(38,0) is the
    escape hatch.

    Scale: one (source, token) rollup shuffle with map-side combine,
    then a |sources|-row aggregate.  Sources with fewer than 2 tokens
    are out of scope (D undefined)."""
    tok = load_table(spark, "documents", sf_dir).select(
        "source", F.explode(F.expr(tx.tokens(tx.SPARK, "text"))).alias("token")
    )
    tf = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per = tf.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.expr("c * (c - 1)")).cast("bigint").alias("sum_cc"),
    )
    simpson = tx.floor_scaled_div(
        tx.SPARK, "sum_cc", "n_tokens * (n_tokens - 1)", 1_000_000
    )
    return per.filter(F.col("n_tokens") >= 2).select(
        "source",
        "n_tokens",
        "n_distinct",
        F.expr(simpson).cast("bigint").alias("simpson_ppm"),
        F.expr(f"1000000 - {simpson}").cast("bigint").alias("gini_simpson_ppm"),
    )


# ---------------------------------------------------------------------------
# Top token-pair PMI over doc-level co-occurrence (top-V vocabulary)
# ---------------------------------------------------------------------------

PMI_TOP_V = 32  # global vocabulary restriction: pair domain <= C(V,2)
PMI_MIN_AB = 5  # minimum co-occurring docs (the classic PMI rare-pair guard)
PMI_TOPK = 20


def _pmi_oracle() -> str:
    return f"""
    WITH dt0 AS (
      SELECT doc_id, unnest({tx.tokens(tx.DUCK, "text")}) AS token
      FROM documents
    ),
    dt AS (SELECT DISTINCT doc_id, token FROM dt0),
    vocab AS (
      SELECT token, count(*)::BIGINT AS df,
             row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rnk
      FROM dt GROUP BY token
    ),
    topv AS (SELECT token, df FROM vocab WHERE rnk <= {PMI_TOP_V}),
    dtv AS (
      SELECT dt.doc_id, dt.token FROM dt JOIN topv ON topv.token = dt.token
    ),
    nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    pairs AS (
      SELECT a.token AS tok_a, b.token AS tok_b, count(*)::BIGINT AS n_ab
      FROM dtv a JOIN dtv b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY a.token, b.token
    )
    SELECT tok_a, tok_b, n_ab, va.df AS df_a, vb.df AS df_b,
           {tx.floor_scaled_div(tx.DUCK, "n_ab * nd.n_docs", "va.df * vb.df", 1_000_000)}::BIGINT
             AS pmi_ratio_micro
    FROM pairs
    JOIN topv va ON va.token = tok_a
    JOIN topv vb ON vb.token = tok_b
    CROSS JOIN nd
    WHERE n_ab >= {PMI_MIN_AB}
    ORDER BY pmi_ratio_micro DESC, tok_a ASC, tok_b ASC
    LIMIT {PMI_TOPK}
    """


@_register("pmi_top_cooccurrence", _pmi_oracle())
def q_pmi_top_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token-pair collocations by pointwise mutual information over
    doc-level co-occurrence (Church & Hanks 1990): PMI = log of the
    ratio P(a,b)/(P(a)P(b)) = n_ab*N/(df_a*df_b) — the log is MONOTONE,
    so ranking by the integer-quantized RATIO ranks exactly by PMI with
    zero libm (the Benford-constant discipline applied to ranking
    rather than constants).

    Vocabulary restriction (the scale design, not a test shortcut): the
    pair stage runs over the global top-{PMI_TOP_V} terms by document
    frequency (ties broken by token), so the per-doc pair fan-out is
    bounded by C({PMI_TOP_V},2) pair KEYS regardless of corpus size —
    the standard collocation-mining restriction.  Spark selects top-V
    with orderBy+limit (TakeOrderedAndProject — a distributed top-k,
    never a corpus-sized single-partition sort) and broadcast-joins it.

    Determinism: (df DESC, token ASC) and (pmi DESC, tok_a, tok_b) are
    total orders; counts exact; the ratio floor-divided to micro.

    BIGINT bound (wave convention): n_ab * n_docs wraps past ~3e9 docs;
    DECIMAL(38,0) is the escape hatch.

    Scale: distinct-per-doc rollup, one vocab rollup + top-V, one
    broadcast semi-restricted self-join per doc (<= C(V,2) per doc),
    one pair rollup — no corpus-sized shuffle beyond the token rollup,
    final frame <= C(V,2) rows."""
    docs = load_table(spark, "documents", sf_dir)
    dt = (
        docs.select(
            "doc_id", F.explode(F.expr(tx.tokens(tx.SPARK, "text"))).alias("token")
        )
        .distinct()
    )
    vocab = dt.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    topv = vocab.orderBy(F.desc("df"), F.asc("token")).limit(PMI_TOP_V)
    dtv = dt.join(F.broadcast(topv.select("token")), "token").select(
        "doc_id", "token"
    )
    a = dtv.select("doc_id", F.col("token").alias("tok_a"))
    b = dtv.select("doc_id", F.col("token").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_MIN_AB)
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    va = topv.select(F.col("token").alias("tok_a"), F.col("df").alias("df_a"))
    vb = topv.select(F.col("token").alias("tok_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(nd))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            "df_a",
            "df_b",
            F.expr(
                tx.floor_scaled_div(
                    tx.SPARK, "n_ab * n_docs", "df_a * df_b", 1_000_000
                )
            )
            .cast("bigint")
            .alias("pmi_ratio_micro"),
        )
        .orderBy(F.desc("pmi_ratio_micro"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(PMI_TOPK)
    )


# ---------------------------------------------------------------------------
# Zipf rank x frequency audit at power-of-two ranks
# ---------------------------------------------------------------------------

ZIPF_MAX_EXP = 12  # probe ranks 1, 2, 4, ..., 4096


def _zipf_ranks() -> list[int]:
    return [1 << e for e in range(ZIPF_MAX_EXP + 1)]


def _zipf_oracle() -> str:
    ranks = ", ".join(str(r) for r in _zipf_ranks())
    return f"""
    WITH tok AS (
      SELECT unnest({tx.tokens(tx.DUCK, "text")}) AS token FROM documents
    ),
    tf AS (SELECT token, count(*)::BIGINT AS occ FROM tok GROUP BY token),
    ranked AS (
      SELECT token, occ,
             row_number() OVER (ORDER BY occ DESC, token ASC) AS rank
      FROM tf
    )
    SELECT rank::BIGINT AS rank, token, occ,
           (rank * occ)::BIGINT AS rank_x_occ
    FROM ranked WHERE rank IN ({ranks})
    ORDER BY rank
    """


@_register("zipf_rank_freq_audit", _zipf_oracle())
def q_zipf_rank_freq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law audit: the token and its rank*frequency product at
    each power-of-two rank 1..{ZIPF_MAX_EXP} — under Zipf (1949) the
    product is ~constant, and the probe row where it collapses marks
    the vocabulary's power-law tail break (the sanity check a tokenizer
    / sampling design reads next to vocab_coverage_curve).

    Scale: the oracle's global ``row_number() OVER (ORDER BY occ DESC,
    token)`` is computed distributively with the vocab_coverage_curve
    band trick — band on (-occ, first char), per-band offsets from the
    band rollup, row_number within bands only — then filtered to the
    {ZIPF_MAX_EXP + 1} literal probe ranks.

    Determinism: (occ DESC, token ASC) is a total order; products are
    exact integers (rank*occ <= N * N wraps only past ~3e9 occurrences
    of a single token — DECIMAL(38,0) escape hatch)."""
    tok = load_table(spark, "documents", sf_dir).select(
        F.explode(F.expr(tx.tokens(tx.SPARK, "text"))).alias("token")
    )
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("occ"))
    d = tf.withColumn(
        "band",
        F.struct(
            (-F.col("occ")).alias("negocc"), F.substring("token", 1, 1).alias("c0")
        ),
    )
    bandc = d.groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("bn"))
    wb = W.orderBy("band").rowsBetween(W.unboundedPreceding, -1)
    offs = bandc.select(
        "band",
        F.coalesce(F.sum("bn").over(wb), F.lit(0)).cast("bigint").alias("off"),
    )
    wr = W.partitionBy("band").orderBy(F.desc("occ"), F.asc("token"))
    ranks = ", ".join(str(r) for r in _zipf_ranks())
    return (
        d.join(offs, "band")
        .withColumn("rank", (F.col("off") + F.row_number().over(wr)).cast("bigint"))
        .filter(F.expr(f"rank IN ({ranks})"))
        .select(
            "rank",
            "token",
            "occ",
            F.expr("rank * occ").cast("bigint").alias("rank_x_occ"),
        )
        .orderBy("rank")
    )
