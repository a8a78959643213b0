"""Draft queries staged for r11 registration (NOT in the registry).

The r10 registry is FROZEN so the driver's 50-slot correctness window
drains the r05/r06 verification-staleness tail instead of spending
slots on first-contact checks (VERDICT r9 ask #2/#6).  These four are
implemented, oracle-paired, and proven green by tests/test_draft_r11.py
under the driver-identical comparison — registering them in r11 is one
line each in ``registry._modules`` plus moving this module's dicts into
the union (or simply importing it there).

Every query follows the established determinism discipline (integer /
DECIMAL arithmetic only, hash-seeded pseudo-randomness via
tx.seeded_hash64, total orders on every rank) and the scale discipline
(domain-bounded frames for any single-partition work; no corpus-sized
window without banding; pair grids only over calendar-bounded point
sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

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


# ---------------------------------------------------------------------------
# Bootstrap confidence interval on average order value
# ---------------------------------------------------------------------------

BOOT_REPS = 32  # fixed replicate count — the per-rep frame is 32 rows forever
# ~95% band by rank over 32 ascending replicate means (2nd / 31st)
BOOT_LO_RANK = 2
BOOT_HI_RANK = 31


def _boot_w(dialect: str) -> str:
    """Deterministic resample weight in {0,1,2} (mean 1) for (orderkey,
    rep) — a hash-weighted bootstrap: irreproducible RNG and
    engine-specific Poisson draws are both banned by the oracle
    discipline, and a three-point mean-1 weight gives the replicate
    variance a CI needs while staying a pure integer expression both
    engines evaluate identically."""
    cast = "STRING" if dialect == tx.SPARK else "VARCHAR"
    key = f"concat(CAST(o_orderkey AS {cast}), ':', CAST(rep AS {cast}))"
    if dialect == tx.DUCK:
        key = f"(o_orderkey::VARCHAR || ':' || rep::VARCHAR)"
    return f"({tx.seeded_hash64(dialect, key, 'boot')} % 3)"


@_register(
    "bootstrap_ci_avg_order",
    f"""
    WITH reps AS (SELECT unnest(range({BOOT_REPS})) AS rep),
    w AS (
      SELECT r.rep,
             {_boot_w(tx.DUCK)} AS w,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM orders o CROSS JOIN reps r
    ),
    m AS (
      SELECT rep,
             (sum(w * cents) * 10000) // sum(w) AS mean_micros
      FROM w GROUP BY rep
    ),
    ranked AS (
      SELECT mean_micros,
             row_number() OVER (ORDER BY mean_micros ASC) AS rn
      FROM m
    ),
    pt AS (
      SELECT (sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) * 10000) // count(*)
               AS point_micros
      FROM orders
    )
    SELECT pt.point_micros::BIGINT AS point_micros,
           (SELECT mean_micros FROM ranked WHERE rn = {BOOT_LO_RANK})::BIGINT
             AS ci_lo_micros,
           (SELECT mean_micros FROM ranked WHERE rn = {BOOT_HI_RANK})::BIGINT
             AS ci_hi_micros,
           {BOOT_REPS}::BIGINT AS n_reps
    FROM pt
    """,
)
def q_bootstrap_ci_avg_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap ~95% confidence interval on the average order value:
    {BOOT_REPS} hash-weighted resamples (weight = seeded_hash64(
    orderkey, rep) % 3 — deterministic, mean 1), each replicate's mean
    in exact integer micro-dollars, CI = rank-2 / rank-31 of the 32
    ascending replicate means.

    Scale: the explode is a flat-map (no shuffle); the per-rep
    aggregation map-side-combines to REPS x partitions partial rows
    before one shuffle on rep; everything after operates on a frame of
    exactly {BOOT_REPS} rows (domain-bounded single-partition sort by
    design, the cents/days pattern).  At 1000 executors the replicate
    count — not the corpus — stays the frame size.

    Determinism: weights, sums, and the floor-divided means are pure
    integer arithmetic; ranks break ties on mean value only (equal
    means are interchangeable for a quantile)."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias("cents"),
    )
    reps = o.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1))))
    w = reps.withColumn("w", F.expr(_boot_w(tx.SPARK)))
    m = w.groupBy("rep").agg(
        F.expr("(sum(w * cents) * 10000) div sum(w)").alias("mean_micros")
    )
    ranked = m.withColumn(
        "rn", F.row_number().over(W.orderBy(F.asc("mean_micros")))
    )
    pt = o.agg(
        F.expr("(sum(cents) * 10000) div count(*)").cast("bigint").alias("point_micros")
    )
    lo = ranked.filter(F.col("rn") == BOOT_LO_RANK).select(
        F.col("mean_micros").cast("bigint").alias("ci_lo_micros")
    )
    hi = ranked.filter(F.col("rn") == BOOT_HI_RANK).select(
        F.col("mean_micros").cast("bigint").alias("ci_hi_micros")
    )
    return (
        pt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .withColumn("n_reps", F.lit(BOOT_REPS).cast("bigint"))
        .select("point_micros", "ci_lo_micros", "ci_hi_micros", "n_reps")
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (token df rank -> cumulative occurrence share)
# ---------------------------------------------------------------------------

VOCAB_BANDS = 10


def _vocab_ntile(n_expr: str, rank_expr: str, k: int) -> str:
    """Standard-SQL ntile arithmetic on (rank, N) — the lift_decile_gains
    formula, shared verbatim by both engines."""
    return (
        f"CAST(CASE WHEN {rank_expr} <= ({n_expr} % {k}) * (({n_expr} div {k}) + 1) "
        f"THEN ({rank_expr} - 1) div (({n_expr} div {k}) + 1) + 1 "
        f"ELSE ({n_expr} % {k}) "
        f"  + ({rank_expr} - ({n_expr} % {k}) * (({n_expr} div {k}) + 1) - 1) "
        f"    div ({n_expr} div {k}) + 1 END AS BIGINT)"
    )


@_register(
    "vocab_coverage_curve",
    f"""
    WITH tok AS (
      SELECT unnest({tx.tokens(tx.DUCK, 'text')}) AS token FROM documents
    ),
    tf AS (SELECT token, count(*)::BIGINT AS occ FROM tok GROUP BY token),
    ranked AS (
      SELECT occ,
             row_number() OVER (ORDER BY occ DESC, token ASC) AS rank,
             count(*) OVER () AS n_vocab
      FROM tf
    ),
    banded AS (
      SELECT {_vocab_ntile('n_vocab', 'rank', VOCAB_BANDS).replace(' div ', ' // ')}
               AS vocab_decile,
             occ
      FROM ranked
    ),
    per AS (
      SELECT vocab_decile, count(*)::BIGINT AS n_terms, sum(occ)::BIGINT AS occ
      FROM banded GROUP BY vocab_decile
    )
    SELECT vocab_decile, n_terms, occ,
           sum(occ) OVER (ORDER BY vocab_decile)::BIGINT AS cum_occ,
           ((sum(occ) OVER (ORDER BY vocab_decile)) * 1000000
              // (SELECT sum(occ) FROM per))::BIGINT AS cum_share_ppm
    FROM per
    ORDER BY vocab_decile
    """,
)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: rank the corpus vocabulary by
    occurrence count (descending), cut into {VOCAB_BANDS} equidepth
    bands, and report each band's cumulative share of all token
    occurrences in exact parts-per-million — the 'how much of the
    corpus does the top-X% of the vocab cover' table a tokenizer-budget
    decision reads.

    Scale: the oracle's global ``row_number() OVER (ORDER BY occ DESC,
    token)`` is computed distributively with the lift_decile_gains
    equidepth-band trick — band on (-occ, first token char): the band
    key is a PREFIX of the total order, per-band offsets come from the
    band-count rollup (bounded by |distinct occ values| x charset, and
    distinct counts grow ~sqrt(total occurrences) under any Zipf-ish
    law), and row_number runs within bands only.  The first-char salt
    exists precisely because count ties are the mass of a vocabulary
    (hapaxes are ~half of it) — an unsalted count band would put half
    the vocab in one window partition.  Everything after the band
    rollup is a {VOCAB_BANDS}-row frame.

    Determinism: counts and cumulative sums are exact integers;
    (occ DESC, token ASC) is a total order; shares are floor-divided
    ppm."""
    tok = (
        load_table(spark, "documents", sf_dir)
        .select(F.explode(F.expr(tx.tokens(tx.SPARK, "text"))).alias("token"))
    )
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("occ"))
    d = tf.withColumn(
        "band",
        F.struct((-F.col("occ")).alias("negocc"), F.substring("token", 1, 1).alias("c0")),
    )
    bandc = d.groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("bn"))
    wb = W.orderBy("band").rowsBetween(W.unboundedPreceding, -1)
    offs = bandc.select(
        "band",
        F.coalesce(F.sum("bn").over(wb), F.lit(0)).cast("bigint").alias("off"),
    )
    tot = tf.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
        F.sum("occ").cast("bigint").alias("occ_total"),
    )
    wr = W.partitionBy("band").orderBy(F.desc("occ"), F.asc("token"))
    ranked = (
        d.join(offs, "band")
        .withColumn("rn", F.row_number().over(wr))
        .withColumn("rank", (F.col("off") + F.col("rn")).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "vocab_decile", F.expr(_vocab_ntile("n_vocab", "rank", VOCAB_BANDS))
        )
    )
    per = ranked.groupBy("vocab_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("occ").cast("bigint").alias("occ"),
    )
    wc = W.orderBy("vocab_decile")
    return (
        per.crossJoin(F.broadcast(tot.select("occ_total")))
        .withColumn("cum_occ", F.sum("occ").over(wc).cast("bigint"))
        .withColumn(
            "cum_share_ppm",
            F.expr("(cum_occ * 1000000) div occ_total").cast("bigint"),
        )
        .select("vocab_decile", "n_terms", "occ", "cum_occ", "cum_share_ppm")
        .orderBy("vocab_decile")
    )


# ---------------------------------------------------------------------------
# Deterministic per-stratum reservoir top-k (threshold-pre-filtered, EXACT)
# ---------------------------------------------------------------------------

RESERVOIR_K = 25
RESERVOIR_MARGIN = 4  # expected survivors per stratum = K * MARGIN
_HASH_MAX = (1 << 60) - 1  # seeded_hash64 is a 60-bit positive integer

_RS = tx.seeded_hash64(tx.SPARK, "CAST(doc_id AS STRING)", "reservoir")
_RD = tx.seeded_hash64(tx.DUCK, "doc_id::VARCHAR", "reservoir")


@_register(
    "stratified_reservoir_topk",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY {_RD} ASC, doc_id ASC
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, rn::BIGINT AS rn
    FROM ranked WHERE rn <= {RESERVOIR_K}
    """,
)
def q_stratified_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'reservoir' sample of exactly k={RESERVOIR_K} docs
    per language: the k smallest seeded hash-ranks per stratum — the
    distributed, reproducible equivalent of reservoir sampling (same
    marginal: each doc equally likely under the hash; same streaming
    property: a grown corpus only swaps members whose hash beats the
    current maximum).

    Scale — the class_balanced_sample docstring prescribes this form,
    this query IMPLEMENTS it: a naked per-stratum window ranks the
    whole corpus (one task per stratum — the skew hazard).  Instead the
    domain-bounded per-stratum count rollup (|langs| rows) is collected
    and each stratum gets a hash THRESHOLD t = HASH_MAX * K * MARGIN /
    n — a pushed-down map-side filter that leaves ~K*MARGIN survivor
    rows per stratum; the window then ranks only survivors.  EXACT, not
    approximate: if a stratum has >= k survivors, its k smallest hashes
    are all below the threshold by construction; the survivor rollup is
    checked and any under-filled stratum (astronomically rare at
    MARGIN={RESERVOIR_MARGIN}, but possible) falls back to ranking its
    full partition — so the result equals the oracle's unfiltered rank
    for every input.

    Determinism: (hash ASC, doc_id ASC) is a total order; the threshold
    affects WHICH rows the window sees, never the top-k themselves."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    counts = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    thresholds = {
        lang: min(
            _HASH_MAX,
            (_HASH_MAX // max(n, 1)) * RESERVOIR_K * RESERVOIR_MARGIN,
        )
        for lang, n in counts.items()
    }
    tmap = F.create_map(
        *[F.lit(x) for kv in thresholds.items() for x in kv]
    )
    h = F.expr(_RS)
    survivors = d.withColumn("h", h).filter(
        F.col("h") < F.element_at(tmap, F.col("lang"))
    )
    # exactness guard: a stratum with < k survivors (including ZERO —
    # absent from the survivor rollup entirely) re-ranks unfiltered
    surv_counts = {
        r["lang"]: r["n"]
        for r in survivors.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    under = [
        lang
        for lang, n in counts.items()
        if surv_counts.get(lang, 0) < min(RESERVOIR_K, n)
    ]
    if under:
        survivors = survivors.unionByName(
            d.filter(F.col("lang").isin(under)).withColumn("h", h)
        ).dropDuplicates(["doc_id"])
    w = W.partitionBy("lang").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        survivors.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= RESERVOIR_K)
        .select("doc_id", "lang", "rn")
    )


# ---------------------------------------------------------------------------
# Theil–Sen median trend of monthly average order value, per market segment
# ---------------------------------------------------------------------------


@_register(
    "theil_sen_monthly_trend",
    """
    WITH pts AS (
      SELECT c.c_mktsegment AS segment,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate))::BIGINT AS mon,
             (sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) * 10000) // count(*)
               AS y_micros
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    slopes AS (
      SELECT p1.segment,
             ((p2.y_micros - p1.y_micros)) // (p2.mon - p1.mon) AS slope_micros
      FROM pts p1 JOIN pts p2
        ON p1.segment = p2.segment AND p1.mon < p2.mon
    ),
    ranked AS (
      SELECT segment, slope_micros,
             row_number() OVER (
               PARTITION BY segment ORDER BY slope_micros ASC
             ) AS rn,
             count(*) OVER (PARTITION BY segment) AS n_pairs
      FROM slopes
    )
    SELECT r.segment,
           (SELECT count(*) FROM pts WHERE pts.segment = r.segment)::BIGINT
             AS n_points,
           r.n_pairs::BIGINT AS n_pairs,
           r.slope_micros::BIGINT AS median_slope_micros
    FROM ranked r
    WHERE r.rn = (r.n_pairs + 1) // 2
    """,
)
def q_theil_sen_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen trend estimate (median of pairwise slopes) of monthly
    average order value per market segment — the robust replacement for
    OLS slope when months contain outlier orders.

    Scale: the O(N²) pair stage runs over the MONTHLY points, not the
    orders — the fact table collapses to |segments| x |months| rows
    first (one shuffle with map-side combine), so the pair grid is
    calendar-domain-bounded (~80 months x 5 segments -> ≤ 3.2k slopes
    per segment at ANY corpus size; the same cents/days discipline as
    the analytics wave).  Exact Theil–Sen over the bounded grid — no
    slope subsampling cap needed because the grid cannot grow with the
    corpus.

    Determinism: monthly means and slopes are floor-divided integer
    micro-dollars (slope denominators are month-index differences —
    exact integers); the median is the lower median by rank over
    (slope ASC) — a total order on integers, ties interchangeable."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias("cents"),
        F.expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)").alias(
            "mon"
        ),
    )
    c = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    pts = (
        o.join(c, "o_custkey")
        .groupBy("segment", "mon")
        .agg(F.expr("(sum(cents) * 10000) div count(*)").alias("y_micros"))
    )
    p1 = pts.select("segment", F.col("mon").alias("m1"), F.col("y_micros").alias("y1"))
    p2 = pts.select("segment", F.col("mon").alias("m2"), F.col("y_micros").alias("y2"))
    slopes = (
        p1.join(p2, "segment")
        .filter(F.col("m1") < F.col("m2"))
        .select(
            "segment",
            F.expr("(y2 - y1) div (m2 - m1)").alias("slope_micros"),
        )
    )
    wseg = W.partitionBy("segment").orderBy(F.asc("slope_micros"))
    ranked = slopes.withColumn("rn", F.row_number().over(wseg)).withColumn(
        "n_pairs", F.count(F.lit(1)).over(W.partitionBy("segment"))
    )
    npts = pts.groupBy("segment").agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    return (
        ranked.filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .join(F.broadcast(npts), "segment")
        .select(
            "segment",
            "n_points",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("slope_micros").cast("bigint").alias("median_slope_micros"),
        )
    )
