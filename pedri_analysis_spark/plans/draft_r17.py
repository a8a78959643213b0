"""Draft queries staged for r17 registration (NOT in the registry).

Staged-draft protocol (established r10→r16): fully implemented,
oracle-paired, plan-invariant-pinned and proven green by
tests/test_draft_r17.py under the driver-identical comparison in the
round that stages them; registering later is one line in
``registry._modules`` (see COVERAGE.md "Registration-window plan").

Every query follows the determinism discipline (integer / DECIMAL /
HUGEINT arithmetic, total orders on every rank, quantization via
integer cross-multiplication — never libm) and the scale discipline
(pair stages blocked or domain-bounded; single-partition frames only
when domain-bounded).

Families and the public designs they implement:
- range_frame_trailing_30d — gap-correct trailing 30-day revenue via an
  integer RANGE window frame (the engine surface ROWS frames cannot
  express when the series has missing days).
- setops_bag_orders — INTERSECT ALL / EXCEPT ALL bag semantics between
  two years' order-priority multisets: exercises Spark's
  intersectAll/exceptAll physical operators, with the multiplicity
  identities (min / clamped difference of counts) pinned in tests.
- clustering_coefficient_degree — local clustering coefficient
  (Watts & Strogatz 1998) rolled up by degree bucket over the
  copurchase graph: the triangles-over-wedges texture number next to
  the global triangle count.
- rfm_customer_segments — classic RFM (recency / frequency / monetary)
  quintile segmentation, each metric scored by the DISTRIBUTED exact
  ntile (the equidepth banded-rank pattern: no global sort anywhere).
- seasonal_residual_outliers — the r15 additive decomposition's
  remainder series screened with the median/MAD robust rule: "which
  days deviate after removing trend AND weekday shape" (STL-style
  residual anomaly detection, libm-free).

Added in the r14 session (same staging discipline):
- kruskal_wallis_h_values — tie-corrected k-group rank test, the MWU
  generalization, on the domain-bounded value grid.
- welch_t2_values — unequal-variance mean test in squared form.
- rendezvous_shard_rebalance — HRW sharding audit: the minimal-
  disruption guarantee (moved_elsewhere = 0) and load balance MEASURED
  over a +1-shard rebalance.

Added in the r15 session (same staging discipline):
- jonckheere_terpstra_trend — ordered-alternative rank trend across
  the priority classes (the ordered-groups upgrade of Kruskal-Wallis).
- cramers_v2_segments — chi^2-normalized association strength of the
  segment x nation contingency table.

Reference parity: none of these exist in the reference engine — they
extend the training-data-pipeline / analytics surface per SURVEY.md
§2's "beyond the reference" mandate.
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


_IDIV = {tx.DUCK: "//", tx.SPARK: "div"}


def _hug(dialect: str, expr: str) -> str:
    """128-bit exact integer widening (HUGEINT / DECIMAL(38,0)); both
    engines' integer division TRUNCATES on these types."""
    if dialect == tx.DUCK:
        return f"CAST({expr} AS HUGEINT)"
    return f"CAST({expr} AS DECIMAL(38,0))"


# ---------------------------------------------------------------------------
# Gap-correct trailing 30-day revenue: integer RANGE window frame
# ---------------------------------------------------------------------------

TRAIL_DAYS = 30


def _trail_sql(dialect: str) -> str:
    ed = tx.epoch_day(dialect, "o_orderdate")
    cents = "sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
    return f"""
    WITH daily AS (
      SELECT o_orderdate AS day, {ed} AS ed,
             CAST({cents} AS BIGINT) AS cents
      FROM orders GROUP BY o_orderdate
    )
    SELECT day, cents,
           CAST(sum(cents) OVER w AS BIGINT) AS trail30_cents,
           CAST(count(*) OVER w AS BIGINT) AS n_days_present
    FROM daily
    WINDOW w AS (ORDER BY ed
                 RANGE BETWEEN {TRAIL_DAYS - 1} PRECEDING AND CURRENT ROW)
    ORDER BY day
    """


@_register("range_frame_trailing_30d", _trail_sql(tx.DUCK))
def q_range_frame_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {TRAIL_DAYS}-day revenue per day via an integer RANGE
    window frame over the epoch day — the frame kind a ROWS window gets
    WRONG whenever the series has gaps (29 PRECEDING rows can reach
    back months; 29 PRECEDING day-VALUES cannot), and an engine surface
    (RangeFrame with a numeric ORDER BY key) nothing else in the
    catalog exercises.  n_days_present in the same frame makes the gap
    handling auditable row by row.

    Determinism: daily sums are exact DECIMAL->BIGINT cents; the frame
    is defined by integer day arithmetic (epoch_day dispatches the
    events-style encoding portably); no division at all.

    Scale: one day rollup with map-side combine; the RANGE window runs
    on the calendar-bounded day frame (the repo's domain-bounded
    single-partition contract — at 100 TB this frame is still ~36.5k
    rows per century)."""
    o = load_table(spark, "orders", sf_dir).select("o_orderdate", "o_totalprice")
    o.createOrReplaceTempView("orders_trail")
    return spark.sql(
        _trail_sql(tx.SPARK).replace("FROM orders", "FROM orders_trail")
    )


# ---------------------------------------------------------------------------
# Bag-semantics set operations: INTERSECT ALL / EXCEPT ALL
# ---------------------------------------------------------------------------

BAG_YEAR_A = 1995
BAG_YEAR_B = 1996


def _bag_sql(dialect: str) -> str:
    yr = (
        (lambda y: f"year(o_orderdate) = {y}")
        if dialect == tx.SPARK
        else (lambda y: f"date_part('year', o_orderdate) = {y}")
    )
    return f"""
    WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE {yr(BAG_YEAR_A)}),
    b AS (SELECT o_orderpriority AS p FROM orders WHERE {yr(BAG_YEAR_B)}),
    inter AS (
      SELECT p, count(*) AS n FROM (SELECT p FROM a INTERSECT ALL SELECT p FROM b)
      GROUP BY p
    ),
    diff AS (
      SELECT p, count(*) AS n FROM (SELECT p FROM a EXCEPT ALL SELECT p FROM b)
      GROUP BY p
    ),
    ca AS (SELECT p, count(*) AS n FROM a GROUP BY p),
    cb AS (SELECT p, count(*) AS n FROM b GROUP BY p)
    SELECT ca.p AS priority,
           CAST(ca.n AS BIGINT) AS n_{BAG_YEAR_A},
           CAST(coalesce(cb.n, 0) AS BIGINT) AS n_{BAG_YEAR_B},
           CAST(coalesce(inter.n, 0) AS BIGINT) AS n_intersect_all,
           CAST(coalesce(diff.n, 0) AS BIGINT) AS n_except_all
    FROM ca
    LEFT JOIN cb ON cb.p = ca.p
    LEFT JOIN inter ON inter.p = ca.p
    LEFT JOIN diff ON diff.p = ca.p
    ORDER BY priority
    """


@_register("setops_bag_orders", _bag_sql(tx.DUCK))
def q_setops_bag_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set algebra between the {BAG_YEAR_A} and
    {BAG_YEAR_B} order-priority MULTISETS: INTERSECT ALL keeps
    min(c_a, c_b) copies of each value and EXCEPT ALL keeps
    max(c_a − c_b, 0) — the duplicate-preserving semantics
    (SQL:2003) that the DISTINCT set ops in setops_nations erase, and
    the engine surface (Spark's intersectAll / exceptAll physical
    operators) nothing else in the catalog executes.  The multiplicity
    identities are pinned against plain count arithmetic in
    tests/test_draft_r17.py, so the operators themselves are
    cross-validated, not just the counts.

    Scale: both set ops hash-partition on the value — one shuffle each
    at any scale; the priority domain bounds every later frame."""
    o = load_table(spark, "orders", sf_dir).select("o_orderdate", "o_orderpriority")
    a = o.filter(F.expr(f"year(o_orderdate) = {BAG_YEAR_A}")).select(
        F.col("o_orderpriority").alias("p")
    )
    b = o.filter(F.expr(f"year(o_orderdate) = {BAG_YEAR_B}")).select(
        F.col("o_orderpriority").alias("p")
    )
    inter = a.intersectAll(b).groupBy("p").agg(F.count(F.lit(1)).alias("ni"))
    diff = a.exceptAll(b).groupBy("p").agg(F.count(F.lit(1)).alias("nd"))
    ca = a.groupBy("p").agg(F.count(F.lit(1)).alias("na"))
    cb = b.groupBy("p").agg(F.count(F.lit(1)).alias("nb"))
    return (
        ca.join(cb, "p", "left")
        .join(inter, "p", "left")
        .join(diff, "p", "left")
        .select(
            F.col("p").alias("priority"),
            F.col("na").cast("bigint").alias(f"n_{BAG_YEAR_A}"),
            F.coalesce("nb", F.lit(0)).cast("bigint").alias(f"n_{BAG_YEAR_B}"),
            F.coalesce("ni", F.lit(0)).cast("bigint").alias("n_intersect_all"),
            F.coalesce("nd", F.lit(0)).cast("bigint").alias("n_except_all"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient by degree bucket (copurchase graph)
# ---------------------------------------------------------------------------

CC_MAX_BUCKET = 1024


def _cc_bucket(dialect: str, deg: str) -> str:
    """Largest power of two <= deg, clamped at {CC_MAX_BUCKET} — a
    branch ladder (no log2, no bit intrinsics)."""
    cases = " ".join(
        f"WHEN {deg} >= {1 << k} THEN {1 << k}"
        for k in range(CC_MAX_BUCKET.bit_length() - 1, 0, -1)
    )
    return f"(CASE {cases} ELSE 1 END)"


def _cc_oracle() -> str:
    from pedri_analysis_spark.plans.resolution_queries import _copurchase_edges_sql

    fsd = tx.floor_scaled_div
    cc = fsd(tx.DUCK, "2 * t_v", "deg * (deg - 1)", 1_000_000)
    return f"""
    WITH {_copurchase_edges_sql()},
    sym AS (
      SELECT pa AS u, pb AS v FROM e
      UNION ALL
      SELECT pb AS u, pa AS v FROM e
    ),
    deg AS (SELECT u AS node, count(*)::BIGINT AS deg FROM sym GROUP BY u),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM e e1
      JOIN e e2 ON e2.pa = e1.pb
      JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    tnode AS (
      SELECT node, count(*)::BIGINT AS t_v
      FROM (
        SELECT unnest([a, b, c]) AS node FROM tri
      ) GROUP BY node
    ),
    cc AS (
      SELECT d.node, d.deg, coalesce(t.t_v, 0) AS t_v,
             {cc.replace('t_v', 'coalesce(t.t_v, 0)')} AS cc_ppm
      FROM deg d LEFT JOIN tnode t ON t.node = d.node
      WHERE d.deg >= 2
    )
    SELECT {_cc_bucket(tx.DUCK, 'deg')}::BIGINT AS deg_bucket,
           count(*)::BIGINT AS n_nodes,
           sum(t_v)::BIGINT AS sum_triangles,
           sum(deg * (deg - 1) {_IDIV[tx.DUCK]} 2)::BIGINT AS sum_wedges,
           {fsd(tx.DUCK, "sum(cc_ppm)", "count(*)", 1)}::BIGINT AS avg_cc_ppm
    FROM cc
    GROUP BY 1
    ORDER BY 1
    """


@_register("clustering_coefficient_degree", _cc_oracle())
def q_clustering_coefficient_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (Watts & Strogatz 1998) of the
    copurchase graph, rolled up by power-of-two degree bucket:
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — "are my neighbours also
    each other's neighbours", the graph-texture number the global
    triangle count cannot localize (hub assortativity, community
    structure vs hairball).

    Determinism: triangles enumerate once through the ordered-edge
    double join (a<b<c, each triangle exactly once — the
    triangle_count_copurchase topology) and are distributed to their
    three corners with ONE explode (the k-truss lineage lesson: never
    three union legs over the same join); cc quantizes to ppm with one
    floor per node, bucket averages with one floor per bucket;
    deg < 2 nodes are excluded by an explicit branch in both engines
    (wedges = 0 — no division).

    Scale: same pair topology as triangle_count_copurchase (in-order
    self-joins, never corpus × corpus); the per-node rollup and the
    ≤ {CC_MAX_BUCKET.bit_length()}-row bucket ladder are one shuffle
    each."""
    from pedri_analysis_spark.plans.resolution_queries import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir).select("pa", "pb").persist()
    sym = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tnode = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t_v"))
    )
    fsd = tx.floor_scaled_div
    cc = (
        deg.join(tnode, "node", "left")
        .withColumn("t_v", F.coalesce("t_v", F.lit(0)).cast("bigint"))
        .filter(F.col("deg") >= 2)
        .withColumn(
            "cc_ppm",
            F.expr(fsd(tx.SPARK, "2 * t_v", "deg * (deg - 1)", 1_000_000)),
        )
    )
    return (
        cc.groupBy(
            F.expr(_cc_bucket(tx.SPARK, "deg")).cast("bigint").alias("deg_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("t_v").cast("bigint").alias("sum_triangles"),
            F.sum(F.expr("deg * (deg - 1) div 2")).cast("bigint").alias("sum_wedges"),
            F.expr(fsd(tx.SPARK, "sum(cc_ppm)", "count(1)", 1))
            .cast("bigint")
            .alias("avg_cc_ppm"),
        )
        .orderBy("deg_bucket")
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation: distributed exact quintiles, no global sort
# ---------------------------------------------------------------------------

RFM_K = 5
RFM_MONETARY_BAND = 100_000  # $1000 bands: the monetary rank's shuffle key


def _ntile_expr(dialect: str, rank: str, n: str, k: int) -> str:
    """Standard-SQL ntile from an exact global rank: the first n%k
    tiles take ceil(n/k) rows, the rest floor(n/k) — the
    equidepth_price_bins arithmetic, shared text in both dialects."""
    d = _IDIV[dialect]
    return (
        f"CAST(CASE WHEN {rank} <= ({n} % {k}) * (({n} {d} {k}) + 1) "
        f"THEN ({rank} - 1) {d} (({n} {d} {k}) + 1) + 1 "
        f"ELSE ({n} % {k}) "
        f"  + ({rank} - ({n} % {k}) * (({n} {d} {k}) + 1) - 1) "
        f"    {d} ({n} {d} {k}) + 1 END AS BIGINT)"
    )


def _rfm_oracle() -> str:
    ed = tx.epoch_day(tx.DUCK, "o_orderdate")
    cents = "sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
    return f"""
    WITH cust AS (
      SELECT o_custkey AS ck,
             max({ed}) AS last_ed,
             count(*)::BIGINT AS freq,
             CAST({cents} AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT max(last_ed) AS max_ed FROM cust),
    m AS (
      SELECT ck, (mx.max_ed - last_ed) AS recency, freq, cents
      FROM cust CROSS JOIN mx
    ),
    scored AS (
      SELECT ck, cents,
             ntile({RFM_K}) OVER (ORDER BY recency ASC, ck ASC) AS r_score,
             ntile({RFM_K}) OVER (ORDER BY freq ASC, ck ASC) AS f_score,
             ntile({RFM_K}) OVER (ORDER BY cents ASC, ck ASC) AS m_score
      FROM m
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           count(*)::BIGINT AS n_customers,
           sum(cents)::BIGINT AS monetary_cents
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """


def _banded_quintile(
    m: DataFrame, metric: str, band_expr: str, n_total_col: str, out: str
) -> DataFrame:
    """Exact distributed ntile score for one metric — the
    equidepth_price_bins banded-rank pattern: per-band counts give
    prefix offsets on a band-domain frame; row_number runs WITHIN each
    band (one hash shuffle, never a global sort); offset + row_number
    is the exact global rank because the band is a monotone function
    of (metric, ck)."""
    d = m.withColumn("band", F.expr(band_expr).cast("bigint"))
    bandc = d.groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("bn"))
    wb = W.orderBy("band").rowsBetween(W.unboundedPreceding, -1)
    offs = bandc.select(
        "band",
        F.coalesce(F.sum("bn").over(wb), F.lit(0)).cast("bigint").alias("off"),
    )
    wr = W.partitionBy("band").orderBy(metric, "ck")
    ranked = (
        d.join(F.broadcast(offs), "band")
        .withColumn("rank", (F.row_number().over(wr) + F.col("off")).cast("bigint"))
    )
    return ranked.select(
        "ck",
        F.expr(_ntile_expr(tx.SPARK, "rank", n_total_col, RFM_K)).alias(out),
    )


@_register("rfm_customer_segments", _rfm_oracle())
def q_rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM segmentation (Hughes 1994): every customer scored
    1–{RFM_K} on Recency (days since last order), Frequency (order
    count) and Monetary (lifetime cents) by EXACT quintile, rolled up
    to the ≤ {RFM_K}³ segment grid — the standard CRM / campaign-
    targeting rollup, and the catalog's demonstration that exact
    population quantile SCORING (not just binning one column —
    equidepth_price_bins — but three joined per-entity scores) runs
    without any global sort.

    The oracle is three ntile windows; the Spark plan computes each
    score with the equidepth banded-rank pattern: recency and
    frequency band on their own domain-bounded values, monetary on
    $1000 bands ({RFM_MONETARY_BAND} cents), so every fact-table-sized
    window is PARTITIONED by band (one hash shuffle) and only
    band-domain frames see an unpartitioned prefix window.  Ties break
    on custkey — both engines rank the identical total order.

    Scale: one orders rollup; three banded rank passes over the
    customer frame; two broadcast joins reassemble the scores; output
    is the ≤ 125-row segment grid."""
    ed = tx.epoch_day(tx.SPARK, "o_orderdate")
    cust = (
        load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.max(F.expr(ed)).cast("bigint").alias("last_ed"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.expr(
                "CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 "
                "AS BIGINT)) AS BIGINT)"
            ).alias("cents"),
        )
    )
    mx = cust.agg(
        F.max("last_ed").alias("max_ed"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    m = cust.crossJoin(F.broadcast(mx)).select(
        "ck",
        (F.col("max_ed") - F.col("last_ed")).cast("bigint").alias("recency"),
        "freq",
        "cents",
        "n_total",
    ).persist()
    r = _banded_quintile(m, "recency", "recency", "n_total", "r_score")
    f_ = _banded_quintile(m, "freq", "freq", "n_total", "f_score")
    mo = _banded_quintile(
        m, "cents", f"cents div {RFM_MONETARY_BAND}", "n_total", "m_score"
    )
    return (
        m.select("ck", "cents")
        .join(r, "ck")
        .join(f_, "ck")
        .join(mo, "ck")
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# Seasonal-residual robust outliers (decompose -> remainder -> MAD)
# ---------------------------------------------------------------------------

SRO_UNIT_DIV = 1000  # daily revenue in $10 quanta (the r15 convention)
SRO_W = 7
SRO_MAD_SCALE = 1_482_600
SRO_TOPK = 8


def _sro_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    ed = tx.epoch_day(dialect, "o_orderdate")
    fsd = tx.floor_scaled_div
    cents = "sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
    seas_mean = (
        f"(CASE WHEN sum(dx7) >= 0 THEN {fsd(dialect, 'sum(dx7)', 'count(*)', 1)} "
        f"ELSE -{fsd(dialect, '-sum(dx7)', 'count(*)', 1)} END)"
    )
    z = f"({h('adev')} * 1000000 * 1000000) {d} ({h(str(SRO_MAD_SCALE))} * {h('mad')})"
    # the median frames are 1-row by construction (rank-selected), but
    # unlike a bare aggregate the planner cannot SEE that, so the Spark
    # dialect hints the broadcast — otherwise the cross joins plan as
    # CartesianProduct (lint-banned)
    hint_med = "/*+ BROADCAST(med) */ " if dialect == tx.SPARK else ""
    hint_mad = "/*+ BROADCAST(madr) */ " if dialect == tx.SPARK else ""
    return f"""
    WITH daily AS (
      SELECT o_orderdate AS day, {ed} AS edd,
             CAST(({cents}) {d} {SRO_UNIT_DIV} AS BIGINT) AS v
      FROM orders GROUP BY o_orderdate
    ),
    ma AS (
      SELECT day, edd, v,
             sum(v) OVER w AS trend_x7,
             count(*) OVER w AS wn
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS (
      SELECT day, (edd + 4) % 7 AS dow, {SRO_W} * v - trend_x7 AS dx7, v
      FROM ma WHERE wn = {SRO_W}
    ),
    seas AS (
      SELECT dow, {seas_mean} AS seasonal_x7
      FROM detr GROUP BY dow
    ),
    resid AS (
      SELECT d2.day, d2.v, d2.dx7 - s.seasonal_x7 AS rx7
      FROM detr d2 JOIN seas s ON s.dow = d2.dow
    ),
    med AS (
      SELECT rx7 AS med_rx7 FROM (
        SELECT rx7, row_number() OVER (ORDER BY rx7 ASC, day ASC) AS rn,
               count(*) OVER () AS n
        FROM resid
      ) WHERE rn = (n + 1) {d} 2
    ),
    devs AS (
      SELECT {hint_med}day, v, rx7,
             CASE WHEN rx7 >= med_rx7 THEN rx7 - med_rx7
                  ELSE med_rx7 - rx7 END AS adev
      FROM resid CROSS JOIN med
    ),
    madr AS (
      SELECT adev AS mad FROM (
        SELECT adev, row_number() OVER (ORDER BY adev ASC, day ASC) AS rn,
               count(*) OVER () AS n
        FROM devs
      ) WHERE rn = (n + 1) {d} 2
    )
    SELECT {hint_mad}day, CAST(v AS BIGINT) AS v_units, CAST(rx7 AS BIGINT) AS rx7,
           CAST(CASE WHEN mad = 0 THEN NULL ELSE {z} END AS BIGINT)
             AS robust_z_micro
    FROM devs CROSS JOIN madr
    ORDER BY robust_z_micro DESC, day ASC
    LIMIT {SRO_TOPK}
    """


@_register("seasonal_residual_outliers", _sro_sql(tx.DUCK))
def q_seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style residual anomaly screen over daily revenue: remove the
    centered {SRO_W}-day trend and the day-of-week seasonal means (the
    r15 seasonal_decomposition_daily arithmetic, x7-scaled exact
    integers), then flag the days whose REMAINDER deviates by the
    median/MAD robust rule — "this Tuesday was wild even for a
    Tuesday", which a raw z-score over the undecomposed series cannot
    say (the weekday shape dominates its variance).

    Determinism: the decomposition is the proven r15 integer ladder
    (one documented floor per dow mean); both medians are exact
    rank-selected LOWER medians with day tie-breaks; the robust z is
    one 128-bit truncating division, and the mad = 0 degenerate
    returns NULL by the same explicit branch in both engines.

    Scale: one day rollup, then every window and rank selection runs
    on the calendar-bounded day frame; output is
    TakeOrdered({SRO_TOPK})."""
    o = load_table(spark, "orders", sf_dir).select("o_orderdate", "o_totalprice")
    o.createOrReplaceTempView("orders_sro")
    return spark.sql(
        _sro_sql(tx.SPARK).replace("FROM orders GROUP BY", "FROM orders_sro GROUP BY")
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H across ALL event-type value distributions (added r14)
# ---------------------------------------------------------------------------

# chi^2_{df, 0.05} in micro units for df = 1..12 (literal constants,
# the mcnemar/mwu discipline); event_type cardinality is domain-small,
# df outside the table yields NULL significance (loud, never wrong)
KW_CHI2_CRIT_MICRO = {
    1: 3_841_459,
    2: 5_991_465,
    3: 7_814_728,
    4: 9_487_729,
    5: 11_070_498,
    6: 12_591_587,
    7: 14_067_140,
    8: 15_507_313,
    9: 16_918_978,
    10: 18_307_038,
    11: 19_675_138,
    12: 21_026_070,
}


def _kw_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    # per-group floor of 3e6 * s2^2 / (n(n+1) ng) via the residue
    # decomposition: the intermediate is 3*s2^2 (~12 n^2 ng^2, 128-bit
    # safe to n ~ 3e9 rows) rather than 1e6x that
    term = tx.floor_scaled_div(
        dialect,
        f"(3 * {h('s2')} * {h('s2')})",
        f"({h('n')} * (n + 1) * ng)",
        1_000_000,
    )
    crit = " ".join(
        f"WHEN k - 1 = {df} THEN {c}" for df, c in KW_CHI2_CRIT_MICRO.items()
    )
    return f"""
    WITH pt AS (
      SELECT value, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL
      GROUP BY value, event_type
    ),
    cum AS (
      SELECT value, tvn,
             CAST(coalesce(sum(tvn) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS c_before
      FROM (SELECT value, CAST(sum(cnt) AS BIGINT) AS tvn
            FROM pt GROUP BY value) tv
    ),
    pj AS (
      SELECT p.event_type, p.cnt, c.tvn, c.c_before,
             row_number() OVER (PARTITION BY p.value
                                ORDER BY p.event_type) AS rn_v
      FROM pt p JOIN cum c ON c.value = p.value
    ),
    rg AS (
      SELECT event_type, CAST(sum(cnt) AS BIGINT) AS ng,
             CAST(sum(cnt * (2 * c_before + tvn + 1)) AS BIGINT) AS s2,
             sum(CASE WHEN rn_v = 1
                 THEN {h('tvn')} * tvn * tvn - tvn ELSE {h('0')} END) AS tie_g
      FROM pj GROUP BY event_type
    ),
    rg2 AS (
      SELECT ng, s2,
             CAST(sum(ng) OVER () AS BIGINT) AS n,
             sum(tie_g) OVER () AS tie_t
      FROM rg
    ),
    tot AS (
      SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS k,
             max(tie_t) AS tie_t,
             CAST(sum(CAST({term} AS BIGINT)) AS BIGINT) AS term_sum
      FROM rg2
    ),
    stat AS (
      SELECT n, k, term_sum - 3 * (n + 1) * 1000000 AS h_micro,
             {h('n')} * {h('n')} * {h('n')} - {h('n')} - tie_t AS tc_den,
             tie_t
      FROM tot
    )
    SELECT n, k AS k_groups, CAST(tie_t AS BIGINT) AS tie_term,
           CAST(h_micro AS BIGINT) AS h_micro,
           CAST(CASE WHEN n >= 2 AND tc_den > 0
                THEN ({h('h_micro')} * ({h('n')} * {h('n')} * {h('n')} - {h('n')}))
                     {d} tc_den
                ELSE h_micro END AS BIGINT) AS h_tc_micro,
           CAST(CASE WHEN k < 2 OR k > 13 THEN NULL
                WHEN (CASE WHEN n >= 2 AND tc_den > 0
                      THEN ({h('h_micro')} * ({h('n')} * {h('n')} * {h('n')} - {h('n')}))
                           {d} tc_den
                      ELSE h_micro END)
                     >= (CASE {crit} END) THEN 1 ELSE 0 END AS BIGINT)
             AS significant
    FROM stat
    """


@_register("kruskal_wallis_h_values", _kw_sql(tx.DUCK))
def q_kruskal_wallis_h_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H rank test (1952) across ALL event-type ``value``
    distributions at once — the k-group generalization of the staged
    Mann-Whitney U (draft_r16): "do ANY of the event populations pay
    differently", the one-way ANOVA-on-ranks with no normality
    assumption and no libm.

    Determinism: doubled average ranks (2*avgrank = 2*c_before + t + 1,
    exact integers for any tie group) give exact doubled rank sums s2_g
    per group; H = [3/(n(n+1))] * sum_g s2_g^2/n_g - 3(n+1) floors each
    group term to micro via the overflow-safe residue decomposition
    (<= k documented per-term floors, the AP@10 convention), and the
    tie correction H' = H*(n^3-n)/(n^3-n - sum(t^3-t)) is one exact
    128-bit division.  Degenerate guards mirrored in both dialects:
    all-values-tied (tc_den = 0) skips the correction; df = k-1 outside
    the literal chi-square table yields NULL significance.

    Scale: one (value, event_type) groupBy reduces corpus rows to the
    domain-bounded 2-decimal grid; the ordered cumulative window runs
    on the per-value rollup of THAT frame (the adjudicated score-domain
    single-partition pattern, see mann_whitney_u_values) and the rest
    is a k-row aggregate.  128-bit ceilings (wave convention, loud —
    ANSI/HUGEINT failure, never silent divergence): 3*s2^2 saturates
    around n ~ 3e9 valued rows; the reported tie_term OUTPUT column
    casts sum(t^3 - t) back to BIGINT, a loud cast error past a ~2.1M-
    row tied value group (the mann_whitney_u_values convention)."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    ev.createOrReplaceTempView("kw_events")
    return spark.sql(
        _kw_sql(tx.SPARK).replace("FROM events WHERE", "FROM kw_events WHERE")
    )


# ---------------------------------------------------------------------------
# Welch's t^2 (unequal-variance mean test) purchase vs click (added r14)
# ---------------------------------------------------------------------------

WELCH_GROUP_A = "purchase"
WELCH_GROUP_B = "click"
# z^2 ~ chi^2_1 at 0.05 in micro units (the MWU/McNemar normal-approx
# convention; Welch df is large for these group sizes)
WELCH_CHI2_CRIT_MICRO = 3_841_459


def _welch_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    # |s1*n2 - s2*n1| with the sign branched before dividing.  NOTE
    # (r14 advice, verified): DuckDB // on BIGINT/HUGEINT truncates
    # toward zero exactly like Spark div (-7//2 = -3 in both) — the
    # real divergence class is DECIMAL quotients (DuckDB rounds, Spark
    # truncates).  The branch is kept as defense-in-depth only.
    mdnum = f"({h('s1')} * n2 - {h('s2')} * n1)"
    mdabs = f"(CASE WHEN {mdnum} >= 0 THEN {mdnum} ELSE -{mdnum} END)"
    md = f"(({mdabs} * 1000) {d} ({h('n1')} * n2))"
    vm = lambda a, dn: (  # noqa: E731
        f"(({h(a)} * 1000000) {d} ({h(dn)} * {dn} * ({dn} - 1)))"
    )
    return f"""
    WITH e AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM events
      WHERE value IS NOT NULL
        AND event_type IN ('{WELCH_GROUP_A}', '{WELCH_GROUP_B}')
    ),
    s AS (
      SELECT
        CAST(sum(CASE WHEN event_type = '{WELCH_GROUP_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN event_type = '{WELCH_GROUP_A}' THEN c ELSE 0 END) AS BIGINT) AS s1,
        sum(CASE WHEN event_type = '{WELCH_GROUP_A}' THEN {h('c')} * c ELSE {h('0')} END) AS q1,
        CAST(sum(CASE WHEN event_type = '{WELCH_GROUP_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN event_type = '{WELCH_GROUP_B}' THEN c ELSE 0 END) AS BIGINT) AS s2,
        sum(CASE WHEN event_type = '{WELCH_GROUP_B}' THEN {h('c')} * c ELSE {h('0')} END) AS q2
      FROM e
    ),
    a AS (
      SELECT n1, s1, n2, s2,
             {h('n1')} * q1 - {h('s1')} * s1 AS a1,
             {h('n2')} * q2 - {h('s2')} * s2 AS a2
      FROM s
    ),
    q AS (
      SELECT n1, n2,
             CASE WHEN n1 > 0 AND n2 > 0 THEN
               CASE WHEN {mdnum} >= 0 THEN {md} ELSE -({md}) END
             ELSE {h('0')} END AS md_milli,
             CASE WHEN n1 >= 2 THEN {vm("a1", "n1")} ELSE {h('0')} END
               + CASE WHEN n2 >= 2 THEN {vm("a2", "n2")} ELSE {h('0')} END
               AS vm_sum_q
      FROM a
    )
    SELECT n1, n2, CAST(md_milli AS BIGINT) AS mean_diff_milli,
           CAST(vm_sum_q AS BIGINT) AS var_mean_sum_micro,
           CAST(CASE WHEN n1 >= 2 AND n2 >= 2 AND vm_sum_q > 0
                THEN ({h('md_milli')} * md_milli * 1000000) {d} vm_sum_q
                ELSE 0 END AS BIGINT) AS t2_micro,
           CAST(CASE WHEN n1 >= 2 AND n2 >= 2 AND vm_sum_q > 0
                     AND ({h('md_milli')} * md_milli * 1000000) {d} vm_sum_q
                         >= {WELCH_CHI2_CRIT_MICRO}
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM q
    """


@_register("welch_t2_values", _welch_sql(tx.DUCK))
def q_welch_t2_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test in SQUARED form (t^2, Welch 1947)
    between the purchase and click ``value`` means — the mean-shift
    companion to mann_whitney_u_values (location on ranks) and
    brown_forsythe_value (spread): t^2 = (m1-m2)^2 / (v1/n1 + v2/n2)
    needs no sqrt and compares against chi^2_1 under the large-sample
    normal approximation (documented, the MWU convention).

    Determinism: exact cents sums S, Q = sum(c^2) widened to 128-bit
    INSIDE the sum; three documented quantizations — the mean
    difference floors to MILLI-cents via (|S1 n2 - S2 n1| * 1000) div
    (n1 n2) with the sign branched BEFORE the division (defense-in-depth
    only: integer div truncates toward zero in BOTH engines; the real
    divergence class is DECIMAL quotients — DuckDB rounds, Spark
    truncates),
    each group's variance-of-mean floors to MICRO-cents^2 via
    (n_i Q_i - S_i^2) * 1e6 div (n_i^2 (n_i-1)), and the final t^2
    floors to micro.  Units cancel exactly: md_milli^2 is 1e-6 cents^2,
    matching vm's micro-cents^2, so t2_micro = md^2 * 1e6 div vm_sum.
    Guards mirrored in both dialects: n_i < 2 or zero variance-of-mean
    branch BEFORE dividing.

    Scale: one narrow scan, ONE 6-sum aggregate row, zero joins and
    zero windows — the cheapest shape in the catalog.  128-bit ceiling:
    n_i*Q_i ~ n^2 c_max^2 saturates around n ~ 1e9 valued rows per
    group (loud, wave convention)."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(WELCH_GROUP_A, WELCH_GROUP_B)
        )
        .select("event_type", "value")
    )
    ev.createOrReplaceTempView("welch_events")
    return spark.sql(
        _welch_sql(tx.SPARK).replace("FROM events", "FROM welch_events")
    )


# ---------------------------------------------------------------------------
# Rendezvous (HRW) shard-rebalance audit over customer keys (added r14)
# ---------------------------------------------------------------------------

HRW_SHARDS = 16  # before; rebalance adds shard 16 (-> 17)


def _hrw_sql(dialect: str) -> str:
    fsd = tx.floor_scaled_div
    shards = ", ".join(str(s) for s in range(HRW_SHARDS + 1))
    if dialect == tx.DUCK:
        kk = "CAST(c_custkey AS VARCHAR)"
        ex = f"unnest([{shards}])"
        key_s = "kk || '#' || CAST(s AS VARCHAR)"
    else:
        kk = "CAST(c_custkey AS STRING)"
        ex = f"explode(array({shards}))"
        key_s = "concat(kk, '#', CAST(s AS STRING))"
    h = tx.seeded_hash64(dialect, key_s, "hrw")
    return f"""
    WITH k AS (SELECT {kk} AS kk FROM customer),
    ex AS (
      SELECT kk, s, {h} AS h
      FROM (SELECT kk, {ex} AS s FROM k) z
    ),
    pk AS (
      SELECT kk,
             max_by(s, h) FILTER (WHERE s < {HRW_SHARDS}) AS s_before,
             max_by(s, h) AS s_after
      FROM ex GROUP BY kk
    ),
    bal AS (
      SELECT s_before,
             CAST(count(*) AS BIGINT) AS c,
             CAST(sum(CASE WHEN s_after <> s_before THEN 1 ELSE 0 END)
               AS BIGINT) AS moved_s,
             CAST(sum(CASE WHEN s_after <> s_before
                            AND s_after <> {HRW_SHARDS}
                      THEN 1 ELSE 0 END) AS BIGINT) AS elsewhere_s
      FROM pk GROUP BY s_before
    )
    SELECT CAST(sum(c) AS BIGINT) AS n_keys,
           CAST(sum(moved_s) AS BIGINT) AS moved,
           CAST(sum(elsewhere_s) AS BIGINT) AS moved_elsewhere,
           CAST(max(c) AS BIGINT) AS max_shard_n,
           CAST(min(c) AS BIGINT) AS min_shard_n,
           CAST({fsd(dialect, "sum(moved_s)", "sum(c)", 1_000_000)} AS BIGINT)
             AS moved_ppm
    FROM bal
    """


@_register("rendezvous_shard_rebalance", _hrw_sql(tx.DUCK))
def q_rendezvous_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding audit (Thaler &
    Ravishankar 1998, the consistent-hashing alternative every
    coordination-free router uses): each key lives on the shard
    maximizing h(key, shard), and adding shard {HRW_SHARDS} must move
    ONLY the keys whose new argmax IS the new shard — the minimal-
    disruption guarantee, MEASURED: moved_elsewhere is structurally 0
    (any key whose 17-way argmax differs from its 16-way argmax can
    only have gained the new maximum) and moved_ppm should sit near
    1/{HRW_SHARDS + 1} of the keys; max/min shard counts audit the
    load balance the scheme promises.  The layout-family companion to
    hilbert/zorder (placement, not ordering).

    Determinism: the shared 60-bit seeded md5 hash is dialect-
    mirrored; argmax ties would need a 60-bit collision between two
    shards of one key (the minhash convention — excluded in practice
    and irrelevant to the audit's aggregates).

    Scale: one {HRW_SHARDS + 1}-way literal explode per key (linear,
    no shuffle beyond the per-key groupBy), a {HRW_SHARDS}-row balance
    rollup, and a 1-row aggregate — no joins anywhere."""
    c = load_table(spark, "customer", sf_dir).select("c_custkey")
    c.createOrReplaceTempView("hrw_customer")
    return spark.sql(
        _hrw_sql(tx.SPARK).replace("FROM customer", "FROM hrw_customer")
    )


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative trend test (added r15)
# ---------------------------------------------------------------------------

# z^2 ~ chi^2_1 at 0.05 in micro units (the MWU normal-approx convention)
JT_CHI2_CRIT_MICRO = 3_841_459


def _hdiv(dialect: str, a: str, b: str) -> str:
    """TRUE 128-bit integral division.  Spark's ``div`` operator always
    returns LONG, so any quotient past 9.2e18 wraps/overflows even when
    both operands are DECIMAL(38,0) — measured on this query's first
    variance term (~9e19 at sf0.1).  ``(a - a % b) / b`` divides
    exactly (the adjusted numerator is divisible, decimal division of
    an exact multiple is exact — verified empirically incl. negative
    truncation matching DuckDB's ``//``), keeping the full 38-digit
    quotient range."""
    if dialect == tx.DUCK:
        return f"(({a}) // ({b}))"
    return f"CAST((({a}) - (({a}) % ({b}))) / ({b}) AS DECIMAL(38,0))"


def _jt_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    hd = lambda a, b: _hdiv(dialect, a, b)  # noqa: E731
    tv = "n1v + n2v + n3v + n4v + n5v"
    return f"""
    WITH base AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               {d} 100000 AS v
      FROM orders
      WHERE substr(o_orderpriority, 1, 1) IN ('1', '2', '3', '4', '5')
    ),
    grid AS (
      SELECT v,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
             CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2v,
             CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3v,
             CAST(sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4v,
             CAST(sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n5v
      FROM base GROUP BY v
    ),
    cum AS (
      SELECT *,
        CAST(coalesce(sum(n1v) OVER w, 0) AS BIGINT) AS c1,
        CAST(coalesce(sum(n2v) OVER w, 0) AS BIGINT) AS c2,
        CAST(coalesce(sum(n3v) OVER w, 0) AS BIGINT) AS c3,
        CAST(coalesce(sum(n4v) OVER w, 0) AS BIGINT) AS c4
      FROM grid
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    sums AS (
      SELECT
        CAST(sum({tv}) AS BIGINT) AS n,
        CAST(sum(n1v) AS BIGINT) AS g1, CAST(sum(n2v) AS BIGINT) AS g2,
        CAST(sum(n3v) AS BIGINT) AS g3, CAST(sum(n4v) AS BIGINT) AS g4,
        CAST(sum(n5v) AS BIGINT) AS g5,
        CAST(sum( n2v * (2 * c1 + n1v)
           + n3v * (2 * (c1 + c2) + n1v + n2v)
           + n4v * (2 * (c1 + c2 + c3) + n1v + n2v + n3v)
           + n5v * (2 * (c1 + c2 + c3 + c4) + n1v + n2v + n3v + n4v) )
          AS BIGINT) AS j2,
        sum({h(tv)} * ({tv} - 1) * (2 * ({tv}) + 5)) AS ta,
        sum({h(tv)} * ({tv} - 1) * (({tv}) - 2)) AS tc,
        sum({h(tv)} * ({tv} - 1)) AS te
      FROM cum
    ),
    st AS (
      SELECT n, j2,
        {h('n')} * (n - 1) * (2 * n + 5)
          - ({h('g1')} * (g1 - 1) * (2 * g1 + 5) + {h('g2')} * (g2 - 1) * (2 * g2 + 5)
           + {h('g3')} * (g3 - 1) * (2 * g3 + 5) + {h('g4')} * (g4 - 1) * (2 * g4 + 5)
           + {h('g5')} * (g5 - 1) * (2 * g5 + 5)) - ta AS a,
        {h('g1')} * (g1 - 1) * (g1 - 2) + {h('g2')} * (g2 - 1) * (g2 - 2)
          + {h('g3')} * (g3 - 1) * (g3 - 2) + {h('g4')} * (g4 - 1) * (g4 - 2)
          + {h('g5')} * (g5 - 1) * (g5 - 2) AS b,
        tc AS c,
        {h('g1')} * (g1 - 1) + {h('g2')} * (g2 - 1) + {h('g3')} * (g3 - 1)
          + {h('g4')} * (g4 - 1) + {h('g5')} * (g5 - 1) AS dd,
        te AS e2,
        {h('n')} * n
          - ({h('g1')} * g1 + {h('g2')} * g2 + {h('g3')} * g3
           + {h('g4')} * g4 + {h('g5')} * g5) AS mu4
      FROM sums
    ),
    vv AS (
      -- EXACT residue decompositions throughout (identical value to a
      -- single floor): the direct B*C*1e6 product overflowed 128-bit
      -- at sf2.0synth's 3M orders, and the quotient of the first term
      -- alone (~9e19 at sf0.1) overflows Spark's LONG-returning div —
      -- hence _hdiv, the true 128-bit integral division
      SELECT n, j2, mu4,
        CASE WHEN n >= 3 THEN
          {hd('a * 1000000', '72')}
          + c * {hd('b * 1000000', f"36 * {h('n')} * (n - 1) * (n - 2)")}
          + {hd(f"c * ((b * 1000000) % (36 * {h('n')} * (n - 1) * (n - 2)))",
                f"36 * {h('n')} * (n - 1) * (n - 2)")}
          + dd * {hd('e2 * 1000000', f"8 * {h('n')} * (n - 1)")}
          + {hd(f"dd * ((e2 * 1000000) % (8 * {h('n')} * (n - 1)))",
                f"8 * {h('n')} * (n - 1)")}
        ELSE 0 END AS var_micro
      FROM st
    ),
    zz AS (
      SELECT n, j2, mu4, var_micro,
        (2 * {h('j2')} - mu4) * (2 * {h('j2')} - mu4) AS x2
      FROM vv
    ),
    z1 AS (
      -- z^2 = x2 * 6.25e10 / var, staged EXACTLY: the 6.25e10 factor
      -- splits as 250000^2 so no intermediate exceeds var * 250000;
      -- nullif guards the degenerate var = 0 frame (coalesced to 0
      -- at the end) without a conditional branch both engines would
      -- still evaluate
      SELECT n, j2, mu4, var_micro,
             {hd('x2', 'nullif(var_micro, 0)')} AS q0,
             (x2 % nullif(var_micro, 0)) * 250000 AS a1
      FROM zz
    ),
    z2f AS (
      SELECT n, j2, mu4, var_micro,
             coalesce(q0 * 62500000000
                      + {hd('a1', 'nullif(var_micro, 0)')} * 250000
                      + {hd('(a1 % nullif(var_micro, 0)) * 250000',
                            'nullif(var_micro, 0)')},
                      0) AS z2
      FROM z1
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(j2 AS BIGINT) AS jt_x2,
           CAST(mu4 AS BIGINT) AS mu_x4,
           CAST(CASE WHEN n >= 2
                THEN {hd('2 * var_micro', f"{h('n')} * (n - 1)")}
                ELSE 0 END AS BIGINT) AS var_pp_micro,
           CAST(z2 AS BIGINT) AS z2_micro,
           CAST(CASE WHEN z2 >= {JT_CHI2_CRIT_MICRO}
                THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM z2f
    """


@_register("jonckheere_terpstra_trend", _jt_sql(tx.DUCK))
def q_jonckheere_terpstra_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test (1954) for an ORDERED alternative:
    does order value trend monotonically across the five priority
    classes 1-URGENT -> 5-LOW?  The rank test to reach for when the
    groups carry a natural order - strictly more powerful there than
    the staged Kruskal-Wallis omnibus, and the ordered-dose cousin of
    the staged Cochran-Armitage (which handles binary outcomes).

    Determinism: J = sum_{a<b} U_ab is assembled EXACTLY from the
    bounded $1000-bucket value grid: per value v and ordered group
    pair, U contributions are n_bv * (2*C_av + n_av) in DOUBLED units
    (ties count 1 = 2 halves), so jt_x2 = 2J is an exact BIGINT.  The
    tie-corrected null variance (Hollander & Wolfe eq. 6.19) is
    assembled from the three tie-power sums in 128-bit and floored
    ONCE per closed-form term to micro (3 documented floors); the two
    tie-PRODUCT terms (B*C, D*E) and z^2 = x2 * 62.5e9 / var_micro all
    use the EXACT quotient+remainder RESIDUE DECOMPOSITION (identical
    value to the single floor; the 62.5e9 factor splits as 250000^2),
    and every internal division goes through _hdiv — the TRUE 128-bit
    integral division, because Spark's ``div`` returns LONG and this
    query's first variance term (~9e19 at sf0.1's 150k orders) already
    exceeds it (measured silent wrap; see _hdiv).  Both overflow
    classes here were caught by the staging probes/sf0.1 parity, not
    the driver.  Residual 128-bit ceilings, loud ANSI/HUGEINT
    failures, never silent: x2 ~ 4n^4 (~8e8 orders), a*1e6 ~ 4n^3*1e6
    (~3.5e10), var*250000 (~2.3e9), C * 36n^3 with C = sum t^3 over
    value-grid ties (~1e8 at the observed $1000-grid dispersion);
    n >= 3 guarded to 0.  The variance OUTPUT is reported per-pair
    (var_pp_micro = 2*var/n(n-1), linear in n) because the raw cubic
    var_micro exceeds a BIGINT output cast already at sf0.1; z^2 uses
    the full 128-bit variance internally.

    Scale: corpus reduces to the $1000 grid (one groupBy); the
    cumulative window runs on the bounded grid (the adjudicated
    score-domain single-partition pattern, see kruskal_wallis /
    mann_whitney_u_values); everything after is a 1-row frame.
    Priority classes outside 1..5 are filtered loudly upstream."""
    ord_df = load_table(spark, "orders", sf_dir)
    ord_df.createOrReplaceTempView("orders")
    return spark.sql(_jt_sql(tx.SPARK))


# ---------------------------------------------------------------------------
# Cramer's V^2 association strength segment x nation (added r15)
# ---------------------------------------------------------------------------


def _cv2_sql(dialect: str) -> str:
    d = _IDIV[dialect]
    h = lambda e: _hug(dialect, e)  # noqa: E731
    return f"""
    WITH cells AS (
      SELECT c_mktsegment AS r, c_nationkey AS c, CAST(count(*) AS BIGINT) AS o
      FROM customer GROUP BY c_mktsegment, c_nationkey
    ),
    m AS (
      SELECT r, c, o,
             CAST(sum(o) OVER (PARTITION BY r) AS BIGINT) AS rm,
             CAST(sum(o) OVER (PARTITION BY c) AS BIGINT) AS cm,
             CAST(sum(o) OVER () AS BIGINT) AS n
      FROM cells
    ),
    agg AS (
      SELECT max(n) AS n,
             CAST(count(DISTINCT r) AS BIGINT) AS nr,
             CAST(count(DISTINCT c) AS BIGINT) AS nc,
             sum((1000000 * {h('n')} * o * o) {d} ({h('rm')} * cm)) AS s
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(nr AS BIGINT) AS n_rows,
           CAST(nc AS BIGINT) AS n_cols,
           CAST(s - 1000000 * {h('n')} AS BIGINT) AS chi2_micro,
           CAST(CASE WHEN n > 0 AND least(nr, nc) > 1
                THEN (1000 * (s - 1000000 * {h('n')}))
                     {d} ({h('n')} * (least(nr, nc) - 1))
                ELSE 0 END AS BIGINT) AS v2_nano
    FROM agg
    """


@_register("cramers_v2_segments", _cv2_sql(tx.DUCK))
def q_cramers_v2_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V^2 (1946) association strength of the market-segment x
    nation contingency table - the [0,1]-normalized effect size the
    raw chi^2 (distribution_drift_chisq's statistic) cannot give
    because chi^2 grows with n: V^2 = chi^2 / (n * (min(r,c) - 1)).

    Determinism: chi^2 = n * sum_cells O^2/(R_i C_j) - n avoids
    expected-count rationals entirely; each OBSERVED cell floors once
    to micro (<= r*c = 125 documented per-cell floors - empty cells
    contribute exactly 0 to the O^2 sum and cancel in the -n term);
    V^2 floors once more to nano.  128-bit ceiling: 1e6 * n * o^2
    ~ 1e6 * n^3 saturates ~5e10 customers (ANSI/HUGEINT loud failure).
    Degenerate 1-row/1-col tables report v2_nano = 0 (guarded, both
    dialects).

    Scale: one groupBy to the domain-bounded 5 x 25 cell grid; margins
    via bounded-grid windows partitioned by row/column; one 1-row
    aggregate after.  The count(DISTINCT) window on the bounded cell
    frame is the adjudicated bounded single-partition pattern."""
    cust = load_table(spark, "customer", sf_dir)
    cust.createOrReplaceTempView("customer")
    return spark.sql(_cv2_sql(tx.SPARK))
