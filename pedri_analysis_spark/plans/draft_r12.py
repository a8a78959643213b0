"""Draft queries staged for r12 registration (NOT in the registry).

Staged-draft protocol (established r10→r11): the module is fully
implemented, oracle-paired, plan-invariant-pinned and proven green by
tests/test_draft_r12.py under the driver-identical comparison THIS
round; registering next round is one line in ``registry._modules``.
Keeping them out of the r11 registry preserves the verification
window's drain slots (10 rewritten-since-green re-proofs + 6 r11 drafts
+ 34 stale re-proofs already fill it).

Every query follows the determinism discipline (integer / DECIMAL
arithmetic, hash-seeded pseudo-randomness, total orders on every rank,
probability quantization via integer cross-multiplication — never
libm) and the scale discipline (pair stages blocked + mod-chunk-capped
or domain-bounded; iterative algorithms with fixed unrolled oracles;
single-partition frames only when domain-bounded).

Families and the public designs they implement:
- importance_resampling_select — hashed-ngram importance weighting for
  training-data selection (DSIR, Xie et al. 2023, arXiv:2302.03169),
  with the log-likelihood-ratio replaced by an integer-quantized
  likelihood RATIO (monotone per feature; see docstring).
- kcenter_coreset — greedy k-center / farthest-point traversal
  (Gonzalez 1985), the classic diverse-subset coreset selector.
- distinct_ngram_diversity — distinct-n diversity ratios per source
  (the Self-BLEU-lite corpus-diversity audit).
- fellegi_sunter_parts — Fellegi–Sunter probabilistic record linkage
  (JASA 1969) with literal integer milli-log-odds field weights.
- kcore_decomposition — k-core peeling (Seidman 1983) on the
  co-purchase graph, fixed unrolled iterations like PageRank/LPA.
- l_diversity_audit — l-diversity (Machanavajjhala et al. 2007), the
  companion to k_anonymity_report on the same QI ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pedri_analysis_spark.functions import textexpr as tx
from pedri_analysis_spark.operators import chunking as chk
from pedri_analysis_spark.operators import similarity as sim
from pedri_analysis_spark.operators.clustering import _dist2
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


def _r6_sql(e: str) -> str:
    # same floor-based 6dp rounding as operators.similarity.round6
    return f"floor(({e}) * 1000000 + 0.5) / 1000000"


# ---------------------------------------------------------------------------
# DSIR-style importance-resampling selection (hashed-bigram features)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed feature space (DSIR §2.2 uses hashed n-grams)
DSIR_TARGET_LANG = "en"  # the target distribution: English documents
DSIR_SELECT_K = 200  # docs selected by importance rank


def _ngrams_pos(dialect: str, toks: str, n: int) -> str:
    """All length-n token windows as space-joined strings — EVERY
    occurrence, not the deduped shingle set (occurrence counts are the
    whole point for frequency features)."""
    if n == 1:
        return toks
    if dialect == tx.SPARK:
        parts = ", ".join(f"{toks}[i + {j}]" for j in range(n))
        return (
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(0, size({toks}) - {n}), "
            f"i -> concat_ws(' ', {parts})) "
            f"ELSE array() END"
        )
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> {parts}) "
        f"ELSE [] END"
    )


@_register(
    "importance_resampling_select",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, source, {tx.tokens(tx.DUCK, 'text')} AS t
      FROM documents
    ),
    fb AS MATERIALIZED (
      SELECT tok.doc_id, tok.lang,
             {tx.seeded_hash64(tx.DUCK, 'u.bg', 'dsir')} % {DSIR_BUCKETS} AS b
      FROM tok, unnest({_ngrams_pos(tx.DUCK, 't', 2)}) AS u(bg)
    ),
    tcnt AS (
      SELECT b, count(*)::BIGINT AS ct FROM fb
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
    ),
    ocnt AS (
      SELECT b, count(*)::BIGINT AS co FROM fb
      WHERE lang <> '{DSIR_TARGET_LANG}' GROUP BY b
    ),
    ratio AS (
      SELECT bk.b,
             ((coalesce(t.ct, 0) + 1) * 1000000)
               // (coalesce(o.co, 0) + 1) AS r_micro
      FROM (SELECT unnest(range({DSIR_BUCKETS})) AS b) bk
      LEFT JOIN tcnt t ON t.b = bk.b
      LEFT JOIN ocnt o ON o.b = bk.b
    ),
    score AS (
      SELECT f.doc_id, sum(r.r_micro)::BIGINT AS score
      FROM fb f JOIN ratio r ON r.b = f.b GROUP BY f.doc_id
    ),
    allsc AS (
      SELECT d.doc_id, d.source, coalesce(s.score, 0)::BIGINT AS score
      FROM documents d LEFT JOIN score s ON s.doc_id = d.doc_id
    ),
    sel AS (
      SELECT source FROM (
        SELECT source,
               row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
        FROM allsc
      ) WHERE rn <= {DSIR_SELECT_K}
    ),
    selc AS (SELECT source, count(*)::BIGINT AS n_sel FROM sel GROUP BY source)
    SELECT a.source,
           count(*)::BIGINT AS n_docs,
           coalesce(min(sc.n_sel), 0)::BIGINT AS n_selected,
           ((coalesce(min(sc.n_sel), 0) * 1000000) // {DSIR_SELECT_K})::BIGINT
             AS selection_share_ppm
    FROM allsc a LEFT JOIN selc sc ON sc.source = a.source
    GROUP BY a.source
    """,
)
def q_importance_resampling_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style training-data selection (Xie et al. 2023): model the
    target distribution ({DSIR_TARGET_LANG} docs) and the raw-rest
    distribution as multinomials over {DSIR_BUCKETS} hashed-bigram
    buckets, score every document by its feature-weighted importance,
    select the top {DSIR_SELECT_K} by (score DESC, doc_id), and report
    each source's share of the selection — the per-source mixture the
    resampling induces.

    Determinism (the honest deviation from the paper): DSIR's log
    likelihood-ratio needs log(), whose last-ulp behaviour differs
    across libm implementations, so the cross-engine contract scores
    with the integer-quantized likelihood RATIO instead —
    r_micro(b) = ((cnt_target(b)+1) * 10^6) // (cnt_rest(b)+1), pure
    BIGINT cross-multiplication (Laplace-smoothed), summed over the
    document's bigram occurrences.  Monotone in each feature's
    likelihood ratio; heavier-tailed than the log form (stated, not
    hidden).  Ranks break ties on doc_id.

    Scale: one explode to (doc, bucket) rows; two bucket-domain
    aggregations (map-side combined, {DSIR_BUCKETS} rows out); the
    ratio table is bucket-domain-bounded and BROADCAST back onto the
    feature stream; the top-k is TakeOrderedAndProject (never a global
    sort); the final rollup is |sources| rows.  Nothing pairwise,
    nothing corpus-sized on one partition."""
    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", F.expr(tx.tokens(tx.SPARK, "text")).alias("t")
    )
    fb = d.select(
        "doc_id",
        "lang",
        F.explode(F.expr(_ngrams_pos(tx.SPARK, "t", 2))).alias("bg"),
    ).select(
        "doc_id",
        "lang",
        (F.expr(tx.seeded_hash64(tx.SPARK, "bg", "dsir")) % DSIR_BUCKETS).alias("b"),
    )
    tcnt = (
        fb.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    )
    ocnt = (
        fb.filter(F.col("lang") != DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    ratio = (
        spark.range(DSIR_BUCKETS)
        .select(F.col("id").alias("b"))
        .join(tcnt, "b", "left")
        .join(ocnt, "b", "left")
        .select(
            "b",
            F.expr(
                "((coalesce(ct, 0) + 1) * 1000000) div (coalesce(co, 0) + 1)"
            ).alias("r_micro"),
        )
    )
    score = (
        fb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.sum("r_micro").cast("bigint").alias("score"))
    )
    allsc = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "source")
        .join(score, "doc_id", "left")
        .select(
            "doc_id", "source", F.coalesce("score", F.lit(0)).cast("bigint").alias("score")
        )
    )
    sel = (
        allsc.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(DSIR_SELECT_K)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sel"))
    )
    return (
        allsc.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .join(F.broadcast(sel), "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_sel", F.lit(0)).cast("bigint").alias("n_selected"),
            F.expr(
                f"CAST((coalesce(n_sel, 0) * 1000000) div {DSIR_SELECT_K} AS BIGINT)"
            ).alias("selection_share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset (farthest-point traversal)
# ---------------------------------------------------------------------------

KCENTER_K = 6
_D2_DUCK = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64), "
    "i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)"
    ")), (acc, v) -> acc + v)"
)


def _kcenter_oracle() -> str:
    r6 = _r6_sql

    def d2(a: str, b: str) -> str:
        return _D2_DUCK.format(a=a, b=b)

    # AS MATERIALIZED: each d_i is referenced by BOTH s_{i+1} and d_{i+1},
    # so letting DuckDB inline the chain would re-evaluate the distance
    # scans 2^k times (measured as an fd blow-up in the kcore oracle's
    # denser chain); materialization makes the unroll linear like the
    # engine's persisted loop
    ctes = [
        "c0 AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings "
        "ORDER BY vec_id LIMIT 1)",
        f"""d0 AS MATERIALIZED (
      SELECT e.vec_id, e.embedding, {d2('e.embedding', 'c.embedding')} AS md
      FROM embeddings e CROSS JOIN c0 c
    )""",
    ]
    rows = ["SELECT 0::BIGINT AS sel_round, vec_id, 0.0 AS min_d2_r6 FROM c0"]
    for i in range(1, KCENTER_K):
        prev_d = f"d{i - 1}"
        ctes.append(
            f"""s{i} AS MATERIALIZED (
      SELECT vec_id, embedding, md FROM {prev_d}
      ORDER BY md DESC, vec_id ASC LIMIT 1
    )"""
        )
        if i < KCENTER_K - 1:
            ctes.append(
                f"""d{i} AS MATERIALIZED (
      SELECT d.vec_id, d.embedding,
             least(d.md, {d2('d.embedding', 's.embedding')}) AS md
      FROM {prev_d} d CROSS JOIN s{i} s
    )"""
            )
        rows.append(
            f"SELECT {i}::BIGINT AS sel_round, vec_id, {r6('md')} AS min_d2_r6 "
            f"FROM s{i}"
        )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(rows)


@_register("kcenter_coreset", _kcenter_oracle())
def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985 farthest-point traversal,
    the classic 2-approximation): seed with the lowest-id vector, then
    {KCENTER_K}-1 times select the vector farthest from the selected
    set (argmax of min squared distance, ties to the lowest vec_id).
    Emits (round, vec_id, its coverage distance) — the diverse-subset
    selector an embedding-curation pipeline uses, and each round's
    min_d2 IS the coverage radius the next center removes.

    Determinism: distances accumulate dimensions in the oracle fold's
    exact order (the kmeans discipline — operators.clustering._dist2 vs
    the oracle's list_reduce), least() chains in iteration order, and
    the argmax's (md DESC, vec_id ASC) is a total order because the
    doubles are bit-identical across engines.

    Scale: the selected set is a k x dim driver-side model exactly like
    kmeans centroids — each iteration is one narrow map (min over <= k
    literal centers, no shuffle, no pair join) + one TakeOrdered(1);
    k driver-side collects of ONE tiny row each (k-bounded, never
    corpus-bounded).  The oracle unrolls the same {KCENTER_K}
    iterations as chained CTEs."""
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding").persist()
    first = emb.orderBy(F.asc("vec_id")).limit(1)
    c0 = first.collect()[0]
    centers = [list(c0["embedding"])]
    out = first.select(
        F.lit(0).cast("bigint").alias("sel_round"),
        "vec_id",
        F.lit(0.0).alias("min_d2_r6"),
    )
    md = _dist2("embedding", centers[0])
    for i in range(1, KCENTER_K):
        scored = emb.select("vec_id", "embedding", md.alias("md"))
        pick_frame = scored.orderBy(F.desc("md"), F.asc("vec_id")).limit(1)
        out = out.unionByName(
            pick_frame.select(
                F.lit(i).cast("bigint").alias("sel_round"),
                "vec_id",
                sim.round6(F.col("md")).alias("min_d2_r6"),
            )
        )
        if i < KCENTER_K - 1:
            pick = pick_frame.collect()[0]
            centers.append(list(pick["embedding"]))
            md = F.least(md, _dist2("embedding", centers[-1]))
    return out


# ---------------------------------------------------------------------------
# Distinct-n n-gram diversity per source (Self-BLEU-lite audit)
# ---------------------------------------------------------------------------


def _diversity_grams_sql(n: int) -> str:
    return f"""
      SELECT tok.source, {n} AS n, u.g
      FROM tok, unnest({_ngrams_pos(tx.DUCK, 't', n)}) AS u(g)"""


@_register(
    "distinct_ngram_diversity",
    f"""
    WITH tok AS (
      SELECT source, {tx.tokens(tx.DUCK, 'text')} AS t FROM documents
    ),
    grams AS ({_diversity_grams_sql(1)}
      UNION ALL {_diversity_grams_sql(2)}
      UNION ALL {_diversity_grams_sql(3)}
    ),
    per_gram AS (
      SELECT source, n, g, count(*)::BIGINT AS c FROM grams GROUP BY 1, 2, 3
    )
    SELECT source, n::BIGINT AS n,
           sum(c)::BIGINT AS total_ngrams,
           count(*)::BIGINT AS distinct_ngrams,
           ((count(*) * 1000000) // sum(c))::BIGINT AS distinct_ppm
    FROM per_gram
    GROUP BY source, n
    """,
)
def q_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity ratios per source for n = 1, 2, 3 — the
    corpus-diversity audit (the distinct-n metric of Li et al. 2016,
    the cheap stand-in for Self-BLEU): a source whose trigram
    distinct-ratio collapses is template/boilerplate text, a prime
    curation-drop candidate.

    Scale: one explode per n unioned (flat maps, no shuffle), ONE
    (source, n, gram) hash aggregate with map-side combine — the
    classic two-level exact count-distinct shape, never a
    count(DISTINCT) over a corpus-wide single group — then a
    |sources| x 3 rollup.  Determinism: pure counting; ppm ratios are
    floor-divided integers."""
    tok = load_table(spark, "documents", sf_dir).select(
        "source", F.expr(tx.tokens(tx.SPARK, "text")).alias("t")
    )
    grams = None
    for n in (1, 2, 3):
        g = tok.select(
            "source",
            F.lit(n).cast("bigint").alias("n"),
            F.explode(F.expr(_ngrams_pos(tx.SPARK, "t", n))).alias("g"),
        )
        grams = g if grams is None else grams.unionByName(g)
    per_gram = grams.groupBy("source", "n", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return per_gram.groupBy("source", "n").agg(
        F.sum("c").cast("bigint").alias("total_ngrams"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_ngrams"),
        F.expr("CAST((count(*) * 1000000) div sum(c) AS BIGINT)").alias(
            "distinct_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Fellegi–Sunter probabilistic record linkage over parts
# ---------------------------------------------------------------------------

FS_CHUNK = 64  # mod-chunk pair-work cap, shared contract (operators/chunking)
# literal integer milli-log-odds per comparison field: the (m, u)
# probabilities of a trained FS model enter the score ONLY through these
# agreement/disagreement weights, so fixing them as literals (the same
# way Benford fixes its log10 constants) keeps the engine libm-free.
FS_W = {
    "brand": (1800, -900),
    "size": (1200, -700),
    "price": (1500, -800),
    "adj": (900, -400),
}
FS_T_MATCH = 2500  # >= : match
FS_T_POSSIBLE = 0  # >= : possible, else non-match
FS_SIZE_TOL = 2
FS_PRICE_TOL_CENTS = 500


def _fs_score(prefix_a: str, prefix_b: str) -> str:
    """The FS agreement score as one integer expression — identical text
    in both dialects (CASE/abs/comparison only)."""
    terms = [
        f"(CASE WHEN {prefix_a}brand = {prefix_b}brand "
        f"THEN {FS_W['brand'][0]} ELSE {FS_W['brand'][1]} END)",
        f"(CASE WHEN abs({prefix_a}size - {prefix_b}size) <= {FS_SIZE_TOL} "
        f"THEN {FS_W['size'][0]} ELSE {FS_W['size'][1]} END)",
        f"(CASE WHEN abs({prefix_a}cents - {prefix_b}cents) <= {FS_PRICE_TOL_CENTS} "
        f"THEN {FS_W['price'][0]} ELSE {FS_W['price'][1]} END)",
        f"(CASE WHEN {prefix_a}adj = {prefix_b}adj "
        f"THEN {FS_W['adj'][0]} ELSE {FS_W['adj'][1]} END)",
    ]
    return "(" + " + ".join(terms) + ")"


def _fs_oracle() -> str:
    return f"""
    WITH reg AS (
      SELECT p_partkey AS pk, p_type AS ptype,
             split_part(p_name, ' ', 2) AS noun,
             split_part(p_name, ' ', 1) AS adj,
             p_brand AS brand, p_size AS size,
             CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM part
    ),
    bc AS (
      SELECT ptype, noun, {chk.nch_sql(FS_CHUNK)} AS nch
      FROM reg GROUP BY ptype, noun
    ),
    chunked AS (
      SELECT r.*, {tx.chunk_of(tx.DUCK, 'r.pk', 'bc.nch')} AS chunk
      FROM reg r JOIN bc ON r.ptype = bc.ptype AND r.noun = bc.noun
    ),
    scored AS (
      SELECT a.ptype,
             {_fs_score('a.', 'b.')} AS score
      FROM chunked a JOIN chunked b
        ON a.ptype = b.ptype AND a.noun = b.noun AND a.chunk = b.chunk
       AND a.pk < b.pk
    )
    SELECT ptype,
           count(*)::BIGINT AS n_pairs,
           sum(CASE WHEN score >= {FS_T_MATCH} THEN 1 ELSE 0 END)::BIGINT
             AS n_match,
           sum(CASE WHEN score >= {FS_T_POSSIBLE} AND score < {FS_T_MATCH}
                    THEN 1 ELSE 0 END)::BIGINT AS n_possible,
           sum(CASE WHEN score < {FS_T_POSSIBLE} THEN 1 ELSE 0 END)::BIGINT
             AS n_nonmatch
    FROM scored
    GROUP BY ptype
    """


@_register("fellegi_sunter_parts", _fs_oracle())
def q_fellegi_sunter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage (JASA 1969) over the
    part register: candidate pairs from (type, name-noun) blocks score
    each comparison field with literal agreement/disagreement
    milli-log-odds weights (brand equality, size within {FS_SIZE_TOL},
    price within {FS_PRICE_TOL_CENTS} cents, adjective equality) and
    the summed score classifies match / possible / non-match per the
    two FS thresholds — reported per part type.

    Determinism: weights are literals (a trained model's m/u
    probabilities enter only through them — the Benford constant
    discipline), prices are exact integer cents, comparisons and CASE
    sums are pure integers.

    Scale: blocks are corpus-fraction, so the in-block all-pairs join
    takes the shared mod-chunk cap (FS_CHUNK={FS_CHUNK},
    operators/chunking.py): nch == 1 at every real SF (bit-identical
    unchunked plan); past the cap the query is APPROXIMATE per the
    shared contract (a true pair whose ids land in different residue
    cells is not scored) — the forced-cap branch is cross-engine-proven
    in tests/test_draft_r12.py."""
    reg = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("pk"),
        F.col("p_type").alias("ptype"),
        F.expr("split_part(p_name, ' ', 2)").alias("noun"),
        F.expr("split_part(p_name, ' ', 1)").alias("adj"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
        F.expr("CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    chunked = chk.mod_chunk(reg, ["ptype", "noun"], "pk", FS_CHUNK)
    a = chunked.select(
        F.col("pk").alias("a_pk"), "ptype", "noun", "chunk",
        F.col("adj").alias("a_adj"), F.col("brand").alias("a_brand"),
        F.col("size").alias("a_size"), F.col("cents").alias("a_cents"),
    )
    b = chunked.select(
        F.col("pk").alias("b_pk"), "ptype", "noun", "chunk",
        F.col("adj").alias("b_adj"), F.col("brand").alias("b_brand"),
        F.col("size").alias("b_size"), F.col("cents").alias("b_cents"),
    )
    scored = (
        a.join(b, ["ptype", "noun", "chunk"])
        .filter(F.col("a_pk") < F.col("b_pk"))
        .select("ptype", F.expr(_fs_score("a_", "b_")).alias("score"))
    )
    return scored.groupBy("ptype").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.expr(f"CASE WHEN score >= {FS_T_MATCH} THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_match"),
        F.sum(
            F.expr(
                f"CASE WHEN score >= {FS_T_POSSIBLE} AND score < {FS_T_MATCH} "
                f"THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_possible"),
        F.sum(F.expr(f"CASE WHEN score < {FS_T_POSSIBLE} THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_nonmatch"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition of the co-purchase graph (fixed peeling rounds)
# ---------------------------------------------------------------------------

KCORE_K = 2
KCORE_ITERS = 4  # a fixed PREFIX of the peel, the PageRank discipline —
# NOT a convergence claim: sf0.001 is converged from round 1, sf0.01 by
# round 4, sf0.1's removals still shrink geometrically (4855, 929, 116,
# 15) — the report states per-round removals so the reader sees exactly
# how far the peel got; a fixpoint run just raises this constant


def _kcore_oracle() -> str:
    from pedri_analysis_spark.plans.resolution_queries import _copurchase_edges_sql

    # AS MATERIALIZED throughout: e_i / v_i are each referenced several
    # times (degree rollup, survivor joins, report counts) — inlined, the
    # unroll re-expands the whole prefix per reference and the scan tree
    # grows exponentially (observed: DuckDB fd exhaustion at 5 rounds);
    # materialized, each round is evaluated once, like the engine's
    # per-round persist
    ctes = [
        _copurchase_edges_sql().strip(),
        "e0 AS MATERIALIZED (SELECT pa, pb FROM e)",
        "v0 AS MATERIALIZED (SELECT pa AS v FROM e0 UNION SELECT pb AS v FROM e0)",
    ]
    rows = []
    for i in range(KCORE_ITERS):
        ctes.append(
            f"""deg{i} AS MATERIALIZED (
      SELECT v, count(*)::BIGINT AS deg FROM (
        SELECT pa AS v FROM e{i} UNION ALL SELECT pb AS v FROM e{i}
      ) GROUP BY v
    )"""
        )
        ctes.append(
            f"""v{i + 1} AS MATERIALIZED (
      SELECT n.v FROM v{i} n JOIN deg{i} d ON d.v = n.v AND d.deg >= {KCORE_K}
    )"""
        )
        ctes.append(
            f"""e{i + 1} AS MATERIALIZED (
      SELECT e.pa, e.pb FROM e{i} e
      JOIN v{i + 1} ka ON e.pa = ka.v
      JOIN v{i + 1} kb ON e.pb = kb.v
    )"""
        )
        rows.append(
            f"""SELECT {i + 1}::BIGINT AS iter,
           (SELECT count(*) FROM v{i}) - (SELECT count(*) FROM v{i + 1})
             AS n_removed,
           (SELECT count(*) FROM v{i + 1})::BIGINT AS n_nodes,
           (SELECT count(*) FROM e{i + 1})::BIGINT AS n_edges"""
        )
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(rows)
    )


@_register("kcore_decomposition", _kcore_oracle())
def q_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core peeling of the co-purchase graph (Seidman 1983):
    each round removes every node whose CURRENT degree is below
    {KCORE_K} and the edges touching it, reporting (round, removed,
    surviving nodes, surviving edges).  The k-core is the standard
    spam/fringe screen on behaviour graphs — fringe parts peel off,
    the dense co-purchase core survives.  {KCORE_ITERS} fixed rounds,
    the PageRank/LPA discipline (a stated PREFIX of the peel, not a
    convergence claim — per-round removal counts show how far it got),
    and the oracle unrolls the SAME rounds as chained MATERIALIZED
    CTEs so the comparison is bit-exact rather than 'until
    convergence' (which could differ between engines only by
    iteration accounting, never by math).

    Scale: degrees are one map-side-combined aggregate per round over
    the CURRENT edge list (a single explode, so the edge frame enters
    the degree plan once); survivor filtering is two hash semi-joins on
    node id.  Per-round frames are localCheckpoint'ed — the DELIBERATE
    opposite of the pagerank/LPA/BFS persist decision (r10 measured
    localCheckpoint killing pagerank 1.35→6.1 s by dropping stats and
    columnar cache): their lineage is LINEAR in the round (each frame
    feeds the next once), while the peel's is MULTIPLICATIVE — every
    round references its edge/survivor frames 3-4 times (degrees,
    two-sided edge filter, three report counts), so a persist-only
    chain grows the LOGICAL plan tree exponentially (measured: driver
    OOM in generateTreeString at 4 rounds on sf0.01).  What the
    LogicalRDD leaf costs pagerank it does not cost here: at corpus
    scale both sides of the survivor join are corpus-sized node/edge
    lists, where the shuffle join a default-stat leaf forces is the
    strategy the planner would pick anyway.  The per-round report row
    crosses three 1-row counts (BNLJ-allowlisted, the
    bounded-build-side pattern)."""
    from pedri_analysis_spark.plans.resolution_queries import _copurchase_edges

    edges = (
        _copurchase_edges(spark, sf_dir)
        .select("pa", "pb")
        .repartition("pa")
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("pa").alias("v"))
        .union(edges.select(F.col("pb").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    out = None
    for i in range(KCORE_ITERS):
        deg = (
            edges.select(
                F.explode(F.array(F.col("pa"), F.col("pb"))).alias("v")
            )
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )
        keep = (
            nodes.join(deg, "v")
            .filter(F.col("deg") >= KCORE_K)
            .select("v")
            .localCheckpoint()
        )
        new_edges = (
            edges.join(keep.select(F.col("v").alias("pa")), "pa")
            .join(keep.select(F.col("v").alias("pb")), "pb")
            .select("pa", "pb")
            .repartition("pa")
            .localCheckpoint()
        )
        row = (
            nodes.agg(F.count(F.lit(1)).alias("n_before"))
            .crossJoin(keep.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes")))
            .crossJoin(
                new_edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
            )
            .select(
                F.lit(i + 1).cast("bigint").alias("iter"),
                (F.col("n_before") - F.col("n_nodes")).cast("bigint").alias(
                    "n_removed"
                ),
                "n_nodes",
                "n_edges",
            )
        )
        out = row if out is None else out.unionByName(row)
        nodes, edges = keep, new_edges
    return out


# ---------------------------------------------------------------------------
# l-diversity audit (companion to k_anonymity_report, same QI ladder)
# ---------------------------------------------------------------------------

L_DIV_MIN = 3  # a QI cell needs >= 3 distinct sensitive values


def _ldiv_level_sql(band: int) -> str:
    return f"""
      SELECT {band} AS band_width,
             count(*)::BIGINT AS n_cells,
             sum(CASE WHEN l < {L_DIV_MIN} THEN 1 ELSE 0 END)::BIGINT
               AS n_low_diversity_cells,
             sum(CASE WHEN l < {L_DIV_MIN} THEN n ELSE 0 END)::BIGINT
               AS n_rows_at_risk,
             min(l)::BIGINT AS min_l
      FROM (
        SELECT c_nationkey,
               (floor(c_acctbal / {band}))::BIGINT AS bal_band,
               count(DISTINCT c_mktsegment)::BIGINT AS l,
               count(*)::BIGINT AS n
        FROM customer
        GROUP BY 1, 2
      ) cells"""


@_register(
    "l_diversity_audit",
    f"""
    {_ldiv_level_sql(1000)}
    UNION ALL
    {_ldiv_level_sql(3000)}
    """,
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the attack
    k-anonymity misses: a cell can hold k rows that all share ONE
    sensitive value (here the market segment), so membership alone
    discloses it.  Per generalization rung (the k_anonymity_report
    ladder minus the sensitive attribute itself, which must never sit
    in the QI): cells below l = {L_DIV_MIN} distinct sensitive values,
    rows at risk, and the worst cell's l.

    Scale: one exact two-level count-distinct per rung — (QI, segment)
    pre-aggregate then QI rollup, cell count bounded by the QI domain —
    then a 1-row summary; rungs union.  Determinism: pure counting;
    floor(acctbal / band) is one IEEE division + floor on identical
    text."""
    c = load_table(spark, "customer", sf_dir)

    def level(band: int) -> DataFrame:
        cells = c.groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / band).cast("bigint").alias("bal_band"),
        ).agg(
            F.countDistinct("c_mktsegment").cast("bigint").alias("l"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        low = F.col("l") < L_DIV_MIN
        return cells.agg(
            F.lit(band).cast("bigint").alias("band_width"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum(F.when(low, 1).otherwise(0)).cast("bigint").alias(
                "n_low_diversity_cells"
            ),
            F.sum(F.when(low, F.col("n")).otherwise(0)).cast("bigint").alias(
                "n_rows_at_risk"
            ),
            F.min("l").cast("bigint").alias("min_l"),
        )

    return level(1000).unionByName(level(3000))
