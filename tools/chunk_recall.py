"""Measure mod-chunk pair RECALL on the synth decade (ADVICE r10).

The mod-chunk cap (operators/chunking.py) bounds in-block all-pairs work
to O(N·CHUNK); once a block exceeds the cap (nch > 1 — only on the
synthetic >=sf1.0 decades locally, but the normal state at cluster
scale) a true pair survives only when both ids hash into the same
residue cell.  The oracle mirrors the arithmetic, so hash-parity CANNOT
see this loss — it must be measured against the unchunked ground truth
and REPORTED (APPROX_PAST_CAP in tools/scaling_check.py / SCALING.json,
'mod-chunk recall' in SCALE.md).

Method — exact, at sf0.1-sized compute, no quadratic synth run:

1. Ground truth at sf0.1 (every block under the cap) via the unchunked
   in-block join in DuckDB — the same expressions the oracles use, so
   this IS the result set both engines produce there.
2. The synth generator replicates sf0.1 with similarity-preserving,
   cross-replica-decorrelating transforms (caesar cipher per replica for
   text — a bijection on char n-grams, so within-replica Jaccard is
   IDENTICAL; an isometry per replica for embeddings — within-replica
   cosine identical).  Hence the synth true-pair set is exactly the
   sf0.1 set replicated with shifted ids: (a + i*SHIFT, b + i*SHIFT).
   This invariant is not assumed: step 3 re-derives replica 1's pairs
   from the synth parquet itself and asserts set equality, and
   tests/test_sf_synth.py pins no-cross-replica collisions.
3. Validate: run the unchunked join restricted to replica 1's rows of
   the synth tables; assert it equals the projected sf0.1 set.
4. Recall: the chunked result is exactly the co-chunked subset of true
   pairs (chunking only restricts candidates; scoring is unchanged), so
   recall = fraction of projected true pairs with equal
   seeded_hash64(id) % nch, with nch from the synth per-block rollup —
   pure integer arithmetic, evaluated in DuckDB with the very
   tx.chunk_of expression the oracles embed.

Reported per family: n_true pairs, n_survived, recall, per-block nch,
and the analytic expectation 1/nch for comparison.  record_linkage is
exempt by construction (both registers chunk the SHARED s_suppkey —
ground-truth pairs always co-chunked, recall 1.0 at any nch).

semantic_dedup_prune cannot use the replica projection (its k-means
cluster blocks mix replicas), so ``--semdedup`` measures its PRUNE-SET
recall directly in Spark: run the registered query twice on the synth
dir — shipped cap vs a cap larger than any cluster (exact) — and ratio
the drop counts.  The chunked drop-set is provably a subset of the
exact one (chunking only removes candidate pairs, and a vector is
dropped iff some lower-id near-dup shares its cell), so the count
ratio IS set recall.  Measured r10: 0.348 at cap 512 on sf1.0synth —
above the 1/nch pair law because a vector drops if ANY of its near-dup
predecessors co-chunks (1-(1-1/nch)^d).

Usage:
    python tools/chunk_recall.py [--sf-dir /root/testdata/sf0.1]
        [--synth-dir .scratch/sf1.0synth] [--replicas 10] [--semdedup]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pedri_analysis_spark.functions import textexpr as tx  # noqa: E402
from pedri_analysis_spark.operators import chunking as chk  # noqa: E402
from pedri_analysis_spark.plans.dedup_queries import (  # noqa: E402
    NGRAM_CHUNK,
    NGRAM_JACCARD_T,
)
from pedri_analysis_spark.plans.similarity_queries import (  # noqa: E402
    EMBDUP_CHUNK,
    NEARDUP_T,
    _dcos,
)

DOC_SHIFT = 10_000_000  # tools/gen_sf_synth.py constants
VEC_SHIFT = 10_000_000


def _ngram_pairs_sql(doc_rel: str) -> str:
    """Unchunked in-block ngram-Jaccard pair set over ``doc_rel``."""
    ng = tx.char_ngrams(tx.DUCK, "text", 3)
    return f"""
    WITH g AS (
      SELECT doc_id, lang, n_chars // 100 AS bucket, {ng} AS ng FROM {doc_rel}
    )
    SELECT a.doc_id AS a, b.doc_id AS b
    FROM g a JOIN g b
      ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ng, b.ng))::DOUBLE / len(list_distinct(a.ng || b.ng))
          >= {NGRAM_JACCARD_T}
    """


def _emb_pairs_sql(emb_rel: str) -> str:
    """Unchunked in-label cosine near-dup pair set over ``emb_rel``."""
    return f"""
    SELECT a.vec_id AS a, b.vec_id AS b
    FROM {emb_rel} a JOIN {emb_rel} b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_dcos('a.embedding', 'b.embedding')} >= {NEARDUP_T}
    """


def _family(
    con,
    name: str,
    base_pairs_sql: str,
    rep1_pairs_sql: str,
    shift: int,
    replicas: int,
    block_rollup_sql: str,
    true_block_sql: str,
    cap: int,
) -> dict:
    con.execute(f"CREATE OR REPLACE TABLE base_pairs AS {base_pairs_sql}")
    n_base = con.sql("SELECT count(*) FROM base_pairs").fetchone()[0]

    # --- step 3: validate the replica projection on replica 1 ---------
    got = {tuple(r) for r in con.sql(rep1_pairs_sql).fetchall()}
    want = {
        (a + shift, b + shift)
        for a, b in con.sql("SELECT a, b FROM base_pairs").fetchall()
    }
    assert got == want, (
        f"{name}: replica-1 pair set diverges from the sf0.1 projection "
        f"({len(got)} vs {len(want)}) — the generator invariant broke; "
        f"recall numbers would be meaningless"
    )

    # --- step 4: co-chunk survival over all replicas -------------------
    con.execute(f"CREATE OR REPLACE TABLE bc AS {block_rollup_sql}")
    chunk_a = tx.chunk_of(tx.DUCK, "t.sa", "t.nch")
    chunk_b = tx.chunk_of(tx.DUCK, "t.sb", "t.nch")
    survived, n_true = con.sql(
        f"""
        WITH r AS (SELECT unnest(range({replicas})) AS i),
        t AS (
          SELECT p.a + r.i * {shift} AS sa, p.b + r.i * {shift} AS sb, bc.nch
          FROM base_pairs p
          CROSS JOIN r
          JOIN ({true_block_sql}) tb ON tb.a = p.a
          JOIN bc ON bc.blk = tb.blk
        )
        SELECT sum(CASE WHEN {chunk_a} = {chunk_b} THEN 1 ELSE 0 END)::BIGINT,
               count(*)::BIGINT
        FROM t
        """
    ).fetchone()
    nches = sorted(r[0] for r in con.sql("SELECT nch FROM bc").fetchall())
    # analytic expectation: true pairs live in blocks; weight 1/nch by
    # the block of each pair (already joined above) — recompute exactly
    expected = con.sql(
        f"""
        WITH r AS (SELECT unnest(range({replicas})) AS i)
        SELECT avg(1.0 / bc.nch) FROM base_pairs p
        CROSS JOIN r
        JOIN ({true_block_sql}) tb ON tb.a = p.a
        JOIN bc ON bc.blk = tb.blk
        """
    ).fetchone()[0]
    return {
        "family": name,
        "cap": cap,
        "n_true_pairs_synth": int(n_true),
        "n_survived": int(survived),
        "recall": round(survived / n_true, 4) if n_true else None,
        "expected_1_over_nch": round(float(expected), 4),
        "nch_per_block": nches,
        "n_true_pairs_sf01": int(n_base),
    }


def annlsh_pair_recall(synth_dir: str, forced_cap: int = 16) -> dict:
    """Pair recall of the capped ann_lsh_near_dups vs the uncapped run on
    the same synth dir.  Under the r11 adaptive k/L the SHIPPED cap never
    engages at any measured scale (max bucket occupancy 40 at sf1.0synth
    / 54 at sf2.0synth vs ANN_CHUNK=64 — occupancy is pinned near
    OCC_TARGET by construction), so the shipped-cap run equals the exact
    run; this measures the cap's recall behaviour by FORCING it small
    enough to engage (the regime a pathological >cap hot cluster would
    hit at cluster scale).  The capped candidate set is a subset of the
    uncapped one (chunking only removes candidates and scoring is
    unchanged), so recall = the count ratio."""
    from pedri_analysis_spark.plans import similarity_queries as sq
    from pedri_analysis_spark.session import get_spark

    spark = get_spark(app_name="chunk-recall-annlsh")

    def n_pairs(cap: int) -> int:
        orig = sq.ANN_CHUNK
        sq.ANN_CHUNK = cap
        try:
            return sq.QUERIES["ann_lsh_near_dups"](spark, synth_dir).count()
        finally:
            sq.ANN_CHUNK = orig

    exact = n_pairs(1 << 40)
    shipped = n_pairs(sq.ANN_CHUNK)
    forced = n_pairs(forced_cap)
    return {
        "family": "ann_lsh_near_dups",
        "cap": sq.ANN_CHUNK,
        "n_pairs_exact": int(exact),
        "n_pairs_shipped_cap": int(shipped),
        "shipped_cap_engages": shipped != exact,
        "forced_cap": forced_cap,
        "n_pairs_forced_cap": int(forced),
        "forced_cap_recall": round(forced / exact, 4) if exact else None,
    }


def fellegi_sunter_recall(synth_dir: str, forced_cap: int = 16) -> dict:
    """Match- and possible-class recall of the capped
    fellegi_sunter_parts (draft_r12) vs the uncapped run on the same
    synth dir.  Since the r12 field-agreement-blocking redesign the
    uncapped blocked run IS the ground truth for both FS classes
    (recall 1.0 by construction — tests/test_draft_r12.py), and the
    pass blocks are 25-100x finer than the old (type, noun) block, so
    the shipped cap no longer engages at the synth decade; like
    ann_lsh, this measures the FORCED cap (per-pass nch > 1) so the
    number reported for APPROX_PAST_CAP is the cap actually biting.
    The capped candidate set is a subset (per-pass chunking only
    removes pairs; scoring and the cross-pass DISTINCT unchanged), so
    the count ratios are set recalls."""
    from pedri_analysis_spark.plans import draft_r12 as d12
    from pedri_analysis_spark.session import get_spark

    spark = get_spark(app_name="chunk-recall-fs")

    def totals(cap: int) -> tuple[int, int, int]:
        orig = d12.FS_CHUNK
        d12.FS_CHUNK = cap
        try:
            rows = d12.QUERIES["fellegi_sunter_parts"](spark, synth_dir).collect()
        finally:
            d12.FS_CHUNK = orig
        return (
            sum(r["n_pairs"] for r in rows),
            sum(r["n_match"] for r in rows),
            sum(r["n_possible"] for r in rows),
        )

    pairs_s, match_s, poss_s = totals(d12.FS_CHUNK)
    pairs_f, match_f, poss_f = totals(forced_cap)
    pairs_u, match_u, poss_u = totals(1 << 40)
    return {
        "family": "fellegi_sunter_parts",
        "cap": d12.FS_CHUNK,
        "n_pairs_shipped_cap": int(pairs_s),
        "n_pairs_exact": int(pairs_u),
        "shipped_cap_engages": pairs_s != pairs_u,
        "shipped_match_recall": round(match_s / match_u, 4) if match_u else None,
        "n_possible_shipped_cap": int(poss_s),
        "shipped_possible_recall": round(poss_s / poss_u, 4) if poss_u else None,
        "forced_cap": forced_cap,
        "n_pairs_forced_cap": int(pairs_f),
        "forced_pair_recall": round(pairs_f / pairs_u, 4) if pairs_u else None,
        "n_match_exact": int(match_u),
        "n_match_forced_cap": int(match_f),
        "forced_match_recall": round(match_f / match_u, 4) if match_u else None,
        "n_possible_exact": int(poss_u),
        "n_possible_forced_cap": int(poss_f),
        "forced_possible_recall": round(poss_f / poss_u, 4) if poss_u else None,
    }


def semdedup_prune_recall(synth_dir: str) -> dict:
    """Prune-set recall of the chunked SemDeDup vs the exact (uncapped)
    run on the same synth dir — see module docstring."""
    from pedri_analysis_spark.plans import similarity_queries as sq
    from pedri_analysis_spark.session import get_spark

    spark = get_spark(app_name="chunk-recall-semdedup")

    def dropped(cap: int) -> dict:
        orig = sq.SEMDEDUP_CHUNK
        sq.SEMDEDUP_CHUNK = cap
        try:
            rows = sq.QUERIES["semantic_dedup_prune"](spark, synth_dir).collect()
        finally:
            sq.SEMDEDUP_CHUNK = orig
        return {r["cluster"]: r["n_dropped"] for r in rows}

    shipped = dropped(sq.SEMDEDUP_CHUNK)
    exact = dropped(1 << 40)
    nd_c, nd_u = sum(shipped.values()), sum(exact.values())
    return {
        "family": "semantic_dedup_prune",
        "cap": sq.SEMDEDUP_CHUNK,
        "n_dropped_chunked": int(nd_c),
        "n_dropped_exact": int(nd_u),
        "prune_set_recall": round(nd_c / nd_u, 4) if nd_u else None,
    }


def containment_recall(synth_dir: str, forced_cap: int = 16) -> dict:
    """Pair recall of containment_near_dups (draft_r13) under the shared
    MinHash-LSH bucket cap vs the uncapped run.  The query inherits
    dedup_queries.MAX_BUCKET (the minhash family's drop-cap), so this
    mirrors annlsh_pair_recall: measure whether the SHIPPED cap engages
    at the synth decade, then force the cap small to measure the
    drop-cap's recall in the regime a hot cluster would hit.  Capped
    candidates are a subset (the cap only drops buckets; the verify is
    unchanged), so count ratios are set recalls."""
    from pedri_analysis_spark.plans import dedup_queries as dq
    from pedri_analysis_spark.plans import draft_r13 as d13
    from pedri_analysis_spark.session import get_spark

    spark = get_spark(app_name="chunk-recall-containment")

    def n_pairs(cap: int) -> int:
        # cap passed EXPLICITLY (ADVICE r11) — no module-global
        # monkeypatch whose effect depends on the query's import timing
        return d13.q_containment_near_dups(
            spark, synth_dir, max_bucket=cap
        ).count()

    exact = n_pairs(1 << 40)
    shipped = n_pairs(dq.MAX_BUCKET)
    forced = n_pairs(forced_cap)
    return {
        "family": "containment_near_dups",
        "cap": dq.MAX_BUCKET,
        "n_pairs_exact": int(exact),
        "n_pairs_shipped_cap": int(shipped),
        "shipped_cap_engages": shipped != exact,
        "shipped_cap_recall": round(shipped / exact, 4) if exact else None,
        "forced_cap": forced_cap,
        "n_pairs_forced_cap": int(forced),
        "forced_cap_recall": round(forced / exact, 4) if exact else None,
    }




def winnowing_capmass(synth_dir: str, forced_cap: int = 8) -> dict:
    """Shipped- and forced-cap retention of winnowing_fingerprints'
    top-k shared-fingerprint MASS (draft_r15).  The drop cap removes
    over-full fingerprint postings entirely, and dropped buckets are by
    construction the MOST-shared fingerprints, so the cap degrades the
    MOSS report toward rarer overlaps — the retained fraction of the
    uncapped top-k shared mass is the honest quality number (a straight
    pair-set recall would be ill-defined on a top-k report)."""
    from pedri_analysis_spark.plans import dedup_queries as dq
    from pedri_analysis_spark.plans import draft_r15 as d15
    from pedri_analysis_spark.session import get_spark

    spark = get_spark(app_name="chunk-recall-winnow")

    def mass(cap: int) -> int:
        rows = d15.q_winnowing_fingerprints(
            spark, synth_dir, max_bucket=cap
        ).collect()
        return sum(r["n_shared"] for r in rows)

    exact = mass(1 << 40)
    shipped = mass(dq.MAX_BUCKET)
    forced = mass(forced_cap)
    return {
        "family": "winnowing_fingerprints",
        "cap": dq.MAX_BUCKET,
        "topk_mass_exact": int(exact),
        "topk_mass_shipped_cap": int(shipped),
        "shipped_cap_engages": shipped != exact,
        "forced_cap": forced_cap,
        "topk_mass_forced_cap": int(forced),
        "forced_cap_mass_retention": round(forced / exact, 4) if exact else None,
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument(
        "--synth-dir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1.0synth",
        ),
    )
    p.add_argument("--replicas", type=int, default=10)
    p.add_argument(
        "--semdedup",
        action="store_true",
        help="also measure semantic_dedup_prune's prune-set recall "
        "(starts a Spark session; ~2 min)",
    )
    p.add_argument(
        "--annlsh",
        action="store_true",
        help="also measure ann_lsh_near_dups' capped-vs-exact pair "
        "recall (starts a Spark session)",
    )
    p.add_argument(
        "--fs",
        action="store_true",
        help="also measure fellegi_sunter_parts' capped-vs-exact pair "
        "and match recall (starts a Spark session)",
    )
    p.add_argument(
        "--winnow",
        action="store_true",
        help="also measure winnowing_fingerprints' shipped/forced-cap "
        "top-k shared-mass retention (starts a Spark session)",
    )
    p.add_argument(
        "--containment",
        action="store_true",
        help="also measure containment_near_dups' capped-vs-exact pair "
        "recall under the shared MinHash bucket cap (starts a Spark "
        "session)",
    )
    a = p.parse_args()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{a.sf_dir}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{a.sf_dir}/embeddings.parquet')"
    )
    con.execute(
        f"CREATE VIEW sdocs AS SELECT * FROM "
        f"read_parquet('{a.synth_dir}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW semb AS SELECT * FROM "
        f"read_parquet('{a.synth_dir}/embeddings.parquet')"
    )

    results = []

    # n-gram Jaccard: block key (lang, bucket) — fold into one blk string
    # so the survival join is single-key
    results.append(
        _family(
            con,
            "ngram_jaccard_near_dups",
            _ngram_pairs_sql("documents"),
            _ngram_pairs_sql(
                f"(SELECT * FROM sdocs WHERE doc_id >= {DOC_SHIFT} "
                f"AND doc_id < {2 * DOC_SHIFT})"
            ),
            DOC_SHIFT,
            a.replicas,
            block_rollup_sql=(
                f"SELECT lang || '/' || (n_chars // 100) AS blk, "
                f"{chk.nch_sql(NGRAM_CHUNK)} AS nch FROM sdocs GROUP BY 1"
            ),
            true_block_sql=(
                "SELECT doc_id AS a, lang || '/' || (n_chars // 100) AS blk "
                "FROM documents"
            ),
            cap=NGRAM_CHUNK,
        )
    )

    results.append(
        _family(
            con,
            "embedding_near_dups",
            _emb_pairs_sql("embeddings"),
            _emb_pairs_sql(
                f"(SELECT * FROM semb WHERE vec_id >= {VEC_SHIFT} "
                f"AND vec_id < {2 * VEC_SHIFT})"
            ),
            VEC_SHIFT,
            a.replicas,
            block_rollup_sql=(
                f"SELECT label::VARCHAR AS blk, {chk.nch_sql(EMBDUP_CHUNK)} AS nch "
                f"FROM semb GROUP BY 1"
            ),
            true_block_sql=(
                "SELECT vec_id AS a, label::VARCHAR AS blk FROM embeddings"
            ),
            cap=EMBDUP_CHUNK,
        )
    )

    if a.semdedup:
        results.append(semdedup_prune_recall(a.synth_dir))
    if a.annlsh:
        results.append(annlsh_pair_recall(a.synth_dir))
    if a.fs:
        results.append(fellegi_sunter_recall(a.synth_dir))
    if a.containment:
        results.append(containment_recall(a.synth_dir))
    if a.winnow:
        results.append(winnowing_capmass(a.synth_dir))

    for r in results:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
