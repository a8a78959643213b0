"""Property-based cross-engine parity: the textexpr builders must agree
between Spark and DuckDB on ARBITRARY input, not just the fixture corpus.
Hypothesis generates adversarial ASCII texts (empty strings, runs of
whitespace, repeated tokens, punctuation); each example evaluates the
dual-dialect expressions on both engines and compares:

- tokens: exact sequence equality;
- word shingles / char n-grams: set equality (dedup order is
  engine-specific by documented contract — see textexpr module note);
- seeded_hash64 / simhash: exact value equality (order-independent
  folds by construction).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pedri_analysis_spark.functions import textexpr as tx

# printable ASCII incl. whitespace runs; excludes quotes/backslash only to
# keep the focus on tokenizer behavior, not SQL literal escaping
_CHARS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t.,-_!?"
texts = st.lists(
    st.text(alphabet=_CHARS, min_size=0, max_size=60), min_size=1, max_size=12
)


def _spark_eval(spark, rows):
    df = spark.createDataFrame(list(enumerate(rows)), "i long, text string")
    toks = tx.tokens(tx.SPARK, "text")
    out = df.selectExpr(
        "i",
        f"{toks} AS toks",
        f"{tx.word_shingles(tx.SPARK, toks, 2)} AS sh2",
        f"{tx.char_ngrams(tx.SPARK, 'text', 3)} AS cg3",
        f"{tx.seeded_hash64(tx.SPARK, 'text', 'prop')} AS h",
        f"{tx.simhash_from_bitsums(tx.SPARK, f'({tx.simhash_bitsums(tx.SPARK, toks)})')} AS simh",
    ).collect()
    return {r.i: (list(r.toks), set(r.sh2), set(r.cg3), r.h, r.simh) for r in out}


def _duck_eval(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(rows)))
    toks = tx.tokens(tx.DUCK, "text")
    got = con.sql(
        f"""SELECT i, {toks} AS toks,
               {tx.word_shingles(tx.DUCK, toks, 2)} AS sh2,
               {tx.char_ngrams(tx.DUCK, 'text', 3)} AS cg3,
               {tx.seeded_hash64(tx.DUCK, 'text', 'prop')} AS h,
               {tx.simhash_from_bitsums(tx.DUCK, f'({tx.simhash_bitsums(tx.DUCK, toks)})')} AS simh
        FROM t"""
    ).fetchall()
    return {r[0]: (list(r[1]), set(r[2]), set(r[3]), r[4], r[5]) for r in got}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts)
def test_textexpr_builders_agree_cross_engine(spark_session_holder, rows):
    spark = spark_session_holder
    s = _spark_eval(spark, rows)
    d = _duck_eval(rows)
    assert s.keys() == d.keys()
    for i in s:
        st_, ss2, sc3, sh, ssim = s[i]
        dt_, ds2, dc3, dh, dsim = d[i]
        assert st_ == dt_, f"tokens diverge on {rows[i]!r}: {st_} vs {dt_}"
        assert ss2 == ds2, f"shingles diverge on {rows[i]!r}"
        assert sc3 == dc3, f"char-ngrams diverge on {rows[i]!r}"
        assert sh == dh, f"seeded_hash64 diverges on {rows[i]!r}"
        assert ssim == dsim, f"simhash diverges on {rows[i]!r}"


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    # hypothesis forbids function-scoped fixtures regenerating per example;
    # the session is module-scoped anyway — this just renames it out of
    # hypothesis' health-check scope
    return spark


# ---------------------------------------------------------------------------
# Mod-chunk arithmetic parity (r9; r10 switched the cell key to
# tx.chunk_of = seeded_hash64(id) % nch): four registered oracles
# (ngram_jaccard_near_dups, embedding_near_dups, semantic_dedup_prune,
# record_linkage_suppliers) rely on the HASHED residue and the ceil-div
# `(cnt + C-1) div C` / `// C` matching EXACTLY across engines for
# nonnegative ids and positive counts — pin it on arbitrary values, not
# just the fixtures.
# ---------------------------------------------------------------------------

chunk_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**40),  # id
        st.integers(min_value=1, max_value=2**20),  # block count
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=chunk_rows, cap=st.integers(min_value=1, max_value=4096))
def test_mod_chunk_arithmetic_matches_duckdb(spark, rows, cap):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "i long, id long, cnt long"
    )
    from pedri_analysis_spark.operators import chunking as chk

    s_nch = f"CAST((cnt + {cap - 1}) div {cap} AS BIGINT)"
    got_s = {
        r.i: (r.nch, r.chunk)
        for r in df.selectExpr(
            "i",
            f"{s_nch} AS nch",
            f"{tx.chunk_of(tx.SPARK, 'id', s_nch)} AS chunk",
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, id BIGINT, cnt BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, a, b) for i, (a, b) in enumerate(rows)],
    )
    d_nch = f"((cnt + {cap - 1}) // {cap})"
    got_d = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"""SELECT i, {d_nch} AS nch,
                   {tx.chunk_of(tx.DUCK, 'id', d_nch)} AS chunk FROM t"""
        ).fetchall()
    }
    assert got_s == got_d
    # the residue is always a valid cell index
    assert all(0 <= c < n for n, c in got_s.values())


@settings(max_examples=40, deadline=None)
@given(n=st.integers(min_value=0, max_value=2**40))
def test_lsh_params_python_matches_oracle_cte(n):
    """The adaptive-LSH (k, L) must be derived identically by the engine
    (plans.similarity_queries.lsh_params, plan-time Python) and the
    oracle (the params CTE, SQL over count(*)) for ANY corpus size —
    a drift here silently desynchronizes bucket assignment between the
    two engines at exactly one count threshold."""
    from pedri_analysis_spark.plans import similarity_queries as sq

    k, tables = sq.lsh_params(n)
    got = duckdb.sql(
        f"WITH n AS (SELECT {n}::BIGINT AS n), params AS ({sq._lsh_params_cte()}) "
        "SELECT k, l FROM params"
    ).fetchone()
    assert (k, tables) == (got[0], got[1])


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    num=st.integers(min_value=0, max_value=(1 << 63) - 1),
    den=st.integers(min_value=1, max_value=1 << 40),
    k=st.sampled_from([10_000, 1_000_000]),
)
def test_floor_scaled_div_exact_and_overflow_safe(spark, num, den, k):
    """floor_scaled_div must equal exact big-integer floor(num*k/den)
    whenever that RESULT fits in BIGINT — including nums where the
    naive num*k intermediate would overflow 2^63 (the whole point of
    the decomposition) — in BOTH dialects."""
    from hypothesis import assume

    want = (num * k) // den  # Python big ints: the exact reference
    assume(want < (1 << 63))  # un-representable results are out of contract
    got_d = duckdb.sql(
        f"SELECT {tx.floor_scaled_div(tx.DUCK, f'{num}::BIGINT', f'{den}::BIGINT', k)}"
    ).fetchone()[0]
    got_s = spark.sql(
        "SELECT "
        + tx.floor_scaled_div(
            tx.SPARK, f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)", k
        )
    ).first()[0]
    assert got_d == want
    assert got_s == want
