"""tools/chunk_recall.py is the cited source for the APPROX_PAST_CAP
recall numbers — pin its machinery at fixture scale (DuckDB only, no
Spark): the replica-projection validation must actually trip on a
broken generator invariant, and the survival arithmetic must match a
hand-computed case.
"""

from __future__ import annotations

import duckdb
import pytest

from pedri_analysis_spark.functions import textexpr as tx
from tools.chunk_recall import _family


def _setup(con, docs):
    con.execute("CREATE OR REPLACE TABLE d(doc_id BIGINT, blk VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)


def test_family_recall_matches_hand_computation():
    """3 true pairs, 2 replicas, nch=2 everywhere: survival of each
    projected pair is a pure chunk_of equality we can also evaluate by
    hand through the same SQL primitive."""
    con = duckdb.connect()
    shift, replicas = 1000, 2
    # base 'true pairs' among ids 1..4, all in one block
    con.execute("CREATE OR REPLACE TABLE tp(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO tp VALUES (?, ?)", [(1, 2), (1, 3), (2, 4)])
    # synth: both replicas' ids present, one block, forced nch=2
    docs = [(i + r * shift, "x") for i in range(1, 5) for r in range(replicas)]
    _setup(con, docs)
    res = _family(
        con,
        "toy",
        base_pairs_sql="SELECT a, b FROM tp",
        # replica-1 restriction of a 'synth' that projects exactly
        rep1_pairs_sql=f"SELECT a + {shift} AS a, b + {shift} AS b FROM tp",
        shift=shift,
        replicas=replicas,
        block_rollup_sql="SELECT blk, 2::BIGINT AS nch FROM d GROUP BY blk",
        true_block_sql="SELECT doc_id AS a, blk FROM d",
        cap=2,
    )
    assert res["n_true_pairs_synth"] == 3 * replicas
    # hand-evaluate the same survival predicate
    expect = con.sql(
        f"""
        WITH r AS (SELECT unnest(range({replicas})) AS i)
        SELECT sum(CASE WHEN {tx.chunk_of(tx.DUCK, f'(a + i * {shift})', '2')}
                           = {tx.chunk_of(tx.DUCK, f'(b + i * {shift})', '2')}
                   THEN 1 ELSE 0 END)::BIGINT
        FROM tp CROSS JOIN r
        """
    ).fetchone()[0]
    assert res["n_survived"] == expect
    assert res["expected_1_over_nch"] == 0.5


def test_family_validation_trips_on_broken_projection():
    """If the 'synth' replica does NOT equal the projected base pairs
    (the generator invariant the method rests on), the tool must refuse
    to produce recall numbers."""
    con = duckdb.connect()
    con.execute("CREATE OR REPLACE TABLE tp(a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO tp VALUES (?, ?)", [(1, 2), (1, 3)])
    _setup(con, [(i + r * 1000, "x") for i in range(1, 5) for r in range(2)])
    with pytest.raises(AssertionError, match="diverges"):
        _family(
            con,
            "toy",
            base_pairs_sql="SELECT a, b FROM tp",
            rep1_pairs_sql="SELECT a + 1000 AS a, b + 999 AS b FROM tp",  # wrong
            shift=1000,
            replicas=2,
            block_rollup_sql="SELECT blk, 2::BIGINT AS nch FROM d GROUP BY blk",
            true_block_sql="SELECT doc_id AS a, blk FROM d",
            cap=2,
        )
