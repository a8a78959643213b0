"""Every declared query must match its DuckDB oracle — the same bar the
driver's CORRECTNESS gate applies (row count + schema + order-insensitive
values at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import assert_query_matches_oracle


def _pairs():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, qfn, sql):
    if sql is None:
        # rows-only contract: must run and return a stable schema
        df = qfn(spark, "/root/testdata/sf0.01")
        assert df.columns
        assert df.count() >= 0
    else:
        assert_query_matches_oracle(spark, duck, qfn, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns
