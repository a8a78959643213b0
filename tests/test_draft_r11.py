"""The r11-staged draft queries (plans/draft_r11.py) must already pass
the driver-identical oracle comparison — registration in r11 is then a
registry toggle, not new risk.  The module is intentionally NOT in
``registry._modules`` this round (r10 freeze: the driver's correctness
window is draining the verification-staleness tail; VERDICT r9 #2/#6).
"""

from __future__ import annotations

import pytest

from tests.conftest import assert_query_matches_oracle


def _pairs():
    from pedri_analysis_spark.plans import draft_r11 as d

    return [(n, d.QUERIES[n], d.ORACLE_SQL[n]) for n in sorted(d.QUERIES)]


def test_drafts_are_not_registered():
    from pedri_analysis_spark.plans import draft_r11 as d
    from pedri_analysis_spark.plans import registry

    registered = set(registry.all_queries())
    assert not (set(d.QUERIES) & registered), (
        "draft queries leaked into the frozen r10 registry — they must "
        "not displace the driver's stale-re-proof slots this round"
    )


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_draft_matches_oracle(spark, duck, name, qfn, sql):
    assert_query_matches_oracle(spark, duck, qfn, sql)


@pytest.mark.parametrize("name,qfn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_draft_plan_invariants(spark, name, qfn, sql):
    """The drafts must already satisfy the catalog plan rules
    (tools/plan_lint.py) so r11 registration cannot introduce a
    violation: no CartesianProduct, no Python boundary, and BNLJ only
    for the two queries whose 1-row-broadcast frames are pre-listed in
    _BNLJ_ALLOWED."""
    from tools.plan_lint import _BNLJ_ALLOWED, lint_plan

    facts = lint_plan(
        qfn(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not facts["cartesian"]
    assert not facts["python"]
    if facts["bnlj"]:
        assert name in _BNLJ_ALLOWED, f"{name}: BNLJ without a pre-staged allowlist entry"


def test_reservoir_prefilter_is_exact(spark, duck, monkeypatch):
    """The hash-threshold pre-filter must be invisible in the result:
    force a tiny margin so under-filled strata actually occur and the
    fallback path runs, then compare against the unfiltered oracle."""
    from pedri_analysis_spark.plans import draft_r11 as d

    monkeypatch.setattr(d, "RESERVOIR_MARGIN", 1)
    assert_query_matches_oracle(
        spark,
        duck,
        d.QUERIES["stratified_reservoir_topk"],
        d.ORACLE_SQL["stratified_reservoir_topk"],
    )
