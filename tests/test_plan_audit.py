"""Catalog-wide plan-shape invariants (tools/plan_lint.py): no query may
plan a CartesianProduct, use BroadcastNestedLoopJoin without a documented
bounded build side, or cross into Python without a justified Arrow
kernel.  This is the mechanized version of the per-query scale audit —
a new query that silently plans a pairwise blowup fails here, not in a
100 TB run."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.plan_lint import audit  # noqa: E402

SF = "/root/testdata/sf0.01"


def test_catalog_plan_invariants(spark):
    report, problems = audit(spark, SF)
    assert len(report) >= 119  # every registered query built a plan
    assert not problems, "\n".join(problems)
    # the committed audit artifact must stay in sync with the catalog
    import json

    with open("/root/repo/PLANAUDIT.json") as f:
        committed = json.load(f)
    assert set(committed) == set(report), (
        "PLANAUDIT.json stale — rerun tools/plan_lint.py"
    )
