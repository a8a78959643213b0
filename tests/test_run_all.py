"""Golden test for the end-to-end orchestrator: one call produces the
reference's complete artifact set (CSV trio + summaries + match ids +
profile + every figure family's data), with correct shapes/orders."""

from __future__ import annotations

import csv
import json
import os

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

EXPECTED_FILES = [
    "pedri_profile.json",
    "pedri_match_ids.txt",
    "pedri_summary_extended.json",
    "csv/pedri_match_stats.csv",
    "csv/pedri_match_stats_extended.csv",
    "csv/pedri_per_match_stats.csv",
    "csv/pedri_summary.csv",
    "figures/pedri_key_passes_per_match.csv",
    "figures/pedri_progressive_passes_per_match.csv",
    "figures/pedri_pass_pct_per_match.csv",
    "figures/pedri_pressures_p90_hist.csv",
    "figures/pedri_tackles_p90_hist.csv",
    "figures/pedri_interceptions_p90_hist.csv",
    "figures/pedri_event_heatmap.csv",
    "figures/pedri_radar_p90_raw.csv",
    "figures/pedri_radar_p90_percentile.csv",
    "figures/pedri_pass_map_all.csv",
    "figures/pedri_pass_map_progressive.csv",
    "figures/trend_kp_pp_per90.csv",
    "figures/scatter_pp_vs_pc.csv",
]


@pytest.fixture(scope="module")
def artifacts(spark, tmp_path_factory):
    from pedri_analysis_spark.run_all import run_all

    out = str(tmp_path_factory.mktemp("runall"))
    arts = run_all(spark, os.path.join(FIXTURES, "events"), out_dir=out)
    return out, arts


def test_artifact_set_complete(artifacts):
    out, arts = artifacts
    for rel in EXPECTED_FILES:
        assert os.path.isfile(os.path.join(out, rel)), f"missing {rel}"
    assert len(arts) >= len(EXPECTED_FILES)


def test_basic_csv_golden(artifacts):
    out, _ = artifacts
    with open(os.path.join(out, "csv", "pedri_match_stats.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 9  # one per fixture match with pedri events
    assert list(rows[0]) == [
        "match_id", "match_date", "position", "minutes", "passes_attempted",
        "passes_completed", "pass_pct", "key_passes", "progressive_passes",
        "shots", "xg",
    ]
    # sorted by PARSED date: 1003 is 01/04/2023 (April) and must come
    # AFTER 1001 (2023-03-10), even though its string sorts first
    ids = [r["match_id"] for r in rows]
    assert ids.index("1001") < ids.index("1003")


def test_match_ids_txt_golden(artifacts):
    out, _ = artifacts
    with open(os.path.join(out, "pedri_match_ids.txt")) as f:
        ids = f.read().split()
    assert ids == sorted(ids)
    assert "1001" in ids and len(ids) == 9


def test_summary_extended_json_golden(artifacts):
    out, _ = artifacts
    with open(os.path.join(out, "pedri_summary_extended.json")) as f:
        s = json.load(f)
    assert set(s) == {"matches", "minutes", "totals", "per90"}
    assert s["matches"] == 9
    assert s["minutes"] > 0
    # per90 consistency: per90[k] == totals[k] / minutes * 90 (3 dp)
    for k, v in s["totals"].items():
        assert s["per90"][k] == pytest.approx(v / s["minutes"] * 90.0, abs=5e-3)


def test_profile_json_roundtrip(spark, artifacts):
    """The built profile is consumable by the profile reader (the produce
    side and the consume side of S4 agree)."""
    from pedri_analysis_spark.sources.events import read_profile

    out, _ = artifacts
    prof = read_profile(spark, os.path.join(out, "pedri_profile.json"))
    rows = {r.match_id: r for r in prof.collect()}
    assert len(rows) == 9
    assert rows[1001].team == "Barcelona"
    assert rows[1001].minutes > 0
