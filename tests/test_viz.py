"""Viz data-side tests: the figure inputs are Spark aggregates (scalable);
rendering is import-gated on matplotlib (absent here)."""

from __future__ import annotations

import os

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="module")
def events(spark):
    from pedri_analysis_spark.sources.events import read_events

    return read_events(spark, os.path.join(FIXTURES, "events")).cache()


def test_heatmap_data(spark, events):
    from pedri_analysis_spark.viz import heatmap_data

    rows = heatmap_data(events).collect()
    assert rows, "no heat cells"
    assert all(0 <= r.gx < 48 and 0 <= r.gy < 32 for r in rows)
    import math

    assert all(abs(r.intensity - math.log1p(r.n)) < 1e-12 for r in rows)


def test_top_matches_and_histogram(spark, events):
    from pedri_analysis_spark.plans.pedri_pipeline import per_match_basic
    from pedri_analysis_spark.viz import histogram_data, top_matches_data

    stats = per_match_basic(events)
    top = top_matches_data(stats, "passes", k=3).collect()
    assert len(top) == 3
    assert top[0].passes >= top[1].passes >= top[2].passes
    hist = histogram_data(stats, "passes", 5.0).collect()
    assert sum(r.n for r in hist) == stats.count()


def test_pass_map_segments(spark, events):
    from pedri_analysis_spark.viz import pass_map_data

    seg = pass_map_data(events).filter("match_id = 1001").collect()
    assert all(s.x1 is not None for s in seg)
    assert any(s.progressive for s in seg)


def test_render_raises_without_matplotlib(spark, events):
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib present; render path exercised elsewhere")
    except ImportError:
        pass
    from pedri_analysis_spark.viz import heatmap_data, render_heatmap

    with pytest.raises(ImportError):
        render_heatmap(heatmap_data(events), "/tmp/heat")
