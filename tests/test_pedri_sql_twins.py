"""Parity pins for the textual predicate twins (predicates.py).

The r15 optimization round rebuilt the pedri per-match aggregates from
one-parse SQL strings instead of py4j Column composition (~7,000 socket
round trips -> ~30; seconds of driver time per query).  Results must be
BIT-identical: every `*_S` / `*_s` twin here is evaluated side by side
with its Column builder over the full fixture event corpus and required
to agree on every row (both NULL, or equal — float equality is exact,
since twin pairs must compile to the same arithmetic).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pedri_analysis_spark.functions import predicates as P

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="module")
def events(spark):
    from pedri_analysis_spark.sources.events import read_events

    return read_events(spark, os.path.join(FIXTURES, "events")).cache()


@pytest.fixture(scope="module")
def directed(spark, events):
    from pedri_analysis_spark.plans.pedri_pipeline import with_direction

    return with_direction(events).cache()


def _assert_twin(df, col, text, name):
    rows = df.select(col.alias("a"), F.expr(text).alias("b")).collect()
    assert rows, f"{name}: empty fixture frame"
    for r in rows:
        assert r.a == r.b or (r.a is None and r.b is None), (
            f"{name}: Column={r.a!r} vs SQL twin={r.b!r}"
        )


def _simple_pairs():
    return [
    ("is_type", P.is_type("Pass"), P.is_type_s("Pass")),
    ("by_player", P.by_player(), P.by_player_s()),
    ("is_tackle_v1", P.is_tackle_v1(), P.IS_TACKLE_V1_S),
    ("is_tackle_v2", P.is_tackle_v2(), P.IS_TACKLE_V2_S),
    ("is_turnover", P.is_turnover(), P.IS_TURNOVER_S),
    ("pass_completed_v1", P.pass_completed_v1(), P.PASS_COMPLETED_V1_S),
    ("pass_completed_v2", P.pass_completed_v2(), P.PASS_COMPLETED_V2_S),
    ("is_key_pass_v1", P.is_key_pass_v1(), P.IS_KEY_PASS_V1_S),
    ("is_key_pass_v2", P.is_key_pass_v2(), P.IS_KEY_PASS_V2_S),
    ("loc_x", P.loc_x(), P.LOC_X_S),
    ("loc_y", P.loc_y(), P.LOC_Y_S),
    ("end_x", P.end_x(), P.END_X_S),
    ("end_y", P.end_y(), P.END_Y_S),
    ("event_time_min", P.event_time_min(), P.EVENT_TIME_MIN_S),
    (
        "euclid",
        P.euclid(P.loc_x(), P.loc_y(), P.end_x(), P.end_y()),
        P.euclid_s(P.LOC_X_S, P.LOC_Y_S, P.END_X_S, P.END_Y_S),
    ),
    ("progressive_pass_v1", P.progressive_pass_v1(), P.PROGRESSIVE_PASS_V1_S),
    ("successful_dribble", P.successful_dribble(), P.SUCCESSFUL_DRIBBLE_S),
    (
        "under_pressure_completed_pass",
        P.under_pressure_completed_pass(),
        P.UNDER_PRESSURE_COMPLETED_PASS_S,
    ),
    ("is_cross", P.is_cross(), P.IS_CROSS_S),
    ("switch_of_play", P.switch_of_play(), P.SWITCH_OF_PLAY_S),
]


def _directed_pairs():
    AR = F.col("attacks_right")
    return [
    (
        "toward_goal_dx",
        P.toward_goal_dx(P.loc_x(), P.end_x(), AR),
        P.toward_goal_dx_s(P.LOC_X_S, P.END_X_S, "attacks_right"),
    ),
    ("progressive_v2", P.progressive_v2(AR), P.progressive_v2_s("attacks_right")),
    (
        "in_final_third",
        P.in_final_third(P.end_x(), AR),
        P.in_final_third_s(P.END_X_S, "attacks_right"),
    ),
    (
        "in_penalty_area",
        P.in_penalty_area(P.end_x(), P.end_y(), AR),
        P.in_penalty_area_s(P.END_X_S, P.END_Y_S, "attacks_right"),
    ),
    (
        "deep_completion",
        P.deep_completion(AR),
        P.deep_completion_s("attacks_right"),
    ),
]


def test_simple_twins(events):
    for name, col, text in _simple_pairs():
        _assert_twin(events, col, text, name)


def test_directed_twins(directed):
    for name, col, text in _directed_pairs():
        _assert_twin(directed, col, text, name)


def test_twins_cover_every_predicate(events):
    """The fixture corpus must actually EXERCISE the twins: each boolean
    twin should be true on at least one fixture row somewhere (otherwise
    the parity pin is vacuous for its true-branch)."""
    preds = {
        "pass_completed_v1": P.PASS_COMPLETED_V1_S,
        "pass_completed_v2": P.PASS_COMPLETED_V2_S,
        "key_pass_v1": P.IS_KEY_PASS_V1_S,
        "turnover": P.IS_TURNOVER_S,
        "tackle_v1": P.IS_TACKLE_V1_S,
        "progressive_v1": P.PROGRESSIVE_PASS_V1_S,
    }
    row = events.select(
        *[
            F.expr(f"sum(CASE WHEN {t} THEN 1 ELSE 0 END)").alias(n)
            for n, t in preds.items()
        ]
    ).collect()[0]
    for n in preds:
        assert row[n] and row[n] > 0, f"fixture never exercises {n}"
