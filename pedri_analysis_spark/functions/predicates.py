"""The reference's row-level predicates/extractors as native Column
expressions (SURVEY §2.2 P1-P16, §2.7 F1-F10).

Every one of the reference's ~25 Python row functions is arithmetic /
boolean / string logic, so all of them compile to Catalyst expressions —
zero Python in the row path, full whole-stage codegen. Null tolerance is
free: Spark struct access on a missing/NULL branch yields NULL, which is
exactly the reference's ``safe_get`` semantics
(reference core/pedri_analysis.py:67-74).

Where the reference has two divergent definitions of the same concept the
rebuild keeps both, parameterized (SURVEY §7 watch-list: P5 completed-pass
and P8 progressive-pass each have a v1/v2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PLAYER_ID = 30486  # the reference's single-player focus (pedri_analysis.py:77)

# Pitch constants (StatsBomb 120x80; reference core/pedri_analysis.py:398-413,
# core/pedri_analysis_extended.py:26,454-472)
PITCH_X = 120.0
PITCH_Y = 80.0
GOAL_Y = 40.0


# --- event-type predicates (P3; reference core/pedri_analysis.py:81-124) ---


def is_type(name: str) -> Column:
    return F.col("type.name") == F.lit(name)


def is_pass() -> Column:
    return is_type("Pass")


def is_shot() -> Column:
    return is_type("Shot")


def is_dribble() -> Column:
    return is_type("Dribble")


def is_carry() -> Column:
    return is_type("Carry")


def is_pressure() -> Column:
    return is_type("Pressure")


def is_interception() -> Column:
    return is_type("Interception")


def is_ball_recovery() -> Column:
    return is_type("Ball Recovery")


def is_tackle_v1() -> Column:
    """Duel+Tackle conjunction (reference core/pedri_analysis.py:112-116)."""
    return is_type("Duel") & (F.col("duel.type.name") == "Tackle")


def is_tackle_v2() -> Column:
    """Bare Tackle event type (reference core/pedri_analysis_extended.py:332-333).
    Divergent from v1 by design — the two CSVs disagree in the reference."""
    return is_type("Tackle")


def is_turnover() -> Column:
    """Miscontrol/Dispossessed (P13; reference extended.py:265-267)."""
    return F.col("type.name").isin("Miscontrol", "Dispossessed")


# --- player / completion predicates ---


def by_player(player_id: int = PLAYER_ID) -> Column:
    """P2 (reference core/pedri_analysis.py:77-78)."""
    return F.col("player.id") == F.lit(player_id)


def pass_completed_v1() -> Column:
    """P5 v1: outcome NULL or 'Complete' (reference core/pedri_analysis.py:85-89)."""
    return is_pass() & (
        F.col("pass.outcome.name").isNull()
        | (F.col("pass.outcome.name") == "Complete")
    )


def pass_completed_v2() -> Column:
    """P5 v2: ``outcome`` key absent entirely (reference
    core/pedri_analysis_extended.py:69-71). Differs from v1 on
    ``outcome={'name':'Complete'}``."""
    return is_pass() & F.col("pass.outcome").isNull()


def is_key_pass_v1() -> Column:
    """P6 v1 (reference core/pedri_analysis.py:127-133)."""
    return is_pass() & (
        (F.col("pass.shot_assist") == True)  # noqa: E712 — tri-state boolean column
        | F.col("pass.assisted_shot_id").isNotNull()
    )


def is_key_pass_v2() -> Column:
    """P6 v2: completed and any of assisted_shot_id/shot_assist/goal_assist
    (reference core/pedri_analysis_extended.py:279-284)."""
    return pass_completed_v2() & (
        F.col("pass.assisted_shot_id").isNotNull()
        | (F.col("pass.shot_assist") == True)  # noqa: E712
        | (F.col("pass.goal_assist") == True)  # noqa: E712
    )


# --- location extraction (P7; reference core/pedri_analysis.py:136-151) ---


def _xy(col: str, i: int) -> Column:
    c = F.col(col)
    return F.when(F.size(c) >= 2, c[i].cast("double"))


def loc_x() -> Column:
    return _xy("location", 0)


def loc_y() -> Column:
    return _xy("location", 1)


def end_location() -> str:
    """Type-dispatched end location (pass vs carry)."""
    return "CASE WHEN type.name = 'Pass' THEN pass.end_location WHEN type.name = 'Carry' THEN carry.end_location END"


def end_x() -> Column:
    c = F.expr(end_location())
    return F.when(F.size(c) >= 2, c[0].cast("double"))


def end_y() -> Column:
    c = F.expr(end_location())
    return F.when(F.size(c) >= 2, c[1].cast("double"))


# --- scalar geometry (F1-F3; reference analysis.py:171-179, extended.py:74-86) ---


def euclid(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    return F.sqrt(F.pow(x2 - x1, 2) + F.pow(y2 - y1, 2))


def toward_goal_dx(sx: Column, ex: Column, attacks_right: Column) -> Column:
    """F2: direction-signed forward delta (reference extended.py:82-86)."""
    return F.when(attacks_right, ex - sx).otherwise(sx - ex)


def event_time_min() -> Column:
    """F3: minute + second/60 (reference analysis.py:174-179)."""
    return F.coalesce(F.col("minute"), F.lit(0)).cast("double") + F.coalesce(
        F.col("second"), F.lit(0)
    ).cast("double") / 60.0


# --- progressive predicates (P8; two variants by design) ---


def progressive_pass_v1() -> Column:
    """P8 v1, direction-agnostic: dx>=10 AND dx>|dy|
    (reference core/pedri_analysis.py:154-162)."""
    dx = end_x() - loc_x()
    dy = end_y() - loc_y()
    return is_pass() & dx.isNotNull() & (dx >= 10) & (dx > F.abs(dy))


def progressive_v2(attacks_right: Column) -> Column:
    """P8 v2, direction-aware (applies to the current row's start/end):
    completed-pass toward-goal dx>=10 AND distance-to-goal reduced >=30%
    (reference core/pedri_analysis_extended.py:110-128)."""
    sx, sy, ex, ey = loc_x(), loc_y(), end_x(), end_y()
    goal_x = F.when(attacks_right, F.lit(PITCH_X)).otherwise(F.lit(0.0))
    d_start = euclid(sx, sy, goal_x, F.lit(GOAL_Y))
    d_end = euclid(ex, ey, goal_x, F.lit(GOAL_Y))
    fwd = toward_goal_dx(sx, ex, attacks_right)
    return (
        sx.isNotNull()
        & ex.isNotNull()
        & (fwd >= 10)
        & (d_end <= d_start * 0.7)
    )


# --- zone predicates (P9-P11; reference extended.py:131-177) ---


def in_final_third(x: Column, attacks_right: Column) -> Column:
    return F.when(attacks_right, x >= PITCH_X - 40).otherwise(x <= 40)


def in_penalty_area(x: Column, y: Column, attacks_right: Column) -> Column:
    in_y = (y >= 18) & (y <= 62)
    return F.when(attacks_right, (x >= PITCH_X - 18) & in_y).otherwise(
        (x <= 18) & in_y
    )


def deep_completion(attacks_right: Column) -> Column:
    """P10: completed, not a cross, end point < 20 from goal center
    (reference extended.py:150-164)."""
    ex, ey = end_x(), end_y()
    goal_x = F.when(attacks_right, F.lit(PITCH_X)).otherwise(F.lit(0.0))
    not_cross = F.col("pass.cross").isNull() | (F.col("pass.cross") == False)  # noqa: E712
    return (
        pass_completed_v2()
        & not_cross
        & ex.isNotNull()
        & (euclid(ex, ey, goal_x, F.lit(GOAL_Y)) < 20)
    )


def switch_of_play() -> Column:
    """P11: completed, |dy|>=40, length>=30 (reference extended.py:167-177)."""
    sx, sy, ex, ey = loc_x(), loc_y(), end_x(), end_y()
    return (
        pass_completed_v2()
        & sx.isNotNull()
        & ex.isNotNull()
        & (F.abs(ey - sy) >= 40)
        & (euclid(sx, sy, ex, ey) >= 30)
    )


def successful_dribble() -> Column:
    """P12 (reference analysis.py:100-101)."""
    return is_dribble() & (F.col("dribble.outcome.name") == "Complete")


def under_pressure_completed_pass() -> Column:
    """P14 (reference extended.py:286-287)."""
    return pass_completed_v2() & (F.col("under_pressure") == True)  # noqa: E712


def is_cross() -> Column:
    return is_pass() & (F.col("pass.cross") == True)  # noqa: E712


# ---------------------------------------------------------------------------
# Textual twins (Spark SQL dialect) — one-parse plan construction.
#
# Building the pedri per-match aggregates from the Column helpers above costs
# ~7,000 py4j socket round trips (~2.5-4.5 s of driver time PER QUERY,
# profiled r15: `send_command` dominates, not Catalyst) because every `&`,
# `==`, `F.col` is its own JVM call.  The same expression written as ONE SQL
# string costs one parse.  Same lesson as the one-parse kmeans assignment
# build (operators/clustering.py).
#
# Each *_S constant / *_s function below is the exact textual form of the
# Column builder above it — same operand order, same literal types (`e0`
# suffix = DOUBLE literal, matching `F.lit(float)`), same implicit-NULL CASE
# forms.  tests/test_pedri_sql_twins.py pins row-identical results between
# every twin pair over the full fixture corpus, and the pedri oracle contract
# re-proves the assembled queries end to end.
# ---------------------------------------------------------------------------


def is_type_s(name: str) -> str:
    return f"(type.name = '{name}')"


def by_player_s(player_id: int = PLAYER_ID) -> str:
    return f"(player.id = {player_id})"


IS_PASS_S = is_type_s("Pass")
IS_SHOT_S = is_type_s("Shot")
IS_DRIBBLE_S = is_type_s("Dribble")
IS_CARRY_S = is_type_s("Carry")
IS_PRESSURE_S = is_type_s("Pressure")
IS_INTERCEPTION_S = is_type_s("Interception")
IS_BALL_RECOVERY_S = is_type_s("Ball Recovery")
IS_TACKLE_V1_S = f"({is_type_s('Duel')} AND duel.type.name = 'Tackle')"
IS_TACKLE_V2_S = is_type_s("Tackle")
IS_TURNOVER_S = "(type.name IN ('Miscontrol', 'Dispossessed'))"

PASS_COMPLETED_V1_S = (
    f"({IS_PASS_S} AND (pass.outcome.name IS NULL"
    f" OR pass.outcome.name = 'Complete'))"
)
PASS_COMPLETED_V2_S = f"({IS_PASS_S} AND pass.outcome IS NULL)"

IS_KEY_PASS_V1_S = (
    f"({IS_PASS_S} AND (pass.shot_assist = true"
    f" OR pass.assisted_shot_id IS NOT NULL))"
)
IS_KEY_PASS_V2_S = (
    f"({PASS_COMPLETED_V2_S} AND (pass.assisted_shot_id IS NOT NULL"
    f" OR pass.shot_assist = true OR pass.goal_assist = true))"
)

# location extraction — implicit-NULL CASE mirrors F.when without otherwise
LOC_X_S = "(CASE WHEN size(location) >= 2 THEN CAST(location[0] AS DOUBLE) END)"
LOC_Y_S = "(CASE WHEN size(location) >= 2 THEN CAST(location[1] AS DOUBLE) END)"
_END_LOC_S = (
    "(CASE WHEN type.name = 'Pass' THEN pass.end_location"
    " WHEN type.name = 'Carry' THEN carry.end_location END)"
)
END_X_S = (
    f"(CASE WHEN size({_END_LOC_S}) >= 2 THEN CAST({_END_LOC_S}[0] AS DOUBLE) END)"
)
END_Y_S = (
    f"(CASE WHEN size({_END_LOC_S}) >= 2 THEN CAST({_END_LOC_S}[1] AS DOUBLE) END)"
)


def euclid_s(x1: str, y1: str, x2: str, y2: str) -> str:
    return f"SQRT(POWER({x2} - {x1}, 2) + POWER({y2} - {y1}, 2))"


def toward_goal_dx_s(sx: str, ex: str, attacks_right: str) -> str:
    return f"(CASE WHEN {attacks_right} THEN {ex} - {sx} ELSE {sx} - {ex} END)"


EVENT_TIME_MIN_S = (
    "(CAST(coalesce(minute, 0) AS DOUBLE)"
    " + CAST(coalesce(second, 0) AS DOUBLE) / 60.0e0)"
)

PROGRESSIVE_PASS_V1_S = (
    f"({IS_PASS_S} AND ({END_X_S} - {LOC_X_S}) IS NOT NULL"
    f" AND {END_X_S} - {LOC_X_S} >= 10"
    f" AND {END_X_S} - {LOC_X_S} > ABS({END_Y_S} - {LOC_Y_S}))"
)


def _goal_x_s(attacks_right: str) -> str:
    return f"(CASE WHEN {attacks_right} THEN 120.0e0 ELSE 0.0e0 END)"


def progressive_v2_s(attacks_right: str) -> str:
    gx = _goal_x_s(attacks_right)
    d_start = euclid_s(LOC_X_S, LOC_Y_S, gx, "40.0e0")
    d_end = euclid_s(END_X_S, END_Y_S, gx, "40.0e0")
    fwd = toward_goal_dx_s(LOC_X_S, END_X_S, attacks_right)
    return (
        f"({LOC_X_S} IS NOT NULL AND {END_X_S} IS NOT NULL"
        f" AND {fwd} >= 10 AND {d_end} <= {d_start} * 0.7e0)"
    )


def in_final_third_s(x: str, attacks_right: str) -> str:
    return f"(CASE WHEN {attacks_right} THEN {x} >= 80.0e0 ELSE {x} <= 40 END)"


def in_penalty_area_s(x: str, y: str, attacks_right: str) -> str:
    in_y = f"({y} >= 18 AND {y} <= 62)"
    return (
        f"(CASE WHEN {attacks_right} THEN {x} >= 102.0e0 AND {in_y}"
        f" ELSE {x} <= 18 AND {in_y} END)"
    )


def deep_completion_s(attacks_right: str) -> str:
    gx = _goal_x_s(attacks_right)
    not_cross = "(pass.cross IS NULL OR pass.cross = false)"
    return (
        f"({PASS_COMPLETED_V2_S} AND {not_cross} AND {END_X_S} IS NOT NULL"
        f" AND {euclid_s(END_X_S, END_Y_S, gx, '40.0e0')} < 20)"
    )


SWITCH_OF_PLAY_S = (
    f"({PASS_COMPLETED_V2_S} AND {LOC_X_S} IS NOT NULL AND {END_X_S} IS NOT NULL"
    f" AND ABS({END_Y_S} - {LOC_Y_S}) >= 40"
    f" AND {euclid_s(LOC_X_S, LOC_Y_S, END_X_S, END_Y_S)} >= 30)"
)

SUCCESSFUL_DRIBBLE_S = f"({IS_DRIBBLE_S} AND dribble.outcome.name = 'Complete')"
UNDER_PRESSURE_COMPLETED_PASS_S = (
    f"({PASS_COMPLETED_V2_S} AND under_pressure = true)"
)
IS_CROSS_S = f"({IS_PASS_S} AND pass.cross = true)"
