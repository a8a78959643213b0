"""The Pedri analytics pipelines — the reference's flagship workloads
rebuilt as composable DataFrame stages (SURVEY §3.2/§3.3).

Reference architecture: four sequential passes over a Python list per
match (core/pedri_analysis_extended.py:209-384) plus a separate basic
analyzer (core/pedri_analysis.py:231-299).  Rebuild architecture: one
events DataFrame, branched into per-concern aggregates (direction, main
counters, xA join, receptions, counter-press) that are joined back on
``match_id`` — Catalyst fuses the narrow stages and each branch is a
single partial+final hash aggregate.

Deliberate semantics fix (documented per SURVEY §7 watch-list): the
reference memoizes attack direction per *team name*, first match wins
(core/pedri_analysis_extended.py:214-223) — an iteration-order-dependent
quirk.  Here direction is computed per (match, team), which is the
correct per-match semantics.

Rounding: final metric columns use ``pround`` — ``floor(x*10^n + 0.5) /
10^n`` on the double lattice — the one formula that evaluates to the SAME
IEEE result in Spark and DuckDB (F6 rounding parity).  ``bround``
(HALF_EVEN via Java BigDecimal's shortest-decimal repr) and DuckDB
``round`` (half away from zero) disagree whenever a metric lands exactly
on a representable .5 boundary, e.g. 9/16 passes → 56.25 → 56.2 vs 56.3;
the floor form is deterministic cross-engine because *, +, floor and /
are all IEEE-754-defined on doubles.  Deviation from the reference's
Python ``round()`` (HALF_EVEN) exists only on those exact boundaries and
is documented here as a cross-engine determinism trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from pedri_analysis_spark.functions import predicates as P

FIVE_SECONDS_MIN = 5.0 / 60.0


def pround(c: str | Column, ndigits: int) -> Column:
    """Cross-engine parity rounding: floor(x * 10^n + 0.5) / 10^n.

    Mirror every use of this with the identical textual formula in the
    oracle SQL (see _R_SQL in plans.pedri_queries); both engines then run
    the same IEEE double ops in the same order.  Same pattern as
    operators.similarity.round6."""
    col = F.col(c) if isinstance(c, str) else c
    f = F.lit(float(10**ndigits))
    return F.floor(col * f + F.lit(0.5)) / f


def _cnt(pred) -> F.Column:
    return F.sum(F.when(pred, 1).otherwise(0))


def _cnt_s(pred: str) -> str:
    """Textual twin of _cnt (one-parse construction, see predicates.py)."""
    return f"sum(CASE WHEN {pred} THEN 1 ELSE 0 END)"


def _xg_dec(col: str = "shot.statsbomb_xg") -> F.Column:
    """xG summed in decimal for order-independent exactness, emitted as
    double (cross-engine deterministic; see plans.relational docstring)."""
    return F.sum(F.col(col).cast("decimal(18,10)")).cast("double")


def attack_directions(events: DataFrame) -> DataFrame:
    """Per (match_id, team): does the team attack left→right?  Mean Δx of
    completed first-half passes >= 0 (reference extended.py:89-107; J4/A7).

    Scale: a narrow filtered aggregate over (match, team) — broadcast the
    result back to the event stream.  Built from the textual predicate
    twins (predicates.py) — one parse instead of hundreds of py4j calls;
    the expressions are identical (pinned by tests/test_pedri_sql_twins)."""
    dx = f"({P.END_X_S} - {P.LOC_X_S})"
    return (
        events.filter(
            F.expr(
                f"{P.PASS_COMPLETED_V2_S} AND period = 1 AND {dx} IS NOT NULL"
            )
        )
        .groupBy("match_id", F.col("team.name").alias("team"))
        .agg(F.expr(f"avg({dx}) >= 0").alias("attacks_right"))
    )


def with_direction(events: DataFrame) -> DataFrame:
    """Events + their team's *effective* ``attacks_right`` flag for the
    event's period: the base direction is inferred from first-half passes,
    and teams switch ends at halftime, so period 2 flips it (reference
    extended.py:261-263). Default True when the team has no qualifying
    first-half passes."""
    dirs = (
        attack_directions(events)
        .withColumnRenamed("team", "_dir_team")
        .withColumnRenamed("match_id", "_dir_match")
    )
    return (
        events.join(
            F.broadcast(dirs),
            (F.col("match_id") == F.col("_dir_match"))
            & (F.col("team")["name"] == F.col("_dir_team")),
            "left",
        )
        .drop("_dir_match")
        .drop("_dir_team")
        .withColumn(
            "attacks_right",
            F.expr(
                "CASE WHEN coalesce(period, 1) = 2"
                " THEN NOT coalesce(attacks_right, true)"
                " ELSE coalesce(attacks_right, true) END"
            ),
        )
    )


def minutes_estimate(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """Per-match minutes-played estimate (SURVEY O6, reference
    core/pedri_analysis.py:201-218):

    - start = substitution-ON minute (player enters as replacement) else
      the player's first event time;
    - end = substitution-OFF minute (player substituted) else the player's
      last event time;
    - minutes = clamp(end - start, 10, 95).
    """
    t = P.EVENT_TIME_MIN_S
    own = events.filter(F.expr(P.by_player_s(player_id))).groupBy("match_id").agg(
        F.expr(f"min({t})").alias("t_first"), F.expr(f"max({t})").alias("t_last")
    )
    sub_on = (
        events.filter(
            F.expr(
                f"{P.is_type_s('Substitution')}"
                f" AND substitution.replacement.id = {player_id}"
            )
        )
        .groupBy("match_id")
        .agg(F.expr(f"min({t})").alias("on_min"))
    )
    sub_off = (
        events.filter(
            F.expr(
                f"{P.is_type_s('Substitution')} AND {P.by_player_s(player_id)}"
            )
        )
        .groupBy("match_id")
        .agg(F.expr(f"min({t})").alias("off_min"))
    )
    return (
        own.join(sub_on, "match_id", "left")
        .join(sub_off, "match_id", "left")
        .select(
            "match_id",
            F.least(
                F.greatest(
                    F.coalesce("off_min", "t_last")
                    - F.coalesce("on_min", "t_first"),
                    F.lit(10.0),
                ),
                F.lit(95.0),
            ).alias("minutes_est"),
        )
    )


def lineup_position(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """Starting-XI position lookup (P15, reference analysis.py:190-198):
    array higher-order filter over ``tactics.lineup`` — no explode needed,
    stays a narrow per-row expression; first Starting XI row wins."""
    entry = (
        f"filter(tactics.lineup, p -> p.player.id = {player_id}"
        f" OR p.player_id = {player_id})"
    )
    w = W.partitionBy("match_id").orderBy(F.expr(P.EVENT_TIME_MIN_S), F.col("id"))
    return (
        events.filter(F.expr(P.is_type_s("Starting XI")))
        .withColumn(
            "pos",
            F.expr(
                f"CASE WHEN size({entry}) > 0"
                f" THEN {entry}[0].position.name END"
            ),
        )
        .filter(F.col("pos").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("match_id", F.col("pos").alias("position_xi"))
    )


def player_team(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """The player's team per match = mode of team.name over their events
    (A6, reference extended.py:209-212); ties break lexicographically."""
    counts = (
        events.filter(
            F.expr(f"{P.by_player_s(player_id)} AND team.name IS NOT NULL")
        )
        .groupBy("match_id", F.col("team.name").alias("team"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("match_id").orderBy(F.desc("n"), F.asc("team"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("match_id", "team")
    )


def per_match_basic(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """The basic per-match stat row (A1, reference
    core/pedri_analysis.py:231-299): ~15 measures folded in ONE hash
    aggregate over the player's events, plus minutes / position / date
    side-lookups joined on match_id.

    Scale: predicate counters are `sum(when(pred,1))` — partial aggregation
    collapses each partition before the shuffle; the whole row set is
    |matches| ≈ tiny."""
    me = P.by_player_s(player_id)
    t = P.EVENT_TIME_MIN_S
    is_sub = P.is_type_s("Substitution")
    sub_on = f"({is_sub} AND substitution.replacement.id = {player_id})"
    # Starting-XI lineup pick (P15) fused into the same aggregate as an
    # ordered struct-min: min over (t, id, pos) structs is lexicographic,
    # so ["pos"] of the minimum == first qualifying row by (t, id) — the
    # standalone lineup_position() window, without its extra scan + join.
    xi_entry = (
        f"filter(tactics.lineup, p -> p.player.id = {player_id}"
        f" OR p.player_id = {player_id})"
    )
    xi_pos = (
        f"(CASE WHEN size({xi_entry}) > 0"
        f" THEN {xi_entry}[0].position.name END)"
    )
    xi_pick = (
        f"min(CASE WHEN {P.is_type_s('Starting XI')} AND {xi_pos} IS NOT NULL"
        f" THEN named_struct('t', {t}, 'id', id, 'pos', {xi_pos}) END)"
    )
    carry_ok = (
        f"({P.IS_CARRY_S} AND {P.END_X_S} IS NOT NULL"
        f" AND {P.LOC_X_S} IS NOT NULL)"
    )
    carry_dist = (
        f"(CASE WHEN {me} AND {carry_ok}"
        f" THEN {P.euclid_s(P.LOC_X_S, P.LOC_Y_S, P.END_X_S, P.END_Y_S)} END)"
    )
    # ONE scan, ONE hash aggregate for the whole basic row: the reference's
    # per-file stat fold (A1), the minutes estimation branches (O6 —
    # minutes_estimate() as conditional min/max), and the lineup pick
    # (P15). Non-player rows needed by O6/P15 join the group via the
    # filter; the row set stays "matches with ≥1 player event" (_me_n).
    # Aggregates are textual-twin SQL (predicates.py) — one parse per
    # column instead of thousands of py4j calls (r15 driver-cost fix).
    base = events.filter(
        F.expr(f"{me} OR {sub_on} OR {P.is_type_s('Starting XI')}")
    )
    aggs = [
        (_cnt_s(me), "_me_n"),
        (_cnt_s(f"{me} AND {P.IS_PASS_S}"), "passes"),
        (_cnt_s(f"{me} AND {P.PASS_COMPLETED_V1_S}"), "passes_completed"),
        (_cnt_s(f"{me} AND {P.IS_KEY_PASS_V1_S}"), "key_passes"),
        (_cnt_s(f"{me} AND {P.PROGRESSIVE_PASS_V1_S}"), "progressive_passes"),
        (_cnt_s(f"{me} AND {P.IS_SHOT_S}"), "shots"),
        (
            _cnt_s(f"{me} AND {P.IS_SHOT_S} AND shot.outcome.name = 'Goal'"),
            "goals",
        ),
        (
            f"coalesce(CAST(sum(CAST(CASE WHEN {me} THEN shot.statsbomb_xg END"
            f" AS DECIMAL(18,10))) AS DOUBLE), 0.0e0)",
            "_xg_raw",
        ),
        (_cnt_s(f"{me} AND {P.IS_DRIBBLE_S}"), "dribbles"),
        (_cnt_s(f"{me} AND {P.SUCCESSFUL_DRIBBLE_S}"), "dribbles_successful"),
        (_cnt_s(f"{me} AND {P.IS_CARRY_S}"), "carries"),
        (f"coalesce(sum({carry_dist}), 0.0e0)", "_carry_raw"),
        (_cnt_s(f"{me} AND {P.IS_PRESSURE_S}"), "pressures"),
        (_cnt_s(f"{me} AND {P.IS_TACKLE_V1_S}"), "tackles"),
        (_cnt_s(f"{me} AND {P.IS_INTERCEPTION_S}"), "interceptions"),
        (_cnt_s(f"{me} AND {P.IS_BALL_RECOVERY_S}"), "ball_recoveries"),
        (f"min(CASE WHEN {me} THEN match_date END)", "match_date"),
        (f"min(CASE WHEN {me} THEN {t} END)", "_t_first"),
        (f"max(CASE WHEN {me} THEN {t} END)", "_t_last"),
        (f"min(CASE WHEN {sub_on} THEN {t} END)", "_on_min"),
        (f"min(CASE WHEN {me} AND {is_sub} THEN {t} END)", "_off_min"),
        (xi_pick, "_xi"),
    ]
    stats = (
        base.groupBy("match_id")
        .agg(*[F.expr(s).alias(n) for s, n in aggs])
        .filter(F.col("_me_n") > 0)
    )
    pct = lambda num, den: F.when(den > 0, pround(100.0 * num / den, 1)).otherwise(0.0)
    minutes_est = F.least(
        F.greatest(
            F.coalesce("_off_min", "_t_last") - F.coalesce("_on_min", "_t_first"),
            F.lit(10.0),
        ),
        F.lit(95.0),
    )
    return (
        stats.withColumn("pass_pct", pct(F.col("passes_completed"), F.col("passes")))
        .withColumn("dribble_pct", pct(F.col("dribbles_successful"), F.col("dribbles")))
        .withColumn("xg", pround("_xg_raw", 3))
        .withColumn("carry_distance", pround("_carry_raw", 1))
        .withColumn("minutes", pround(F.coalesce(minutes_est, F.lit(90.0)), 1))
        .withColumn("position", F.coalesce(F.col("_xi")["pos"], F.lit("Unknown")))
        .drop(
            "_xg_raw", "_carry_raw", "_me_n", "_t_first", "_t_last",
            "_on_min", "_off_min", "_xi",
        )
    )


def xa_per_match(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """xA: shots probe their key pass by id; if the pass was the player's,
    credit the shot's xG (J1, reference extended.py:226-253). A plain
    equi-join — Catalyst broadcasts the pass side when small; at scale both
    sides shuffle on the pass id."""
    shots = events.filter(
        F.expr(f"{P.IS_SHOT_S} AND shot.key_pass_id IS NOT NULL")
    ).selectExpr(
        "match_id AS s_match",
        "shot.key_pass_id AS kp_id",
        "shot.statsbomb_xg AS s_xg",
    )
    passes = events.filter(
        F.expr(f"{P.IS_PASS_S} AND {P.by_player_s(player_id)}")
    ).selectExpr("match_id AS p_match", "id AS p_id")
    return (
        shots.join(
            passes,
            (shots.kp_id == passes.p_id) & (shots.s_match == passes.p_match),
        )
        .groupBy(F.col("s_match").alias("match_id"))
        .agg(
            F.expr(
                "coalesce(CAST(sum(CAST(s_xg AS DECIMAL(18,10))) AS DOUBLE),"
                " 0.0e0)"
            ).alias("xa_raw")
        )
    )


def receptions_per_match(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """Progressive receptions (J6, reference extended.py:340-354): completed
    progressive passes (direction of the PASSING team) received by the
    player."""
    ev = with_direction(events)
    pred = (
        f"pass.recipient.id = {player_id}"
        f" AND {P.PASS_COMPLETED_V2_S}"
        f" AND {P.progressive_v2_s('attacks_right')}"
    )
    return (
        ev.filter(F.expr(pred))
        .groupBy("match_id")
        .agg(F.count(F.lit(1)).alias("progressive_receptions"))
    )


def counterpress_per_match(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """Counter-pressures (J5/O5, reference extended.py:357-384): the
    player's Pressure events within [0, 5 s] AFTER one of their own
    turnovers, same match+period, bounds inclusive; each pressure credited
    at most once (left-semi join ≡ the reference's `break`).

    Scale: equi-keys (match, period) + time-range residual — a range join,
    shuffle on the equi keys only. The streaming analogue is a
    watermarked stream-stream interval join (streaming module)."""
    t = P.EVENT_TIME_MIN_S
    losses = events.filter(
        F.expr(f"{P.IS_TURNOVER_S} AND {P.by_player_s(player_id)}")
    ).selectExpr(
        "match_id AS l_match", "period AS l_period", f"{t} AS l_t"
    )
    pressures = events.filter(
        F.expr(f"{P.IS_PRESSURE_S} AND {P.by_player_s(player_id)}")
    ).selectExpr(
        "match_id AS match_id", "period AS p_period", f"{t} AS p_t"
    )
    hit = pressures.join(
        losses,
        (F.col("match_id") == F.col("l_match"))
        & (F.col("p_period") == F.col("l_period"))
        & (F.col("p_t") >= F.col("l_t"))
        & (F.col("p_t") <= F.col("l_t") + FIVE_SECONDS_MIN),
        "left_semi",
    )
    return hit.groupBy("match_id").agg(F.count(F.lit(1)).alias("counter_pressures"))


def team_xg_per_match(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """team_total_xg: xG of ALL shots by the player's team — aggregated
    before any player filter (the §7 watch-list trap)."""
    teams = player_team(events, player_id)
    shots = events.filter(F.expr(P.IS_SHOT_S)).selectExpr(
        "match_id", "team.name AS shot_team", "shot.statsbomb_xg AS xg"
    )
    return (
        shots.join(F.broadcast(teams), "match_id")
        .filter(F.col("shot_team") == F.col("team"))
        .groupBy("match_id")
        .agg(
            F.expr(
                "coalesce(CAST(sum(CAST(xg AS DECIMAL(18,10))) AS DOUBLE),"
                " 0.0e0)"
            ).alias("team_total_xg_raw")
        )
    )


def per_match_extended(
    events: DataFrame, profile: DataFrame | None = None, player_id: int = P.PLAYER_ID
) -> DataFrame:
    """The extended per-match row (A2, reference extended.py:199-436):
    direction-aware pass/carry metrics + xA + receptions + counter-press +
    team xG, assembled from independent branch aggregates joined on
    match_id (the reference's four sequential passes become four parallel
    DataFrame branches off one scan)."""
    ev = with_direction(events)
    me = P.by_player_s(player_id)
    ar = "attacks_right"
    pcv2 = P.PASS_COMPLETED_V2_S
    prog = P.progressive_v2_s(ar)
    carry_ok = (
        f"({P.IS_CARRY_S} AND {P.END_X_S} IS NOT NULL"
        f" AND {P.LOC_X_S} IS NOT NULL)"
    )
    carry_dist = (
        f"(CASE WHEN {me} AND {carry_ok}"
        f" THEN {P.euclid_s(P.LOC_X_S, P.LOC_Y_S, P.END_X_S, P.END_Y_S)} END)"
    )
    # The reference's receptions pass (extended.py:340-354) reads the SAME
    # direction-joined stream as the main loop, just without the player
    # filter (the pass is a teammate's; only the recipient is the player).
    # Folding it into the one hash aggregate removes a second full scan and
    # a join: group the union of (player rows | rows received by player),
    # conjoin every main-loop predicate with `me`, and post-filter to
    # matches where the player actually appeared (preserving the row set of
    # the old main ⟕ receptions join).
    # Aggregates are textual-twin SQL (predicates.py) — one parse per
    # column instead of thousands of py4j calls (r15 driver-cost fix).
    reception = f"(pass.recipient.id = {player_id} AND {pcv2} AND {prog})"
    base = ev.filter(F.expr(f"{me} OR pass.recipient.id = {player_id}"))
    aggs = [
        (_cnt_s(me), "_me_n"),
        (_cnt_s(f"{me} AND {P.IS_PASS_S}"), "passes"),
        (_cnt_s(f"{me} AND {pcv2}"), "passes_completed"),
        (_cnt_s(f"{me} AND {pcv2} AND {prog}"), "progressive_passes"),
        (
            _cnt_s(f"{me} AND {pcv2} AND {P.in_final_third_s(P.END_X_S, ar)}"),
            "final_third_passes",
        ),
        (
            _cnt_s(
                f"{me} AND {pcv2}"
                f" AND {P.in_penalty_area_s(P.END_X_S, P.END_Y_S, ar)}"
            ),
            "penalty_area_passes",
        ),
        (_cnt_s(f"{me} AND {P.deep_completion_s(ar)}"), "deep_completions"),
        (_cnt_s(f"{me} AND {P.SWITCH_OF_PLAY_S}"), "switches"),
        (_cnt_s(f"{me} AND {P.IS_CROSS_S}"), "crosses"),
        (_cnt_s(f"{me} AND {P.IS_KEY_PASS_V2_S}"), "key_passes"),
        (_cnt_s(f"{me} AND {pcv2} AND pass.goal_assist = true"), "assists"),
        (
            _cnt_s(f"{me} AND {P.UNDER_PRESSURE_COMPLETED_PASS_S}"),
            "passes_under_pressure",
        ),
        (_cnt_s(f"{me} AND {P.IS_SHOT_S}"), "shots"),
        (
            _cnt_s(f"{me} AND {P.IS_SHOT_S} AND shot.outcome.name = 'Goal'"),
            "goals",
        ),
        (
            f"coalesce(CAST(sum(CAST(CASE WHEN {me} THEN shot.statsbomb_xg END"
            f" AS DECIMAL(18,10))) AS DOUBLE), 0.0e0)",
            "xg_raw",
        ),
        (_cnt_s(f"{me} AND {P.IS_DRIBBLE_S}"), "dribbles"),
        (_cnt_s(f"{me} AND {P.SUCCESSFUL_DRIBBLE_S}"), "dribbles_successful"),
        (_cnt_s(f"{me} AND {P.IS_CARRY_S}"), "carries"),
        (f"coalesce(sum({carry_dist}), 0.0e0)", "carry_distance_raw"),
        (_cnt_s(f"{me} AND {carry_ok} AND {prog}"), "progressive_carries"),
        (_cnt_s(f"{me} AND {P.IS_TACKLE_V2_S}"), "tackles"),
        (_cnt_s(f"{me} AND {P.IS_INTERCEPTION_S}"), "interceptions"),
        (_cnt_s(f"{me} AND {P.IS_BALL_RECOVERY_S}"), "ball_recoveries"),
        (_cnt_s(f"{me} AND {P.IS_PRESSURE_S}"), "pressures"),
        (_cnt_s(f"{me} AND {P.IS_TURNOVER_S}"), "turnovers"),
        (_cnt_s(reception), "progressive_receptions"),
    ]
    main = (
        base.groupBy("match_id")
        .agg(*[F.expr(s).alias(n) for s, n in aggs])
        .filter(F.col("_me_n") > 0)
        .drop("_me_n")
    )
    out = (
        main.join(xa_per_match(events, player_id), "match_id", "left")
        .join(counterpress_per_match(events, player_id), "match_id", "left")
        .join(team_xg_per_match(events, player_id), "match_id", "left")
        .fillna(
            {
                "xa_raw": 0.0,
                "counter_pressures": 0,
                "team_total_xg_raw": 0.0,
            }
        )
    )
    pct = lambda num, den: F.when(den > 0, pround(100.0 * num / den, 1)).otherwise(0.0)
    out = (
        out.withColumn("pass_pct", pct(F.col("passes_completed"), F.col("passes")))
        .withColumn("dribble_pct", pct(F.col("dribbles_successful"), F.col("dribbles")))
        .withColumn("xg", pround("xg_raw", 3))
        .withColumn("xa", pround("xa_raw", 3))
        .withColumn("team_total_xg", pround("team_total_xg_raw", 3))
        .withColumn("carry_distance", pround("carry_distance_raw", 1))
        .withColumn(
            "xg_share",
            F.when(
                F.col("team_total_xg_raw") > 0,
                pround(F.col("xg_raw") / F.col("team_total_xg_raw") * 100.0, 1),
            ).otherwise(0.0),
        )
        .drop("xg_raw", "xa_raw", "team_total_xg_raw", "carry_distance_raw")
    )
    if profile is not None:
        out = (
            out.join(F.broadcast(profile), "match_id", "left")
            .withColumn("minutes", F.coalesce("minutes", F.lit(90.0)))
            .withColumn("team", F.coalesce("team", F.lit("Unknown")))
            .withColumn("position", F.coalesce("position", F.lit("Unknown")))
        )
    return out


def season_summary_basic(stats: DataFrame) -> DataFrame:
    """Season rollup of the basic table (A3, reference analysis.py:664-691):
    sums + the weighted completion rate 100*Σcompleted/Σattempted."""
    sums = [
        F.sum(c).alias(f"total_{c}")
        for c in (
            "passes",
            "passes_completed",
            "key_passes",
            "progressive_passes",
            "shots",
            "goals",
            "dribbles",
            "carries",
            "pressures",
            "tackles",
            "interceptions",
            "ball_recoveries",
        )
    ]
    out = stats.agg(
        F.count(F.lit(1)).alias("matches"),
        *sums,
        pround(F.sum("xg"), 3).alias("total_xg"),
        pround(F.sum("minutes"), 1).alias("total_minutes"),
    )
    return out.withColumn(
        "pass_pct",
        F.when(
            F.col("total_passes") > 0,
            pround(100.0 * F.col("total_passes_completed") / F.col("total_passes"), 1),
        ).otherwise(0.0),
    )


def per90(stats: DataFrame, cols: list[str]) -> DataFrame:
    """Totals + per-90 rates (A4, reference extended.py:620-649)."""
    total_min = F.sum("minutes")
    aggs = [F.sum(c).alias(f"total_{c}") for c in cols]
    out = stats.agg(total_min.alias("total_minutes"), *aggs)
    for c in cols:
        out = out.withColumn(
            f"{c}_per90",
            F.when(
                F.col("total_minutes") > 0,
                pround(F.col(f"total_{c}") / F.col("total_minutes") * 90.0, 2),
            ).otherwise(0.0),
        )
    return out
