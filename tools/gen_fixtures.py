"""Generate deterministic StatsBomb-like event fixtures (FIXTURES.md §B).

One JSON array per match under tests/fixtures/events/<match_id>.json plus
tests/fixtures/pedri_profile.json. No RNG — every value is hand-chosen to
drive a specific edge case, and the files are committed so the oracle SQL
(DuckDB read_json) and the golden tests see identical bytes.

Scenarios (FIXTURES.md §B list):
  1001 baseline: every event type, Starting XI position, no subs
  1002 sub-on  (replacement.id == 30486 at minute 60)
  1003 sub-off (player 30486 substituted off at minute 70)
  1004 pass-semantics: outcome absent / 'Complete' / 'Incomplete'
  1005 progressive/zone thresholds + period-2 direction flip
  1006 xA: key pass by Pedri / by teammate / opponent shot (team xG)
  1007 counter-press: +4.9 s (in), +5.0 s (in, inclusive), +5.1 s (out),
       other-period (out)
  1008 direction inference: Barcelona attacks LEFT (mean Δx < 0)
  1009 progressive receptions (pass.recipient.id == 30486)
  9999 zero Pedri events (excluded from stats)
  bad.json (malformed), notarray.json (dict, not array)
"""

from __future__ import annotations

import json
import os

P = 30486  # Pedri
TEAM = "Barcelona"
OPP = "Opponent FC"
FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")


def ev(i, type_name, player=P, team=TEAM, minute=0, second=0, period=1, **kw):
    e = {
        "id": f"e{i:04d}",
        "type": {"name": type_name},
        "period": period,
        "minute": minute,
        "second": second,
    }
    if player is not None:
        e["player"] = {"id": player, "name": "Pedri" if player == P else f"p{player}"}
    if team is not None:
        e["team"] = {"name": team}
    e.update(kw)
    return e


def mk_pass(i, minute, second, loc, end, player=P, team=TEAM, period=1, outcome=None, **pk):
    top = {}
    if "under_pressure" in pk:
        top["under_pressure"] = pk.pop("under_pressure")
    p = {"end_location": end}
    if outcome is not None:
        p["outcome"] = {"name": outcome}
    p.update(pk)
    return ev(i, "Pass", player, team, minute, second, period, location=loc, **{"pass": p}, **top)


def direction_anchor(istart, team=TEAM, right=True, period=1):
    """Four completed 1st-half passes establishing the attack direction
    (mean Δx sign) for ``team`` — reference extended.py:89-107."""
    out = []
    for j in range(4):
        sx = 30.0 + j
        ex = sx + (20.0 if right else -20.0)
        out.append(
            mk_pass(istart + j, 1 + j, 0, [sx, 40.0], [ex, 40.0], player=P if team == TEAM else 999, team=team, period=period)
        )
    return out


def baseline_1001():
    evs = [
        ev(
            0,
            "Starting XI",
            player=None,
            team=TEAM,
            tactics={
                "lineup": [
                    {"player": {"id": P, "name": "Pedri"}, "position": {"name": "Center Midfield"}},
                    {"player": {"id": 111, "name": "x"}, "position": {"name": "Goalkeeper"}},
                ]
            },
        ),
        ev(1, "Starting XI", player=None, team=OPP, tactics={"lineup": [{"player": {"id": 222}, "position": {"name": "Striker"}}]}),
    ]
    evs += direction_anchor(2)  # Barcelona attacks right
    evs += [
        # completed pass (no outcome key)
        mk_pass(10, 10, 0, [50.0, 40.0], [65.0, 42.0]),
        # incomplete pass
        mk_pass(11, 12, 0, [50.0, 40.0], [70.0, 40.0], outcome="Incomplete"),
        # key pass (shot_assist) + the assisted shot
        mk_pass(12, 20, 0, [80.0, 40.0], [100.0, 42.0], shot_assist=True, assisted_shot_id="e0013"),
        ev(13, "Shot", player=333, minute=20, second=5, location=[100.0, 42.0], shot={"statsbomb_xg": 0.3, "outcome": {"name": "Saved"}, "key_pass_id": "e0012"}),
        # Pedri's own shot -> goal
        ev(14, "Shot", minute=30, second=0, location=[105.0, 40.0], shot={"statsbomb_xg": 0.4, "outcome": {"name": "Goal"}}),
        # dribbles
        ev(15, "Dribble", minute=33, second=0, location=[60.0, 30.0], dribble={"outcome": {"name": "Complete"}}),
        ev(16, "Dribble", minute=34, second=0, location=[61.0, 30.0], dribble={"outcome": {"name": "Incomplete"}}),
        # carry 3-4-5 triangle => distance 5
        ev(17, "Carry", minute=36, second=0, location=[50.0, 30.0], carry={"end_location": [53.0, 34.0]}),
        # defensive events
        ev(18, "Pressure", minute=40, second=0, location=[55.0, 35.0]),
        ev(19, "Duel", minute=42, second=0, duel={"type": {"name": "Tackle"}}),
        ev(20, "Interception", minute=44, second=0),
        ev(21, "Ball Recovery", minute=46, second=0),
        ev(22, "Miscontrol", minute=50, second=0),
        # opponent shot (team_total_xg must NOT include it for Barcelona)
        ev(23, "Shot", player=444, team=OPP, minute=55, second=0, location=[20.0, 40.0], shot={"statsbomb_xg": 0.2, "outcome": {"name": "Off T"}}),
        # last Pedri event at minute 88 -> event-span minutes estimate
        mk_pass(24, 88, 0, [40.0, 40.0], [52.0, 41.0]),
    ]
    for e in evs:
        e["match_date"] = "2023-03-10"
    return evs


def sub_on_1002():
    evs = direction_anchor(0, team=TEAM)
    evs += [
        ev(10, "Substitution", player=555, minute=60, second=0, substitution={"replacement": {"id": P, "name": "Pedri"}}),
        mk_pass(11, 62, 0, [50.0, 40.0], [61.0, 40.0]),
        mk_pass(12, 89, 0, [50.0, 40.0], [62.0, 40.0]),
    ]
    for e in evs:
        e["match_date"] = "2023-03-17 00:00:00"  # second of the reference's three formats (F5)
    return evs


def sub_off_1003():
    evs = direction_anchor(0, team=TEAM)
    evs += [
        mk_pass(10, 5, 0, [50.0, 40.0], [61.0, 40.0]),
        ev(11, "Substitution", player=P, minute=70, second=0, substitution={"replacement": {"id": 666}}),
    ]
    for e in evs:
        e["match_date"] = "01/04/2023"  # DD/MM/YYYY, third reference format
    return evs


def pass_semantics_1004():
    evs = direction_anchor(0)
    evs += [
        mk_pass(10, 10, 0, [50.0, 40.0], [60.0, 40.0]),                       # (a) absent outcome
        mk_pass(11, 11, 0, [50.0, 40.0], [60.0, 40.0], outcome="Complete"),   # (b) explicit Complete
        mk_pass(12, 12, 0, [50.0, 40.0], [60.0, 40.0], outcome="Incomplete"), # (c) Incomplete
    ]
    for e in evs:
        e["match_date"] = "2023-04-08"
    return evs


def progressive_zones_1005():
    evs = direction_anchor(0)  # attacks right in period 1
    evs += [
        # exactly dx=10, dy=0: v1 progressive (10>=10 and 10>0); v2: forward 10 and
        # 30% closer? start (50,40)->goal 70 away; end (60,40)-> 60 away: 60 > 49 -> NOT v2
        mk_pass(10, 10, 0, [50.0, 40.0], [60.0, 40.0]),
        # big forward pass: v1 and v2 both (end 100,40: 20 <= 0.7*70=49 yes)
        mk_pass(11, 12, 0, [50.0, 40.0], [100.0, 40.0]),
        # final third end (x>=80) + penalty area end (x>=102, 18<=y<=62) + deep completion (<20 to goal)
        mk_pass(12, 14, 0, [90.0, 40.0], [104.0, 40.0]),
        # switch of play: |dy|>=40 and length>=30
        mk_pass(13, 16, 0, [50.0, 10.0], [55.0, 70.0]),
        # cross into the box — excluded from deep completions
        mk_pass(14, 18, 0, [95.0, 5.0], [110.0, 40.0], cross=True),
        # under pressure completed pass
        mk_pass(15, 20, 0, [30.0, 30.0], [35.0, 30.0], under_pressure=True),
        # PERIOD 2: direction flips (attacks left) — same geometry now regressive
        mk_pass(16, 50, 0, [50.0, 40.0], [40.0, 40.0], period=2),  # forward 10 in p2 (toward x=0)
        # carries: progressive carry p1 (toward right >=5? spec: use progressive_v2 on carry)
        ev(17, "Carry", minute=22, second=0, location=[50.0, 40.0], carry={"end_location": [85.0, 40.0]}),
    ]
    evs[-1]["match_date"] = "2023-04-15"
    for e in evs:
        e["match_date"] = "2023-04-15"
    return evs


def xa_1006():
    evs = direction_anchor(0)
    evs += [
        # Pedri key pass -> teammate shot 0.35 xg (xa credit)
        mk_pass(10, 10, 0, [70.0, 40.0], [95.0, 41.0], shot_assist=True, assisted_shot_id="e0011"),
        ev(11, "Shot", player=333, minute=10, second=10, location=[95.0, 41.0], shot={"statsbomb_xg": 0.35, "outcome": {"name": "Saved"}, "key_pass_id": "e0010"}),
        # teammate key pass -> shot (no credit to Pedri)
        mk_pass(12, 20, 0, [70.0, 40.0], [95.0, 39.0], player=777, shot_assist=True, assisted_shot_id="e0013"),
        ev(13, "Shot", player=888, minute=20, second=10, location=[95.0, 39.0], shot={"statsbomb_xg": 0.25, "outcome": {"name": "Off T"}, "key_pass_id": "e0012"}),
        # goal assist by Pedri
        mk_pass(14, 30, 0, [70.0, 40.0], [98.0, 40.0], goal_assist=True, assisted_shot_id="e0015"),
        ev(15, "Shot", player=333, minute=30, second=10, location=[98.0, 40.0], shot={"statsbomb_xg": 0.5, "outcome": {"name": "Goal"}, "key_pass_id": "e0014"}),
        # opponent shot: counts to opponent total only
        ev(16, "Shot", player=444, team=OPP, minute=40, second=0, location=[15.0, 40.0], shot={"statsbomb_xg": 0.15, "outcome": {"name": "Saved"}}),
    ]
    for e in evs:
        e["match_date"] = "2023-04-22"
    return evs


def counterpress_1007():
    evs = direction_anchor(0)
    evs += [
        ev(10, "Miscontrol", minute=10, second=0),                      # loss at 600.0s
        ev(11, "Pressure", minute=10, second=4),                        # +4.0s in
        ev(12, "Dispossessed", minute=20, second=0),                    # loss at 1200.0s
        ev(13, "Pressure", minute=20, second=5),                        # +5.0s in (inclusive bound)
        ev(14, "Miscontrol", minute=30, second=0),                      # loss at 1800.0s
        ev(15, "Pressure", minute=30, second=6),                        # +6.0s out
        ev(16, "Miscontrol", minute=40, second=0, period=1),            # loss p1
        ev(17, "Pressure", minute=40, second=2, period=2),              # same clock, other period: out
        ev(18, "Pressure", minute=44, second=0),                        # no loss nearby: out
    ]
    for e in evs:
        e["match_date"] = "2023-04-29"
    return evs


def direction_left_1008():
    evs = direction_anchor(0, right=False)  # Barcelona attacks LEFT
    evs += [
        # "forward" now means decreasing x: dx toward goal = 15
        mk_pass(10, 10, 0, [60.0, 40.0], [45.0, 40.0]),
        # end x<=40 is the final third when attacking left
        mk_pass(11, 12, 0, [50.0, 40.0], [30.0, 40.0]),
    ]
    for e in evs:
        e["match_date"] = "2023-05-06"
    return evs


def receptions_1009():
    evs = direction_anchor(0)
    evs += [
        # teammate completed progressive pass received by Pedri
        mk_pass(10, 10, 0, [40.0, 40.0], [80.0, 40.0], player=777, recipient={"id": P, "name": "Pedri"}),
        # incomplete one — not a reception
        mk_pass(11, 12, 0, [40.0, 40.0], [82.0, 40.0], player=777, outcome="Incomplete", recipient={"id": P}),
        # short sideways — completed but not progressive
        mk_pass(12, 14, 0, [40.0, 40.0], [42.0, 41.0], player=777, recipient={"id": P}),
    ]
    for e in evs:
        e["match_date"] = "2023-05-13"
    return evs


def no_pedri_9999():
    evs = direction_anchor(0, team=OPP)
    for e in evs:
        e["match_date"] = "2023-05-20"
    return evs


def main() -> None:
    events_dir = os.path.join(FIX, "events")
    os.makedirs(events_dir, exist_ok=True)
    matches = {
        1001: baseline_1001(),
        1002: sub_on_1002(),
        1003: sub_off_1003(),
        1004: pass_semantics_1004(),
        1005: progressive_zones_1005(),
        1006: xa_1006(),
        1007: counterpress_1007(),
        1008: direction_left_1008(),
        1009: receptions_1009(),
        9999: no_pedri_9999(),
    }
    for mid, evs in matches.items():
        with open(os.path.join(events_dir, f"{mid}.json"), "w") as f:
            json.dump(evs, f, indent=1)
    with open(os.path.join(events_dir, "bad.json"), "w") as f:
        f.write("{not valid json!!")
    with open(os.path.join(events_dir, "notarray.json"), "w") as f:
        json.dump({"oops": "a dict, not an array"}, f)
    profile = [
        {"match_id": 1001, "team_name": TEAM, "minutes": 88.0, "position": "CM"},
        {"id": 1002, "team_name": TEAM, "minutes": 30.0, "position": "CM"},
        {"matchId": 1003, "team": TEAM, "minutes": 70.0},
        {"match": 1004, "team_name": TEAM},
        {"match_id": 1005, "team_name": TEAM, "minutes": 90.0, "position": "CM"},
        {"match_id": 1006, "team_name": TEAM, "minutes": 90.0, "position": "CM"},
        {"match_id": 1007, "team_name": TEAM, "minutes": 90.0, "position": "CM"},
        {"match_id": 1008, "team_name": TEAM, "minutes": 90.0, "position": "CM"},
        {"match_id": 1009, "team_name": TEAM, "minutes": 90.0, "position": "CM"},
    ]
    with open(os.path.join(FIX, "pedri_profile.json"), "w") as f:
        json.dump(profile, f, indent=1)
    print(f"wrote {len(matches)} match files + 2 dirty files + profile to {FIX}")


if __name__ == "__main__":
    main()
