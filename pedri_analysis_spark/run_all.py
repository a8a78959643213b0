"""End-to-end pipeline orchestrator (SURVEY §3.1).

One call / one command produces the reference's complete output set —
mirroring ``automation/run_all.py:21-26`` (stage order: lineup inspection
→ profile → match-id discovery → full analysis) and
``core/pedri_analysis.py:597-751`` + ``core/pedri_analysis_extended.py:
590-700`` (the artifact list):

    out_dir/
      pedri_profile.json            profile rows built from events
      pedri_match_ids.txt           sorted match ids, one per line
      csv/pedri_match_stats.csv             basic column subset
      csv/pedri_match_stats_extended.csv    full extended per-match table
      csv/pedri_per_match_stats.csv         compat copy (extended)
      csv/pedri_summary.csv                 1-row season summary
      pedri_summary_extended.json           totals + per90 JSON
      figures/<family>.csv                  figure DATA (always)
      figures/<family>.png + .svg           rendered (when matplotlib)

Every figure family's *data* is written as a CSV unconditionally — the
data builders are Spark aggregates and the contract of this engine; the
matplotlib render is an optional driver-side detail (import-gated), so
the artifact set is deterministic in containers without plotting libs.

Scale: each stage is a DataFrame plan over ONE cached parse of the event
corpus; sinks are the coalesce(1) single-file writers (correct for the
per-match/1-row grains they serve — see sources.sinks).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pedri_analysis_spark.plans.pedri_pipeline import (
    lineup_position,
    minutes_estimate,
    per_match_basic,
    per_match_extended,
    player_team,
    pround,
)
from pedri_analysis_spark.sources.events import read_events, read_profile
from pedri_analysis_spark.sources.sinks import (
    write_csv_single,
    write_json_summary,
    write_text_list,
)
from pedri_analysis_spark import viz

# reference core/pedri_analysis.py:637-648 (basic CSV subset; `passes` is
# exported under the reference's `passes_attempted` name)
BASIC_CSV_COLS = [
    ("match_id", "match_id"),
    ("match_date", "match_date"),
    ("position", "position"),
    ("minutes", "minutes"),
    ("passes", "passes_attempted"),
    ("passes_completed", "passes_completed"),
    ("pass_pct", "pass_pct"),
    ("key_passes", "key_passes"),
    ("progressive_passes", "progressive_passes"),
    ("shots", "shots"),
    ("xg", "xg"),
]


def _p90(col: str) -> F.Column:
    m = F.col("minutes")
    return F.when(m > 0, F.col(col) / m * 90.0).otherwise(0.0)


def _summary_basic(stats: DataFrame) -> DataFrame:
    """The reference's 1-row season summary (core/pedri_analysis.py:
    665-688), with its exact key names and rounding."""
    s = lambda c: F.sum(c)
    return stats.agg(
        F.count(F.lit(1)).alias("matches"),
        pround(s("minutes"), 1).alias("minutes_total"),
        s("passes").alias("passes_attempted"),
        s("passes_completed").alias("passes_completed"),
        F.when(
            s("passes") > 0,
            pround(100.0 * s("passes_completed") / s("passes"), 2),
        )
        .otherwise(0.0)
        .alias("pass_pct_weighted"),
        s("key_passes").alias("key_passes"),
        s("progressive_passes").alias("progressive_passes"),
        s("shots").alias("shots"),
        pround(s("xg"), 3).alias("xg"),
        s("dribbles").alias("dribbles_attempted"),
        s("dribbles_successful").alias("dribbles_completed"),
        s("carries").alias("carries"),
        pround(s("carry_distance"), 1).alias("carry_distance_units"),
        s("pressures").alias("pressures"),
        s("tackles").alias("tackles"),
        s("interceptions").alias("interceptions"),
        s("ball_recoveries").alias("ball_recoveries"),
    )


def _summary_extended_payload(ext: DataFrame) -> dict:
    """totals + per90 JSON payload (reference extended.py:640-652): sum
    every numeric per-match column except identifiers/minutes, each total
    and its per-90 rate rounded to 3."""
    num_cols = [
        f.name
        for f in ext.schema.fields
        if f.dataType.typeName() in ("long", "double", "integer", "bigint")
        and f.name not in ("match_id", "minutes")
    ]
    aggs = [F.count(F.lit(1)).alias("_matches"), F.sum("minutes").alias("_minutes")]
    aggs += [F.sum(c).alias(c) for c in num_cols]
    row = ext.agg(*aggs).collect()[0]
    total_minutes = float(row["_minutes"] or 0.0)
    totals, per90 = {}, {}
    for c in num_cols:
        v = float(row[c] or 0.0)
        totals[c] = round(v, 3)
        per90[c] = round(v / total_minutes * 90.0, 3) if total_minutes > 0 else 0.0
    return {
        "matches": int(row["_matches"]),
        "minutes": round(total_minutes, 1),
        "totals": totals,
        "per90": per90,
    }


def _have_matplotlib() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


def _figure(
    artifacts: dict[str, str],
    name: str,
    data_df: DataFrame,
    fig_dir: str,
    render,
    order_by: list[str] | None = None,
) -> None:
    """Write the figure's data CSV always; render PNG+SVG when possible."""
    data_path = write_csv_single(data_df, os.path.join(fig_dir, f"{name}.csv"), order_by)
    artifacts[f"fig:{name}:data"] = data_path
    if _have_matplotlib():
        for p in render(os.path.join(fig_dir, name)):
            artifacts[f"fig:{name}:{os.path.splitext(p)[1][1:]}"] = p


def run_all(
    spark: SparkSession,
    events_dir: str,
    profile_path: str | None = None,
    out_dir: str = "outputs",
) -> dict[str, str]:
    """Run every stage end-to-end; returns {artifact-name: path}."""
    csv_dir = os.path.join(out_dir, "csv")
    fig_dir = os.path.join(out_dir, "figures")
    for d in (out_dir, csv_dir, fig_dir):
        os.makedirs(d, exist_ok=True)
    artifacts: dict[str, str] = {}

    events = read_events(spark, events_dir).cache()
    try:
        # -- stage 1: lineup inspection (reference pedri_inspect_lineups) --
        positions = lineup_position(events)
        pos_report = positions.groupBy(
            F.col("position_xi").alias("position")
        ).agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.slice(F.sort_array(F.collect_list("match_id")), 1, 10).alias(
                "match_ids_preview"
            ),
        )
        pos_report.show(truncate=False)  # the reference's stdout report

        # -- stage 2: profile build (reference pedri_profile) --
        profile_rows = (
            player_team(events)
            .join(minutes_estimate(events), "match_id", "left")
            .join(positions, "match_id", "left")
            .select(
                "match_id",
                F.col("team").alias("team_name"),
                pround(F.coalesce("minutes_est", F.lit(90.0)), 1).alias("minutes"),
                F.col("position_xi").alias("position"),
            )
        )
        profile_out = os.path.join(out_dir, "pedri_profile.json")
        rows = [r.asDict() for r in profile_rows.orderBy("match_id").collect()]
        with open(profile_out, "w") as f:
            json.dump(rows, f, indent=1, default=str)
        artifacts["profile_json"] = profile_out

        # -- stage 3: match-id discovery (reference find_pedri_matches) --
        from pedri_analysis_spark.functions.predicates import PLAYER_ID

        mids = events.filter(F.col("player.id") == PLAYER_ID).select("match_id")
        artifacts["match_ids_txt"] = write_text_list(
            mids, os.path.join(out_dir, "pedri_match_ids.txt"), "match_id"
        )

        # -- stage 4: basic analysis + CSVs (reference pedri_analysis) --
        basic = per_match_basic(events).cache()
        # reference sort: PARSED multi-format date, then match id
        # (core/pedri_analysis.py:621-634 — string order would put
        # dd/MM/yyyy dates wrong)
        parsed_date = F.coalesce(
            F.expr("try_to_timestamp(match_date, 'yyyy-MM-dd')"),
            F.expr("try_to_timestamp(match_date, 'yyyy-MM-dd HH:mm:ss')"),
            F.expr("try_to_timestamp(match_date, 'dd/MM/yyyy')"),
        )
        basic_subset = basic.withColumn("_dt", parsed_date).select(
            "_dt",
            *[F.col(src).alias(dst) for src, dst in BASIC_CSV_COLS if src in basic.columns],
        )
        artifacts["basic_csv"] = write_csv_single(
            basic_subset.orderBy("_dt", "match_id").drop("_dt"),
            os.path.join(csv_dir, "pedri_match_stats.csv"),
        )
        artifacts["summary_csv"] = write_csv_single(
            _summary_basic(basic), os.path.join(csv_dir, "pedri_summary.csv")
        )

        # -- stage 5: extended analysis + CSVs + JSON summary --
        profile = read_profile(spark, profile_path or profile_out)
        ext = per_match_extended(events, profile).cache()
        artifacts["extended_csv"] = write_csv_single(
            ext, os.path.join(csv_dir, "pedri_match_stats_extended.csv"), ["match_id"]
        )
        artifacts["compat_csv"] = write_csv_single(
            ext, os.path.join(csv_dir, "pedri_per_match_stats.csv"), ["match_id"]
        )
        ext_json = os.path.join(out_dir, "pedri_summary_extended.json")
        with open(ext_json, "w") as f:
            json.dump(_summary_extended_payload(ext), f, indent=2)
        artifacts["summary_extended_json"] = ext_json

        # -- stage 6: figures (data always; render when matplotlib) --
        for metric in ("key_passes", "progressive_passes", "pass_pct"):
            top = viz.top_matches_data(basic, metric, k=20)
            _figure(
                artifacts,
                f"pedri_{metric}_per_match",
                top,
                fig_dir,
                lambda base, t=top, m=metric: viz.render_bars(t, m, base),
            )
        for metric in ("pressures", "tackles", "interceptions"):
            hist = viz.histogram_data(
                basic.withColumn(f"{metric}_p90", _p90(metric)), f"{metric}_p90", 1.0
            )
            _figure(
                artifacts,
                f"pedri_{metric}_p90_hist",
                hist,
                fig_dir,
                lambda base, h=hist: viz.render_histogram(h, base),
                ["bin_start"],
            )
        heat = viz.heatmap_data(events)
        _figure(
            artifacts,
            "pedri_event_heatmap",
            heat,
            fig_dir,
            lambda base, h=heat: viz.render_heatmap(h, base),
            ["gx", "gy"],
        )
        radar = viz.radar_percentile_data(
            basic,
            ["key_passes", "progressive_passes", "shots", "xg",
             "dribbles_successful", "pressures", "tackles", "interceptions"],
        ).cache()
        radar_row = radar.collect()[0]
        raw_metrics = [c for c in radar.columns if c.endswith("_raw")]
        pct_metrics = [c for c in radar.columns if c.endswith("_pctile")]
        _figure(
            artifacts,
            "pedri_radar_p90_raw",
            radar.select(*raw_metrics),
            fig_dir,
            lambda base: viz.render_radar(radar_row, raw_metrics, base),
        )
        _figure(
            artifacts,
            "pedri_radar_p90_percentile",
            radar.select(*pct_metrics),
            fig_dir,
            lambda base: viz.render_radar(radar_row, pct_metrics, base, rmax=100.0),
        )
        segments = viz.pass_map_data(events)
        _figure(
            artifacts,
            "pedri_pass_map_all",
            segments,
            fig_dir,
            lambda base, s=segments: viz.render_pass_map(s, base),
            ["match_id", "x1", "y1"],
        )
        _figure(
            artifacts,
            "pedri_pass_map_progressive",
            segments.filter(F.col("progressive")),
            fig_dir,
            lambda base, s=segments: viz.render_pass_map(s, base, progressive_only=True),
            ["match_id", "x1", "y1"],
        )
        trend = viz.trend_per90_data(ext)
        _figure(
            artifacts,
            "trend_kp_pp_per90",
            trend,
            fig_dir,
            lambda base, t=trend: viz.render_trend(t, base),
            ["idx"],
        )
        scatter = viz.scatter_pp_pc_data(ext)
        _figure(
            artifacts,
            "scatter_pp_vs_pc",
            scatter,
            fig_dir,
            lambda base, s=scatter: viz.render_scatter(s, base),
            ["match_id"],
        )
    finally:
        events.unpersist()
    return artifacts


def main() -> None:
    import argparse

    from pedri_analysis_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser(description="Run the full analysis pipeline")
    ap.add_argument(
        "--events-dir", default=os.path.join(repo, "tests", "fixtures", "events")
    )
    ap.add_argument("--profile", default=None, help="profile JSON side input")
    ap.add_argument("--out-dir", default="outputs")
    args = ap.parse_args()

    spark = get_spark(app_name="pedri-run-all")
    artifacts = run_all(spark, args.events_dir, args.profile, args.out_dir)
    for name in sorted(artifacts):
        print(f"{name}: {artifacts[name]}")
    spark.stop()


if __name__ == "__main__":
    main()
