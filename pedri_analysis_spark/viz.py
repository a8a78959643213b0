"""Visualization layer (reference S8 family, SURVEY §2.10).

Split in two so the expensive part scales and the rendering part stays a
driver-side detail:

- ``*_data`` functions: the figure's input computed AS A DATAFRAME —
  binned heat grids, top-k bars, percentile radars. These are ordinary
  Spark aggregates (the 48×32 heat grid is a groupBy, not an
  np.histogram2d over collected points — the 100 TB-safe formulation of
  reference core/pedri_analysis_extended.py:562-565).
- ``render_*`` functions: tiny collected pandas → matplotlib, saved as
  PNG+SVG pairs like the reference (core/pedri_analysis.py:326-333).
  Import-gated: matplotlib is optional (absent in the build container);
  calling render without it raises a clear error, and everything up to
  the collect still works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pedri_analysis_spark.functions import predicates as P

HEAT_NX, HEAT_NY = 48, 32  # reference grid (extended.py:33)


def _matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "matplotlib is not installed in this environment; the *_data "
            "DataFrames are still available — render elsewhere"
        ) from e


def heatmap_data(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """Pitch-occupancy heat grid: bucket event locations into the 48×32
    grid and count — log1p-compressed like the reference (F8).

    Scale: groupBy(cell) over billions of events is a partial+final hash
    agg producing ≤1,536 rows; never collect raw points."""
    x, y = P.loc_x(), P.loc_y()
    return (
        events.filter(P.by_player(player_id) & x.isNotNull())
        .groupBy(
            F.floor(x / (P.PITCH_X / HEAT_NX)).cast("int").alias("gx"),
            F.floor(y / (P.PITCH_Y / HEAT_NY)).cast("int").alias("gy"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("intensity", F.log1p("n"))
    )


def top_matches_data(stats: DataFrame, metric: str, k: int = 20) -> DataFrame:
    """Top-k matches by a metric for bar charts (reference O2 top-20
    clip, core/pedri_analysis.py:362-364) — TakeOrderedAndProject."""
    return stats.select("match_id", metric).orderBy(
        F.desc(metric), F.asc("match_id")
    ).limit(k)


def histogram_data(stats: DataFrame, metric: str, bin_width: float) -> DataFrame:
    """Per-90-style metric histogram as bucket counts (reference A10)."""
    return (
        stats.groupBy(
            (F.floor(F.col(metric) / bin_width) * bin_width).alias("bin_start")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin_start")
    )


def radar_data(stats: DataFrame, metrics: list[str]) -> DataFrame:
    """Radar chart values: per-metric mean + min-max normalization bounds
    (reference utils/viz_radar.py:23-30 F9) in one aggregate row."""
    aggs = []
    for m in metrics:
        aggs += [
            F.avg(m).alias(f"{m}_mean"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    return stats.agg(*aggs)


def pass_map_data(events: DataFrame, player_id: int = P.PLAYER_ID) -> DataFrame:
    """Pass-map segments (start→end, completed flag, progressive flag) —
    the reference quiver input (core/pedri_analysis.py:526-593). Kept as a
    DataFrame; collect only the single match being rendered."""
    return events.filter(P.by_player(player_id) & P.is_pass()).select(
        "match_id",
        P.loc_x().alias("x1"),
        P.loc_y().alias("y1"),
        P.end_x().alias("x2"),
        P.end_y().alias("y2"),
        P.pass_completed_v1().alias("completed"),
        P.progressive_pass_v1().alias("progressive"),
    )


def render_heatmap(heat_df: DataFrame, out_base: str) -> list[str]:
    """Render the heat grid to PNG+SVG (requires matplotlib)."""
    plt = _matplotlib()
    import numpy as np

    grid = np.zeros((HEAT_NY, HEAT_NX))
    for r in heat_df.collect():
        if 0 <= r.gx < HEAT_NX and 0 <= r.gy < HEAT_NY:
            grid[r.gy, r.gx] = r.intensity
    fig, ax = plt.subplots(figsize=(9, 6))
    ax.imshow(grid, origin="lower", extent=[0, P.PITCH_X, 0, P.PITCH_Y], aspect="auto")
    ax.set_title("event heatmap (log1p)")
    paths = [f"{out_base}.png", f"{out_base}.svg"]
    for p in paths:
        fig.savefig(p)
    plt.close(fig)
    return paths
