"""Distributed EXACT quantiles (linear-interpolated / ``quantile_cont``)
without ever materializing the column on a single reducer.

Spark's builtin exact ``percentile()`` collects every value of the group
into one aggregation buffer — a single-reducer scale-killer on a 100 TB
column.  This operator computes the identical result in two fully
distributed scans (three only when n < accuracy, i.e. small data):

  1. **Sketch pass** — ``percentile_approx`` (Greenwald-Khanna, mergeable,
     map-side combined) brackets each target quantile with value bounds
     ``[lo, hi]`` whose rank error is deterministically ≤ n/accuracy.
     The 1-row result (n + 2k bracket values) is collected driver-side —
     a bounded model, like any cutpoint set.  If n < accuracy the
     probability-space bracket can be narrower than ±3 ranks, so the
     bracket is recomputed once with the RANK-space slack 3/n (the
     sketch is exact in this regime, so ±3 ranks always suffices).
  2. **Candidate pass** — one scan computes, per target, the exact count
     of rows strictly below ``lo`` and collects the (tiny, rank-width
     ≤ 8n/accuracy) sorted window of candidate values between the bounds.
  3. Pure driver arithmetic picks the two order statistics around the
     target position ``q*(n-1)`` out of the candidate window and
     interpolates ``v_lo + (v_hi - v_lo) * frac`` — the same formula
     Spark's ``percentile`` and DuckDB's ``quantile_cont`` use, so
     results are bit-identical to the single-reducer form.

At sf0.1 (~600k rows, accuracy 10k) each window holds ~500 values; the
guarantee scales to ~10^9 rows per refinement pass at that accuracy, and
wider data just raises ``accuracy`` (sketch memory is O(accuracy·log n),
still kB-scale).  Reference parity: this backs the reference's
equal-frequency discretizer semantics (quartile binning over a metric
column); see plans/relational_ext.py::q_quantile_binning_price.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_quantiles"]


def _bracket_values(
    nn: DataFrame, v: Column, probs: list[float], delta: float, accuracy: int
) -> tuple[int, list[float]]:
    """One sketch scan: (n, bracket values at probs∓delta / probs±delta)."""
    lo_probs = [max(0.0, q - delta) for q in probs]
    hi_probs = [min(1.0, q + delta) for q in probs]
    row = nn.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(v, lo_probs + hi_probs, F.lit(accuracy)).alias("b"),
    ).collect()[0]
    return int(row["n"]), [float(x) for x in row["b"]]


def exact_quantiles(
    df: DataFrame,
    col: str | Column,
    probs: list[float],
    names: list[str] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """Return a 1-row DataFrame with one double column per requested
    quantile (named ``names[i]`` or ``q_<i>``), equal to
    ``percentile(col, probs)`` but computed distributed.

    ``df`` must have at least one non-null value of ``col``; nulls are
    ignored (as in ``percentile``).
    """
    v = F.col(col).cast("double") if isinstance(col, str) else col.cast("double")
    names = names or [f"q_{i}" for i in range(len(probs))]
    if len(names) != len(probs):
        raise ValueError("names and probs must have equal length")

    # Parallelizing the passes stays REJECTED after two attempts:
    # spread() alone (r15 — the exchange re-materializes per collected
    # pass, binning/winsorize regressed 1.7→2.9/3.3 s) and r16's
    # spread+persist (same-session interleaved A/B: old 0.75–0.97 s vs
    # new 1.34–1.64 s steady-state — the repartition exchange + cache
    # fill cost more than the single-task GK sketch they parallelize).
    # The sketch is cheap per row; the passes are exchange-dominated.
    nn = df.filter(v.isNotNull()).select(v.alias("__v"))
    vv = F.col("__v")

    # Pass 1: n + bracketing values.  percentile_approx returns actual
    # column elements, so lo/hi are valid comparison anchors.  The
    # probability-space slack 3/accuracy guarantees the [k0+1, k0+2]
    # order statistics land in the window only when the rank slack
    # 2n/accuracy ≥ 2; for n < accuracy re-bracket with rank-space slack
    # 3/n (sketch is exact there, so ±3 ranks always covers both).
    k = len(probs)
    n, b = _bracket_values(nn, vv, probs, 3.0 / accuracy, accuracy)
    if n == 0:
        raise ValueError("exact_quantiles: column has no non-null values")
    if n < accuracy:
        n, b = _bracket_values(nn, vv, probs, 3.0 / n, accuracy)

    # Pass 2: per target, exact rank offset below lo + the sorted
    # candidate window [lo, hi] (literal bounds — no join needed).
    # collect_list drops the nulls from the unmatched branch, so each
    # window is only the bracketed slice.
    aggs = []
    for i in range(k):
        lo_i, hi_i = F.lit(b[i]), F.lit(b[k + i])
        aggs.append(F.sum(F.when(vv < lo_i, 1).otherwise(0)).alias(f"below_{i}"))
        aggs.append(
            F.sort_array(
                F.collect_list(F.when((vv >= lo_i) & (vv <= hi_i), vv))
            ).alias(f"cand_{i}")
        )
    stats = nn.agg(*aggs)

    # Pass 3 (driver arithmetic on the 1-row frame): order statistics
    # around pos = q*(n-1), 0-based; interpolate exactly like
    # percentile() / quantile_cont.  element_at is 1-based, hence the +1;
    # any bracket violation surfaces loudly as an ANSI error rather than
    # a silent null.
    outs = []
    for i, q in enumerate(probs):
        pos = q * (n - 1)
        k0 = int(pos // 1)
        frac = pos - k0
        base = (F.lit(k0 + 1) - F.col(f"below_{i}")).cast("int")
        v_lo = F.element_at(f"cand_{i}", base)
        if frac > 0:
            v_hi = F.element_at(f"cand_{i}", base + F.lit(1))
            outs.append((v_lo + (v_hi - v_lo) * F.lit(frac)).alias(names[i]))
        else:
            outs.append(v_lo.alias(names[i]))
    return stats.select(*outs)
