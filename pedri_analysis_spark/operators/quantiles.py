"""Distributed EXACT quantiles (linear-interpolated / ``quantile_cont``)
without ever materializing the column on a single reducer.

Spark's builtin exact ``percentile()`` collects every value of the group
into one aggregation buffer — a single-reducer scale-killer on a 100 TB
column.  This operator computes the identical result in three fully
distributed passes:

  1. **Sketch pass** — ``percentile_approx`` (Greenwald-Khanna, mergeable,
     map-side combined) brackets each target quantile with value bounds
     ``[lo, hi]`` whose rank error is deterministically ≤ n/accuracy.
  2. **Candidate pass** — one scan computes, per target, the exact count of
     rows strictly below ``lo`` and collects the (tiny, rank-width ≤
     8n/accuracy) sorted window of candidate values between the bounds.
  3. Pure column math picks the two order statistics around the target
     position ``q*(n-1)`` out of the candidate window and interpolates
     ``v_lo + (v_hi - v_lo) * frac`` — the same formula Spark's
     ``percentile`` and DuckDB's ``quantile_cont`` use, so results are
     bit-identical to the single-reducer form.

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

    eps = 1.0 / accuracy
    delta = 3 * eps  # rank slack: sketch error ± eps, window margin ± 2 eps
    lo_probs = [max(0.0, q - delta) for q in probs]
    hi_probs = [min(1.0, q + delta) for q in probs]

    # Pass 1: n + bracketing values.  percentile_approx returns actual
    # column elements, so lo/hi are valid comparison anchors.
    bounds = df.filter(v.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(v, lo_probs + hi_probs, F.lit(accuracy)).alias("b"),
    )

    # Pass 2: per target, exact rank offset below lo + the sorted candidate
    # window [lo, hi].  collect_list drops the nulls from the unmatched
    # branch, so each window is only the bracketed slice.
    k = len(probs)
    aggs = [F.first("n").alias("n")]
    for i in range(k):
        lo_i = F.element_at("b", i + 1)
        hi_i = F.element_at("b", k + i + 1)
        aggs.append(F.sum(F.when(v < lo_i, 1).otherwise(0)).alias(f"below_{i}"))
        aggs.append(
            F.sort_array(
                F.collect_list(F.when((v >= lo_i) & (v <= hi_i), v))
            ).alias(f"cand_{i}")
        )
    stats = df.crossJoin(F.broadcast(bounds)).agg(*aggs)

    # Pass 3 (column math on the 1-row frame): order statistics around
    # pos = q*(n-1), 0-based; interpolate exactly like percentile() /
    # quantile_cont.  element_at is 1-based, hence the +1.
    outs = []
    n1 = F.col("n") - F.lit(1)
    for i, q in enumerate(probs):
        pos = F.lit(q) * n1.cast("double")
        k0 = F.floor(pos).cast("long")
        frac = pos - k0.cast("double")
        base = (k0 + 1 - F.col(f"below_{i}")).cast("int")
        v_lo = F.element_at(f"cand_{i}", base)
        v_hi = F.element_at(f"cand_{i}", base + F.lit(1))
        exact = F.when(frac > 0, v_lo + (v_hi - v_lo) * frac).otherwise(v_lo)
        outs.append(exact.alias(names[i]))
    return stats.select(*outs)
