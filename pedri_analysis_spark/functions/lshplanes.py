"""Deterministic random hyperplanes for cosine-LSH, shared across engines.

Plane components are derived from md5 in PYTHON at plan-build time and
embedded as literal arrays in both the Spark plan and the DuckDB oracle —
so there is no cross-engine hashing at runtime at all; the two sides see
byte-identical constants.

The bucket decision is sign(dot(v, plane)); the dot product is evaluated
as the SAME sequential left fold in both engines (Spark ``aggregate`` HOF,
DuckDB ``list_reduce``), so even near-zero dots land on the same side of
the hyperplane in both.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

SPARK = "spark"
DUCK = "duck"


@lru_cache(maxsize=None)
def plane(p: int, dim: int) -> tuple[float, ...]:
    """Plane ``p`` over ``dim`` dimensions: components in [-1, 1] with 3
    decimals, derived from md5(p:d) — deterministic and reproducible."""
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()[:15], 16)
        out.append(round(((h % 2001) - 1000) / 1000.0, 3))
    return tuple(out)


def _lit_array(dialect: str, values: tuple[float, ...]) -> str:
    body = ", ".join(f"{v}" for v in values)
    if dialect == SPARK:
        return f"array({body})"
    return f"[{body}]"


def dot_literal(dialect: str, vec_expr: str, values: tuple[float, ...]) -> str:
    """Sequential left-fold dot product of a vector column with a literal
    plane — the DuckDB-oracle formulation. (The Spark side does NOT use
    this: Spark interprets HOF lambdas per element and an unrolled
    4096-term expression tree blows up codegen/task binaries, so the
    engine assigns buckets in one Arrow-vectorized UDF that accumulates
    dimensions in the same sequential order — bit-identical sums.)"""
    arr = _lit_array(dialect, values)
    if dialect == SPARK:
        return (
            f"aggregate(zip_with({vec_expr}, {arr}, "
            f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(generate_series(1, {len(values)}), "
        f"i -> {vec_expr}[i]::DOUBLE * ({arr})[i])), (acc, v) -> acc + v)"
    )


# NOTE: the r10-era fixed-k helpers (planes_matrix, bucket_key) were
# REMOVED with the r11 adaptive-k/L switch: their (table * bits + b)
# plane indexing contradicts the adaptive contract's fixed
# (table * K_MAX + b) stride, so a stale caller would silently assign
# buckets inconsistent with the shipped ann_lsh family.  The engine
# builds its sliced plane array inline in
# plans.similarity_queries._bucket_keys_udf; the oracle uses
# bucket_key_adaptive below.


def bucket_key_adaptive(
    dialect: str,
    vec_expr: str,
    table: int,
    max_bits: int,
    dim: int,
    k_expr: str,
) -> str:
    """LSH bucket for hash-table ``table`` with a DATA-DEPENDENT bit count:
    packs sign bits ``b < k_expr`` (an SQL expression, e.g. a params-CTE
    column) out of a fixed ``max_bits`` plane family — the oracle half of
    the adaptive-k/L design, where the engine picks k = ceil(log2(n /
    occupancy-target)) at plan time (plans.similarity_queries.lsh_params)
    and the oracle derives the SAME k from count(*) in SQL.  Plane
    indices are ``table * max_bits + b`` so every k selects a PREFIX of
    one fixed plane family (both engines see identical constants at any
    k).  The outer CASE guards the dot product itself: bits >= k are
    never evaluated, matching the engine side which never computes them
    (DuckDB evaluates CASE branches only on their selection vectors)."""
    terms = []
    for b in range(max_bits):
        d = dot_literal(dialect, vec_expr, plane(table * max_bits + b, dim))
        terms.append(
            f"(CASE WHEN {b} < {k_expr} THEN "
            f"(CASE WHEN ({d}) >= 0 THEN {1 << b} ELSE 0 END) ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"
