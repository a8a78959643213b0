"""Dual-dialect text/hash expression builders.

The dedup / text-analysis / similarity operators must be verifiable
against the DuckDB oracle, which means every hash, tokenization, and
shingle step has to produce *bit-identical* values in Spark SQL and DuckDB
SQL.  Each builder here emits the expression in both dialects from one
spec, so the two sides cannot drift.

Cross-engine primitives verified to agree exactly:
- ``md5(s)`` hex digest (both engines);
- hex→int:  Spark ``CAST(CONV(SUBSTRING(md5(x),1,15),16,10) AS BIGINT)``
  ≡ DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT`` (60 bits, positive);
- ``split``/``string_split_regex`` on ``\\s+``;
- list ``transform/list_transform``, ``array_distinct/list_distinct``,
  ``array_sort/list_sort``, ``array_intersect/list_intersect``
  (intersection dedups in both engines).

NOTE: Spark SQL arrays are 0-indexed, DuckDB lists are 1-indexed — the
builders account for this.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


def seeded_hash64(dialect: str, expr: str, seed: int | str = "") -> str:
    """Deterministic 60-bit positive integer hash of a string expression,
    identical across engines. ``seed`` namespaces independent hash
    functions (minhash permutations)."""
    salted = f"concat('{seed}:', {expr})" if dialect == SPARK else f"('{seed}:' || {expr})"
    if dialect == SPARK:
        return f"CAST(CONV(SUBSTRING(md5({salted}), 1, 15), 16, 10) AS BIGINT)"
    return f"('0x' || substr(md5({salted}), 1, 15))::BIGINT"


def tokens(dialect: str, text_expr: str) -> str:
    """Lower-cased whitespace tokens (the reference-style normalization)."""
    if dialect == SPARK:
        return f"split(trim(lower({text_expr})), '\\\\s+')"
    return f"string_split_regex(trim(lower({text_expr})), '\\s+')"


def word_shingles(dialect: str, toks_expr: str, k: int = 3) -> str:
    """Distinct word k-shingles ('a b c' strings) of a token array.

    Guarded so fewer-than-k tokens yields an empty list (``sequence`` /
    ``generate_series`` misbehave on negative ranges)."""
    if dialect == SPARK:
        joined = " , ".join(f"{toks_expr}[i + {j}]" for j in range(k))
        body = (
            f"transform(sequence(0, size({toks_expr}) - {k}), "
            f"i -> concat_ws(' ', {joined}))"
        )
        return (
            f"CASE WHEN size({toks_expr}) >= {k} THEN array_distinct({body}) "
            f"ELSE array() END"
        )
    joined = " || ' ' || ".join(f"{toks_expr}[i + {j}]" for j in range(1, k + 1))
    body = (
        f"list_transform(generate_series(0, len({toks_expr}) - {k}), "
        f"i -> {joined})"
    )
    return (
        f"CASE WHEN len({toks_expr}) >= {k} THEN list_distinct({body}) "
        f"ELSE [] END"
    )


def char_ngrams(dialect: str, text_expr: str, n: int = 3) -> str:
    """Distinct character n-grams of a string."""
    if dialect == SPARK:
        body = (
            f"transform(sequence(1, length({text_expr}) - {n - 1}), "
            f"i -> substring({text_expr}, i, {n}))"
        )
        return (
            f"CASE WHEN length({text_expr}) >= {n} THEN array_distinct({body}) "
            f"ELSE array() END"
        )
    body = (
        f"list_transform(generate_series(1, length({text_expr}) - {n - 1}), "
        f"i -> substr({text_expr}, i, {n}))"
    )
    return (
        f"CASE WHEN length({text_expr}) >= {n} THEN list_distinct({body}) "
        f"ELSE [] END"
    )


def minhash_signature(dialect: str, shingles_expr: str, n_hashes: int) -> list[str]:
    """One min-hash value per seed: ``min_{s in shingles} H_seed(s)``.

    Returns a list of per-seed scalar expressions (NULL on empty set).
    Column HOF math only — JVM-side in Spark, no Python in the hot path."""
    out = []
    for seed in range(n_hashes):
        if dialect == SPARK:
            h = seeded_hash64(SPARK, "s", seed)
            out.append(f"array_min(transform({shingles_expr}, s -> {h}))")
        else:
            h = seeded_hash64(DUCK, "s", seed)
            out.append(f"list_min(list_transform({shingles_expr}, s -> {h}))")
    return out


def band_key(dialect: str, sig_cols: list[str], band: int, rows_per_band: int) -> str:
    """LSH band key: hash of the band's signature slice."""
    sl = sig_cols[band * rows_per_band : (band + 1) * rows_per_band]
    if dialect == SPARK:
        parts = ", ".join(f"CAST({c} AS STRING)" for c in sl)
        return seeded_hash64(SPARK, f"concat_ws(',', {parts})", f"band{band}")
    parts = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in sl)
    return seeded_hash64(DUCK, f"({parts})", f"band{band}")


def simhash_bitsums(dialect: str, toks_expr: str) -> str:
    """The 32-element bit-sum array for SimHash (fold over distinct tokens)."""
    h = seeded_hash64(dialect, "t", "simhash")
    if dialect == SPARK:
        bits = (
            f"transform(sequence(0, 31), b -> "
            f"CASE WHEN (shiftright({h}, b) & 1) = 1 THEN 1 ELSE -1 END)"
        )
        return (
            f"aggregate(array_distinct({toks_expr}), array_repeat(0, 32), "
            f"(acc, t) -> zip_with(acc, {bits}, (a, x) -> a + x))"
        )
    bits = (
        f"list_transform(generate_series(0, 31), b -> "
        f"CASE WHEN (({h} >> b) & 1) = 1 THEN 1 ELSE -1 END)"
    )
    return (
        f"list_reduce(list_prepend([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,"
        f"0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0], "
        f"list_transform(list_distinct({toks_expr}), t -> {bits})), "
        f"(acc, x) -> list_transform(generate_series(1, 32), i -> acc[i] + x[i]))"
    )


def simhash_from_bitsums(dialect: str, bitsums_expr: str) -> str:
    """Collapse the 32 bit-sums into the SimHash integer."""
    if dialect == SPARK:
        terms = " + ".join(
            f"(CASE WHEN {bitsums_expr}[{b}] > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            for b in range(32)
        )
    else:
        terms = " + ".join(
            f"(CASE WHEN {bitsums_expr}[{b + 1}] > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
            for b in range(32)
        )
    return f"({terms})"
