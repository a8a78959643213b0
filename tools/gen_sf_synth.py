r"""Synthesize a larger scale factor from sf0.1 by DETERMINISTIC
replication — the extra measured decade for the weak-scaling check
(VERDICT r7 ask #2).

``--replicas K`` stamps K copies of the three tables the expensive
dedup/similarity/graph family actually scales on:

* ``documents``: doc_id shifted per replica; every TOKEN of replicas
  1..K-1 gets a ``_r{i}`` suffix.  This is the load-bearing design
  choice: replicas share the token-length/shape distribution but have
  DISJOINT shingle/window/minhash spaces, so each replica is an
  independent shard of the same corpus distribution (true weak
  scaling).  Byte-identical replication would instead plant K-way
  cross-replica duplicates, and candidate-pair volume would grow
  quadratically in K *in the data itself* — flagging linear algorithms
  as super-linear.
* ``embeddings``: vec_id shifted; first component of replicas 1..K-1
  offset by ``0.037*i`` (cosine is scale-invariant, so a scalar
  multiply would leave exact cross-replica duplicates; a single-axis
  shift breaks them).
* ``lineitem``: l_orderkey/l_partkey/l_suppkey shifted per replica —
  replica co-purchase graphs are disjoint components.

Every other table is symlinked unchanged from the source SF, so the
whole 192-query catalog still RUNS against the synth dir (queries on
unscaled tables simply measure ~1x).

No randomness anywhere; re-running produces byte-identical parquet.

Usage:
    python tools/gen_sf_synth.py --replicas 10        # -> .scratch/sf1.0synth
    python tools/scaling_check.py --sf-dirs /root/testdata/sf0.1 \
        /root/repo/.scratch/sf1.0synth
"""

from __future__ import annotations

import argparse
import os

import duckdb

DOC_SHIFT = 10_000_000
VEC_SHIFT = 10_000_000
OK_SHIFT = 1_000_000_000
PK_SHIFT = 10_000_000
SK_SHIFT = 1_000_000

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SYNTH_TABLES = ("documents", "embeddings", "lineitem")


def replica_select(table: str, i: int) -> str:
    """The SELECT producing replica ``i`` (0 = verbatim original)."""
    src = f"read_parquet('{{src}}/{table}.parquet')"
    if table == "documents":
        text = (
            "text"
            if i == 0
            else rf"regexp_replace(text, '([^ ]+)', '\1_r{i}', 'g')"
        )
        return (
            f"SELECT doc_id + {i * DOC_SHIFT} AS doc_id, {text} AS text, "
            f"* EXCLUDE (doc_id, text) FROM {src}"
        )
    if table == "embeddings":
        emb = (
            "embedding"
            if i == 0
            else (
                f"CAST([embedding[1] + {round(0.037 * i, 6)}] || embedding[2:] "
                f"AS FLOAT[])"
            )
        )
        return (
            f"SELECT vec_id + {i * VEC_SHIFT} AS vec_id, {emb} AS embedding, "
            f"* EXCLUDE (vec_id, embedding) FROM {src}"
        )
    if table == "lineitem":
        return (
            f"SELECT l_orderkey + {i * OK_SHIFT} AS l_orderkey, "
            f"l_partkey + {i * PK_SHIFT} AS l_partkey, "
            f"l_suppkey + {i * SK_SHIFT} AS l_suppkey, "
            f"* EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM {src}"
        )
    raise ValueError(table)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--replicas", type=int, default=10)
    p.add_argument("--out", default=None)
    a = p.parse_args()
    out = a.out or os.path.join(
        repo, ".scratch", f"sf{round(0.1 * a.replicas, 2)}synth"
    )
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    for t in SYNTH_TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        union = " UNION ALL ".join(
            replica_select(t, i).format(src=a.src) for i in range(a.replicas)
        )
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {a.replicas} replicas, {n} rows -> {dst}")
    for t in ALL_TABLES:
        if t in SYNTH_TABLES:
            continue
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(os.path.join(a.src, f"{t}.parquet"), dst)
    print(f"symlinked {len(ALL_TABLES) - len(SYNTH_TABLES)} unscaled tables")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
