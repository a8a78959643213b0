"""Compare two BENCH_DETAIL.json snapshots and flag per-query regressions.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--warn 1.5] [--fail 2.0]

Prints every query slower than the warn ratio (default 1.5×) and exits
non-zero if any exceeds the fail ratio (default 2.0× — the driver's
bench contract bound). Queries faster than 0.2 s in the old snapshot are
ignored (pure scheduling noise at that magnitude). New queries (absent
from OLD) and removed queries are listed informationally, never failed —
adding an operator is not a regression.

Typical round workflow: run bench.py, then
``python tools/bench_diff.py <(git show HEAD:BENCH_DETAIL.json) BENCH_DETAIL.json``
before committing the refreshed snapshot.
"""

from __future__ import annotations

import argparse
import json
import sys

NOISE_FLOOR_S = 0.2


def diff(old: dict, new: dict, warn: float, fail: float) -> int:
    oq, nq = old["queries"], new["queries"]
    failures = new.get("failures", {})
    added = sorted(set(nq) - set(oq))
    # A query that FAILED in the new run is reported on the failures line,
    # not double-listed as an (intentional-sounding) removal.
    removed = sorted(set(oq) - set(nq) - set(failures))
    worst: list[tuple[float, str, float, float]] = []
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name], nq[name]
        if o < NOISE_FLOOR_S:
            continue
        ratio = n / o
        if ratio >= warn:
            worst.append((ratio, name, o, n))
    worst.sort(reverse=True)
    for ratio, name, o, n in worst:
        flag = "FAIL" if ratio >= fail else "warn"
        print(f"{flag}  {ratio:4.1f}x  {o:7.2f}s -> {n:7.2f}s  {name}")
    if added:
        print(f"new queries (not compared): {', '.join(added)}")
    if removed:
        print(f"removed queries: {', '.join(removed)}")
    if failures:
        print(f"FAIL  broken queries in new run: {', '.join(sorted(failures))}")
    print(
        f"total: {old.get('value', 0):.1f}s -> {new.get('value', 0):.1f}s; "
        f"{len(worst)} over {warn}x"
    )
    hard = [w for w in worst if w[0] >= fail]
    return 1 if hard or failures else 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--warn", type=float, default=1.5)
    p.add_argument("--fail", type=float, default=2.0)
    a = p.parse_args()
    with open(a.old) as f:
        old = json.load(f)
    with open(a.new) as f:
        new = json.load(f)
    return diff(old, new, a.warn, a.fail)


if __name__ == "__main__":
    sys.exit(main())
