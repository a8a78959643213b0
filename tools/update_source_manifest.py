"""Maintain SOURCE_MANIFEST.json — query name -> sha256 of the query
function's source (decorators + oracle SQL included) AS LAST PROVEN
GREEN by the correctness driver.

The registry (plans/registry.py) compares these stamps against the
on-disk source at ordering time: a query whose function was edited
after its last green proof jumps into the driver's verification window
immediately (tier 1, between "failed" and "never-checked") instead of
waiting out the least-recently-green rotation.

Protocol (pin: round{N}-state memory / SCALE.md "Verification rotation"):

  * ROUND START, BEFORE editing any query source:
        python tools/update_source_manifest.py --stamp-latest
    The code on disk is exactly what the just-finished driver round
    verified (the driver commits artifacts on top of the final tree),
    so stamping the current hash for every query green in the newest
    CORRECTNESS_r*.json records the proven source.
  * --bootstrap: reconstruct the whole manifest from git history — for
    each query, extract its function's source from the tree of the
    "round {last_green}: verdict/..." commit and hash THAT.  Used once
    (r11) to seed the manifest honestly: queries rewritten after their
    green (e.g. the four r9/r10-rewritten pair queries carrying r08
    proofs) get their OLD hash and therefore sort into the re-prove
    tier, exactly as the r10 verdict asked.

Forgetting --stamp-latest is safe in the conservative direction: a
green query with no stamp (or a stale stamp) is re-proven, never
silently trusted.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pedri_analysis_spark.plans import registry  # noqa: E402


def _all_fns() -> tuple[dict[str, object], bool]:
    """(name -> fn, complete) — ``complete`` is False when any query
    module failed to import (registry._modules warns and drops it).
    Pruning decisions must never run on an incomplete registry: deleting
    a dropped family's stamps would force every one of its queries back
    through the re-prove tier."""
    import warnings as _warnings

    out: dict[str, object] = {}
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        for mod in registry._modules():
            out.update(mod.QUERIES)
    dropped = False
    for w in caught:
        # re-emit everything recording suppressed (catch_warnings eats
        # the stderr display) and flag ONLY the registry's own
        # module-drop warning — an unrelated library RuntimeWarning must
        # not disable pruning forever
        print(f"  warning: {w.message}", file=sys.stderr)
        if issubclass(w.category, RuntimeWarning) and (
            "dropped from registry" in str(w.message)
        ):
            dropped = True
    return out, not dropped


def _round_commits() -> dict[int, str]:
    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        check=True,
        capture_output=True,
        text=True,
        cwd=registry._REPO_ROOT,
    ).stdout
    out: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            # newest first: keep the first (latest) commit per round
            out.setdefault(int(m.group(1)), sha)
    return out


def _git_show(commit: str, relpath: str) -> str | None:
    res = subprocess.run(
        ["git", "show", f"{commit}:{relpath}"],
        capture_output=True,
        text=True,
        cwd=registry._REPO_ROOT,
    )
    return res.stdout if res.returncode == 0 else None


def bootstrap() -> dict[str, dict]:
    fns, complete = _all_fns()
    if not complete:
        # bootstrap REWRITES the whole manifest: proceeding with a
        # dropped module would silently erase that family's stamps and
        # force every one of its queries through the re-prove tier
        raise SystemExit(
            "refusing to bootstrap: a query module failed to import "
            "(see warning above) — fix the import and re-run"
        )
    last_green, _ = registry._verification_history()
    commits = _round_commits()
    # per-commit text getters + parse caches so closure_fn_hash reads
    # every module AT THAT ROUND'S TREE (helpers included)
    getters: dict[str, object] = {}
    maps_caches: dict[str, dict] = {}

    def getter_for(commit: str):
        if commit not in getters:
            cache: dict[str, str | None] = {}

            def get_text(mod: str, _c=commit, _cache=cache):
                if mod not in _cache:
                    rel = mod.replace(".", "/")
                    # package modules live in __init__.py (operators.spread)
                    _cache[mod] = _git_show(_c, rel + ".py") or _git_show(
                        _c, rel + "/__init__.py"
                    )
                return _cache[mod]

            getters[commit] = get_text
            maps_caches[commit] = {}
        return getters[commit], maps_caches[commit]

    manifest: dict[str, dict] = {}
    for name, fn in sorted(fns.items()):
        rnd = last_green.get(name, -1)
        if rnd < 0:
            continue  # never green: nothing to stamp
        commit = commits.get(rnd)
        if commit is None:
            print(f"  !! {name}: no commit found for round {rnd}", file=sys.stderr)
            continue
        get_text, maps_cache = getter_for(commit)
        h = registry.closure_fn_hash(
            fn.__module__, fn.__name__, get_text, maps_cache
        )
        if h is None:
            # module or function absent/ambiguous at that tree (moved in
            # a refactor): record an impossible hash so the query sorts
            # into the re-prove tier rather than being silently trusted
            h = f"UNKNOWN@r{rnd:02d}"
        manifest[name] = {"hash": h, "round": rnd}
    return manifest


def stamp_latest() -> dict[str, dict]:
    manifest_path = registry._MANIFEST_PATH
    try:
        with open(manifest_path, encoding="utf-8") as f:
            raw = json.load(f)
        assert isinstance(raw, dict)
    except (OSError, ValueError, AssertionError):
        raw = {}
    # tolerate malformed entries the same way registry._manifest() does
    manifest = {
        n: e
        for n, e in raw.items()
        if isinstance(e, dict) and isinstance(e.get("hash"), str)
    }
    fns, complete = _all_fns()
    # newest CORRECTNESS file only: its green rows were proven against
    # the code currently on disk (run this BEFORE editing query source)
    import glob as _glob

    rounds = []
    for path in _glob.glob(os.path.join(registry._REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    if not rounds:
        return manifest
    rnd, path = max(rounds)
    with open(path, encoding="utf-8") as f:
        rows = json.load(f)
    current = registry._current_hashes(fns)
    n = 0
    for name, row in rows.items():
        if not (
            isinstance(row, dict)
            and row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        ):
            continue
        h = current.get(name)
        if h is None:
            continue
        manifest[name] = {"hash": h, "round": rnd}
        n += 1
    # prune entries for queries that no longer exist — but ONLY when the
    # registry imported completely: with a module dropped, its queries
    # are merely invisible, and deleting their proven stamps would burn
    # a re-prove window slot each, next round
    if complete:
        manifest = {k: v for k, v in manifest.items() if k in fns}
    else:
        print(
            "registry incomplete (module import warning) — stamp-only, "
            "no pruning",
            file=sys.stderr,
        )
    print(f"stamped {n} green queries from round {rnd}", file=sys.stderr)
    return manifest


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--stamp-latest"
    if mode == "--bootstrap":
        manifest = bootstrap()
    elif mode == "--stamp-latest":
        manifest = stamp_latest()
    else:
        print(__doc__, file=sys.stderr)
        return 2
    with open(registry._MANIFEST_PATH, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(manifest.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    unknown = [
        n
        for n, e in manifest.items()
        if str(e.get("hash", "")).startswith("UNKNOWN")
    ]
    print(f"wrote {len(manifest)} stamps -> {registry._MANIFEST_PATH}")
    if unknown:
        print(f"unresolvable at their green tree (will re-prove): {unknown}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
