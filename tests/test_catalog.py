"""QUERIES.md must stay in sync with the registry (regeneration is a
no-op); catches silently dropped or undocumented queries.  Regenerates
into tmp_path so a stale run FAILS without rewriting the committed file
(no self-healing gate, no dirty working tree)."""

from __future__ import annotations

import subprocess
import sys


def test_query_catalog_is_current(tmp_path):
    committed = open("/root/repo/QUERIES.md").read()
    out = tmp_path / "QUERIES.md"
    subprocess.run(
        [sys.executable, "/root/repo/tools/gen_query_catalog.py", str(out)],
        check=True,
        cwd="/root/repo",
    )
    regenerated = out.read_text()
    assert regenerated == committed, (
        "QUERIES.md stale — rerun tools/gen_query_catalog.py"
    )
    # every registered query has a docstring (the catalog summary source)
    for line in regenerated.splitlines():
        if line.startswith("| ") and "`" in line:
            summary = line.rsplit("|", 2)[-2].strip()
            assert summary, f"missing docstring summary: {line}"
