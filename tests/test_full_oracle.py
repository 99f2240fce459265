"""CI twin of the driver's correctness gate.

The driver samples ~50 of the declared queries per round; this test runs
`tools/check_correctness.py` — the full oracle sweep over EVERY
``queries()`` entry vs its DuckDB ``oracle_sql()`` twin at sf0.01 — so
the driver-unsampled queries can never silently regress between rounds.

Runs as a subprocess so the sweep gets its own local[32] session with
production shuffle settings instead of the test session's local[4].
Marked slow; skip locally with SKIP_FULL_ORACLE=1 when iterating.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("FULL_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.mark.slow
def test_every_declared_query_matches_its_oracle():
    if os.environ.get("SKIP_FULL_ORACLE") == "1":
        pytest.skip("SKIP_FULL_ORACLE=1")
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"no testdata at {SF_DIR}")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), SF_DIR],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-40:])
    assert proc.returncode == 0, (
        f"full oracle sweep failed (rc={proc.returncode}):\n{tail}\n{proc.stderr[-2000:]}"
    )
    assert " 0 failed," in proc.stdout, tail
