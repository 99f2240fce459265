"""Pin the documentation's query-count claims to the code (VERDICT r6
'Next round' #5): round 6 shipped a hand-fixed count drift (commit
8889097) because nothing asserted README/DEPLOYMENT against
`suite.all_queries()`. This test goes red the moment a query is added
or removed without syncing the docs.

Two claim families, each pinned to its source of truth:
- the DECLARED-SURFACE count ("<N> queries, each with a DuckDB oracle",
  "all <N> declared queries", "<N>/<N>", "all <N> query plans") must
  equal len(suite.all_queries());
- the PROBE-FAMILY sizes ("<N> queries" inside the scale-probe sections)
  must equal the corresponding list lengths in tools/scale_probe.py.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# declared-surface claim patterns: the number each one captures must be
# the all_queries() count
_SURFACE_PATTERNS = (
    r"\b(\d{2,4}) quer(?:y|ies), each with",
    r"\ball (\d{2,4}) declared quer(?:y|ies)",
    r"\b(\d{2,4})/\1\b",
    r"\ball (\d{2,4}) (?:query plans|plans|physical plans)",
    r"\b(\d{2,4}) declared quer(?:y|ies)",
)


def _declared_count() -> int:
    from op_etl_spark import suite

    return len(suite.all_queries())


def _surface_claims(path: str) -> set[int]:
    text = open(os.path.join(REPO, path)).read()
    counts: set[int] = set()
    for pat in _SURFACE_PATTERNS:
        for m in re.finditer(pat, text):
            counts.add(int(m.group(1)))
    return counts


def _check_doc(path: str) -> None:
    n = _declared_count()
    claimed = _surface_claims(path)
    stale = {c for c in claimed if c != n}
    assert not stale, (
        f"{path} claims declared-query counts {sorted(stale)} but "
        f"suite.all_queries() has {n} — sync the doc"
    )
    assert claimed == {n}, (
        f"{path} no longer states the declared query count "
        f"(expected a '{n} queries' claim)"
    )


def test_readme_counts_match_code():
    _check_doc("README.md")


def test_deployment_counts_match_code():
    _check_doc("DEPLOYMENT.md")


def test_probe_family_sizes_match_docs():
    import sys

    sys.path.insert(0, REPO)
    from tools import scale_probe

    text = open(os.path.join(REPO, "DEPLOYMENT.md")).read()
    m = re.search(r"main family, K=\d+, (\d+) queries", text)
    if m:
        assert int(m.group(1)) == len(scale_probe.MAIN_QUERIES), (
            "DEPLOYMENT.md main-family probe size is stale vs "
            "tools/scale_probe.MAIN_QUERIES"
        )
    m = re.search(r"sketch family, K=\d+, (\d+) ", text)
    if m:
        assert int(m.group(1)) == len(scale_probe.SKETCH_QUERIES)
