"""Zero-extra-pass dataflow counters for multi-stage pair pipelines.

The exact-pair-join family (prefix-filter / LSH+capped verify /
embedding blocks) owns the steepest measured scale curves, and a bare
wall-clock ratio can't distinguish "the operator's candidate generation
degraded" from "the corpus has more duplicates, so the output itself
grew".  These counters decompose the flow per stage — candidate pairs
generated, pairs surviving each prune, output pairs — so the scale probe
reports candidate:output economics instead of arguing them.

Mechanism: Spark's CollectMetrics (`DataFrame.observe`) — the named
aggregate piggybacks on rows already streaming through that point of the
plan, costing no extra job, no extra scan, and no driver-side collect of
data rows.  Counters are OFF by default so the declared driver-facing
query plans stay byte-identical (no CollectMetrics node — enforced by
plan_audit's CollectMetricsLeak axis over every plan) and bench timings
stay honest; the scale probe (tools/scale_probe.py) enables them around
its timed runs and snapshots the totals into SCALE_PROBE.json.

Usage (inside a suite query):

    from ..operators import counters
    cand = counters.observe_stage(cand, "prefix_filter_jaccard_pairs",
                                  "candidates")

and in a tool:

    counters.enable()
    ... run the query's action ...
    print(counters.snapshot())   # {query: {stage: rows}}
    counters.disable()
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_seq = itertools.count()
_active: list[tuple[str, str, Observation]] = []
_loops: dict[str, list[dict]] = {}
_scope: str | None = None
_enabled = False


def enable() -> None:
    """Turn instrumentation on and drop any stale observations."""
    global _enabled
    _enabled = True
    _active.clear()
    _loops.clear()


def disable() -> None:
    global _enabled, _scope
    _enabled = False
    _scope = None
    _active.clear()
    _loops.clear()


def is_enabled() -> bool:
    """Probe-only query builders branch on this to attach a stage
    observation point that the compound-predicate production plan has no
    seam for (e.g. the interval join's candidate stage); production calls
    see False and build the untouched plan."""
    return _enabled


def reset() -> None:
    """Forget recorded observations (e.g. between probe scales) while
    staying enabled."""
    _active.clear()
    _loops.clear()


def set_scope(query: str | None) -> None:
    """Name the query whose iterative loops are being recorded — the
    fixpoint functions are shared (cc_fixpoint serves three declared
    queries), so the probe names the run, not the algorithm."""
    global _scope
    _scope = query


def record_loop(kind: str, **metrics) -> None:
    """Record one completed driver-side fixpoint run (rounds-to-converge
    plus whatever per-round scalars the loop ALREADY computes — edge
    counts for peeling, the label-sum potential for CC; never an extra
    pass). A no-op when instrumentation is off, so production calls pay
    nothing and plans are untouched (this never builds a plan node at
    all, unlike observe_stage)."""
    if not _enabled:
        return
    _loops.setdefault(_scope or kind, []).append({"kind": kind, **metrics})


def loops_snapshot() -> dict[str, list[dict]]:
    """{query: [loop records in execution order]} since enable()/reset()."""
    return {q: [dict(r) for r in v] for q, v in _loops.items()}


def observe_stage(df: DataFrame, query: str, stage: str) -> DataFrame:
    """Attach a row counter named (query, stage) to this point of the
    plan.  A no-op returning `df` unchanged when instrumentation is off —
    the default — so production plans carry no CollectMetrics node."""
    if not _enabled:
        return df
    obs = Observation(f"{query}/{stage}/{next(_seq)}")
    _active.append((query, stage, obs))
    return df.observe(obs, F.count(F.lit(1)).alias("rows"))


def snapshot() -> dict[str, dict[str, int]]:
    """Totals for every stage observed since enable()/reset() — a
    (query, stage) observed by several plan builds SUMS across them.

    CAUTION: an Observation whose plan branch never executed (query
    built but no action ran — e.g. an exception between build and the
    action) blocks forever on `.get`; callers must snapshot right after
    a successful action, and stages observed by the same query build all
    complete with that action.  Re-executing the same DataFrame keeps
    the FIRST action's numbers (Spark Observation semantics), which is
    exactly what the probe wants: counters from the measured plan, not
    accumulated across warm-up reruns of one build."""
    out: dict[str, dict[str, int]] = {}
    for query, stage, obs in _active:
        d = out.setdefault(query, {})
        d[stage] = d.get(stage, 0) + int(obs.get["rows"])
    return out
