"""Driver-side phase timings for multi-phase gate pipelines.

The ANN gate queries (pq/ivf/ivfpq recall) deliberately rebuild their
index on every call — a session cache would silently stop measuring
whether the build scales (policy set in round 6).  The cost is honest
but was un-decomposed: ~26% of the bench headline is Lloyd-round build
work, and a search-path regression could hide under that noise.

This registry records the driver-BLOCKING portion of each build (seed
collect + Lloyd-round collects — the part that completes during query
*construction*) under a pipeline name.  bench.py resets the registry
around each timed query run and publishes the delta as a per-query
build/search decomposition: build = recorded seconds, search = total -
build.  The lazily-checkpointed encode/assign tail executes at
action time and is accounted to the search side; the split is therefore
"synchronous index training" vs "everything the action pays", which is
exactly the boundary a cache would have moved.

Not a cache: nothing about the recorded values feeds back into any
query; plans and results are byte-identical with the registry empty,
full, or absent.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

_timings: dict[str, dict[str, float]] = {}


@contextmanager
def phase(pipeline: str, name: str):
    """Time a driver-blocking block as (pipeline, phase). Re-entering the
    same (pipeline, phase) ACCUMULATES (a Lloyd loop may record each
    round under one name)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        d = _timings.setdefault(pipeline, {})
        d[name] = d.get(name, 0.0) + dt


def reset() -> None:
    _timings.clear()


def snapshot() -> dict[str, dict[str, float]]:
    """{pipeline: {phase: seconds}} recorded since the last reset()."""
    return {p: dict(d) for p, d in _timings.items()}


def total() -> float:
    """Sum of all recorded phase seconds since the last reset()."""
    return sum(v for d in _timings.values() for v in d.values())
