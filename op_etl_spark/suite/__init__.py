"""Query suite: the engine's declared query surface.

Each submodule exposes

  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLE:  dict[str, str]        # DuckDB-runnable ANSI SQL twin

The driver runs each Spark query AND its oracle side-by-side at sf0.01 and
hash-compares (order-insensitive, columns sorted by name) — so every
computed column is aliased identically on both sides, floats are rounded
identically on both sides, and timestamps are emitted as strings.

Keys without an ORACLE entry get a rows-only check (reserved for genuinely
non-SQL-expressible operators).
"""

from __future__ import annotations

from . import (
    advanced,
    ann_recall,
    chunking,
    clustering,
    contamination,
    incremental,
    dedup,
    embedding_store,
    geo,
    layout,
    lm_stats,
    monitoring,
    multimodal,
    packing,
    pq_ann,
    profile,
    relational,
    robust,
    sampling,
    similarity,
    sketches,
    stream_windows,
    text,
    tpch_batch3,
    tpch_extra,
)

_MODULES = [
    relational,
    advanced,
    incremental,
    chunking,
    tpch_extra,
    tpch_batch3,
    clustering,
    text,
    lm_stats,
    dedup,
    similarity,
    sketches,
    ann_recall,
    pq_ann,
    embedding_store,
    geo,
    stream_windows,
    multimodal,
    layout,
    sampling,
    robust,
    contamination,
    profile,
    packing,
    monitoring,
]


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
