"""Exact heavy hitters via two-pass Misra-Gries candidate generation.

The scale problem: "which keys exceed frequency N/K?" over a 100 TB
fact table. The naive answer — `groupBy(key).count().filter(...)` —
shuffles EVERY distinct key (at corpus scale, billions of group states)
to answer a question whose output is at most K-1 rows. The classic
two-pass fix (Misra-Gries 1982; mergeable-summaries form of Agarwal et
al., PODS 2012):

  Pass 1 (narrow, no shuffle): each partition maintains a Misra-Gries
  summary of at most `m` counters over its local rows. MG guarantees a
  key's stored count undercounts its true local count by at most
  N_part/m, so any key with true local count > N_part/m survives with a
  positive counter. Summing over partitions: a key with GLOBAL count
  > N/m must exceed N_part/m in at least one partition (pigeonhole),
  hence appears in at least one partition's summary. The union of
  summaries — at most `m * n_partitions` rows, independent of data
  volume — is a guaranteed superset of every global heavy hitter.

  Pass 2 (bounded shuffle): exact counts for candidate keys only — a
  broadcast semi-join of the fact against the candidate set, then a
  groupBy over |candidates| distinct keys. Final filter count*K > N
  (with K <= m, so the pass-1 guarantee covers the threshold) yields
  EXACTLY the set {key : count > N/K} — deterministic and
  oracle-checkable, unlike a sketch-only answer.

Use it for hot-key detection before a big join or aggregation (which
keys need salting), bot/spam account discovery, boilerplate n-gram
mining. The pass-1 summaries are Arrow-batched pandas (`mapInPandas`),
merged per-partition across batches; no Python row loop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key: str, m: int) -> DataFrame:
    """Per-partition Misra-Gries summaries with `m` counters; returns the
    distinct union of surviving keys (string column ``key``) — a superset
    of every key with global frequency > N/m. Narrow: no shuffle until
    the final (candidate-sized) distinct."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # Merge the batch's exact value_counts into the summary, then
            # prune back to m counters (mergeable-summaries rule: subtract
            # the (m+1)-th largest stored count from all, drop <= 0).
            for k, c in pdf[key].value_counts().items():
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > m:
                cut = sorted(counters.values(), reverse=True)[m]
                counters = {k: c - cut for k, c in counters.items() if c > cut}
        yield pd.DataFrame({key: list(counters.keys())})

    return df.select(F.col(key).cast("string").alias(key)).mapInPandas(
        mg, f"{key} string"
    ).distinct()


def heavy_hitters(df: DataFrame, key: str, k: int, m: int | None = None) -> DataFrame:
    """All NON-NULL keys with count > N/k, with exact counts: MG
    candidates (pass 1) then an exact count restricted to candidates
    (pass 2). ``m`` (counters per partition, default 4k) must be >= k for
    the completeness guarantee. Output: (key, cnt) — at most k-1 rows.

    Null keys are OUT OF CONTRACT by explicit filter (and excluded from
    N): pandas value_counts drops NaN in pass 1 and the pass-2 equi-join
    never matches null, so without the filter a null key over the
    threshold would be silently missed — diverging from a SQL GROUP BY,
    which reports the NULL group. Callers who care about a null hot key
    should fillna a sentinel before calling."""
    m = 4 * k if m is None else m
    if m < k:
        raise ValueError(f"m={m} must be >= k={k} for completeness")
    keyed = df.select(F.col(key).cast("string").alias(key)).filter(
        F.col(key).isNotNull()
    )
    cand = misra_gries_candidates(keyed, key, m)
    total = keyed.agg(F.count(F.lit(1)).alias("__n"))
    return (
        keyed.join(F.broadcast(cand), key)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("__n"))
        .drop("__n")
    )
