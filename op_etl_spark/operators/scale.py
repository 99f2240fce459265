"""Scale machinery: bucketed co-located joins and skew-salted aggregation.

These are the two knobs that decide whether a 100 TB join/agg finishes:

 - **Bucketing** (`write_bucketed`): persist both fact tables bucketed by
   the join key -> every subsequent join on that key is exchange-free
   (SortMergeJoin over pre-bucketed scans, zero shuffle of either side).
   The reference has no analogue — FileGDB has no co-location — but at
   cluster scale it's the difference between shuffling 100 TB per join
   and shuffling nothing. tests/test_scale_ops.py asserts the plan
   contains no Exchange.

 - **Salting** (`salted_agg`): a skewed group key (one authority with 90%
   of features, one hot user) turns a shuffle into a single straggler
   task. Two-phase aggregation over (key, salt) spreads the hot key over
   `n_salts` reducers, then merges the partials — same result, bounded
   task size. AQE's skew handling covers joins; pre-aggregation skew
   still needs this. Salt is deterministic (hash of a high-cardinality
   column), never Math.random, so retried tasks stay idempotent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist `df` bucketed (and sorted) by `key` so joins/aggs on `key`
    skip the exchange entirely (Spark reads bucket files as pre-shuffled
    partitions)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `aggs` maps output name -> one of sum/count/min/max column expressions
    (re-aggregatable functions; avg must be decomposed by the caller into
    sum + count). Phase 1 aggregates (key, salt) — the hot key's rows
    split across `n_salts` reducers; phase 2 merges the partials with the
    matching re-combiner. `salt_col` must name a high-cardinality column;
    the salt is its hash mod n_salts (deterministic across task retries).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).alias("_salt")
    partial = df.groupBy(F.col(key), salt).agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )

    def recombine(name: str, expr: Column) -> Column:
        # sum/count partials re-merge with SUM; min/max with themselves.
        # str(Column) works on classic AND Connect (no private _jc).
        fn_name = str(expr).split("'", 1)[-1].split("(")[0].strip().lower()
        p = F.col(f"_p_{name}")
        if fn_name == "min":
            return F.min(p).alias(name)
        if fn_name == "max":
            return F.max(p).alias(name)
        if fn_name in ("sum", "count"):
            return F.sum(p).alias(name)
        # avg, count(DISTINCT), stddev, ... do NOT re-merge by summing
        # partials; silently mis-aggregating is worse than refusing
        raise ValueError(
            f"salted_agg cannot re-combine {fn_name!r} for {name!r}: only "
            "sum/count/min/max are decomposable; rewrite avg as sum+count"
        )

    return partial.groupBy(key).agg(
        *[recombine(name, expr) for name, expr in aggs.items()]
    )
