"""Deterministic sampling and dataset splitting.

The training-data-pipeline primitives that `sample(fraction)` can't give
you: every decision here is a pure function of (salt, key), so samples
are reproducible run-to-run, stable under repartitioning, resumable after
failure, and consistent across engines — the properties a 100 TB corpus
split actually needs (Spark's native `sample` is seed-stable only for an
identical partitioning).

Mechanism: u(key) = first 52 bits of md5(salt|key) / 2^52 — an exact
double in [0, 1) computed identically by Spark (`conv`) and the DuckDB
oracles (`('0x'||…)::BIGINT`). 52 bits because every such integer is
exactly representable in a double, making the `< fraction` comparison
bit-deterministic. All ops are narrow (no shuffle) except the per-group
top-k sampler, which shuffles once on its group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_UNIT = float(1 << 52)


def hash_unit(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from a key column (see module doc)."""
    hx = F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string")).cast("binary"))
    return F.conv(F.substring(hx, 1, 13), 16, 10).cast("long") / F.lit(_UNIT)


def hash_unit_sql(key_expr: str, salt: str = "") -> str:
    """Oracle twin of `hash_unit`."""
    return (
        f"(('0x' || substr(md5('{salt}|' || CAST({key_expr} AS VARCHAR)), 1, 13))::BIGINT"
        f" / {_UNIT!r})"
    )


def deterministic_sample(df: DataFrame, key: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash — stable under re-runs,
    repartitioning, and incremental appends (a row's fate never changes)."""
    return df.filter(hash_unit(F.col(key), salt) < fraction)


def train_test_split(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    salt: str = "split",
    holdout_fraction: float = 0.0,
) -> DataFrame:
    """Label each row train/test (and optionally holdout) by key hash.

    Disjoint contiguous u-intervals, so growing test_fraction only MOVES
    the boundary — rows never hop between existing splits when fractions
    are tuned, and the same key lands in the same split in every table
    it appears in (leakage-proof joins between split corpora)."""
    u = hash_unit(F.col(key), salt)
    split = (
        F.when(u < test_fraction, F.lit("test"))
        .when(u < test_fraction + holdout_fraction, F.lit("holdout"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep-fractions (e.g. downsample dominant languages).
    Still a narrow filter — the per-stratum threshold is a CASE chain, no
    join, no shuffle."""
    thr: Column = F.lit(default_fraction)
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(frac)).otherwise(thr)
    return df.filter(hash_unit(F.col(key), salt) < thr)


def negative_pairs(
    df: DataFrame, key: str, k: int, salt: str = "neg", anchors: DataFrame | None = None
) -> DataFrame:
    """K deterministic pseudo-random negative partners per anchor — the
    contrastive-training pairing op (anchor, negative_1..k). Partners are
    drawn from ALL of `df`; `anchors` (default: every row) restricts only
    who gets partners, so a subset's pairs equal the full run's subset.

    Each (key, j) hashes to a uniform index into the keyspace; the index
    resolves to a partner key through a dense key->index table built by
    `operators.ranks.global_row_index` — distributed order statistics
    (range partition + offset add), NOT a single-partition
    `row_number() OVER (ORDER BY key)` window, so the index build stays
    balanced at any corpus size. One explode (k rows per anchor) and two
    shuffles (the range partition and the index join); self-pairs are
    dropped, so a row yields k or occasionally k-1 partners.
    Deterministic in (salt, key, j)."""
    from .ranks import global_row_index

    idx = global_row_index(
        df.select(F.col(key).alias("__neg_key")), "__neg_key", out="__idx"
    )
    n1 = df.agg(F.count(F.lit(1)).alias("__n"))
    a = (anchors if anchors is not None else df).select(key)
    cand = (
        a.withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(k))))
        .crossJoin(F.broadcast(n1))
        .withColumn(
            "__idx",
            F.floor(
                hash_unit(
                    F.concat(
                        F.col(key).cast("string"), F.lit("#"), F.col("j").cast("string")
                    ),
                    salt,
                )
                * F.col("__n")
            ).cast("long"),
        )
    )
    return (
        cand.join(idx, "__idx")
        .filter(F.col("__neg_key") != F.col(key))
        .select(key, "j", F.col("__neg_key").alias("neg_" + key))
    )


def shuffle_shards(
    df: DataFrame, key: str, n_shards: int, salt: str = "shuffle"
) -> DataFrame:
    """Deterministic distributed corpus shuffle: assign every row a
    (shard, pos) address that is a pure function of (salt, key) — the
    op that turns a corpus into a globally pseudo-randomly ordered
    training stream WITHOUT a global sort.

    shard = floor(u_shard * n_shards) spreads rows uniformly over
    n_shards output shards; pos = rank of u_order within the shard.
    Reading shards 0..n-1 each in pos order yields a reproducible
    permutation of the corpus. One shuffle (on shard) + a per-shard
    sort whose size is |corpus|/n_shards — pick n_shards so a shard
    fits an executor (100 TB / 100k shards = 1 GB sorts) and no
    single-partition bottleneck exists; contrast with
    `orderBy(rand())`, which is a full global range sort AND
    non-reproducible. Stable under repartitioning and incremental
    rebuilds; epoch re-shuffles are just a new salt."""
    u_shard = hash_unit(F.col(key), f"{salt}|shard")
    u_order = hash_unit(F.col(key), f"{salt}|order")
    w = Window.partitionBy("shard").orderBy("__u", key)
    return (
        df.withColumn("shard", F.floor(u_shard * n_shards).cast("int"))
        .withColumn("__u", u_order)
        .withColumn("pos", F.row_number().over(w))
        .drop("__u")
    )


def group_topk_sample(
    df: DataFrame, group_cols: list[str], key: str, k: int, salt: str = ""
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, uniformly chosen by key
    hash (rank over u). The fixed-size variant of stratified sampling —
    caps every group's contribution regardless of skew. One shuffle on
    the group key; ties broken by the key itself so results are total-
    ordered and engine-reproducible."""
    w = Window.partitionBy(*group_cols).orderBy(hash_unit(F.col(key), salt), F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
