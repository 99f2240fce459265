"""Mergeable sketch primitives: KMV bottom-k, HyperLogLog registers,
count-min, and Bloom position sets — the approximate-aggregation toolkit a
100 TB pipeline reaches for when exact distinct/count/membership would
shuffle the corpus.

Every sketch here is a *mergeable summary* (Agarwal et al., PODS 2012):
per-partition summaries combine associatively, so Spark computes them with
ordinary map-side-combining `groupBy().agg()` — the shuffle moves sketch
state (registers, bottom-k arrays, bucket counts), never raw rows. That is
the entire 100 TB story: cost is O(|sketch| x n_groups), independent of
corpus size, and the same summaries can be unioned across days/shards
without touching the original data.

Cross-engine determinism (the suite's DuckDB oracles replay every estimate
bit-for-bit): all randomness comes from md5 — hex chars 1..15 parsed as a
60-bit integer (Spark `conv`, DuckDB `'0x'||substr` cast), the same
contract as suite/dedup.py. Estimates that need floating point perform the
identical IEEE-754 op sequence on identical inputs on both engines
(exact-integer numerators, one correctly-rounded divide, floor+0.5
round-half-up — the fround discipline of suite/_util.py).

The reference has no sketch surface (it is an ArcPy ETL tool); this module
is part of the training-data-pipeline extension mandated by the build
brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def h60(col: Column) -> Column:
    """60-bit non-negative hash: md5 hex chars 1..15. DuckDB twin:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")


def h60_salted(salt: int | Column, col: Column) -> Column:
    """Salted 60-bit hash of ``salt || ':' || col`` (independent hash
    functions for CMS rows / Bloom probes). DuckDB twin:
    ``('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || CAST(x AS VARCHAR)),
    1, 15))::BIGINT``."""
    s = F.lit(salt) if isinstance(salt, int) else salt
    return F.conv(
        F.substring(
            F.md5(
                F.concat(s.cast("string"), F.lit(":"), col.cast("string")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


# --- KMV / bottom-k distinct ---


def bottom_k_hashes(
    df: DataFrame, group_cols: list[str], hash_col: Column, k: int, n_salts: int = 16
) -> DataFrame:
    """Per group: the k smallest DISTINCT 60-bit hashes plus the exact
    distinct-hash count, with bounded aggregation state at every step.

    Three map-side-combining shuffles, all on the group key (AQE
    co-partitions them):
      1. distinct (group, h) — partial dedup before the shuffle;
      2. per (group, h % n_salts): sort+slice to k — state is the salt's
         distinct-hash slice (~d/n_salts), not the group's;
      3. per group: flatten the <= n_salts arrays of <= k, sort, slice —
         state <= n_salts*k, a constant.
    The salt split is what keeps step 2's collect bounded when one group
    dominates the corpus; k smallest overall = k smallest of the per-salt
    k-smallest, so the result is exact.

    Returns group_cols + [hs: array<long> (ascending, len <= k),
    n_distinct: long].
    """
    distinct = df.select(*group_cols, hash_col.alias("h")).distinct()
    per_salt = (
        distinct.withColumn("salt", F.col("h") % n_salts)
        .groupBy(*group_cols, "salt")
        .agg(
            F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("hs"),
            F.count(F.lit(1)).alias("nd"),
        )
    )
    return per_salt.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("hs"))), 1, k).alias("hs"),
        F.sum("nd").alias("n_distinct"),
    )


KMV_MAX = float(2**60)


def kmv_estimate(k: int) -> Column:
    """Distinct estimate from a bottom-k array ``hs`` + exact fallback:
    d <= k-? exact, else (k-1) * 2^60 / h_k (the classic KMV estimator).
    (k-1)*2^60 is exact in double (k-1 has few significant bits); h_k's
    long->double conversion and the divide are correctly rounded, so both
    engines produce the identical double before the half-up floor."""
    hk = F.element_at(F.col("hs"), k).cast("double")
    est = F.floor(F.lit(float(k - 1)) * F.lit(KMV_MAX) / hk + F.lit(0.5)).cast("long")
    return F.when(F.col("n_distinct") < k, F.col("n_distinct")).otherwise(est)


# --- HyperLogLog ---

HLL_ALPHA_64 = 0.709  # Flajolet et al. 2007 constant for m = 64


def hll_register_table(
    df: DataFrame, group_cols: list[str], hash_col: Column, m: int = 64
) -> DataFrame:
    """Per (group, register): max rho. The register table IS the sketch —
    m rows per group, mergeable by max, built with one map-side-combining
    groupBy. Register = h mod m; rho = leading-zero count of the remaining
    (60 - log2 m)-bit field + 1, computed via bit-length (string length of
    the base-2 representation — exact integer arithmetic on both engines,
    no float log)."""
    width = 60 - m.bit_length() + 1  # bits left after the register index
    rest = F.floor(F.col("h") / m).cast("long")
    bitlen = F.length(F.conv(rest, 10, 2))
    rho = F.when(rest == 0, width + 1).otherwise(width + 1 - bitlen)
    return (
        df.select(*group_cols, hash_col.alias("h"))
        .withColumn("reg", F.col("h") % m)
        .withColumn("rho", rho)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str], m: int = 64) -> DataFrame:
    """HLL estimate per group from a register table, with the standard
    linear-counting small-range branch.

    Determinism: the harmonic sum is computed as the exact integer
    Z' = sum 2^(width+1-rho) + n_empty * 2^(width+1) (every term a power of
    two <= 2^55, total < 2^62 — no float accumulation). The raw estimate is
    then alpha * m^2 * 2^(width+1) / Z' — exact-double constants, one
    divide. The small-range branch (raw <= 2.5m and empty registers exist)
    uses m * ln(m / V): ln is the one non-correctly-rounded op (same ulp
    caveat as suite/lm_stats.py — deterministic per platform, ~1e-10 flip
    probability at the integer half-up boundary)."""
    width = 60 - m.bit_length() + 1
    scale = 2 ** (width + 1)
    agg = registers.groupBy(*group_cols).agg(
        # shiftleft with a column bit count: SQL form (the Python API wants
        # a literal numBits)
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {width + 1} - max_rho)")
        ).alias("z_used"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    zprime = (F.col("z_used") + (m - F.col("n_regs")) * F.lit(scale)).cast("double")
    raw = F.lit(HLL_ALPHA_64 * m * m) * F.lit(float(scale)) / zprime
    v = (m - F.col("n_regs")).cast("double")  # empty registers
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when((raw <= 2.5 * m) & (v > 0), linear).otherwise(raw)
    return agg.select(
        *group_cols, F.floor(est + F.lit(0.5)).cast("long").alias("hll_estimate")
    )


# --- Count-min sketch ---


def cms_table(df: DataFrame, key_col: Column, d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min sketch of key occurrence counts: d independent salted
    hash rows x w buckets. One projection explodes each input row into its
    d (row, bucket) cells; one map-side-combining groupBy produces the
    d*w-cell table. The sketch is mergeable by cell-wise sum; its size is
    a constant regardless of corpus size."""
    cells = df.select(
        F.posexplode(
            F.array(*[(h60_salted(j, key_col) % w) for j in range(d)])
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(cms: DataFrame, keys: DataFrame, key_col: str, d: int = 4,
               w: int = 1024) -> DataFrame:
    """Point estimates for a key table: min over the key's d cells —
    the classic CMS guarantee est >= true, est <= true + eps*N w.h.p.
    The d*w sketch is broadcast; the probe never shuffles."""
    probes = keys.select(
        "*",
        F.posexplode(
            F.array(*[(h60_salted(j, F.col(key_col)) % w) for j in range(d)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"])
        .groupBy(*keys.columns)
        .agg(F.min("cnt").alias("cms_est"))
    )


# --- Bloom filter ---


def bloom_size_bits(n_keys: int) -> int:
    """Power-of-two Bloom size at ~10 bits/key (k = 7 ~ the ln2 * m/n
    optimum). Matches the SQL twin's CAST(ceil(log2(10*n)) ...) — 10*n has
    a factor of 5 so it is never an exact power of two and the float log2
    cannot sit on a ceil boundary."""
    import math

    return 1 << math.ceil(math.log2(10 * n_keys))


def bloom_positions(build: DataFrame, key_col: str, m_bits: int, k: int = 7) -> DataFrame:
    """The Bloom filter as a DataFrame: the distinct set of set-bit
    positions (k salted hashes per build key, mod m_bits). <= k*n_build
    rows — broadcast-sized whenever the build side is a dimension."""
    return (
        build.select(
            F.explode(
                F.array(
                    *[(h60_salted(j, F.col(key_col)) % m_bits) for j in range(k)]
                )
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(probe: DataFrame, key_col: str, positions: DataFrame, m_bits: int,
                k: int = 7) -> DataFrame:
    """Membership test: a probe key passes iff all k of its bit positions
    are set. Implemented as explode(k) -> LEFT broadcast join on position
    -> min(hit) per probe row. The left join keeps zero-hit probe rows in
    the aggregate, so no second (shuffled) join back to the probe side is
    needed to recover them; the row id preserves duplicate probe rows'
    multiplicity and is dropped before return (group members all descend
    from one probe row, so first() per column is exact, not arbitrary).
    No false negatives by construction; false positives are exactly the
    keys whose k positions all collide with set bits."""
    exploded = probe.withColumn("_rid", F.monotonically_increasing_id()).select(
        "_rid",
        *probe.columns,
        F.explode(
            F.array(*[(h60_salted(j, F.col(key_col)) % m_bits) for j in range(k)])
        ).alias("pos"),
    )
    return (
        exploded.join(
            F.broadcast(positions.withColumn("_hit", F.lit(1))), "pos", "left"
        )
        .groupBy("_rid")
        .agg(
            *[F.first(c).alias(c) for c in probe.columns],
            (F.min(F.col("_hit").isNotNull().cast("int")) == 1).alias("bloom_pass"),
        )
        .drop("_rid")
    )
