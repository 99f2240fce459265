"""Mergeable-sketch queries: approximate distinct / count / membership with
exact-vs-estimate accounting, all oracle-replayed bit-for-bit by DuckDB.

Why these exist in a 100 TB engine: exact COUNT(DISTINCT), per-key exact
counts, and semi-join membership all shuffle corpus-scale data. The sketch
versions shuffle constant-size summaries (KMV bottom-k arrays, HLL
registers, CMS cells, Bloom bit positions) that merge associatively across
partitions/days/shards — Agarwal et al., "Mergeable Summaries", PODS 2012.
At gate scale each query ALSO computes the exact answer and reports the
estimation error; at 100 TB the exact column is what you delete, the
sketch column is what you keep.

Determinism contract: every estimate is a deterministic function of md5
(operators/sketches.h60 — the suite-wide 60-bit contract), with
exact-integer accumulators and a single correctly-rounded divide before
the half-up floor, so Spark and DuckDB agree bit-for-bit (the HLL
small-range ln branch carries the same documented ulp caveat as
suite/lm_stats.py).

The reference (an ArcPy geospatial ETL, no sketch surface) is not cited
here: this module is part of the training-data-pipeline extension surface
the build brief mandates beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from op_etl_spark.operators.sketches import (
    HLL_ALPHA_64,
    KMV_MAX,
    bloom_positions,
    bloom_probe,
    bloom_size_bits,
    bottom_k_hashes,
    cms_lookup,
    cms_table,
    h60,
    h60_salted,
    hll_estimate,
    hll_register_table,
    kmv_estimate,
)

from ._util import fround, read_table

KMV_K = 64
HLL_M = 64
CMS_D, CMS_W = 4, 1024
BLOOM_K = 7

H60_SQL = "('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15))::BIGINT"
H60_SALTED_SQL = (
    "('0x' || substr(md5(CAST({s} AS VARCHAR) || ':' || CAST({x} AS VARCHAR)),"
    " 1, 15))::BIGINT"
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from op_etl_spark.session import read_events

    return read_events(spark, sf_dir)


def _err_bp(est, exact) -> F.Column:
    return F.floor(
        F.abs(est.cast("double") - exact.cast("double")) * 10000.0
        / exact.cast("double")
        + F.lit(0.5)
    ).cast("long")


# --- KMV bottom-k distinct ---


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via a k=64 bottom-k (KMV/theta)
    sketch, with the exact count and the error in basis points alongside.

    Plan shape: distinct (type, h60) with map-side partial dedup, then two
    bounded-state roll-ups (per-salt bottom-k, then per-group merge) — see
    operators/sketches.bottom_k_hashes. The n_exact column counts distinct
    60-bit hashes (== distinct users barring a 2^-60 collision, and the
    DuckDB twin counts the identical quantity, so the gate is exact either
    way); at 100 TB you keep the sketch column and drop the exact one."""
    ev = _events(spark, sf_dir)
    bk = bottom_k_hashes(ev, ["event_type"], h60(F.col("user_id")), KMV_K)
    return bk.select(
        "event_type",
        F.col("n_distinct").alias("n_exact"),
        kmv_estimate(KMV_K).alias("kmv_estimate"),
    ).withColumn("err_bp", _err_bp(F.col("kmv_estimate"), F.col("n_exact")))


ORACLE_KMV = f"""
WITH dh AS (
  SELECT DISTINCT event_type, {H60_SQL.format(x="user_id")} AS h FROM events),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM dh),
k AS (
  SELECT event_type, max(nd) AS n_exact,
         max(CASE WHEN rn = {KMV_K} THEN h END) AS hk
  FROM r GROUP BY 1),
e AS (
  SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
         CAST(CASE WHEN n_exact < {KMV_K} THEN n_exact
              ELSE floor({float(KMV_K - 1)!r} * {KMV_MAX!r} / CAST(hk AS DOUBLE)
                         + 0.5) END AS BIGINT) AS kmv_estimate
  FROM k)
SELECT event_type, n_exact, kmv_estimate,
       CAST(floor(abs(CAST(kmv_estimate AS DOUBLE) - CAST(n_exact AS DOUBLE))
                  * 10000.0 / CAST(n_exact AS DOUBLE) + 0.5) AS BIGINT) AS err_bp
FROM e
"""


# --- HyperLogLog ---


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via m=64 HyperLogLog registers
    (Flajolet et al. 2007), linear-counting small-range branch included.

    Plan shape: ONE map-side-combining groupBy builds the register table
    (64 rows per group — the mergeable sketch); the estimate is pure
    column arithmetic on it. The exact count is a second aggregate of the
    same scan (2 scans total, under the plan-audit rescan threshold);
    at 100 TB the exact branch is the one you delete."""
    ev = _events(spark, sf_dir).select("event_type", h60(F.col("user_id")).alias("h"))
    regs = hll_register_table(ev, ["event_type"], F.col("h"), HLL_M)
    est = hll_estimate(regs, ["event_type"], HLL_M)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("h").alias("n_exact")
    )
    return (
        exact.join(est, "event_type")
        .select("event_type", "n_exact", "hll_estimate")
        .withColumn("err_bp", _err_bp(F.col("hll_estimate"), F.col("n_exact")))
    )


_HLL_WIDTH = 60 - HLL_M.bit_length() + 1  # 54
_HLL_SCALE = 2 ** (_HLL_WIDTH + 1)

ORACLE_HLL = f"""
WITH h AS (
  SELECT event_type, {H60_SQL.format(x="user_id")} AS h FROM events),
rr AS (
  SELECT event_type, h % {HLL_M} AS reg,
         CASE WHEN h // {HLL_M} = 0 THEN {_HLL_WIDTH + 1}
              ELSE {_HLL_WIDTH + 1} - length(ltrim(bin(h // {HLL_M}), '0'))
         END AS rho
  FROM h),
regs AS (SELECT event_type, reg, max(rho) AS max_rho FROM rr GROUP BY 1, 2),
agg AS (
  SELECT event_type,
         sum(CAST(1 AS BIGINT) << ({_HLL_WIDTH + 1} - max_rho)) AS z_used,
         count(*) AS n_regs
  FROM regs GROUP BY 1),
est AS (
  SELECT event_type,
         CAST(z_used + ({HLL_M} - n_regs) * {_HLL_SCALE} AS DOUBLE) AS zp,
         CAST({HLL_M} - n_regs AS DOUBLE) AS v
  FROM agg),
fin AS (
  SELECT event_type,
         {HLL_ALPHA_64 * HLL_M * HLL_M!r} * {float(_HLL_SCALE)!r} / zp AS raw, v
  FROM est),
ex AS (SELECT event_type, count(DISTINCT h) AS n_exact FROM h GROUP BY 1)
SELECT f.event_type, CAST(ex.n_exact AS BIGINT) AS n_exact,
       CAST(floor(CASE WHEN raw <= {2.5 * HLL_M!r} AND v > 0
                       THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
                       ELSE raw END + 0.5) AS BIGINT) AS hll_estimate,
       CAST(floor(abs(CAST(floor(CASE WHEN raw <= {2.5 * HLL_M!r} AND v > 0
                                      THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
                                      ELSE raw END + 0.5) AS DOUBLE)
                      - CAST(ex.n_exact AS DOUBLE)) * 10000.0
                  / CAST(ex.n_exact AS DOUBLE) + 0.5) AS BIGINT) AS err_bp
FROM fin f JOIN ex ON ex.event_type = f.event_type
"""


def hll_merge_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY as a declared gate, not just a unit test: the
    corpus is split into two "days" (event_id parity), per-day HLL
    register tables are built independently, max-merged, and estimated —
    alongside the estimate from a single full-corpus sketch. Because
    registers are a pure max-reduction, the two must be EQUAL (not
    approximately equal), and `merge_exact` pins it per group. This is the
    operational property that lets daily 100 TB sketches roll up into
    monthly distincts without re-reading any raw data (Agarwal et al.,
    PODS 2012).

    Plan shape: day registers come from ONE scan (day is a derived
    column, the roll-up is a second tiny aggregate of the register
    table); the full sketch is a second scan — 2 total, under the
    plan-audit rescan threshold."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        (F.col("event_id") % 2).alias("day"),
        h60(F.col("user_id")).alias("h"),
    )
    regs_day = hll_register_table(ev, ["event_type", "day"], F.col("h"), HLL_M)
    merged_regs = regs_day.groupBy("event_type", "reg").agg(
        F.max("max_rho").alias("max_rho")
    )
    merged = hll_estimate(merged_regs, ["event_type"], HLL_M).withColumnRenamed(
        "hll_estimate", "hll_merged"
    )
    full = hll_estimate(
        hll_register_table(ev, ["event_type"], F.col("h"), HLL_M),
        ["event_type"],
        HLL_M,
    ).withColumnRenamed("hll_estimate", "hll_full")
    return (
        merged.join(full, "event_type")
        .select(
            "event_type",
            "hll_merged",
            "hll_full",
            (F.col("hll_merged") == F.col("hll_full")).cast("int").alias("merge_exact"),
        )
    )


ORACLE_HLL_MERGE = f"""
WITH h AS (
  SELECT event_type, event_id % 2 AS day,
         {H60_SQL.format(x="user_id")} AS h
  FROM events),
rr AS (
  SELECT event_type, day, h % {HLL_M} AS reg,
         CASE WHEN h // {HLL_M} = 0 THEN {_HLL_WIDTH + 1}
              ELSE {_HLL_WIDTH + 1} - length(ltrim(bin(h // {HLL_M}), '0'))
         END AS rho
  FROM h),
day_regs AS (
  SELECT event_type, day, reg, max(rho) AS max_rho FROM rr GROUP BY 1, 2, 3),
merged_regs AS (
  SELECT event_type, reg, max(max_rho) AS max_rho FROM day_regs GROUP BY 1, 2),
full_regs AS (
  SELECT event_type, reg, max(rho) AS max_rho FROM rr GROUP BY 1, 2),
est AS (
  SELECT 'm' AS side, event_type,
         sum(CAST(1 AS BIGINT) << ({_HLL_WIDTH + 1} - max_rho)) AS z_used,
         count(*) AS n_regs
  FROM merged_regs GROUP BY 2
  UNION ALL
  SELECT 'f' AS side, event_type,
         sum(CAST(1 AS BIGINT) << ({_HLL_WIDTH + 1} - max_rho)) AS z_used,
         count(*) AS n_regs
  FROM full_regs GROUP BY 2),
fin AS (
  SELECT side, event_type,
         {HLL_ALPHA_64 * HLL_M * HLL_M!r} * {float(_HLL_SCALE)!r}
           / CAST(z_used + ({HLL_M} - n_regs) * {_HLL_SCALE} AS DOUBLE) AS raw,
         CAST({HLL_M} - n_regs AS DOUBLE) AS v
  FROM est),
e2 AS (
  SELECT side, event_type,
         CAST(floor(CASE WHEN raw <= {2.5 * HLL_M!r} AND v > 0
                         THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / v)
                         ELSE raw END + 0.5) AS BIGINT) AS est
  FROM fin)
SELECT m.event_type, m.est AS hll_merged, f.est AS hll_full,
       CAST(CASE WHEN m.est = f.est THEN 1 ELSE 0 END AS INT) AS merge_exact
FROM (SELECT event_type, est FROM e2 WHERE side = 'm') m
JOIN (SELECT event_type, est FROM e2 WHERE side = 'f') f
  ON f.event_type = m.event_type
"""


# --- Count-min sketch ---


def cms_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-count point estimates from a 4x1024 count-min
    sketch, with the exact count and the (always >= 0) overcount.

    Plan shape: the sketch is ONE map-side-combining groupBy over the
    d-cell explosion (4096 cells total — a constant, broadcast to the
    probe join); the exact per-key counts are the verification payload the
    sketch is meant to replace at scale."""
    ev = _events(spark, sf_dir)
    cms = cms_table(ev, F.col("user_id"), CMS_D, CMS_W)
    keys = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    looked = cms_lookup(cms, keys, "user_id", CMS_D, CMS_W)
    return looked.select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


ORACLE_CMS = f"""
WITH cells AS (
  SELECT j AS rj, {H60_SALTED_SQL.format(s="j", x="user_id")} % {CMS_W} AS bucket
  FROM events, (SELECT unnest(range(0, {CMS_D})) AS j)),
cms AS (SELECT rj, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
keys AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1),
probes AS (
  SELECT user_id, exact_cnt, j AS rj,
         {H60_SALTED_SQL.format(s="j", x="user_id")} % {CMS_W} AS bucket
  FROM keys, (SELECT unnest(range(0, {CMS_D})) AS j))
SELECT p.user_id, CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(min(c.cnt) AS BIGINT) AS cms_est,
       CAST(min(c.cnt) - p.exact_cnt AS BIGINT) AS overcount
FROM probes p JOIN cms c ON c.rj = p.rj AND c.bucket = p.bucket
GROUP BY p.user_id, p.exact_cnt
"""


# --- Bloom-filter join pruning ---


def bloom_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join pruning, fully accounted: build a ~10
    bits/key power-of-two Bloom filter (k=7) over BUILDING-segment
    customer keys, probe every order, and report pass/member/false-positive
    counts plus the measured false-positive rate in basis points.

    This is the shuffle-avoidance pattern for 100 TB joins: the bit-set
    (<= k * n_dim positions, broadcast) filters the fact table down to
    ~members + fpp before the real join pays a shuffle. No false negatives
    by construction (tests/test_sketches.py proves it on an adversarial
    fixture); the builder's n_keys -> m sizing is replayed by the oracle in
    SQL so the plan and the gate can never disagree on the filter size.
    The dimension count() driving the sizing is a bounded driver-side
    scalar (same class as the suite's centroid/manifest lists)."""
    cust = read_table(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    ).distinct()
    n_keys = build.count()
    m_bits = bloom_size_bits(n_keys)
    pos = bloom_positions(build, "c_custkey", m_bits, BLOOM_K)
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probed = bloom_probe(orders, "o_custkey", pos, m_bits, BLOOM_K)
    flagged = probed.join(
        F.broadcast(build.withColumn("is_member", F.lit(1))),
        probed.o_custkey == build.c_custkey,
        "left",
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_pass"),
        F.sum(F.coalesce(F.col("is_member"), F.lit(0)).cast("long")).alias("n_member"),
        F.sum(
            (F.col("bloom_pass") & F.col("is_member").isNull()).cast("long")
        ).alias("n_false_pos"),
    )
    return agg.select(
        F.lit(n_keys).cast("long").alias("n_build_keys"),
        F.lit(m_bits).cast("long").alias("m_bits"),
        "n_probe",
        "n_pass",
        "n_member",
        "n_false_pos",
        F.floor(
            F.col("n_false_pos").cast("double") * 10000.0
            / (F.col("n_probe") - F.col("n_member")).cast("double")
            + F.lit(0.5)
        ).cast("long").alias("fpp_bp"),
    )


ORACLE_BLOOM = f"""
WITH bk AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
n AS (SELECT count(*) AS nk FROM bk),
mb AS (
  SELECT CAST(1 AS BIGINT) << CAST(ceil(log2(10.0 * nk)) AS INT) AS m FROM n),
pos AS (
  SELECT DISTINCT {H60_SALTED_SQL.format(s="j", x="c_custkey")} % m AS pos
  FROM bk, (SELECT unnest(range(0, {BLOOM_K})) AS j), mb),
probe AS (SELECT o_orderkey, o_custkey FROM orders),
hits AS (
  SELECT o_orderkey, count(*) AS nh
  FROM (SELECT p.o_orderkey,
               {H60_SALTED_SQL.format(s="j", x="p.o_custkey")} % m AS pp
        FROM probe p, (SELECT unnest(range(0, {BLOOM_K})) AS j), mb) e
  JOIN pos ON pos.pos = e.pp
  GROUP BY 1),
flags AS (
  SELECT p.o_orderkey,
         CASE WHEN coalesce(h.nh, 0) = {BLOOM_K} THEN 1 ELSE 0 END AS pass,
         CASE WHEN p.o_custkey IN (SELECT c_custkey FROM bk) THEN 1 ELSE 0
         END AS member
  FROM probe p LEFT JOIN hits h ON h.o_orderkey = p.o_orderkey),
agg AS (
  SELECT count(*) AS n_probe, sum(pass) AS n_pass, sum(member) AS n_member,
         sum(CASE WHEN pass = 1 AND member = 0 THEN 1 ELSE 0 END) AS n_false_pos
  FROM flags)
SELECT CAST((SELECT nk FROM n) AS BIGINT) AS n_build_keys,
       CAST((SELECT m FROM mb) AS BIGINT) AS m_bits,
       CAST(n_probe AS BIGINT) AS n_probe,
       CAST(n_pass AS BIGINT) AS n_pass,
       CAST(n_member AS BIGINT) AS n_member,
       CAST(n_false_pos AS BIGINT) AS n_false_pos,
       CAST(floor(CAST(n_false_pos AS DOUBLE) * 10000.0
                  / CAST(n_probe - n_member AS DOUBLE) + 0.5) AS BIGINT) AS fpp_bp
FROM agg
"""


# --- bottom-k uniform row sample -> quantile estimates + rank-error gate ---

QSAMPLE_K = 256
QSAMPLE_OVER = 8  # threshold targets OVER*K expected survivors
QPOINTS = (0.25, 0.5, 0.75, 0.9, 0.99)
_POW60 = 1152921504606846976.0  # 2^60 as an exact double


def sample_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a MERGEABLE bottom-k uniform row sample (Cohen &
    Kaplan 2007): keep the K rows with the smallest salted hash of their
    unique id. Bottom-k of a union is the k-smallest of the merged
    bottom-ks, so per-shard/per-day samples merge associatively — the
    quantile member of the KMV/HLL/CMS/Bloom family (the
    `approx_quantile_gate` twin covers Spark's built-in percentile_approx;
    this is the from-scratch mergeable path).

    Bounded state end to end: an exact count picks an integer hash
    threshold targeting OVER*K expected survivors (Chernoff makes < K
    survivors astronomically unlikely; if N <= OVER*K the threshold
    clamps to 2^60 = keep all), the filter is a narrow scan, and only
    ~OVER*K rows reach the final sort+slice. For each declared quantile
    point the gate reports the sample estimate AND its exact full-data
    rank error |rank(est)/N - q| — expected O(1/sqrt(K)).

    Determinism: the threshold is derived from N with one double divide +
    an exact power-of-two scale (bit-identical in Python and DuckDB); the
    sample is fixed by (h, event_id) order; estimates are sample order
    statistics at floor(q*(m-1))."""
    import math

    from op_etl_spark.session import read_events

    ev = read_events(spark, sf_dir).select("event_id", "value")
    n = ev.count()
    thr = min(
        math.floor(_POW60 * ((QSAMPLE_OVER * float(QSAMPLE_K)) / n)), 2**60
    )
    h = h60_salted(F.lit("qs"), F.col("event_id"))
    samp = (
        ev.withColumn("h", h)
        .filter(F.col("h") < F.lit(int(thr)))
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("h", "event_id", "value"))),
                1,
                QSAMPLE_K,
            ).alias("xs")
        )
    )
    vals = F.array_sort(F.transform(F.col("xs"), lambda x: x["value"]))
    m = F.size(vals)
    ests = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.element_at(
                    vals, (F.floor(F.lit(q) * (m - 1)) + 1).cast("int")
                ).alias("est_value"),
            )
            for q in QPOINTS
        ]
    )
    est = samp.select(F.explode(ests).alias("e")).select("e.q", "e.est_value")
    return (
        ev.join(F.broadcast(est))
        .groupBy("q", "est_value")
        .agg(
            F.sum(
                F.when(F.col("value") <= F.col("est_value"), 1).otherwise(0)
            ).alias("n_le"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "q",
            "est_value",
            "n_le",
            "n_total",
            fround(
                F.abs(F.col("n_le") / F.col("n_total") - F.col("q")), 6
            ).alias("rank_err"),
        )
    )


_QPTS_SQL = ", ".join(f"CAST({q!r} AS DOUBLE)" for q in QPOINTS)

ORACLE_QSAMPLE = f"""
WITH n AS (SELECT count(*) AS n FROM events),
t AS (
  SELECT CAST(least(floor({_POW60!r} * (({QSAMPLE_OVER} * {float(QSAMPLE_K)!r}) / n)),
              {_POW60!r}) AS BIGINT) AS thr
  FROM n),
h AS (
  SELECT event_id, value,
         {H60_SALTED_SQL.format(s="'qs'", x="event_id")} AS h
  FROM events),
samp AS (
  SELECT value FROM (
    SELECT value, row_number() OVER (ORDER BY h, event_id) AS rn
    FROM h, t WHERE h < thr)
  WHERE rn <= {QSAMPLE_K}),
sv AS (
  SELECT value, row_number() OVER (ORDER BY value) - 1 AS vr FROM samp),
m AS (SELECT count(*) AS m FROM samp),
qs AS (SELECT unnest([{_QPTS_SQL}]) AS q),
est AS (
  SELECT q.q, sv.value AS est_value
  FROM qs q CROSS JOIN m
  JOIN sv ON sv.vr = CAST(floor(q.q * (m.m - 1)) AS BIGINT))
SELECT e.q, e.est_value,
       CAST(sum(CASE WHEN ev.value <= e.est_value THEN 1 ELSE 0 END)
            AS BIGINT) AS n_le,
       count(*) AS n_total,
       floor(abs(CAST(sum(CASE WHEN ev.value <= e.est_value THEN 1 ELSE 0 END)
                      AS BIGINT) / count(*) - e.q) * 1000000 + 0.5)
         / 1000000.0 AS rank_err
FROM events ev CROSS JOIN est e
GROUP BY 1, 2
"""


QUERIES = {
    "sample_quantile_gate": sample_quantile_gate,
    "kmv_distinct_users": kmv_distinct_users,
    "hll_distinct_users": hll_distinct_users,
    "hll_merge_days": hll_merge_days,
    "cms_user_event_counts": cms_user_event_counts,
    "bloom_prune_orders": bloom_prune_orders,
}

ORACLE = {
    "sample_quantile_gate": ORACLE_QSAMPLE,
    "kmv_distinct_users": ORACLE_KMV,
    "hll_distinct_users": ORACLE_HLL,
    "hll_merge_days": ORACLE_HLL_MERGE,
    "cms_user_event_counts": ORACLE_CMS,
    "bloom_prune_orders": ORACLE_BLOOM,
}
