"""Sketch-primitive properties: the guarantees each sketch advertises,
exercised on adversarial fixtures (operators/sketches.py).

The suite queries (suite/sketches.py) prove cross-engine determinism via
the DuckDB oracles; these tests prove the *semantic* invariants the
estimates rest on — exact bottom-k, register mergeability, CMS
one-sidedness, Bloom's no-false-negative contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from op_etl_spark.operators.sketches import (
    bloom_positions,
    bloom_probe,
    bloom_size_bits,
    bottom_k_hashes,
    cms_lookup,
    cms_table,
    h60,
    hll_register_table,
    kmv_estimate,
)


def _keys_df(spark, keys, group="g"):
    return spark.createDataFrame([(group, k) for k in keys], "g string, k long")


def test_bottom_k_is_exact_k_smallest_distinct(spark):
    # duplicates + two groups; bottom-k must equal the naive sorted slice
    # of the DISTINCT hash set, per group
    rows = [("a", i % 40) for i in range(400)] + [("b", i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, k long")
    got = {
        r["g"]: (r["hs"], r["n_distinct"])
        for r in bottom_k_hashes(df, ["g"], h60(F.col("k")), 8, n_salts=4).collect()
    }
    hashes = {
        (r["g"], r["h"])
        for r in df.select("g", h60(F.col("k")).alias("h")).distinct().collect()
    }
    for g, d in (("a", 40), ("b", 10)):
        expect = sorted(h for (gg, h) in hashes if gg == g)[:8]
        assert got[g][0] == expect
        assert got[g][1] == d


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    df = _keys_df(spark, range(30))
    row = (
        bottom_k_hashes(df, ["g"], h60(F.col("k")), 64)
        .select(kmv_estimate(64).alias("est"), "n_distinct")
        .collect()[0]
    )
    assert row["est"] == 30  # d < k: the sketch IS exact

    big = _keys_df(spark, range(2000))
    row = (
        bottom_k_hashes(big, ["g"], h60(F.col("k")), 64)
        .select(kmv_estimate(64).alias("est"))
        .collect()[0]
    )
    # stderr ~ 1/sqrt(k-1) = 12.6%; 4 sigma on the fixed md5 hash set
    assert abs(row["est"] - 2000) / 2000 < 0.5


def test_hll_registers_merge_by_max(spark):
    # mergeability: registers(half1) max-merged with registers(half2)
    # == registers(union). This is what lets daily sketches roll up
    # without touching raw data.
    all_keys = list(range(500))
    h1 = _keys_df(spark, all_keys[:250])
    h2 = _keys_df(spark, all_keys[250:])
    union = _keys_df(spark, all_keys)

    def regs(df):
        t = hll_register_table(
            df.select("g", h60(F.col("k")).alias("h")), ["g"], F.col("h")
        )
        return {(r["g"], r["reg"]): r["max_rho"] for r in t.collect()}

    merged: dict = {}
    for part in (regs(h1), regs(h2)):
        for key, rho in part.items():
            merged[key] = max(merged.get(key, 0), rho)
    assert merged == regs(union)


def test_cms_never_underestimates(spark):
    # heavy skew: key 0 appears 500x, the rest once — every point
    # estimate must dominate its true count (the CMS one-sided guarantee)
    rows = [(0,)] * 500 + [(k,) for k in range(1, 200)]
    df = spark.createDataFrame(rows, "k long")
    cms = cms_table(df, F.col("k"), d=4, w=64)  # tiny w forces collisions
    keys = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    out = cms_lookup(cms, keys, "k", d=4, w=64).collect()
    assert len(out) == 200
    assert all(r["cms_est"] >= r["exact"] for r in out)
    # and the heavy key is still identified exactly-ish (min over rows)
    heavy = next(r for r in out if r["k"] == 0)
    assert heavy["cms_est"] >= 500


def test_bloom_has_no_false_negatives(spark):
    build = spark.createDataFrame([(k,) for k in range(0, 300, 3)], "k long")
    m = bloom_size_bits(100)
    pos = bloom_positions(build, "k", m)
    probe = spark.createDataFrame([(k,) for k in range(300)], "k long")
    out = bloom_probe(probe, "k", pos, m).collect()
    members = {r["k"] for r in build.collect()}
    for r in out:
        if r["k"] in members:
            assert r["bloom_pass"], f"false negative on member {r['k']}"
    # the filter actually filters: most non-members rejected at 10 bits/key
    rejected = sum(1 for r in out if r["k"] not in members and not r["bloom_pass"])
    assert rejected > 150


def test_bloom_size_power_of_two_and_bits_per_key(spark):
    for n in (10, 302, 2943, 100_000):
        m = bloom_size_bits(n)
        assert m & (m - 1) == 0  # power of two (cheap mod on both engines)
        assert 10 * n <= m < 40 * n  # >= 10 bits/key, within 2 doublings
