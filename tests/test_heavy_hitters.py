"""Heavy hitters (operators/heavy_hitters.py): the completeness guarantee
and the candidate-bound contract, exercised on data skewed enough that
Misra-Gries pruning actually engages (the suite's oracle check runs on
near-uniform testdata where it doesn't)."""

import pandas as pd
from pyspark.sql import functions as F

from op_etl_spark.operators.heavy_hitters import (
    heavy_hitters,
    misra_gries_candidates,
)


def _zipfish(spark, n_keys=500, hot=("h0", 4000), partitions=8):
    """A long uniform tail plus one hot key, shuffled across partitions."""
    tail = spark.range(20000).select(
        F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias("key")
    )
    head = spark.range(hot[1]).select(F.lit(hot[0]).alias("key"))
    return tail.union(head).repartition(partitions)


def test_exact_result_matches_groupby(spark):
    df = _zipfish(spark)
    k = 100  # threshold: > 24000/100 = 240 events
    got = {(r.key, r.cnt) for r in heavy_hitters(df, "key", k, m=150).collect()}
    want = {
        (r.key, r.cnt)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > df.count())
        .collect()
    }
    assert got == want and ("h0", 4000) in got


def test_mg_candidates_superset_and_pruned(spark):
    df = _zipfish(spark)
    m = 50  # far fewer counters than the 501 distinct keys: pruning engages
    cands = {r.key for r in misra_gries_candidates(df, "key", m).collect()}
    # superset of every key with global count > N/m
    n = df.count()
    heavy = {
        r.key
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * m > n)
        .collect()
    }
    assert heavy <= cands
    # and pruning really happened: far fewer candidates than distinct keys
    assert len(cands) < 501


def test_m_less_than_k_rejected(spark):
    df = _zipfish(spark)
    try:
        heavy_hitters(df, "key", k=100, m=50)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_mg_batched_merge_matches_single_batch():
    """The mergeable-summaries pruning rule keeps the MG error bound:
    feed the same rows as one batch vs many batches — both candidate
    sets must contain the guaranteed-heavy key."""
    from op_etl_spark.operators.heavy_hitters import misra_gries_candidates  # noqa: F401

    # pure-pandas re-implementation of the inner loop, k small
    def run(batches, m):
        counters = {}
        for pdf in batches:
            for k, c in pdf["key"].value_counts().items():
                counters[k] = counters.get(k, 0) + int(c)
            if len(counters) > m:
                cut = sorted(counters.values(), reverse=True)[m]
                counters = {k: c - cut for k, c in counters.items() if c > cut}
        return set(counters)

    rows = ["hot"] * 50 + [f"t{i}" for i in range(40)]
    one = run([pd.DataFrame({"key": rows})], 8)
    many = run([pd.DataFrame({"key": rows[i : i + 10]}) for i in range(0, 90, 10)], 8)
    assert "hot" in one and "hot" in many


def test_null_keys_are_out_of_contract(spark):
    """A null key over the threshold is explicitly filtered (documented
    contract), not silently half-handled: it never appears in the output,
    and it does not inflate N for the other keys' threshold."""
    from pyspark.sql import functions as F

    rows = [("a",)] * 60 + [(None,)] * 500 + [("b",)] * 3
    df = spark.createDataFrame(rows, "key string").repartition(4)
    got = {(r.key, r.cnt) for r in heavy_hitters(df, "key", k=3, m=50).collect()}
    # N excludes nulls: N=63, threshold 21 -> only 'a' qualifies. If nulls
    # counted toward N (563 -> threshold 187), nothing would qualify.
    assert got == {("a", 60)}
