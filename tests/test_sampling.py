"""Invariants for deterministic sampling (values are oracle-checked in the
suite; these pin the properties that make the ops safe at scale)."""

import os

from pyspark.sql import functions as F

from op_etl_spark.operators.sampling import (
    deterministic_sample,
    group_topk_sample,
    train_test_split,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_sample_stable_under_repartition(spark):
    d = _docs(spark)
    a = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.3).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(d.repartition(17), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < d.count()


def test_sample_fraction_roughly_honored(spark):
    d = _docs(spark)
    total = d.count()
    kept = deterministic_sample(d, "doc_id", 0.3).count()
    assert abs(kept / total - 0.3) < 0.08


def test_split_disjoint_exhaustive_and_monotone(spark):
    d = _docs(spark)
    s1 = train_test_split(d, "doc_id", 0.1, holdout_fraction=0.1)
    counts = dict(
        (r.split, r.n) for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert sum(counts.values()) == d.count()
    assert set(counts) == {"train", "test", "holdout"}

    test1 = {r.doc_id for r in s1.filter("split = 'test'").select("doc_id").collect()}
    s2 = train_test_split(d, "doc_id", 0.25)
    test2 = {r.doc_id for r in s2.filter("split = 'test'").select("doc_id").collect()}
    assert test1 <= test2  # growing the fraction only moves the boundary


def test_group_topk_exact_cap(spark):
    d = _docs(spark)
    k = 4
    sizes = {
        (r.source, r.lang): r.n
        for r in d.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()
    }
    got = {
        (r.source, r.lang): r.n
        for r in group_topk_sample(d, ["source", "lang"], "doc_id", k)
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(sizes)
    for g, n in sizes.items():
        assert got[g] == min(k, n)


def test_shuffle_shards_reproducible_permutation(spark):
    from op_etl_spark.operators.sampling import shuffle_shards

    d = _docs(spark)
    m = shuffle_shards(d, "doc_id", 8)
    rows = [(r.doc_id, r.shard, r.pos) for r in m.select("doc_id", "shard", "pos").collect()]
    # total function: every doc exactly once, shard in range
    assert len(rows) == d.count() == len({r[0] for r in rows})
    assert {r[1] for r in rows} <= set(range(8))
    # pos is 1..|shard| contiguous within each shard
    by_shard = {}
    for _, s, p in rows:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # stable under repartitioning (pure function of key)
    again = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_shards(d.repartition(17), "doc_id", 8)
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert set(rows) == again
    # a different salt is a different permutation
    other = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_shards(d, "doc_id", 8, salt="epoch2")
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert set(rows) != other


def test_weighted_reservoir_sample_exact_k_and_weight_bias(spark):
    """A-ES invariants on the real fixture: exactly AES_K rows per lang
    (or the whole group when smaller), no duplicates (without
    replacement), ranks contiguous from 1, and the selected docs'
    mean weight exceeds the population mean (weighted inclusion bias)."""
    from op_etl_spark.suite.sampling import AES_K, _docs, weighted_reservoir_sample
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    out = weighted_reservoir_sample(spark, sf).collect()
    d = _docs(spark, sf)
    pop = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(pop)
    for lang, rows in by_lang.items():
        assert len(rows) == min(AES_K, pop[lang])
        assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))
        ids = [r["doc_id"] for r in rows]
        assert len(set(ids)) == len(ids)  # without replacement

    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    pop_mean = d.agg(F.avg(ttr)).collect()[0][0]
    sample_mean = sum(r["ttr"] for r in out) / len(out)
    assert sample_mean > pop_mean  # quality-weighted keys bias the draw up
