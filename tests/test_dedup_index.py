"""Persisted MinHash-LSH dedup index (operators/dedup_index.py).

The suite gate (incremental_lsh_dedup) proves the delta-vs-corpus plan
against the DuckDB oracle every round; these tests prove the PERSISTED
split is the same operator:

- build-then-dedup on the suite's own corpus/delta split reproduces the
  oracle-checked query's output row for row;
- append folds a delta in without touching corpus rows, after which the
  same delta self-matches at jaccard 1.0.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _split(spark):
    from op_etl_spark.suite.dedup import INC_MOD, INC_REMAINDER, _docs

    d = _docs(spark, SF_DIR)
    is_new = F.col("doc_id") % INC_MOD == INC_REMAINDER
    return d.filter(~is_new), d.filter(is_new)


def test_persisted_delta_matches_suite_gate(spark, tmp_path):
    from op_etl_spark.operators.dedup_index import build_dedup_index, dedup_delta
    from op_etl_spark.suite.dedup import incremental_lsh_dedup

    corpus, delta = _split(spark)
    idx = str(tmp_path / "lsh_idx")
    build_dedup_index(corpus, idx, n_buckets=4)

    pairs = dedup_delta(spark, idx, delta)
    best = F.min(
        F.struct(F.col("old_id").alias("old_id"), F.col("jaccard").alias("jaccard"))
    ).alias("b")
    got = {
        tuple(r)
        for r in pairs.groupBy("new_id")
        .agg(F.count(F.lit(1)).alias("n_matches"), best)
        .select("new_id", "n_matches", "b.old_id", "b.jaccard")
        .collect()
    }
    want = {
        tuple(r) for r in incremental_lsh_dedup(spark, SF_DIR).collect()
    }
    assert got == want and got, "persisted split diverged from the oracle-checked gate"


def test_append_then_self_match(spark, tmp_path):
    from op_etl_spark.operators.dedup_index import (
        append_to_index,
        build_dedup_index,
        dedup_delta,
    )

    corpus, delta = _split(spark)
    idx = str(tmp_path / "lsh_idx2")
    build_dedup_index(corpus, idx)

    n_bands_before = spark.read.parquet(f"{idx}/bands").count()
    append_to_index(spark, idx, delta)
    n_bands_after = spark.read.parquet(f"{idx}/bands").count()
    n_delta_docs = delta.count()
    # 16 hashes / 4 rows per band = 4 band rows per doc
    assert n_bands_after - n_bands_before == 4 * n_delta_docs

    # the delta is now part of the corpus: a delta doc self-matches at
    # jaccard 1.0 iff at least one of its band buckets (post-append) is
    # still under LSH_BUCKET_CAP — dedup_delta drops over-cap buckets by
    # contract, so the expected set is computed from the actual bucket
    # sizes, not assumed to be all n_delta_docs (which flakes the moment
    # appended bands push any bucket past the cap)
    from op_etl_spark.operators.dedup_index import band_key
    from op_etl_spark.suite.dedup import LSH_BUCKET_CAP

    key = band_key()
    bands = spark.read.parquet(f"{idx}/bands")
    undercap = (
        bands.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= LSH_BUCKET_CAP)
        .drop("n")
    )
    delta_ids = {r.doc_id for r in delta.select("doc_id").collect()}
    expected = {
        r.doc_id
        for r in bands.join(undercap, key).select("doc_id").distinct().collect()
    } & delta_ids
    assert expected, "fixture degenerated: every delta band bucket is over cap"

    self_matches = (
        dedup_delta(spark, idx, delta)
        .filter(F.col("new_id") == F.col("old_id"))
        .collect()
    )
    assert {r.new_id for r in self_matches} == expected
    assert all(r.jaccard == 1.0 for r in self_matches)
