"""End-to-end training-data pipeline: the extension operators composed the
way a real corpus build chains them —

  profile -> exact dedup -> quality filter -> near-dup (minhash-LSH
  candidates) prune -> train/test split -> stratified rebalance ->
  sequence packing -> Z-order clustered write -> compaction.

Each stage's row accounting is asserted against independently computed
expectations, and the final artifact is re-read and reconciled with the
surviving document set — proving the operators compose (schemas, caches,
determinism) rather than only passing in isolation.
"""

import os

from pyspark.sql import functions as F

from op_etl_spark.operators.layout import compact_files, plan_compaction, zorder_write
from op_etl_spark.operators.packing import SEQ_COL, pack_sequences
from op_etl_spark.operators.profile import profile_columns
from op_etl_spark.operators.sampling import stratified_sample, train_test_split
from op_etl_spark.suite.dedup import exact_dedup_groups, minhash_lsh_candidates

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_pipeline_composes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_raw = docs.count()

    # 0. profile gate: no null ids, no empty text
    prof = {r.column: r for r in profile_columns(docs, ["doc_id", "text"]).collect()}
    assert prof["doc_id"].n_nonnull == n_raw
    assert prof["doc_id"].n_distinct == n_raw

    # 1. exact dedup: keep each fingerprint's canonical (min) doc_id
    canon = exact_dedup_groups(spark, SF_DIR).select(
        F.col("canonical_id").alias("doc_id")
    )
    deduped = docs.join(canon, "doc_id", "left_semi")
    n_dedup = deduped.count()
    assert n_dedup == canon.count() <= n_raw

    # 2. quality filter: drop boilerplate-ish tiny docs
    kept = deduped.filter(F.size(F.split("text", " ")) >= 5)
    n_kept = kept.count()
    assert 0 < n_kept <= n_dedup

    # 3. near-dup prune: drop the higher id of every LSH candidate pair
    cand = minhash_lsh_candidates(spark, SF_DIR).select(
        F.col("id2").alias("doc_id")
    ).distinct()
    pruned = kept.join(cand, "doc_id", "left_anti")
    n_pruned = pruned.count()
    assert n_pruned == n_kept - kept.join(cand, "doc_id", "left_semi").count()

    # 4. split, then rebalance ONLY the training side
    split = train_test_split(pruned, "doc_id", test_fraction=0.2)
    train = split.filter("split = 'train'")
    test = split.filter("split = 'test'")
    assert train.count() + test.count() == n_pruned

    balanced = stratified_sample(
        train, "doc_id", "lang", {"en": 0.5}, default_fraction=1.0
    )
    per_lang = {
        r.lang: r.n
        for r in balanced.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    before = {
        r.lang: r.n
        for r in train.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert per_lang["en"] < before["en"]  # en downsampled
    for lang in before:
        if lang != "en":
            assert per_lang.get(lang) == before[lang]  # others untouched

    # 5. pack into 1024-token sequences per language
    with_toks = balanced.withColumn(
        "toks", F.size(F.split("text", " ")).cast("long")
    )
    packed = pack_sequences(with_toks, "toks", ["doc_id"], 1024, shard_col="lang")
    seq_sizes = packed.groupBy("lang", SEQ_COL).agg(F.sum("toks").alias("t"))
    # every closed sequence holds >= the budget's worth of starts
    assert packed.count() == balanced.count()
    assert seq_sizes.filter(F.col("t") <= 0).count() == 0

    # 6. clustered write + compaction plan sanity
    out = str(tmp_path / "corpus")
    zorder_write(
        packed.drop("split"), out, ["doc_id", "toks"], bits=8, num_files=6
    )
    plan = plan_compaction(spark, out, target_file_bytes=1 << 30)
    assert plan.n_files > 1
    compact_files(spark, out, target_file_bytes=1 << 30)
    final = spark.read.parquet(out)

    # 7. reconciliation: artifact == surviving docs, bit-stable ids
    assert final.count() == balanced.count()
    lhs = sorted(r.doc_id for r in final.select("doc_id").collect())
    rhs = sorted(r.doc_id for r in balanced.select("doc_id").collect())
    assert lhs == rhs
