"""Index-table lifecycle: compaction under append (operators/layout.py
compact_index over the dedup-LSH and IVF index layouts).

Append-mode indexes accrete one file set per delta forever; compaction
must shrink the file count WITHOUT changing a single result row. These
tests absorb three appends into each index kind, pin the query output
before compaction, compact, and require the re-run to be row-for-row
identical — the invariance that lets a scheduled compactor fire
unconditionally (reference analogue: the staging-GDB rebuild discipline,
stage_files.py:688-725).
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _data_files(path: str) -> list[str]:
    return [
        p
        for p in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if not p.rsplit("/", 1)[-1].startswith((".", "_"))
    ]


def _doc_slices(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 8 < 5)
    batches = [docs.filter(F.col("doc_id") % 8 == r) for r in (5, 6, 7)]
    return corpus, batches


def test_dedup_index_results_invariant_across_compaction(spark, tmp_path):
    from op_etl_spark.operators.dedup_index import (
        append_to_index,
        build_dedup_index,
        dedup_delta,
    )
    from op_etl_spark.operators.layout import compact_index

    corpus, batches = _doc_slices(spark)
    idx = str(tmp_path / "lsh_idx")
    build_dedup_index(corpus, idx)
    for b in batches:
        append_to_index(spark, idx, b)

    query_delta = batches[0]
    before = sorted(map(tuple, dedup_delta(spark, idx, query_delta).collect()))
    assert before, "fixture produced no matches - the invariance check is vacuous"

    n_before = len(_data_files(f"{idx}/bands"))
    plans = compact_index(spark, idx)
    assert set(plans) == {"bands", "shingles"}
    assert not plans["bands"].skipped, "appends must leave bands over target"
    assert len(_data_files(f"{idx}/bands")) == plans["bands"].target_files
    assert len(_data_files(f"{idx}/bands")) < n_before

    after = sorted(map(tuple, dedup_delta(spark, idx, query_delta).collect()))
    assert after == before


def test_ivf_index_search_invariant_across_compaction(spark, tmp_path):
    from op_etl_spark.operators.ann_index import (
        build_ivf_index,
        ivf_append_batch,
        ivf_search,
    )
    from op_etl_spark.operators.layout import compact_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 8 < 5)
    batches = [emb.filter(F.col("vec_id") % 8 == r) for r in (5, 6, 7)]

    idx = str(tmp_path / "ivf_idx")
    build_ivf_index(corpus, idx, n_lists=4, iters=2)
    for b in batches:
        ivf_append_batch(spark, idx, b)

    query = list(
        emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    )
    before = [tuple(r) for r in ivf_search(spark, idx, query, nprobe=2, topk=10).collect()]
    assert len(before) == 10

    n_before = len(_data_files(f"{idx}/vectors"))
    plans = compact_index(spark, idx)
    assert "vectors" in plans and "centroids" in plans
    assert not plans["vectors"].skipped, "appends must leave vectors over target"
    assert len(_data_files(f"{idx}/vectors")) < n_before
    # the hive layout survives: list dirs still present for partition pruning
    assert glob.glob(f"{idx}/vectors/list_id=*"), "partition layout lost"

    after = [tuple(r) for r in ivf_search(spark, idx, query, nprobe=2, topk=10).collect()]
    assert after == before


def test_ivf2_index_search_invariant_across_compaction(spark, tmp_path):
    """Two-level layout: vectors/coarse_id=C/fine_id=F — compaction must
    preserve BOTH partition levels (two-column pruning untouched)."""
    from op_etl_spark.operators.ann_index import (
        build_ivf2_index,
        ivf2_append_batch,
        ivf2_search,
    )
    from op_etl_spark.operators.layout import compact_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter(F.col("vec_id") % 8 < 5)
    batches = [emb.filter(F.col("vec_id") % 8 == r) for r in (5, 6, 7)]

    idx = str(tmp_path / "ivf2_idx")
    build_ivf2_index(corpus, idx, n_coarse=2, n_fine=2, iters=1)
    for b in batches:
        ivf2_append_batch(spark, idx, b)

    query = list(emb.orderBy("vec_id").limit(1).collect()[0]["embedding"])
    before = [
        tuple(r)
        for r in ivf2_search(spark, idx, query, p_coarse=2, p_fine=2, topk=10).collect()
    ]
    assert len(before) == 10

    n_before = len(_data_files(f"{idx}/vectors"))
    plans = compact_index(spark, idx)
    assert not plans["vectors"].skipped
    assert len(_data_files(f"{idx}/vectors")) < n_before
    assert glob.glob(f"{idx}/vectors/coarse_id=*/fine_id=*"), "two-level layout lost"

    after = [
        tuple(r)
        for r in ivf2_search(spark, idx, query, p_coarse=2, p_fine=2, topk=10).collect()
    ]
    assert after == before


def test_compact_index_is_idempotent_and_schedulable(spark, tmp_path):
    """Second run straight after the first: every plan reports skipped
    (already at target), so an unconditional scheduled compactor is safe."""
    from op_etl_spark.operators.dedup_index import append_to_index, build_dedup_index
    from op_etl_spark.operators.layout import compact_index

    corpus, batches = _doc_slices(spark)
    idx = str(tmp_path / "lsh_idx2")
    build_dedup_index(corpus, idx)
    append_to_index(spark, idx, batches[0])

    compact_index(spark, idx)
    again = compact_index(spark, idx)
    assert all(p.skipped for p in again.values())


def test_compact_index_rejects_non_index_dir(spark, tmp_path):
    import pytest

    from op_etl_spark.operators.layout import compact_index

    with pytest.raises(ValueError, match="no recognized index"):
        compact_index(spark, str(tmp_path / "empty"))
