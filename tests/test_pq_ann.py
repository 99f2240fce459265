"""PQ ANN (suite/pq_ann.py): encode/ADC plumbing pinned by the
zero-distortion contract — when every corpus vector IS a codeword, the
compressed-domain distances equal the exact ones and recall@k is 1.0."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from op_etl_spark.suite.pq_ann import (
    PQ_KCODES,
    PQ_M,
    PQ_SUBDIM,
    pq_distortion_stats,
    pq_recall_at_k,
)


@pytest.fixture(scope="module")
def codeword_corpus(spark, tmp_path_factory):
    """Exactly PQ_KCODES distinct 64-dim micro-grid vectors, once each:
    the seed scan must select ALL of them as codewords (16 rows, limit
    16), so trained distortion is exactly 0, ADC equals exact sqdist,
    and recall@k is forced to 1.0 — any plumbing slip (wrong subspace
    slice, wrong codeword lookup, tie-break skew) breaks it."""
    dim = PQ_M * PQ_SUBDIM
    distinct = [
        [round((i * 37 + p * 11) % 100 / 1e6, 6) for p in range(dim)]
        for i in range(PQ_KCODES)
    ]
    rows = [(v, distinct[v]) for v in range(PQ_KCODES)]
    d = tmp_path_factory.mktemp("pqdata")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).withColumn("label", F.lit("x")).coalesce(1).write.parquet(
        os.path.join(str(d), "embeddings.parquet")
    )
    return str(d)


def test_zero_distortion_on_codeword_corpus(spark, codeword_corpus):
    out = pq_distortion_stats(spark, codeword_corpus).collect()
    assert len(out) == PQ_M
    for r in out:
        assert r["mean_distortion"] == 0.0
        assert r["max_distortion"] == 0.0
        assert r["n_vectors"] == PQ_KCODES


def test_perfect_recall_on_codeword_corpus(spark, codeword_corpus):
    out = pq_recall_at_k(spark, codeword_corpus).collect()
    assert len(out) == 10
    assert all(r["recall"] == 1.0 for r in out)


def test_codes_in_range(spark, codeword_corpus):
    from op_etl_spark.suite.pq_ann import _pq_index

    enc, books = _pq_index(spark, codeword_corpus)
    assert len(books) == PQ_M
    assert all(len(b) == PQ_KCODES for b in books)
    mins = enc.select(
        F.least(*[F.col(f"c{m}") for m in range(PQ_M)]).alias("lo"),
        F.greatest(*[F.col(f"c{m}") for m in range(PQ_M)]).alias("hi"),
    ).agg(F.min("lo"), F.max("hi")).collect()[0]
    assert mins[0] >= 0 and mins[1] < PQ_KCODES
