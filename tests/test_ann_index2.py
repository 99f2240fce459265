"""Two-level IVF index: the very-large-codebook scale path.

The flat index's assignment is O(n x n_lists); with n_lists forced to
scale with the corpus (bounded list sizes), that goes quadratic. The
two-level build pins: deterministic construction, two-column partition
pruning (coarse_id AND fine_id), full-probe == brute force, recall at
partial probe, per-cell sub-codebook dispatch, and frozen-codebook
append touching only assigned (coarse, fine) partitions.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from op_etl_spark.operators.ann_index import (
    build_ivf2_index,
    ivf2_append_batch,
    ivf2_search,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
N_COARSE = 4
N_FINE = 4


@pytest.fixture(scope="module")
def index2(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf2") / "idx")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    fine = build_ivf2_index(emb, path, n_coarse=N_COARSE, n_fine=N_FINE, iters=2)
    return path, fine, emb


@pytest.fixture(scope="module")
def query_vec(spark):
    row = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .collect()[0]
    )
    return [float(v) for v in row.embedding]


def _brute_topk(spark, query, k):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = F.array(*[F.lit(float(v)) for v in query])
    e = F.col("embedding").cast("array<double>")
    dot = F.aggregate(F.zip_with(e, q, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    nrm = F.sqrt(F.aggregate(F.zip_with(e, e, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v))
    qn = sum(v * v for v in query) ** 0.5
    return [
        r.vec_id
        for r in emb.withColumn("cosine", dot / (nrm * F.lit(qn)))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
        .collect()
    ]


def test_layout_two_level_and_coverage(spark, index2):
    path, fine, emb = index2
    assert set(fine) <= set(range(N_COARSE))
    coarse_dirs = glob.glob(os.path.join(path, "vectors", "coarse_id=*"))
    assert 1 < len(coarse_dirs) <= N_COARSE
    fine_dirs = glob.glob(os.path.join(path, "vectors", "coarse_id=*", "fine_id=*"))
    assert len(fine_dirs) > len(coarse_dirs)  # genuinely two-level
    vecs = spark.read.parquet(f"{path}/vectors")
    assert vecs.count() == emb.count()
    assert vecs.select("vec_id").distinct().count() == emb.count()


def test_build_deterministic(spark, index2, tmp_path):
    path, fine, emb = index2
    again = build_ivf2_index(
        emb.repartition(7), str(tmp_path / "idx2"), n_coarse=N_COARSE, n_fine=N_FINE, iters=2
    )
    assert again == fine


def test_both_partition_columns_prune(spark, index2, query_vec):
    path, _, _ = index2
    df = ivf2_search(spark, path, query_vec, p_coarse=1, p_fine=2, topk=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "coarse_id" in plan and "fine_id" in plan
    probed = {
        (r.coarse_id, r.fine_id)
        for r in df.select("coarse_id", "fine_id").distinct().collect()
    }
    assert len(probed) <= 2
    assert len({c for c, _ in probed}) <= 1


def test_full_probe_equals_bruteforce(spark, index2, query_vec):
    path, _, _ = index2
    got = [
        r.vec_id
        for r in ivf2_search(
            spark, path, query_vec, p_coarse=N_COARSE, p_fine=N_FINE, topk=10
        ).collect()
    ]
    assert got == _brute_topk(spark, query_vec, 10)


def test_partial_probe_recall(spark, index2, query_vec):
    path, _, _ = index2
    got = {
        r.vec_id
        for r in ivf2_search(spark, path, query_vec, p_coarse=2, p_fine=3, topk=10).collect()
    }
    truth = set(_brute_topk(spark, query_vec, 10))
    assert 0 in got  # the self-match must survive
    assert len(got & truth) >= 3


def test_append_touches_only_assigned_partitions(spark, tmp_path):
    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    build_ivf2_index(base, path, n_coarse=N_COARSE, n_fine=N_FINE, iters=2)

    def file_sets():
        out = {}
        for d in glob.glob(os.path.join(path, "vectors", "coarse_id=*", "fine_id=*")):
            rel = os.path.relpath(d, os.path.join(path, "vectors"))
            out[rel] = sorted(os.listdir(d))
        return out

    before = file_sets()
    touched = ivf2_append_batch(spark, path, batch)
    assert touched
    after = file_sets()
    touched_dirs = {f"coarse_id={c}/fine_id={f}" for c, f in touched}
    for d, files in before.items():
        if d not in touched_dirs:
            assert after[d] == files  # untouched partitions byte-stable
    allv = spark.read.parquet(f"{path}/vectors")
    assert allv.count() == emb.count()
    assert allv.select("vec_id").distinct().count() == emb.count()


def test_append_into_coarse_cell_empty_at_build(spark, tmp_path):
    """A coarse cell can end the build with ZERO members (its seed keeps
    its centroid through Lloyd) — a frozen-codebook append must still
    give vectors assigned there a valid fine_id, not a NULL landing in a
    default partition. Build on two tight clusters far from a third
    seed's region, then append a vector at that region."""
    import numpy as np

    path = str(tmp_path / "idx")
    rows = []
    # seeds are hash-ordered, so just make 4+ distinct vectors; two tight
    # clusters around A=(0,...) and B=(100,...); appended C=(1000,...)
    for i in range(20):
        base = 0.0 if i % 2 == 0 else 100.0
        rows.append((i, [base + (i % 5) * 0.01] * 8, 0))
    base_df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    build_ivf2_index(base_df, path, n_coarse=4, n_fine=2, iters=2)

    # a direction the base corpus (all along the all-ones axis) never has
    away = [1000.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    batch = spark.createDataFrame(
        [(999, away, 0)], "vec_id bigint, embedding array<float>, label int"
    )
    touched = ivf2_append_batch(spark, path, batch)
    assert touched
    allv = spark.read.parquet(f"{path}/vectors")
    got = allv.filter("vec_id = 999").collect()
    assert len(got) == 1
    assert got[0].fine_id is not None and got[0].coarse_id is not None
    # and the appended vector is findable by search at full probe
    res = ivf2_search(spark, path, away, p_coarse=4, p_fine=2, topk=1).collect()
    assert res and res[0].vec_id == 999
