"""Production graph API (operators/graph.py): peel a PERSISTED edge
table without re-deriving the graph, and the nested decomposition
generator.  The algorithms themselves are pinned by tests/test_kcore.py
and the kcore/ktruss DuckDB oracles; here the contract is the
build/peel split — persisted-path results must equal direct in-memory
peels edge for edge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from op_etl_spark.operators import graph


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


# 5-clique (0..4) + pendant chain 4-10-11-12 + a triangle 20-21-22
# hanging off node 0 via edge (0, 20)
CLIQUE = [(a, b) for a in range(5) for b in range(a + 1, 5)]
EXTRAS = [(4, 10), (10, 11), (11, 12), (0, 20), (20, 21), (21, 22), (20, 22)]


def test_persisted_kcore_equals_direct(spark, tmp_path):
    pairs = _pairs_df(spark, CLIQUE + EXTRAS)
    path = str(tmp_path / "edges")
    graph.build_edge_table(pairs, path, n_buckets=2)

    direct, _ = graph.kcore(graph.symmetrize(pairs), k=4)
    direct_members = {
        (r["node"], r["core_degree"])
        for r in direct.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .collect()
    }
    persisted = {
        (r["node"], r["core_degree"])
        for r in graph.kcore_persisted(spark, path, k=4).collect()
    }
    assert persisted == direct_members
    assert {n for n, _ in persisted} == {0, 1, 2, 3, 4}


def test_persisted_ktruss_equals_direct(spark, tmp_path):
    pairs = _pairs_df(spark, CLIQUE + EXTRAS)
    path = str(tmp_path / "edges")
    graph.build_edge_table(pairs, path)

    truss, _ = graph.ktruss(pairs, k=4)
    direct = {
        (r["a"], r["b"], r["support"])
        for r in graph.truss_support(truss).collect()
    }
    persisted = {
        (r["a"], r["b"], r["support"])
        for r in graph.ktruss_persisted(spark, path, k=4).collect()
    }
    assert persisted == direct
    # the 4-truss is exactly the clique: every clique edge closes 3
    # triangles; the pendant triangle (support 1 each) and chain peel off
    assert {(a, b) for a, b, _ in persisted} == set(CLIQUE)
    assert all(s == 3 for _, _, s in persisted)


def test_decompose_matches_independent_peels(spark):
    edges = graph.symmetrize(_pairs_df(spark, CLIQUE + EXTRAS))
    nested = {
        k: {r["src"] for r in surv.select("src").distinct().collect()}
        for k, surv in graph.kcore_decompose(edges, (2, 3, 4))
    }
    for k in (2, 3, 4):
        direct, _ = graph.kcore(edges, k)
        assert nested[k] == {
            r["src"] for r in direct.select("src").distinct().collect()
        }, f"nesting shortcut diverged at k={k}"


def test_decompose_rejects_descending_ks(spark):
    edges = graph.symmetrize(_pairs_df(spark, CLIQUE))
    with pytest.raises(ValueError, match="ascending"):
        list(graph.kcore_decompose(edges, (4, 2)))
