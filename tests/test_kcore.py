"""k-core peeling (suite/clustering.kcore_fixpoint): known cores on
synthetic graphs, monotone convergence, and the round-bound contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from op_etl_spark.suite.clustering import _symmetrize, kcore_fixpoint


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return _symmetrize(df)


def _core_nodes(core_edges):
    return {r["src"] for r in core_edges.select("src").distinct().collect()}


def test_clique_survives_chain_peeled(spark):
    # 5-clique (0..4) with a pendant chain 4-10-11-12: 4-core == clique
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    core, rounds = kcore_fixpoint(_edges(spark, clique + chain), k=4)
    assert _core_nodes(core) == {0, 1, 2, 3, 4}
    assert rounds >= 1
    # every survivor has degree >= 4 inside the core
    degs = core.groupBy("src").count().collect()
    assert all(r["count"] >= 4 for r in degs)


def test_long_chain_fully_peels(spark):
    chain = [(i, i + 1) for i in range(12)]
    core, _ = kcore_fixpoint(_edges(spark, chain), k=2, max_rounds=16)
    # a path has empty 2-core (leaves peel from both ends inward)
    assert core.count() == 0


def test_cycle_is_its_own_2core(spark):
    cycle = [(i, (i + 1) % 8) for i in range(8)]
    core, rounds = kcore_fixpoint(_edges(spark, cycle), k=2)
    assert _core_nodes(core) == set(range(8))
    assert rounds == 1  # first round is already stable


def test_round_bound_raises(spark):
    # a 12-path needs 6 peel rounds at k=2; a bound of 3 must raise
    chain = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_fixpoint(_edges(spark, chain), k=2, max_rounds=3)


def test_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    core, rounds = kcore_fixpoint(empty, k=4)
    assert core.count() == 0 and rounds == 0


# --- k-truss (triangle-support peeling) ---

def _canon(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_k4_is_its_own_4truss(spark):
    from op_etl_spark.suite.clustering import ktruss_fixpoint

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    truss, rounds = ktruss_fixpoint(_canon(spark, k4), k=4)
    got = {(r["a"], r["b"]) for r in truss.collect()}
    assert got == set(k4)
    assert rounds == 1  # first round already stable (every support = 2)


def test_pendant_and_chain_peel_off_k4(spark):
    from op_etl_spark.suite.clustering import ktruss_fixpoint

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    extra = [(3, 10), (10, 11), (0, 10)]  # triangle-poor appendage
    truss, _ = ktruss_fixpoint(_canon(spark, k4 + extra), k=4)
    got = {(r["a"], r["b"]) for r in truss.collect()}
    assert got == set(k4)


def test_two_triangles_sharing_edge_cascade(spark):
    """4-truss: the shared edge has support 2 but its flank edges have 1;
    removing flanks drops the shared edge next round — the cascade the
    per-round recount must capture."""
    from op_etl_spark.suite.clustering import ktruss_fixpoint

    bowtie = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    truss, rounds = ktruss_fixpoint(_canon(spark, bowtie), k=4)
    assert truss.count() == 0
    assert rounds >= 2


def test_truss_round_bound_raises(spark):
    import pytest as _pytest

    from op_etl_spark.suite.clustering import ktruss_fixpoint

    # a strip of triangles peels one triangle per round from each end
    strip = []
    for i in range(8):
        strip += [(i, i + 1), (i, i + 2)]
    strip = sorted(set(strip))
    with _pytest.raises(RuntimeError, match="did not converge"):
        ktruss_fixpoint(_canon(spark, strip), k=4, max_rounds=1)


def test_kcore_profile_nesting_monotone(spark):
    """Core sizes must be non-increasing in k, and each level must equal
    the k-core computed FROM SCRATCH (nesting property)."""
    from op_etl_spark.suite.clustering import kcore_fixpoint, kcore_profile

    prof = {r["k"]: (r["n_nodes"], r["n_edges"])
            for r in kcore_profile(spark, "/root/testdata/sf0.001").collect()}
    ks = sorted(prof)
    for a, b in zip(ks, ks[1:]):
        assert prof[b][0] <= prof[a][0]
        assert prof[b][1] <= prof[a][1]
    # spot-check k=4 against a from-scratch peel of the same graph
    from op_etl_spark.suite.clustering import (
        KCORE_MIN_COMMON,
        _pairs,
        _symmetrize,
    )

    edges = _symmetrize(_pairs(spark, "/root/testdata/sf0.001",
                               min_common=KCORE_MIN_COMMON))
    core4, _ = kcore_fixpoint(edges, 4)
    assert prof[4] == (core4.select("src").distinct().count(), core4.count() // 2)
