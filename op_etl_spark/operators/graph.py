"""Production graph-peeling operators: k-core / k-truss fixpoints over a
persisted edge table.

The peeling algorithms were born inside the query suite
(suite/clustering.py), where every call reconstructs the near-dup edge
list from document shingles.  A production caller peeling the SAME graph
at several k (or re-peeling after an append) should not re-pay that
`_pairs` reconstruction — this module is the build/peel split, mirroring
operators/ann_index.py's build/search/append structure: persist the
canonical edge table once, then run any number of peels against it.

Algorithms (both public, both cited in the suite docstrings):
- k-core: Matula & Beck 1983 degree peeling, distributed — per round one
  degree aggregate + two semi-joins on the shrinking SYMMETRIC edge
  table, `localCheckpoint` truncating lineage, scalar edge count as the
  monotone convergence potential.
- k-truss: Cohen 2008 triangle-support peeling — per round a wedge-
  closure double-join counts each surviving edge's triangles; edges with
  support < k-2 drop.

100 TB design: every round's cost is proportional to the CURRENT edge
count, which only shrinks; all shuffles are on edge keys; the only
driver-side values are scalar counts.  Round budgets are hard bounds
that RAISE rather than silently diverge (the suite's DuckDB oracles
unroll exactly that many rounds, so engine and oracle can never quietly
disagree about depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import counters

KCORE_DEFAULT_MAX_ROUNDS = 24
KTRUSS_DEFAULT_MAX_ROUNDS = 48


def symmetrize(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Canonical (a < b) pair list -> symmetric (src, dst) edge list."""
    return pairs.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).unionAll(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))


def build_edge_table(pairs: DataFrame, path: str, n_buckets: int = 0) -> None:
    """Persist a canonical (a, b) pair table as the reusable graph
    artifact.  Stored CANONICAL (one row per undirected edge, a < b) —
    half the bytes of the symmetric form; peels symmetrize on read, which
    is a narrow map-side union, not a shuffle.  `n_buckets` > 0
    repartitions by `a` before writing, clustering FILES for scan
    locality; a plain parquet read reports no output partitioning, so
    the first degree aggregate still exchanges — use a catalog table
    bucketed by `a` (bucketBy + saveAsTable) where that exchange must
    go too."""
    out = pairs.select("a", "b")
    if n_buckets > 0:
        out = out.repartition(n_buckets, "a")
    out.write.mode("overwrite").parquet(path)


def load_edge_table(spark: SparkSession, path: str) -> DataFrame:
    """Canonical (a, b) pairs persisted by build_edge_table."""
    return spark.read.parquet(path)


def kcore(edges: DataFrame, k: int,
          max_rounds: int = KCORE_DEFAULT_MAX_ROUNDS):
    """k-core of a SYMMETRIC (src, dst) edge list: drop every node of
    degree < k (and its edges) per round until stable.  Returns
    (surviving symmetric edges, rounds); raises past `max_rounds`."""
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    rounds = 0
    # per-round surviving-edge counts the loop computes anyway — recorded
    # (when the probe enables counters) so the scale report can separate
    # "more rounds" from "costlier rounds" without an extra pass
    edge_curve = [n_edges]
    for _ in range(max_rounds):
        if n_edges == 0:
            counters.record_loop("kcore", k=k, rounds=rounds, edges=edge_curve)
            return edges, rounds
        rounds += 1
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint()
        )
        n_after = edges.count()
        edge_curve.append(n_after)
        if n_after == n_edges:
            counters.record_loop("kcore", k=k, rounds=rounds, edges=edge_curve)
            return edges, rounds
        n_edges = n_after
    raise RuntimeError(f"k-core peeling did not converge in {max_rounds} rounds")


def kcore_decompose(edges: DataFrame, ks,
                    max_rounds: int = KCORE_DEFAULT_MAX_ROUNDS):
    """Nested k-core decomposition over ascending `ks`: yields
    (k, surviving symmetric edges) per level.  Exploits core NESTING —
    the k-core of the (k-1)-core IS the k-core of the whole graph — so
    each level peels the previous level's strictly smaller survivor set
    instead of restarting from the full edge list."""
    cur = edges
    last_k = None
    for k in ks:
        if last_k is not None and k < last_k:
            raise ValueError(f"ks must be ascending, got {k} after {last_k}")
        last_k = k
        cur, _ = kcore(cur, k, max_rounds=max_rounds)
        yield k, cur


def truss_support(pairs: DataFrame) -> DataFrame:
    """(a, b, support): triangles closed by each canonical edge inside
    the graph `pairs` spans — the wedge-closure double-join (common
    neighbors of a and b via the symmetric adjacency)."""
    sym = symmetrize(pairs)
    s1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    s2 = sym.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return (
        pairs.join(s1, "a")
        .join(s2, ["b", "c"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def ktruss(pairs: DataFrame, k: int,
           max_rounds: int = KTRUSS_DEFAULT_MAX_ROUNDS):
    """k-truss of a CANONICAL (a < b) pair list: drop every edge whose
    triangle support inside the surviving subgraph is < k-2, until
    stable.  Returns (surviving canonical pairs, rounds); raises past
    `max_rounds`."""
    pairs = pairs.select("a", "b").localCheckpoint()
    n_edges = pairs.count()
    rounds = 0
    edge_curve = [n_edges]
    for _ in range(max_rounds):
        if n_edges == 0:
            counters.record_loop("ktruss", k=k, rounds=rounds, edges=edge_curve)
            return pairs, rounds
        rounds += 1
        sup = truss_support(pairs).withColumnRenamed("support", "sup")
        kept = (
            pairs.join(
                sup.filter(F.col("sup") >= k - 2).select("a", "b"),
                ["a", "b"],
                "left_semi",
            )
            .localCheckpoint()
        )
        n_after = kept.count()
        edge_curve.append(n_after)
        pairs = kept
        if n_after == n_edges:
            counters.record_loop("ktruss", k=k, rounds=rounds, edges=edge_curve)
            return pairs, rounds
        n_edges = n_after
    raise RuntimeError(f"k-truss peeling did not converge in {max_rounds} rounds")


def kcore_persisted(spark: SparkSession, path: str, k: int,
                    max_rounds: int = KCORE_DEFAULT_MAX_ROUNDS):
    """Peel the k-core of a prebuilt edge table without re-deriving the
    graph: load canonical pairs, symmetrize, peel.  Returns the
    (doc/node, core_degree) membership table."""
    core, _ = kcore(symmetrize(load_edge_table(spark, path)), k,
                    max_rounds=max_rounds)
    return core.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def ktruss_persisted(spark: SparkSession, path: str, k: int,
                     max_rounds: int = KTRUSS_DEFAULT_MAX_ROUNDS):
    """k-truss of a prebuilt edge table: surviving canonical edges with
    their in-truss triangle support."""
    truss, _ = ktruss(load_edge_table(spark, path), k, max_rounds=max_rounds)
    return truss_support(truss)
