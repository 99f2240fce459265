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
- k-core: Matula & Beck 1983 degree peeling, distributed with
  INCREMENTAL degree maintenance (round 9): the maintained object is the
  node-sized degree table, not the edge set — each round subtracts the
  removed vertices' contributions from their surviving neighbors'
  degrees instead of recomputing degrees from the full surviving edge
  set, so the per-round shuffles move only removed-incident rows plus
  the node table (see _PeelState).
- k-truss: Cohen 2008 triangle-support peeling — per round a wedge-
  closure double-join counts each surviving edge's triangles; edges with
  support < k-2 drop.

100 TB design: the k-core's per-round exchange is proportional to the
REMOVED-vertex frontier (node-sized tables otherwise); the k-truss's to
the current edge count, which only shrinks. The only driver-side values
are scalar counts. Round budgets are hard bounds that RAISE rather than
silently diverge (the suite's DuckDB oracles unroll exactly that many
rounds, so engine and oracle can never quietly disagree about depth).
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


# Above this many frontier vertices the per-round removed set stops being
# broadcastable (~8 MB of longs at 1M rows) and the decrement scan falls
# back to a shuffle semi-join — the bulk first rounds of a power-law
# graph, the one regime where an edge-wide exchange is unavoidable.
BROADCAST_REMOVED_MAX = 1_000_000


class _PeelState:
    """Incremental-degree k-core peeling over one edge snapshot.

    The round-8 scale probe measured the old peel's cost as pure
    per-round shuffle volume at constant round count (3.07x at 32x data),
    and that round body recomputed degrees from the FULL surviving edge
    set every round: one groupBy shuffle + two semi-join shuffles + a
    checkpoint of the surviving edges. This state keeps the DEGREE table
    as the maintained object instead, with the invariant

        deg(v) == v's degree in the subgraph induced by alive vertices

    and each round only
      1. filters `deg` for the frontier dropping below k (node-sized),
      2. scans the STATIC edge snapshot once — map-side when the frontier
         broadcasts — counting decrements onto surviving neighbors,
      3. applies anti-join + decrement to the node-sized degree table.

    No edge-sized shuffle per round: the only edge-wide operation is the
    snapshot scan in (2), exchange-free under the broadcast semi-join,
    and the per-round shuffles move frontier-incident rows plus the node
    table. Edges incident to vertices removed in EARLIER rounds still sit
    in the snapshot; the decrements they generate target vertices no
    longer in `deg`, so the left join drops them — no alive-edge table is
    maintained at all. When cumulative removals halve the live edge mass
    the snapshot is compacted (one anti-join pass), so late-round scans
    track the live graph instead of the original one.

    Invariant argument: removing frontier R from an alive graph
    decrements each surviving v by |edges(v, R)|. Step (2) counts exactly
    the snapshot rows r->v with r in R; of those, rows whose v died
    earlier vanish in the left join (v not in `deg`), rows whose v is in
    R die in the anti-join before the decrement applies, and rows whose
    r-side was dead before this round cannot exist (R is drawn from
    `deg`, which excludes prior removals). Vertices decremented to 0 are
    dropped in the same update — mirroring how they silently vanish from
    an edge-derived degree table — which keeps round counts identical to
    the recompute formulation's."""

    def __init__(self, edges: DataFrame):
        self.edges_snap = edges.select("src", "dst").localCheckpoint()
        self.deg = (
            self.edges_snap.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .localCheckpoint()
        )
        self._removed: list[DataFrame] = []
        self.cur_rows = self.snap_rows = self.edges_snap.count()
        # live node count, maintained by the same per-round aggregate as
        # cur_rows (an edge list has no isolated nodes, so 0 edges -> 0
        # nodes; any peel over a non-empty graph refreshes it via _stats
        # before returning)
        self.cur_nodes = 0 if self.cur_rows == 0 else None

    def _stats(self, k: int) -> tuple[int, int]:
        """(live symmetric edge rows, frontier size) in ONE tiny job over
        the node-sized degree table: sum(deg) equals the live row count
        because every live edge row contributes 1 to its src's degree.
        The same job refreshes `cur_nodes` — consumers that report node
        counts (the degeneracy profile) never pay a dedicated count()."""
        row = self.deg.agg(
            F.sum("deg").alias("s"),
            F.sum(F.when(F.col("deg") < k, 1).otherwise(0)).alias("r"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        self.cur_nodes = int(row["n"] or 0)
        return int(row["s"] or 0), int(row["r"] or 0)

    def peel(self, k: int, max_rounds: int) -> tuple[int, list[int]]:
        """Peel to the k-core fixpoint. Returns (rounds, edge_curve);
        raises past max_rounds. Round count matches the recompute
        formulation: the confirming no-change round counts, an emptied
        graph converges without one."""
        rounds = 0
        edge_curve = [self.cur_rows]
        if self.cur_rows == 0:
            return rounds, edge_curve
        _, n_rem = self._stats(k)
        while True:
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    f"k-core peeling did not converge in {max_rounds} rounds"
                )
            if n_rem == 0:
                # the confirming round re-appends the unchanged count, so
                # `rounds == len(edge_curve) - 1` holds for every exit
                # path (the contract probe consumers pin)
                edge_curve.append(self.cur_rows)
                return rounds, edge_curve
            removed = self.deg.filter(F.col("deg") < k).select("src")
            rem = (
                F.broadcast(removed)
                if n_rem <= BROADCAST_REMOVED_MAX
                else removed
            )
            dec = (
                self.edges_snap.join(rem, "src", "left_semi")
                .groupBy("dst")
                .agg(F.count(F.lit(1)).alias("dec"))
                .withColumnRenamed("dst", "src")
            )
            self.deg = (
                self.deg.join(rem, "src", "left_anti")
                .join(dec, "src", "left")
                .select(
                    "src",
                    (F.col("deg") - F.coalesce(F.col("dec"), F.lit(0))).alias(
                        "deg"
                    ),
                )
                .filter(F.col("deg") > 0)
                .localCheckpoint()
            )
            self._removed.append(removed)
            self.cur_rows, n_rem = self._stats(k)
            edge_curve.append(self.cur_rows)
            if self.cur_rows == 0:
                return rounds, edge_curve
            if self.cur_rows <= self.snap_rows // 2:
                self._compact()

    def _compact(self) -> None:
        """Fold accumulated removals into the snapshot (one anti-join
        pass). Every surviving row's endpoints are alive, so the new
        snapshot's row count is exactly sum(deg) == cur_rows."""
        self.edges_snap = self.surviving_edges().localCheckpoint()
        self._removed = []
        self.snap_rows = self.cur_rows

    def surviving_edges(self) -> DataFrame:
        """Symmetric (src, dst) rows of the current core — the snapshot
        minus every row touching a removed vertex. Built from the DF
        objects captured now, so the plan stays valid across later peels
        and compactions of this state."""
        e = self.edges_snap
        if self._removed:
            rem = self._removed[0]
            for r in self._removed[1:]:
                rem = rem.unionAll(r)
            e = (
                e.join(rem, "src", "left_anti")
                .join(rem.select(F.col("src").alias("dst")), "dst", "left_anti")
            )
        return e.select("src", "dst")

    def degrees(self) -> DataFrame:
        """(node, core_degree) membership — the degree table the peel
        maintains anyway, so membership queries skip reconstructing the
        edge set and re-aggregating it."""
        return self.deg.select(
            F.col("src").alias("node"), F.col("deg").alias("core_degree")
        )


def _peel_once(edges: DataFrame, k: int, max_rounds: int) -> _PeelState:
    """One-level peel with the loop-economics record every public entry
    point shares (per-round surviving-edge counts the loop computes
    anyway — recorded only when the probe enables counters, so the scale
    report can separate "more rounds" from "costlier rounds" without an
    extra pass)."""
    st = _PeelState(edges)
    st.rounds, edge_curve = st.peel(k, max_rounds)
    counters.record_loop("kcore", k=k, rounds=st.rounds, edges=edge_curve)
    return st


def _peel_ramp(edges: DataFrame, ks, max_rounds: int):
    """Continuous ascending-k peel over ONE shared state: exploits core
    NESTING — the k-core of the (k-1)-core IS the k-core of the whole
    graph — so level k+1 starts from the k-core's degree table, with no
    edge rebuild and no per-level degree recompute. Yields (k, state)
    after each level's fixpoint."""
    st = _PeelState(edges)
    last_k = None
    for k in ks:
        if last_k is not None and k < last_k:
            raise ValueError(f"ks must be ascending, got {k} after {last_k}")
        last_k = k
        rounds, edge_curve = st.peel(k, max_rounds)
        counters.record_loop("kcore", k=k, rounds=rounds, edges=edge_curve)
        yield k, st


def kcore(edges: DataFrame, k: int,
          max_rounds: int = KCORE_DEFAULT_MAX_ROUNDS):
    """k-core of a SYMMETRIC (src, dst) edge list: drop every node of
    degree < k (and its edges) per round until stable.  Returns
    (surviving symmetric edges, rounds); raises past `max_rounds`.
    Per-round cost is frontier-incident, not survivor-wide — _PeelState.

    The returned edges are a LAZY bounded plan (the checkpointed
    snapshot minus at most one accumulated-removals anti-join pair), not
    a materialized table: single-action consumers — every declared query
    — pay no extra write. A caller running SEVERAL actions over the
    result should `localCheckpoint()` it once, or the anti-joins re-run
    per action."""
    st = _peel_once(edges, k, max_rounds)
    return st.surviving_edges(), st.rounds


def kcore_degrees(edges: DataFrame, k: int,
                  max_rounds: int = KCORE_DEFAULT_MAX_ROUNDS):
    """(node, core_degree) membership of the k-core, straight off the
    peel's maintained degree table — no edge reconstruction, no final
    degree aggregate. Returns (membership DataFrame, rounds)."""
    st = _peel_once(edges, k, max_rounds)
    return st.degrees(), st.rounds


def kcore_decompose(edges: DataFrame, ks,
                    max_rounds: int = KCORE_DEFAULT_MAX_ROUNDS):
    """Nested k-core decomposition over ascending `ks`: yields
    (k, surviving symmetric edges) per level, all levels peeled as one
    continuous ramp (_peel_ramp)."""
    for k, st in _peel_ramp(edges, ks, max_rounds):
        yield k, st.surviving_edges()


def kcore_profile_counts(edges: DataFrame, ks,
                         max_rounds: int = KCORE_DEFAULT_MAX_ROUNDS):
    """[(k, n_nodes, n_edges)] degeneracy profile via one continuous
    incremental peel (_peel_ramp): node counts ride the per-round stats
    aggregate the peel already runs and edge counts come from its
    maintained sum (each undirected edge holds two symmetric rows), so
    no level ever reconstructs, re-aggregates, or re-counts anything."""
    return [
        (k, st.cur_nodes, st.cur_rows // 2)
        for k, st in _peel_ramp(edges, ks, max_rounds)
    ]


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
    members, _ = kcore_degrees(symmetrize(load_edge_table(spark, path)), k,
                               max_rounds=max_rounds)
    return members


def ktruss_persisted(spark: SparkSession, path: str, k: int,
                     max_rounds: int = KTRUSS_DEFAULT_MAX_ROUNDS):
    """k-truss of a prebuilt edge table: surviving canonical edges with
    their in-truss triangle support."""
    truss, _ = ktruss(load_edge_table(spark, path), k, max_rounds=max_rounds)
    return truss_support(truss)
