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
- k-truss: Cohen 2008 triangle-support peeling, distributed with
  INCREMENTAL support maintenance (round 10): the maintained object is
  the per-edge support table — each round enumerates only the triangles
  destroyed by the removed-edge frontier and decrements their surviving
  edges, instead of recounting every surviving edge's triangles via the
  full wedge-closure double-join (see _TrussState).

100 TB design: the k-core's per-round exchange is proportional to the
REMOVED-vertex frontier (node-sized tables otherwise); the k-truss's to
frontier-incident wedges (edge-sized map-side scans otherwise). The
only driver-side values are scalar counts. Round budgets are hard
bounds that RAISE rather than silently diverge (the suite's DuckDB
oracles unroll exactly that many rounds, so engine and oracle can never
quietly disagree about depth).
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


def _ckpt_leaf(df: DataFrame) -> DataFrame:
    """localCheckpoint + re-wrap the materialized RDD as a FRESH leaf
    plan carrying no inherited statistics.

    Dataset.localCheckpoint deliberately preserves the child plan's
    Catalyst statistics on the LogicalRDD it returns (SPARK-27712). In
    an iterative peel that is a time bomb: the maintained table appears
    on several join sides of the next round's plan, so the inherited
    sizeInBytes estimates MULTIPLY — digits(size) roughly triple per
    k-truss round (x2 per k-core round) — and by round ~10 Catalyst's
    stats arithmetic is doing Toom-Cook multiplications on thousand-
    digit BigIntegers on the DRIVER: measured 0.7 s -> 5 s -> 22 s ->
    112 s per round on the sf0.1 truss with CONSTANT data, plan shape,
    job and task counts (the tasks stayed at 21; the time was all
    planning). Re-wrapping the already-materialized checkpoint RDD in a
    stats-free LogicalRDD resets the estimate to the conf default each
    round, so stats stay O(1) digits at any depth. Join strategy is
    unaffected: the frontier is explicitly broadcast and AQE sizes the
    rest from runtime shuffle statistics.

    internalCreateDataFrame is `private[sql]` (public in bytecode, the
    standard py4j seam); if a future Spark removes it, fall back to the
    plain checkpoint — correct, but restoring the deep-peel slowdown."""
    ck = df.localCheckpoint()
    try:
        jdf = ck._jdf
        js = df.sparkSession._jsparkSession
        fresh = js.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(fresh, df.sparkSession)
    except Exception:  # noqa: BLE001 — internal-API drift: keep correctness
        return ck


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
        self.edges_snap = _ckpt_leaf(edges.select("src", "dst"))
        self.deg = _ckpt_leaf(
            self.edges_snap.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
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
            )
            self.deg = _ckpt_leaf(self.deg)
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
        self.edges_snap = _ckpt_leaf(self.surviving_edges())
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


class _TrussState:
    """Incremental-support k-truss peeling (round 10) — the edge
    analogue of _PeelState, motivated by the same measurement: the old
    round body recounted EVERY surviving edge's triangle support per
    round via the full wedge-closure double-join (39 rounds on the
    sf0.1 near-dup graph = 39 edge-wide double-joins).  The maintained
    object is the SUPPORT table

        sup(e) == e's triangle count in the subgraph of alive edges

    (alive edges carry a row even at support 0, matching the oracle's
    coalesce(sup, 0) round semantics), and each round only
      1. filters `sup` for the frontier R dropping below k-2,
      2. enumerates triangles THROUGH R against the LIVE adjacency —
         symmetrize(sup): `sup`'s key set IS the alive edge set, so no
         separate snapshot, no compaction, and no aliveness-membership
         joins exist; the wedge join is proportional to
         frontier-incident wedges, with R broadcast below
         BROADCAST_REMOVED_MAX,
      3. flags which side edges are themselves in R (broadcast
         left-join against the frontier) and decrements the surviving
         side edges in one map-side update pass.

    Batch-removal dedup (the standard decremental triangle-maintenance
    rule): a triangle containing m >= 1 frontier edges is enumerated
    once per frontier edge; only the LEXICOGRAPHICALLY SMALLEST frontier
    edge emits its decrements, and only to non-frontier edges — so a
    destroyed triangle decrements each of its surviving edges exactly
    once, and frontier edges (dropped wholesale in the same update)
    never receive one.

    Invariant argument: removing frontier R from the alive graph
    destroys exactly the triangles with >= 1 edge in R whose other
    edges are alive.  Step (2) enumerates every triangle through each
    r in R whose side edges are in the live adjacency — alive by
    construction (edges dead from earlier rounds left `sup` the round
    they died, after their triangles were subtracted; sup was correct
    then, by induction).  Side edges in R are flagged in (3) and
    excluded from decrements, and the min-edge rule collapses
    multi-frontier-edge triangles to one emission."""

    def __init__(self, pairs: DataFrame, k: int):
        self.k = k
        snap = _ckpt_leaf(pairs.select("a", "b"))
        self.cur_rows = snap.count()
        base = truss_support(snap).withColumnRenamed("support", "sup")
        # alive edges keep a row even at zero support: truss_support's
        # inner wedge join omits triangle-free edges, but the oracle's
        # left-join + coalesce(0) is the declared round semantics
        self.sup = _ckpt_leaf(
            snap.join(base, ["a", "b"], "left")
            .select("a", "b", F.coalesce(F.col("sup"), F.lit(0)).alias("sup"))
        )

    def _stats(self) -> tuple[int, int]:
        """(alive edges, frontier size) in one tiny aggregate over the
        maintained support table."""
        row = self.sup.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("sup") < self.k - 2, 1).otherwise(0)).alias("r"),
        ).collect()[0]
        return int(row["n"] or 0), int(row["r"] or 0)

    def _round(self, n_frontier: int) -> tuple[int, int]:
        """Subtract the frontier's destroyed triangles from surviving
        edges' support and drop the frontier rows. Returns the updated
        (alive edges, next frontier size), observed ON the update's own
        materialization (pyspark Observation riding the checkpoint
        action) so a round costs exactly one job — no separate stats
        pass. The CollectMetrics node lives only in the materialized
        round plan; the maintained `sup` the next round (and the
        returned query plan) reads is a fresh stats-free leaf, so
        production plans stay free of observation nodes (the plan-audit
        CollectMetricsLeak axis).

        `sup`'s key set IS the alive edge set, so the adjacency for the
        wedge join is symmetrize(sup) — no separate snapshot, no
        compaction, and no aliveness membership joins: every edge of an
        enumerated triangle is alive-or-frontier by construction.

        The destroyed triangles are then grouped BY TRIANGLE, which
        makes the batch-removal bookkeeping intrinsic: a triangle with m
        frontier edges is enumerated exactly m times (once per frontier
        edge), so its GENERATOR set collected in the group is exactly
        its frontier edges — and every non-generator edge is therefore a
        survivor (an in-frontier edge would have enumerated the triangle
        itself). One decrement per (triangle, non-generator edge), no
        membership joins, no ordering rule."""
        small = n_frontier <= BROADCAST_REMOVED_MAX
        is_front = F.col("sup") < self.k - 2
        removed = self.sup.filter(is_front).select("a", "b")
        rem = F.broadcast(removed) if small else removed
        sym = symmetrize(self.sup.select("a", "b"))
        # triangles through a frontier edge (a,b): common neighbor c in
        # the LIVE adjacency — cost ~ frontier-incident wedges
        tri = (
            rem.join(
                sym.select(F.col("src").alias("a"), F.col("dst").alias("c")), "a"
            )
            .join(
                sym.select(F.col("src").alias("b"), F.col("dst").alias("c")),
                ["b", "c"],
            )
            .select(
                F.array_sort(F.array("a", "b", "c")).alias("ns"),
                F.struct(F.col("a").alias("a"), F.col("b").alias("b")).alias("gen"),
            )
            .groupBy("ns")
            .agg(F.collect_set("gen").alias("gens"))
        )
        n0, n1, n2 = (F.col("ns")[i] for i in range(3))
        edges3 = F.array(
            F.struct(n0.alias("a"), n1.alias("b")),
            F.struct(n0.alias("a"), n2.alias("b")),
            F.struct(n1.alias("a"), n2.alias("b")),
        )
        decs = (
            tri.select(
                F.explode(
                    F.filter(edges3, lambda e: ~F.array_contains("gens", e))
                ).alias("e")
            )
            .groupBy(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("dec"))
        )
        # decs is frontier-incident (bounded by destroyed-triangle side
        # edges) — broadcast it under the same gate so the update is a
        # single map-side pass over the maintained table
        from pyspark.sql import Observation

        obs = Observation()
        upd = (
            self.sup.filter(~is_front)
            .join(F.broadcast(decs) if small else decs, ["a", "b"], "left")
            .select(
                "a",
                "b",
                (F.col("sup") - F.coalesce(F.col("dec"), F.lit(0))).alias("sup"),
            )
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(F.col("sup") < self.k - 2, 1).otherwise(0)
                ).alias("r"),
            )
        )
        self.sup = _ckpt_leaf(upd)
        row = obs.get
        return int(row["n"] or 0), int(row["r"] or 0)

    def peel(self, max_rounds: int) -> tuple[int, list[int]]:
        """Rounds and edge-curve semantics identical to the recompute
        formulation: the confirming no-change round counts, an emptied
        graph converges without one."""
        rounds = 0
        edge_curve = [self.cur_rows]
        if self.cur_rows == 0:
            return rounds, edge_curve
        _, n_front = self._stats()
        for _ in range(max_rounds):
            rounds += 1
            if n_front == 0:
                edge_curve.append(self.cur_rows)
                return rounds, edge_curve
            self.cur_rows, n_front = self._round(n_front)
            edge_curve.append(self.cur_rows)
            if self.cur_rows == 0:
                return rounds, edge_curve
        raise RuntimeError(
            f"k-truss peeling did not converge in {max_rounds} rounds"
        )

    def surviving_edges(self) -> DataFrame:
        return self.sup.select("a", "b")


def ktruss(pairs: DataFrame, k: int,
           max_rounds: int = KTRUSS_DEFAULT_MAX_ROUNDS):
    """k-truss of a CANONICAL (a < b) pair list: drop every edge whose
    triangle support inside the surviving subgraph is < k-2, until
    stable.  Returns (surviving canonical pairs, rounds); raises past
    `max_rounds`.  Per-round cost is frontier-incident (incremental
    support maintenance, _TrussState), not survivor-wide."""
    st = _TrussState(pairs, k)
    rounds, edge_curve = st.peel(max_rounds)
    counters.record_loop("ktruss", k=k, rounds=rounds, edges=edge_curve)
    return st.surviving_edges(), rounds


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
