"""Round-9 behavior pins.

1. The incremental-degree k-core peel (operators/graph._PeelState) must
   equal a direct Python reference peel on randomized graphs — including
   the frontier cases the incremental formulation has to get right:
   vertices decremented to zero, both-endpoints-removed edges, and
   edges whose far endpoint died in an EARLIER round.
2. The snapshot compaction path (triggered when live edges halve) must
   not change results or round counts.
3. kcore_degrees must equal the degree aggregate over kcore's edges.
4. grid_distance_pairs vs BRUTE FORCE (round-8 verdict 'What's missing'
   #2): the sweep's DuckDB twin now shares the Spark plan's cell-bucketed
   blocking, so a boundary bug in the 3x3-replica scheme could pass both.
   These gates run the DECLARED query against the retired inequality-join
   brute force on the real sf0.001 testdata (1k points — cheap even
   nested-loop), and `grid_pairs` against a Python reference on an
   adversarial fixture with points exactly ON cell boundaries and at
   distance exactly GRID_DIST.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from op_etl_spark.operators import graph


def _ref_kcore(pairs: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference Matula-Beck peel: simultaneous removal of all deg<k
    vertices per round; returns {node: degree inside the k-core}."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        drop = {v for v, ns in adj.items() if len(ns) < k}
        if not drop:
            break
        for v in drop:
            for n in adj[v]:
                adj[n].discard(v)
            del adj[v]
        # vertices whose last neighbor just died vanish with them
        adj = {v: ns for v, ns in adj.items() if ns}
    return {v: len(ns) for v, ns in adj.items()}


def _sym(spark, pairs):
    return graph.symmetrize(spark.createDataFrame(pairs, "a long, b long"))


def test_incremental_peel_matches_reference_on_random_graphs(spark):
    rng = random.Random(9)
    for trial in range(3):
        n = 40
        pairs = sorted(
            {
                tuple(sorted(p))
                for p in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(90)
                )
                if p[0] != p[1]
            }
        )
        for k in (2, 3, 4):
            ref = _ref_kcore(pairs, k)
            members, _ = graph.kcore_degrees(_sym(spark, pairs), k)
            got = {
                r["node"]: r["core_degree"] for r in members.collect()
            }
            assert got == ref, f"trial={trial} k={k}"


def test_zero_degree_vertex_drops_with_its_last_neighbor(spark):
    # pendant pair (8, 9) at k=2: both have degree 1 -> removed round 1;
    # each is the other's only neighbor, so the decrement targets a
    # vertex removed in the SAME round and must not resurrect it
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    members, rounds = graph.kcore_degrees(_sym(spark, clique + [(8, 9)]), 2)
    got = {r["node"]: r["core_degree"] for r in members.collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    assert rounds == 2  # removal round + confirming round


def test_cascade_through_earlier_round_removals(spark):
    # path 10-11-12 hanging off a 4-clique at k=2: 10 peels in round 1,
    # 11's decrement arrives from a vertex whose OTHER edges reference
    # the already-dead 10 — the earlier-round-removal join case
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 12), (12, 11), (11, 10)]
    members, _ = graph.kcore_degrees(_sym(spark, clique + chain), 2)
    assert {r["node"] for r in members.collect()} == {0, 1, 2, 3}


def test_compaction_preserves_results_and_rounds(spark, monkeypatch):
    # a 24-path at k=2 halves its live edges repeatedly -> the snapshot
    # compaction path runs several times; the peel must still fully
    # drain and report the same round count as an uncompacted state
    # (force the distributed loop: the round-11 local endgame would
    # otherwise absorb this driver-sized graph before compaction fires)
    monkeypatch.setattr(graph, "KCORE_LOCAL_EDGES_MAX", 0)
    chain = [(i, i + 1) for i in range(24)]
    st = graph._PeelState(_sym(spark, chain))
    rounds, curve = st.peel(2, max_rounds=graph.KCORE_DEFAULT_MAX_ROUNDS)
    assert curve[-1] == 0 and st.surviving_edges().count() == 0
    assert rounds == 12  # 25 nodes peel 2 ends/round; emptied graph skips confirm
    assert st.snap_rows < 48  # at least one compaction actually fired


def test_kcore_degrees_equals_edge_aggregate(spark):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [
        (4, 10),
        (10, 11),
    ]
    edges = _sym(spark, pairs)
    members, _ = graph.kcore_degrees(edges, 3)
    core, _ = graph.kcore(edges, 3)
    via_edges = {
        (r["src"], r["count"])
        for r in core.groupBy("src").count().collect()
    }
    assert {(r["node"], r["core_degree"]) for r in members.collect()} == via_edges


# --- grid_distance_pairs: brute-force oracle restoration ---


def test_grid_pairs_vs_bruteforce_on_sf0001(spark):
    """The declared query vs the RETIRED brute-force a.id < b.id oracle
    (independent of the cell-bucketed blocking scheme both the Spark plan
    and the sweep's DuckDB twin now share). The per-cell cap exclusion is
    part of the declared semantics, so the brute force applies the same
    whole-cell filter — but pairs itself with a plain inequality join."""
    import duckdb

    from op_etl_spark.suite.geo import (
        FAN_COPY_SHIFT,
        FAN_TILE_STRIDE,
        GRID_CELL_CAP,
        GRID_DIST,
        grid_distance_pairs,
    )

    got = {
        (r["id1"], r["id2"], r["dist2"])
        for r in grid_distance_pairs(spark, "/root/testdata/sf0.001").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    ref = con.execute(f"""
        WITH pts AS (
          SELECT event_id,
                 150000.0::DOUBLE + (event_id * 7919 % 800000)
                   + CAST(event_id // {FAN_COPY_SHIFT} AS DOUBLE)
                     * {FAN_TILE_STRIDE} AS x,
                 6050000.0::DOUBLE + (user_id * 104729 % 1700000) AS y
          FROM events),
        cells AS (
          SELECT floor(x / {GRID_DIST}) AS cx, floor(y / {GRID_DIST}) AS cy,
                 count(*) AS c
          FROM pts GROUP BY 1, 2),
        ok AS (
          SELECT p.* FROM pts p
          JOIN cells ON floor(p.x / {GRID_DIST}) = cells.cx
                    AND floor(p.y / {GRID_DIST}) = cells.cy
                    AND cells.c <= {GRID_CELL_CAP})
        SELECT a.event_id AS id1, b.event_id AS id2,
               (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS dist2
        FROM ok a JOIN ok b ON a.event_id < b.event_id
        WHERE (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
              <= {GRID_DIST * GRID_DIST}
    """).fetchall()
    assert got == {(r[0], r[1], r[2]) for r in ref}
    assert got, "vacuous gate: no qualifying pairs at sf0.001"


def test_grid_pairs_boundary_adversarial(spark):
    """Points exactly ON cell boundaries and pairs at distance exactly
    GRID_DIST — every coordinate integer-valued so the distance math is
    exact. A replica-scheme off-by-one (wrong neighborhood, < vs <=,
    floor at the boundary) shows up here before it could at sf scale."""
    from op_etl_spark.suite.geo import GRID_DIST, grid_pairs

    d = GRID_DIST  # 1000.0, cell size == dist
    pts = [
        (1, 0.0, 0.0),          # exactly on a cell corner
        (2, 1000.0, 0.0),       # cell boundary; dist to 1 exactly GRID_DIST
        (3, 2000.0, 0.0),       # next boundary; dist to 2 exactly GRID_DIST
        (4, 1000.0, 1000.0),    # corner diagonal; dist to 2 exactly 1000
        (5, 999.0, 999.0),      # same-diagonal near pair with 6
        (6, 1001.0, 1001.0),    # crosses the corner diagonally (dist2=8)
        (7, 0.0, 1001.0),       # dist to 1 is 1001 > GRID_DIST: excluded
        (8, 3500.0, 3500.0),    # isolated
        (9, 1000.0, 0.0),       # duplicate coordinates of 2 (dist 0)
    ]
    df = spark.createDataFrame(pts, "event_id long, x double, y double")
    got = {
        (r["id1"], r["id2"], r["dist2"])
        for r in grid_pairs(df, d, cap=64).collect()
    }
    ref = set()
    for i, (ida, xa, ya) in enumerate(pts):
        for idb, xb, yb in pts[i + 1:]:
            a, b = sorted([(ida, xa, ya), (idb, xb, yb)])
            d2 = (b[1] - a[1]) ** 2 + (b[2] - a[2]) ** 2
            if d2 <= d * d:
                ref.add((a[0], b[0], d2))
    assert got == ref
    # the exact-GRID_DIST pairs and the duplicate-point pair all made it
    assert {(1, 2), (2, 3), (2, 4), (2, 9)} <= {(a, b) for a, b, _ in got}


def test_grid_pairs_boundary_cap_exclusion(spark):
    """Cap exclusion at the boundary: a hot cell is dropped WHOLE — its
    points pair neither with each other nor with neighbor cells — while
    a boundary point of an adjacent cell keeps its other pairs."""
    from op_etl_spark.suite.geo import grid_pairs

    hot = [(i, 500.0 + i, 500.0) for i in range(10, 15)]  # 5 pts, cell (0,0)
    cold = [(1, 1000.0, 500.0), (2, 1500.0, 500.0)]       # cell (1, 0)
    df = spark.createDataFrame(
        hot + cold, "event_id long, x double, y double"
    )
    got = {
        (r["id1"], r["id2"])
        for r in grid_pairs(df, 1000.0, cap=4).collect()
    }
    assert got == {(1, 2)}


# --- compaction contract under concurrent readers (r8 verdict ask #7) ---


def test_compaction_reader_contract(spark, tmp_path):
    """The swap is atomic for NEW readers, but a reader holding a
    pre-compaction file listing (Spark lists files when the DataFrame is
    created) references files the swap deleted — the documented failure
    mode behind the single-writer / compact-between-query-waves contract
    (DEPLOYMENT.md storage-layout notes). Pin both halves: the stale
    plan fails loudly (never returns partial/wrong data), the fresh plan
    sees every row."""
    import pytest

    from op_etl_spark.operators import layout

    path = str(tmp_path / "t")
    spark.range(0, 5000).withColumn("v", F.col("id") % 7).repartition(
        16
    ).write.parquet(path)
    stale = spark.read.parquet(path)  # file listing captured HERE
    assert stale.count() == 5000

    plan = layout.compact_files(spark, path, target_file_bytes=1 << 30)
    assert not plan.skipped and plan.n_files == 16 and plan.target_files == 1

    fresh = spark.read.parquet(path)
    assert fresh.count() == 5000
    assert len(layout._list_data_files(spark, path)) == 1

    with pytest.raises(Exception) as ei:
        stale.count()
    # Spark's wording for exactly this situation; loud, never silent
    assert "FileNotFound" in str(ei.value) or "does not exist" in str(ei.value)


# --- interval-join counter instrumentation (r8 verdict ask #1) ---


def test_instrumented_interval_join_equals_production(spark):
    """The probe-only decomposed form (equi-join + observed filter) must
    return exactly the production compound-condition join's rows, and
    the candidate counter must read the full same-user pair space."""
    from op_etl_spark.operators import counters
    from op_etl_spark.suite.stream_windows import click_attribution

    sf = "/root/testdata/sf0.001"
    prod = {tuple(r) for r in click_attribution(spark, sf).collect()}

    counters.enable()
    counters.set_scope("click_attribution")
    try:
        df = click_attribution(spark, sf)
        probed = {tuple(r) for r in df.collect()}
        snap = counters.snapshot().get("click_attribution", {})
    finally:
        counters.disable()

    assert probed == prod
    assert snap["output"] == len(prod)
    assert snap["candidates"] >= snap["output"]
    # the candidate stage is the UNFILTERED same-user pair space
    from op_etl_spark.session import read_events
    from pyspark.sql import functions as F

    ev = read_events(spark, sf)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u")
    )
    expected = c.join(p, "u").count()
    assert snap["candidates"] == expected


def test_production_interval_join_plan_has_no_collectmetrics(spark):
    """With counters off (production), the observe_as param must leave
    the plan byte-identical to an unnamed call — no CollectMetrics node
    (the plan_audit sweep enforces this repo-wide; this is the unit pin)."""
    from op_etl_spark.suite.stream_windows import click_attribution

    df = click_attribution(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "CollectMetrics" not in plan
