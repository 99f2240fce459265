"""Candidate-economics instrumentation (operators/counters.py) for the
exact-pair-join family: counters are strictly off by default (no
CollectMetrics node in driver-facing plans), and when enabled they
decompose the collision -> candidate -> output funnel monotonically —
the measurement the scale probe records so 'output grew with duplicate
density' is a number, not an argument."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _run(df):
    df.write.format("noop").mode("overwrite").save()


def test_counters_off_by_default_no_plan_change(spark):
    from op_etl_spark.operators import counters
    from op_etl_spark.suite.dedup import prefix_filter_jaccard_pairs

    counters.disable()
    plan = prefix_filter_jaccard_pairs(spark, SF_DIR)._jdf.queryExecution().toString()
    assert "CollectMetrics" not in plan


def test_prefix_filter_funnel_is_monotone(spark):
    from op_etl_spark.operators import counters
    from op_etl_spark.suite.dedup import prefix_filter_jaccard_pairs

    counters.enable()
    try:
        _run(prefix_filter_jaccard_pairs(spark, SF_DIR))
        snap = counters.snapshot()["prefix_filter_jaccard_pairs"]
    finally:
        counters.disable()
    assert snap["prefix_collisions"] >= snap["candidates"] >= snap["output"] > 0
    # the PPJoin positional + size-ratio prunes must actually prune:
    # collisions are per-token, candidates are per-pair post-filter
    assert snap["candidates"] < snap["prefix_collisions"]


def test_verified_pairs_funnel(spark):
    from op_etl_spark.operators import counters
    from op_etl_spark.suite.dedup import jaccard_verified_pairs

    counters.enable()
    try:
        _run(jaccard_verified_pairs(spark, SF_DIR))
        snap = counters.snapshot()["jaccard_verified_pairs"]
    finally:
        counters.disable()
    # union of the two branches, deduped, is what gets verified
    assert snap["candidates"] <= snap["lsh_candidates"] + snap["capped_out"]
    assert snap["output"] <= snap["candidates"]
    assert snap["output"] > 0


def test_embedding_neardup_funnel(spark):
    from op_etl_spark.operators import counters
    from op_etl_spark.suite.similarity import embedding_neardup_pairs

    counters.enable()
    try:
        _run(embedding_neardup_pairs(spark, SF_DIR))
        snap = counters.snapshot()["embedding_neardup_pairs"]
    finally:
        counters.disable()
    assert snap["candidates"] >= snap["output"] > 0


def test_record_loop_is_noop_when_disabled(spark):
    from op_etl_spark.operators import counters
    from op_etl_spark.operators.graph import kcore, symmetrize

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    # production path: disabled -> nothing recorded, result unchanged
    core, rounds = kcore(symmetrize(pairs), 2)
    assert counters.loops_snapshot() == {}
    assert rounds >= 1 and core.count() == 6  # the 1-2-3 triangle, symmetric


def test_record_loop_scoped_rounds_and_edge_curve(spark):
    from op_etl_spark.operators import counters
    from op_etl_spark.operators.graph import kcore, symmetrize

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    counters.enable()
    counters.set_scope("my_query")
    try:
        kcore(symmetrize(pairs), 2)
        loops = counters.loops_snapshot()
    finally:
        counters.disable()
    assert list(loops) == ["my_query"]
    (rec,) = loops["my_query"]
    assert rec["kind"] == "kcore" and rec["k"] == 2
    # edge curve: symmetric counts per round, first entry the input size,
    # last two equal (the convergence round), monotone non-increasing
    curve = rec["edges"]
    assert curve[0] == 8 and curve[-1] == 6 == curve[-2]
    assert all(a >= b for a, b in zip(curve, curve[1:]))
    assert rec["rounds"] == len(curve) - 1
    # disable() clears state for the next enable()
    assert counters.loops_snapshot() == {}


def test_cc_fixpoint_records_potential_curve(spark):
    from op_etl_spark.operators import counters
    from op_etl_spark.suite.clustering import cc_fixpoint

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    counters.enable()
    counters.set_scope("cc_q")
    try:
        labels, rounds = cc_fixpoint(nodes, edges)
        loops = counters.loops_snapshot()
    finally:
        counters.disable()
    (rec,) = loops["cc_q"]
    assert rec["kind"] == "cc" and rec["rounds"] == rounds
    pot = rec["potential"]
    # label sums only fall, and the last two entries tie (convergence)
    assert all(a >= b for a, b in zip(pot, pot[1:]))
    assert pot[-1] == pot[-2]
    assert {(r.doc_id, r.label) for r in labels.collect()} == {
        (1, 1), (2, 1), (3, 1), (4, 4), (5, 5),
    }
