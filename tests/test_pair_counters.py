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
