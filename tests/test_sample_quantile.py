"""Bottom-k sample quantile gate (suite/sketches.sample_quantile_gate):
rank-error bound at gate scale and the mergeability property the
docstring claims (bottom-k of a union == k-smallest of merged bottom-ks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from op_etl_spark.operators.sketches import h60_salted
from op_etl_spark.suite.sketches import QSAMPLE_K, sample_quantile_gate

SF_DIR = "/root/testdata/sf0.01"


def test_rank_error_bound(spark):
    rows = sample_quantile_gate(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        # K=256 -> expected error ~1/sqrt(K)=0.0625; 0.1 is a loose pin
        assert r["rank_err"] <= 0.1, (r["q"], r["rank_err"])
        assert 0 < r["n_le"] <= r["n_total"]


def test_bottom_k_sample_is_mergeable(spark):
    k = 32
    df = spark.range(0, 5000).select(
        F.col("id").alias("event_id"),
        h60_salted(F.lit("qs"), F.col("id")).alias("h"),
    )
    direct = df.agg(
        F.slice(F.array_sort(F.collect_list(F.struct("h", "event_id"))), 1, k)
    ).collect()[0][0]
    parts = [
        df.filter(F.col("event_id") % 3 == i)
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("h", "event_id"))), 1, k
            ).alias("xs")
        )
        for i in range(3)
    ]
    union = parts[0].unionAll(parts[1]).unionAll(parts[2])
    merged = union.agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("xs"))), 1, k)
    ).collect()[0][0]
    assert merged == direct


def test_sample_is_full_at_gate_scale(spark):
    """At sf0.01 (10k events) the threshold keeps ~8*K rows, so the
    sample must be exactly K — a shrunken sample would silently degrade
    the estimator."""
    from op_etl_spark.session import read_events

    ev = read_events(spark, SF_DIR).select("event_id")
    n = ev.count()
    assert n >= 8 * QSAMPLE_K
