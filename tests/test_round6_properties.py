"""Mathematical invariants of the round-6 suite queries, independent of
the DuckDB oracles (which pin cross-engine equality, not meaning):
- the MAD gate flags exactly the points a hand-computed robust z would;
- the exact stratified split's cohort sizes are exact, not binomial;
- Markov transition probabilities are a proper distribution per source;
- the hourly anomaly gate flags an injected spike and nothing else on a
  flat series.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_mad_outliers_match_hand_computation(spark):
    from op_etl_spark.session import read_events
    from op_etl_spark.suite.robust import OUTLIER_K, mad_outlier_report

    rows = read_events(spark, SF_DIR).select(
        "event_type", "value", "event_id"
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["value"], r["event_id"]))
    got = {r["event_type"]: r for r in mad_outlier_report(spark, SF_DIR).collect()}
    assert set(got) == set(by_type)
    for t, vs in by_type.items():
        vals = [v for v, _ in sorted(vs)]
        med = vals[(len(vals) - 1) // 2]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) - 1) // 2]
        n_out = sum(1 for v in vals if abs(v - med) > OUTLIER_K * mad)
        assert got[t]["med_value"] == med
        assert got[t]["mad_value"] == mad
        assert got[t]["n_outliers"] == n_out
        assert got[t]["n_events"] == len(vals)


def test_exact_split_counts_are_exact(spark):
    from op_etl_spark.suite.sampling import EXACT_SPLIT_DEN, exact_stratified_split

    out = exact_stratified_split(spark, SF_DIR).collect()
    per_lang = {}
    for r in out:
        per_lang.setdefault(r["lang"], {})[r["split"]] = r["n_docs"]
    for lang, splits in per_lang.items():
        n = sum(splits.values())
        q = n // EXACT_SPLIT_DEN
        assert splits.get("test", 0) == q, (lang, splits)
        assert splits.get("holdout", 0) == q, (lang, splits)
        assert splits.get("train", 0) == n - 2 * q, (lang, splits)


def test_transition_probs_are_distributions(spark):
    from op_etl_spark.suite.advanced import event_transition_matrix

    out = event_transition_matrix(spark, SF_DIR).collect()
    sums = {}
    for r in out:
        sums[r["from_type"]] = sums.get(r["from_type"], 0.0) + r["prob"]
        assert 0.0 <= r["prob"] <= 1.0
    # fround(6) quantization: row sums within 5e-6 * n_targets of 1
    for t, s in sums.items():
        assert abs(s - 1.0) < 5e-5, (t, s)


def test_volume_anomaly_flags_injected_spike(spark, tmp_path):
    import os

    from op_etl_spark.suite.robust import event_volume_anomalies

    # 96 flat hours of 10 events + one hour with 200: exactly one anomaly
    rows = []
    eid = 0
    for h in range(96):
        n = 200 if h == 40 else 10
        for i in range(n):
            rows.append((eid, f"2024-03-{1 + h // 24:02d} {h % 24:02d}:00:{i % 60:02d}"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts_s string").select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    d = os.path.join(str(tmp_path), "events.parquet")
    df.coalesce(1).write.parquet(d)
    out = event_volume_anomalies(spark, str(tmp_path)).collect()
    anomalies = [r for r in out if r["is_anomaly"] == 1]
    assert len(anomalies) == 1
    assert anomalies[0]["n_events"] == 200
    assert len(out) == 96
