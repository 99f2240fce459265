"""Round-7 regression tests for the round-6 ADVICE items:

- quantile_normalized_lengths must survive a 1-document language stratum
  (Spark 4 ANSI mode turns the naive rn/(n-1) into DIVIDE_BY_ZERO) and
  must return 0.0 there, matching SQL percent_rank's defined value for a
  single-row partition;
- the k-core direct peel must afford at least as many rounds as the
  nested profile (KCORE_MAX_ROUNDS >= KCORE_PROFILE_ROUNDS), since peel
  depth grows with chain length in the data.
"""

from __future__ import annotations

import duckdb


def test_quantile_norm_single_doc_stratum(spark, tmp_path):
    from op_etl_spark.suite.robust import quantile_normalized_lengths

    rows = [
        (1, "aa", 10),
        (2, "aa", 20),
        (3, "aa", 30),
        (4, "zz", 999),  # singleton stratum: n-1 == 0
    ]
    spark.createDataFrame(rows, "doc_id INT, lang STRING, n_chars INT").write.parquet(
        str(tmp_path / "documents.parquet")
    )

    out = {
        r["doc_id"]: r["pct"]
        for r in quantile_normalized_lengths(spark, str(tmp_path)).collect()
    }
    assert out[4] == 0.0  # percent_rank of a single-row partition
    assert out[1] == 0.0 and out[3] == 1.0
    assert abs(out[2] - 0.5) < 1e-9

    # the DuckDB oracle agrees on the same fixture
    from op_etl_spark.suite.robust import ORACLE_QNORM

    con = duckdb.connect()
    glob = str(tmp_path / "documents.parquet" / "*.parquet").replace("'", "''")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')")
    oracle = {r[0]: r[3] for r in con.execute(ORACLE_QNORM).fetchall()}
    assert oracle == out


def test_kcore_round_budget_covers_profile_depth():
    from op_etl_spark.suite.clustering import KCORE_MAX_ROUNDS, KCORE_PROFILE_ROUNDS

    assert KCORE_MAX_ROUNDS >= KCORE_PROFILE_ROUNDS
