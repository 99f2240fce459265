"""Late-data semantics under a watermark (round-7 gate).

watermark_hourly_counts re-delivers the first-quarter even-event_id rows
in a LATER micro-batch, after the watermark has passed their windows.
These tests pin the three claims the gate's docstring makes:

- the late set is non-empty at the test sf (otherwise the gate proves
  nothing);
- every late row is dropped: the emitted counts sum to exactly
  |subsample| - |late set|, and each early window's count excludes its
  withheld rows;
- the result hash-matches the DuckDB oracle that embeds the same cutoff.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _fixture_stats(spark):
    """(n_subsample, n_late) computed independently of the gate code."""
    from op_etl_spark.suite.stream_windows import _events_fixture_slice

    rows = _events_fixture_slice(spark, SF_DIR).select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts")
    ).collect()
    fmt = "%Y-%m-%d %H:%M:%S.%f"
    epoch = datetime(1970, 1, 1)
    us = [
        (datetime.strptime(r.ts, fmt) - epoch) // timedelta(microseconds=1)
        for r in rows
    ]
    cutoff = min(us) + (max(us) - min(us)) // 4
    n_late = sum(
        1 for r, u in zip(rows, us) if u < cutoff and r.event_id % 2 == 0
    )
    return len(rows), n_late


def test_watermark_drops_late_rows(spark):
    from op_etl_spark.suite.stream_windows import watermark_hourly_counts

    n_all, n_late = _fixture_stats(spark)
    assert n_late > 0, "fixture has no late rows — the gate proves nothing"

    out = watermark_hourly_counts(spark, SF_DIR).collect()
    assert out, "no windows emitted"
    assert sum(r.n for r in out) == n_all - n_late
    # append mode emits each finalized window exactly once
    keys = [(r.hour_start, r.event_type) for r in out]
    assert len(keys) == len(set(keys)), "duplicate window emitted"
    assert all(r.event_type != "sentinel" for r in out)


def test_watermark_gate_matches_oracle(spark):
    from op_etl_spark.suite.stream_windows import (
        ORACLE_WATERMARK_HOURLY,
        watermark_hourly_counts,
    )

    got = {
        (r.hour_start, r.event_type): (r.n, r.total_value)
        for r in watermark_hourly_counts(spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{SF_DIR}/events.parquet')"
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(ORACLE_WATERMARK_HOURLY).fetchall()
    }
    assert got == want
