"""Watermarked event-time window aggregations.

The batch suite's `tumbling_hourly_events` (op_etl_spark/suite/relational.py)
re-expressed over an unbounded stream: watermarks bound state and tolerate
late data (the reference has no streaming surface — SURVEY.md §2.12 — so
these are the extension operators a continuous ingest needs).

All three builders accept EITHER a streaming or a batch DataFrame — the
window/aggregate code is identical, which is what the tests exploit
(stream result == batch result on the same closed input).

Scale notes: state size is (watermark horizon / window slide) × #groups;
a 2h watermark on 1h tumbling windows keeps ≤3 open windows per
event_type. Shuffle is on (window, event_type) — time-bucketed keys are
uniformly distributed, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows: event counts + exact money sum per type."""
    # deferred: suite/__init__ imports suite.stream_windows which imports
    # this module — a module-level import here would be circular
    from op_etl_spark.suite._util import money_sum

    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_event_rate(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Overlapping windows (rate monitoring): events/users per window."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
            "n_events",
            "approx_users",
        )
    )


def session_window_rollup(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Built-in gap-based session windows per user (F.session_window):
    a session closes after `gap` of inactivity. The declarative sibling of
    the stateful sessionizer in `streaming.stateful` (which exists for
    semantics session_window can't express, e.g. custom session ids)."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
        )
    )
