"""Streaming deduplication — exactly-once event delivery over an
at-least-once transport.

`dropDuplicatesWithinWatermark` keys the dedup state by `keys` and ages
state out at the event-time watermark: a duplicate arriving within the
horizon is dropped, state stays bounded by (horizon × arrival rate)
instead of growing with the stream. This is the streaming twin of the
batch suite's exact dedup (`exact_dedup_groups`) and of the staged-file
stem dedup (SURVEY §2.8 U3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop duplicate events (same `keys`) arriving within the watermark
    horizon. Works on a streaming DataFrame with an event-time `ts`."""
    if not events.isStreaming:
        return events.dropDuplicates(list(keys))
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
