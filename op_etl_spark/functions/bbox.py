"""Envelope/bbox column math (reference F7/F14/P3).

The spatial bbox predicate the reference pushes to remote servers
(download_rest.py:89-100) becomes plain column arithmetic here — cheap
enough to evaluate on every row at scan time, and the exact prefilter the
geometry kernel uses before exact point-in-polygon/clip tests (so the
expensive pandas-UDF path only ever sees envelope-overlapping rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bbox_struct(xmin: Column, ymin: Column, xmax: Column, ymax: Column) -> Column:
    """4 numeric columns → canonical bbox struct (coerce_bbox4,
    download_rest.py:64-69)."""
    return F.struct(
        xmin.cast("double").alias("xmin"),
        ymin.cast("double").alias("ymin"),
        xmax.cast("double").alias("xmax"),
        ymax.cast("double").alias("ymax"),
    )


def envelope_intersects(b1: Column, b2: Column) -> Column:
    """Envelope-overlap predicate (esriSpatialRelIntersects on envelopes,
    download_rest.py:89-100)."""
    return (
        (b1["xmax"] >= b2["xmin"])
        & (b1["xmin"] <= b2["xmax"])
        & (b1["ymax"] >= b2["ymin"])
        & (b1["ymin"] <= b2["ymax"])
    )


def envelope_within_tolerance(b1: Column, b2: Column, tol: float = 0.1) -> Column:
    """Response-envelope vs requested-bbox tolerance check
    (sr_utils.py:62-116: each edge within `tol` of the request span)."""
    w = b2["xmax"] - b2["xmin"]
    h = b2["ymax"] - b2["ymin"]
    return (
        (F.abs(b1["xmin"] - b2["xmin"]) <= w * tol)
        & (F.abs(b1["xmax"] - b2["xmax"]) <= w * tol)
        & (F.abs(b1["ymin"] - b2["ymin"]) <= h * tol)
        & (F.abs(b1["ymax"] - b2["ymax"]) <= h * tol)
    )


def point_in_bbox(x: Column, y: Column, bbox: Column) -> Column:
    return (
        (x >= bbox["xmin"]) & (x <= bbox["xmax"]) & (y >= bbox["ymin"]) & (y <= bbox["ymax"])
    )
