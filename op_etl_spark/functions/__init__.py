"""Scalar column functions (reference §2.9 F1-F16 re-expressed as Spark
column expressions — JVM-side, codegen'd; no Python UDFs)."""

from .naming import safe_name_expr, sanitize_layer_name_expr, slug_expr, slug_py
from .crs import SR_BOUNDS, crs_to_epsg_expr, magnitude_valid_expr
from .bbox import bbox_struct, envelope_intersects, envelope_within_tolerance

__all__ = [
    "slug_expr",
    "slug_py",
    "safe_name_expr",
    "sanitize_layer_name_expr",
    "crs_to_epsg_expr",
    "magnitude_valid_expr",
    "SR_BOUNDS",
    "bbox_struct",
    "envelope_intersects",
    "envelope_within_tolerance",
]
