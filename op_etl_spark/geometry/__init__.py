"""Geometry kernel: WKB codec, transverse-Mercator reprojection,
clip/point-in-polygon — the reference's ArcPy-backed operators (T1-T3)
re-implemented as numpy-vectorized math exposed through Arrow pandas UDFs.
"""

from .tm import CRS_REGISTRY, geodetic_to_grid, grid_to_geodetic, reproject_xy
from .wkb import wkb_dumps, wkb_loads

__all__ = [
    "CRS_REGISTRY",
    "geodetic_to_grid",
    "grid_to_geodetic",
    "reproject_xy",
    "wkb_dumps",
    "wkb_loads",
]
