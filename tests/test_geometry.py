"""Geometry kernel: TM projection accuracy, WKB codec, clipping, PIP."""

from __future__ import annotations

import numpy as np
import pytest

from op_etl_spark.geometry.clip import (
    clip_geometry_bbox,
    clip_line_bbox,
    clip_ring_bbox,
    point_in_polygon,
)
from op_etl_spark.geometry.tm import (
    geodetic_to_grid,
    grid_to_geodetic,
    reproject_xy,
)
from op_etl_spark.geometry.wkb import envelope, wkb_dumps, wkb_loads

# GRS80 for the independent meridian-arc formula
_A = 6378137.0
_F = 1 / 298.257222101
_E2 = _F * (2 - _F)


def _meridian_arc(phi):
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def test_central_meridian_identity():
    """On the central meridian: E == false easting exactly, N == k0 *
    meridian arc (independent 6th-order formula, mm agreement)."""
    for lat in (55.0, 60.0, 65.0, 68.0):
        x, y = geodetic_to_grid(lat, 15.0, 3006)
        assert abs(float(x) - 500000.0) < 1e-6
        assert abs(float(y) - 0.9996 * _meridian_arc(np.radians(lat))) < 0.005


def test_roundtrip_accuracy():
    rng = np.random.default_rng(7)
    lat = rng.uniform(55, 69, 500)
    lon = rng.uniform(11, 24, 500)
    for epsg in (3006, 3010):
        x, y = geodetic_to_grid(lat, lon, epsg)
        la2, lo2 = grid_to_geodetic(x, y, epsg)
        # 1e-9 deg ~ 0.1 mm
        assert np.abs(la2 - lat).max() < 1e-9
        assert np.abs(lo2 - lon).max() < 1e-9


def test_stockholm_known_location():
    x, y = geodetic_to_grid(59.3293, 18.0686, 3006)
    assert abs(float(x) - 674500) < 1000
    assert abs(float(y) - 6580500) < 1000


def test_reproject_chain():
    """4326 -> 3006 -> 3010 -> 4326 closes to sub-mm."""
    lon = np.array([14.0, 18.0686, 22.0])
    lat = np.array([56.0, 59.3293, 67.0])
    x6, y6 = reproject_xy(lon, lat, 4326, 3006)
    x10, y10 = reproject_xy(x6, y6, 3006, 3010)
    lon2, lat2 = reproject_xy(x10, y10, 3010, 4326)
    assert np.abs(lon2 - lon).max() < 1e-8
    assert np.abs(lat2 - lat).max() < 1e-8


GEOMS = [
    ("Point", [1.5, 2.5]),
    ("MultiPoint", [[1, 2], [3, 4]]),
    ("LineString", [[0, 0], [1, 1], [2, 0]]),
    ("MultiLineString", [[[0, 0], [1, 1]], [[5, 5], [6, 6]]]),
    ("Polygon", [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]),
    (
        "MultiPolygon",
        [[[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]],
         [[[10, 10], [12, 10], [11, 12], [10, 10]]]],
    ),
]


@pytest.mark.parametrize("gt,coords", GEOMS)
def test_wkb_roundtrip(gt, coords):
    got_gt, got_coords = wkb_loads(wkb_dumps(gt, coords))
    assert got_gt == gt

    def norm(c):
        if isinstance(c[0], (int, float)):
            return [float(c[0]), float(c[1])]
        return [norm(s) for s in c]

    assert got_coords == norm(coords)


def test_envelope():
    assert envelope("Polygon", [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]) == (0, 0, 4, 4)
    assert envelope("Point", [3, 7]) == (3, 7, 3, 7)


def test_clip_polygon_to_bbox():
    gt, coords = clip_geometry_bbox(
        "Polygon", [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]], (1, 1, 3, 3)
    )
    assert gt == "Polygon"
    assert envelope(gt, coords) == (1, 1, 3, 3)


def test_clip_polygon_outside():
    gt, coords = clip_geometry_bbox(
        "Polygon", [[[10, 10], [12, 10], [11, 12], [10, 10]]], (0, 0, 5, 5)
    )
    assert gt is None


def test_clip_line_split():
    segs = clip_line_bbox(
        [[0, 2], [2, 2], [2, 5], [2.5, 5], [2.5, 2], [3, 2]], (1, 1, 3, 3)
    )
    assert len(segs) == 2


def test_clip_triangle_corner():
    # triangle (0,0)-(2,0)-(0,1) clipped to unit box -> quad of area 3/4
    ring = clip_ring_bbox([[0, 0], [2, 0], [0, 1], [0, 0]], (0, 0, 1, 1))
    def area(r):
        s = 0.0
        for i in range(len(r) - 1):
            s += r[i][0] * r[i + 1][1] - r[i + 1][0] * r[i][1]
        return abs(s) / 2

    assert abs(area(ring) - 0.75) < 1e-12


def test_point_in_polygon_concave():
    ring = [[0, 0], [4, 0], [4, 4], [2, 2], [0, 4]]  # concave notch at top
    assert point_in_polygon([1, 1], ring)
    assert point_in_polygon([2, 1.5], ring)
    assert not point_in_polygon([2, 3.5], ring)  # inside the notch
    assert not point_in_polygon([5, 5], ring)


class TestReprojectNullCrs:
    def test_assume_epsg_transforms_null_crs_rows(self, spark):
        from pyspark.sql import functions as F

        from op_etl_spark.geometry.ops import reproject
        from op_etl_spark.geometry.wkb import wkb_dumps, wkb_loads

        wkb = wkb_dumps("Point", [500000.0, 6500000.0])
        df = spark.createDataFrame(
            [(wkb, None)], "geometry binary, crs int"
        )
        # null CRS assumed 3006 -> transformed into 3010 coordinates
        out = reproject(df, 3010, assume_epsg=3006).collect()[0]
        assert out.crs == 3010
        _, coords = wkb_loads(bytes(out.geometry))
        assert coords[0] != 500000.0  # actually reprojected, not stamped

        # default: null CRS treated as already-dst (metadata-only stamp)
        out2 = reproject(df, 3010).collect()[0]
        _, coords2 = wkb_loads(bytes(out2.geometry))
        assert coords2 == [500000.0, 6500000.0] and out2.crs == 3010


class TestGridPairsCap:
    def test_hot_cell_excluded_others_kept(self, spark):
        # 100 points stacked at one location (over the cap) + 3 spread
        # points within distance of each other elsewhere: the hot cell's
        # quadratic pair set must vanish, the normal pairs must survive
        from op_etl_spark.suite.geo import grid_pairs

        hot = [(i, 500.0, 500.0) for i in range(100)]
        normal = [(1000, 5_000.0, 5_000.0), (1001, 5_100.0, 5_050.0),
                  (1002, 5_950.0, 5_000.0)]
        pts = spark.createDataFrame(hot + normal, "event_id long, x double, y double")
        got = {(r.id1, r.id2) for r in grid_pairs(pts, 1000.0, 64).collect()}
        assert got == {(1000, 1001), (1000, 1002), (1001, 1002)}

    def test_cap_not_biting_equals_bruteforce(self, spark):
        from op_etl_spark.suite.geo import grid_pairs

        import itertools
        rows = [(i, float(137 * i % 3000), float(211 * i % 3000)) for i in range(60)]
        pts = spark.createDataFrame(rows, "event_id long, x double, y double")
        got = {(r.id1, r.id2) for r in grid_pairs(pts, 500.0, 64).collect()}
        want = {
            (a[0], b[0])
            for a, b in itertools.combinations(rows, 2)
            if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= 500.0 ** 2
        }
        assert got == want
