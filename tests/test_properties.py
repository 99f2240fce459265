"""Property-based tests (hypothesis) for the pure kernels — the
invariants that hold for ALL inputs, not just fixtures:

 - WKB encode/decode round-trips every geometry type bit-exactly;
 - transverse-Mercator forward/inverse round-trips to sub-mm inside the
   projection zone (the tolerance ArcPy parity requires, SURVEY §2.10 T1);
 - slug/safe-name are idempotent and produce only legal characters
   (reference F1/F2 contracts, etl/download_http.py:21-38, utils.py:56-113);
 - convex clip output always lies inside the clip window.

Pure Python/numpy — no SparkSession, so the whole file runs in
milliseconds and hypothesis can push hundreds of cases.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from op_etl_spark.functions.naming import slug_py
from op_etl_spark.geometry.clip import clip_line_bbox
from op_etl_spark.geometry.tm import geodetic_to_grid, grid_to_geodetic, reproject_xy
from op_etl_spark.geometry.wkb import wkb_dumps, wkb_loads

finite = st.floats(
    min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False
)
coord = st.tuples(finite, finite).map(list)


class TestWkbRoundTrip:
    @given(st.lists(coord, min_size=1, max_size=20))
    @settings(max_examples=200, deadline=None)
    def test_linestring(self, pts):
        gt, coords = wkb_loads(wkb_dumps("LineString", pts))
        assert gt == "LineString"
        assert coords == pts

    @given(coord)
    @settings(max_examples=200, deadline=None)
    def test_point(self, p):
        gt, coords = wkb_loads(wkb_dumps("Point", p))
        assert gt == "Point" and coords == p

    @given(st.lists(st.lists(coord, min_size=4, max_size=8), min_size=1, max_size=3))
    @settings(max_examples=100, deadline=None)
    def test_polygon(self, rings):
        rings = [r[:-1] + [r[0]] for r in rings]  # close each ring
        gt, coords = wkb_loads(wkb_dumps("Polygon", rings))
        assert gt == "Polygon" and coords == rings

    @given(st.lists(st.lists(coord, min_size=2, max_size=5), min_size=1, max_size=4))
    @settings(max_examples=100, deadline=None)
    def test_multilinestring(self, lines):
        gt, coords = wkb_loads(wkb_dumps("MultiLineString", lines))
        assert gt == "MultiLineString" and coords == lines


# Swedish projection zone: the lat/lon window the reference operates in
swedish_lat = st.floats(min_value=55.0, max_value=69.0, allow_nan=False)
swedish_lon = st.floats(min_value=10.5, max_value=24.2, allow_nan=False)


class TestTransverseMercator:
    @given(swedish_lat, swedish_lon)
    @settings(max_examples=300, deadline=None)
    def test_forward_inverse_round_trip_sub_mm(self, lat, lon):
        x, y = geodetic_to_grid(lat, lon, 3006)
        lat2, lon2 = grid_to_geodetic(x, y, 3006)
        # 1e-9 degrees ~ 0.1 mm
        assert abs(float(lat2) - lat) < 1e-9
        assert abs(float(lon2) - lon) < 1e-9

    @given(swedish_lat, swedish_lon)
    @settings(max_examples=200, deadline=None)
    def test_3006_3010_chain_round_trip(self, lat, lon):
        x, y = reproject_xy(np.array([lon]), np.array([lat]), 4326, 3006)
        x2, y2 = reproject_xy(x, y, 3006, 3010)
        x3, y3 = reproject_xy(x2, y2, 3010, 3006)
        assert abs(float(x3[0] - x[0])) < 1e-4  # 0.1 mm in meters
        assert abs(float(y3[0] - y[0])) < 1e-4

    @given(swedish_lat, swedish_lon)
    @settings(max_examples=200, deadline=None)
    def test_sweref_grid_magnitudes(self, lat, lon):
        x, y = geodetic_to_grid(lat, lon, 3006)
        # the P9 magnitude window the reference enforces (sr_utils.py:15-60)
        assert -200000 <= float(x) <= 1100000
        assert 6000000 <= float(y) <= 7800000


class TestNaming:
    @given(st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_slug_idempotent(self, s):
        once = slug_py(s)
        assert slug_py(once) == once

    @given(st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_slug_alphabet_and_length(self, s):
        out = slug_py(s)
        assert len(out) <= 63
        assert all(c.islower() or c.isdigit() or c in "_-" for c in out)


class TestWkbFuzz:
    @given(st.binary(min_size=0, max_size=200))
    @settings(max_examples=500, deadline=None)
    def test_arbitrary_bytes_never_raise_anything_but_valueerror(self, buf):
        try:
            wkb_loads(buf)
        except ValueError:
            pass  # the contract: malformed -> ValueError, nothing else

    @given(st.binary(min_size=9, max_size=50))
    @settings(max_examples=300, deadline=None)
    def test_truncated_valid_prefix_raises_cleanly(self, junk):
        valid = wkb_dumps("LineString", [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        for cut in (5, 9, 13, len(valid) - 1):
            try:
                wkb_loads(valid[:cut] + junk[: max(0, cut - 9)])
            except ValueError:
                pass


class TestClip:
    BBOX = (0.0, 0.0, 100.0, 100.0)

    @given(st.lists(st.tuples(
        st.floats(min_value=-200, max_value=300, allow_nan=False),
        st.floats(min_value=-200, max_value=300, allow_nan=False),
    ).map(list), min_size=2, max_size=10))
    @settings(max_examples=200, deadline=None)
    def test_clipped_lines_stay_inside_window(self, pts):
        segments = clip_line_bbox(pts, self.BBOX)
        eps = 1e-9
        for seg in segments:
            for x, y in seg:
                assert -eps <= x <= 100 + eps
                assert -eps <= y <= 100 + eps
