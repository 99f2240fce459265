"""Hypothesis properties for the real multimodal kernels: the Spark-side
numpy kernels must agree with straight-line pure-numpy references for
RANDOM raster/PCM shapes, not just the hand-picked unit fixtures. The
references here are written independently (direct index math, no reuse
of the kernel code), so a shared bug can't hide.

Volume note: each case runs a Spark job, so example counts are modest;
the byte-exact oracle gates cover volume at fixed shapes, these cover
shape diversity.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

dims = st.integers(min_value=1, max_value=12)


def _raw_df(spark, arr):
    h, w, c = arr.shape
    return spark.createDataFrame(
        [(1, h, w, c, arr.tobytes())],
        "media_id bigint, height int, width int, channels int, content binary",
    )


class TestResizeProperties:
    @given(
        st.integers(0, 2**32 - 1), dims, dims,
        st.integers(1, 16), st.integers(1, 16),
    )
    @settings(
        max_examples=15, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_nearest_matches_reference(self, spark, seed, h, w, oh, ow):
        from op_etl_spark.operators.multimodal import resize_raw_nearest

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = resize_raw_nearest(_raw_df(spark, img), ow, oh).collect()[0]
        ref = np.empty((oh, ow, 3), dtype=np.uint8)
        for y in range(oh):
            for x in range(ow):
                ref[y, x] = img[(y * h) // oh, (x * w) // ow]
        assert bytes(out.content) == ref.tobytes()
        assert out.byte_sum == int(ref.sum(dtype=np.int64))

    @given(st.integers(0, 2**32 - 1), dims, dims)
    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_bilinear_identity_and_range(self, spark, seed, h, w):
        from op_etl_spark.operators.multimodal import resize_raw_bilinear

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = resize_raw_bilinear(_raw_df(spark, img), w, h).collect()[0]
        assert bytes(out.content) == img.tobytes()  # identity is exact


class TestPcmProperties:
    @given(st.integers(0, 2**32 - 1), st.integers(1, 6))
    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_frames_match_reference(self, spark, seed, n_frames):
        from op_etl_spark.operators.multimodal import pcm_frame_features

        rng = np.random.default_rng(seed)
        flen = 16
        v = rng.integers(-16384, 16384, size=n_frames * flen + 7, dtype=np.int64)
        enc = v + 16384
        raw = np.stack([enc % 256, enc // 256], axis=1).astype(np.uint8).tobytes()
        df = spark.createDataFrame(
            [(1, 16000, raw, len(raw))],
            "media_id bigint, sample_rate int, content binary, n_bytes int",
        )
        rows = {r.frame_idx: r for r in pcm_frame_features(df, frame_len=flen).collect()}
        assert set(rows) == set(range(n_frames))  # trailing partial dropped
        for i in range(n_frames):
            fr = v[i * flen : (i + 1) * flen]
            assert rows[i].energy_sum == int((fr * fr).sum())
            assert rows[i].n_zero_cross == int(((fr[:-1] * fr[1:]) < 0).sum())
            assert rows[i].rms == pytest.approx(float(np.sqrt((fr * fr).sum() / flen)))
