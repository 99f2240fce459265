"""Multimodal binary-column operators: schema/plumbing tests beyond the
DuckDB-oracle gate (tools/check_correctness covers the value-level
equivalence of decode/entropy/frames)."""

from __future__ import annotations

import hashlib

import pytest

from op_etl_spark.operators import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_table(spark, SF_DIR)


class TestMediaTable:
    def test_schema_and_kinds(self, media):
        assert dict(media.dtypes)["content"] == "binary"
        kinds = {r.kind for r in media.select("kind").distinct().collect()}
        assert kinds == {"image", "audio", "video"}

    def test_content_is_text_bytes(self, spark, media):
        row = media.orderBy("media_id").first()
        doc = spark.read.parquet(f"{SF_DIR}/documents.parquet").orderBy("doc_id").first()
        assert bytes(row.content) == doc.text.encode()
        assert row.meta.n_bytes == len(doc.text)


class TestDecode:
    def test_kind_specific_fields(self, media):
        out = mm.decode_media(media).collect()
        for r in out:
            if r.kind == "image":
                assert r.width and r.height and r.channels
                assert r.sample_rate is None and r.fps is None
            elif r.kind == "audio":
                assert r.sample_rate and r.n_samples == r.n_bytes * 32
                assert r.width is None
            else:
                assert r.fps and r.n_frames >= 1
                assert r.width is None and r.sample_rate is None

    def test_fake_decode_deterministic(self):
        buf = b"hello world"
        assert mm.fake_decode("image", buf) == mm.fake_decode("image", buf)
        assert mm.fake_decode("image", buf)["width"] == 64 + buf[0] % 64


class TestResizeStub:
    def test_real_resize_raises_clearly_without_codecs(self, media):
        with pytest.raises(NotImplementedError, match="codec"):
            mm.resize_images(media, 32, 32)

    def test_fake_resize_restrides_content(self, media):
        out = mm.fake_resize(media.limit(5), 8, 8).collect()
        assert len(out) == 5
        for r in out:
            assert len(bytes(r.content)) == 64
            assert r.meta.n_bytes == 64
            assert r.meta.tag == "resized_8x8"

    def test_fake_resize_cycles_short_content(self, spark):
        df = spark.createDataFrame(
            [(1, "image", b"ab", {"n_bytes": 2, "tag": "t"})], mm.MEDIA_DDL
        )
        (row,) = mm.fake_resize(df, 2, 3).collect()
        assert bytes(row.content) == b"ababab"


class TestFrames:
    def test_only_video_sampled_with_stride(self, spark, media):
        frames = mm.sample_frames(media, every_n=2, frame_bytes=64)
        rows = frames.collect()
        video_ids = {
            r.media_id for r in media.filter("kind = 'video'").collect()
        }
        assert {r.media_id for r in rows} == video_ids
        idx = sorted(r.frame_idx for r in rows if r.media_id == min(video_ids))
        assert all(i % 2 == 0 for i in idx)

    def test_frame_md5_matches_local_slice(self, spark, media):
        first_video = media.filter("kind = 'video'").orderBy("media_id").first()
        got = {
            r.frame_idx: r.frame_md5
            for r in mm.sample_frames(
                media.filter(media.media_id == first_video.media_id),
                every_n=1, frame_bytes=64,
            ).collect()
        }
        buf = bytes(first_video.content)
        want = {
            i: hashlib.md5(buf[i * 64 : (i + 1) * 64]).hexdigest()
            for i in range(0, max(1, len(buf) // 64))
        }
        assert got == want


class TestRawResizeKernels:
    """Real raster math (no codec): nearest + bilinear over raw uint8."""

    def _raw(self, spark, rows):
        # rows: (media_id, h, w, c, np_array)
        import numpy as np  # noqa: F401

        data = [
            (mid, h, w, c, arr.tobytes()) for mid, h, w, c, arr in rows
        ]
        return spark.createDataFrame(
            data, "media_id bigint, height int, width int, channels int, content binary"
        )

    def test_nearest_identity_is_exact_copy(self, spark):
        import numpy as np

        from op_etl_spark.operators.multimodal import resize_raw_nearest

        rng = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
        out = resize_raw_nearest(self._raw(spark, [(1, 6, 5, 3, rng)]), 5, 6).collect()[0]
        assert bytes(out.content) == rng.tobytes()
        assert out.byte_sum == int(rng.sum())

    def test_nearest_downscale_matches_numpy_reference(self, spark):
        import numpy as np

        from op_etl_spark.operators.multimodal import resize_raw_nearest

        img = (np.arange(8 * 8 * 3, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(8, 8, 3)
        out = resize_raw_nearest(self._raw(spark, [(1, 8, 8, 3, img)]), 4, 4).collect()[0]
        ref = img[(np.arange(4) * 8) // 4][:, (np.arange(4) * 8) // 4]
        assert bytes(out.content) == ref.tobytes()
        assert out.tl == int(ref[0, 0, 0]) and out.br == int(ref[-1, -1, -1])

    def test_bilinear_identity_is_exact_copy(self, spark):
        import numpy as np

        from op_etl_spark.operators.multimodal import resize_raw_bilinear

        img = (np.arange(5 * 7 * 3, dtype=np.int64) * 11 % 256).astype(np.uint8).reshape(5, 7, 3)
        out = resize_raw_bilinear(self._raw(spark, [(1, 5, 7, 3, img)]), 7, 5).collect()[0]
        assert bytes(out.content) == img.tobytes()

    def test_bilinear_constant_stays_constant(self, spark):
        import numpy as np

        from op_etl_spark.operators.multimodal import resize_raw_bilinear

        img = np.full((4, 4, 3), 131, dtype=np.uint8)
        out = resize_raw_bilinear(self._raw(spark, [(1, 4, 4, 3, img)]), 9, 6).collect()[0]
        arr = np.frombuffer(bytes(out.content), dtype=np.uint8)
        assert arr.shape[0] == 9 * 6 * 3 and (arr == 131).all()

    def test_raw_table_buffers_cycle_text(self, spark):
        from op_etl_spark.operators.multimodal import raw_image_table

        rows = raw_image_table(spark, "/root/testdata/sf0.001").limit(3).collect()
        for r in rows:
            assert len(bytes(r.content)) == r.height * r.width * 3
            assert 8 <= r.height <= 15 and 8 <= r.width <= 15


class TestPcmKernels:
    """Real PCM DSP: int16 decode, frame energy/RMS, zero crossings."""

    def _pcm(self, spark, samples):
        import numpy as np

        v = np.asarray(samples, dtype=np.int64) + 16384
        raw = np.stack([v % 256, v // 256], axis=1).astype(np.uint8).tobytes()
        return spark.createDataFrame(
            [(1, 16000, raw, len(raw))],
            "media_id bigint, sample_rate int, content binary, n_bytes int",
        )

    def test_energy_rms_zero_cross_hand_checked(self, spark):
        import numpy as np

        from op_etl_spark.operators.multimodal import pcm_frame_features

        # alternating +100/-100: 63 sign changes, energy 64*100^2
        samples = [100 if i % 2 == 0 else -100 for i in range(64)]
        row = pcm_frame_features(self._pcm(spark, samples), frame_len=64).collect()[0]
        assert row.energy_sum == 64 * 100 * 100
        assert row.n_zero_cross == 63
        assert abs(row.rms - 100.0) < 1e-9

    def test_partial_trailing_frame_dropped(self, spark):
        from op_etl_spark.operators.multimodal import pcm_frame_features

        samples = [5] * 100  # one full 64-frame + 36 leftover
        rows = pcm_frame_features(self._pcm(spark, samples), frame_len=64).collect()
        assert len(rows) == 1 and rows[0].frame_idx == 0

    def test_constant_signal_has_no_crossings(self, spark):
        from op_etl_spark.operators.multimodal import pcm_frame_features

        rows = pcm_frame_features(self._pcm(spark, [7] * 128), frame_len=64).collect()
        assert {r.n_zero_cross for r in rows} == {0}
        assert {r.energy_sum for r in rows} == {128 * 49 // 2}


class TestFrameDeltaKernel:
    def _media(self, spark, buf, kind="video"):
        return spark.createDataFrame(
            [(1, kind, buf, {"n_bytes": len(buf), "tag": "t"})],
            "media_id bigint, kind string, content binary, meta struct<n_bytes:int, tag:string>",
        )

    def test_identical_frames_have_zero_delta(self, spark):
        from op_etl_spark.operators.multimodal import frame_delta_features

        buf = bytes(range(64)) * 3  # 3 identical frames
        rows = frame_delta_features(self._media(spark, buf), frame_bytes=64).collect()
        assert len(rows) == 2
        assert {r.sum_abs_diff for r in rows} == {0}

    def test_hand_checked_delta(self, spark):
        from op_etl_spark.operators.multimodal import frame_delta_features

        buf = bytes([10] * 64) + bytes([13] * 64)  # |13-10| * 64 = 192
        row = frame_delta_features(self._media(spark, buf), frame_bytes=64).collect()[0]
        assert row.sum_abs_diff == 192 and abs(row.mean_abs_diff - 3.0) < 1e-9

    def test_non_video_and_short_blobs_skipped(self, spark):
        from op_etl_spark.operators.multimodal import frame_delta_features

        assert frame_delta_features(
            self._media(spark, bytes(200), kind="image"), frame_bytes=64
        ).count() == 0
        assert frame_delta_features(
            self._media(spark, bytes(63)), frame_bytes=64
        ).count() == 0
