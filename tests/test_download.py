"""HTTP file-download driver (S1-S3) + response validation (F13) +
count-sanity probe (A5) — driver-side helpers with injected fetchers."""

from __future__ import annotations

import io
import json
import zipfile

import pytest

from op_etl_spark.sources.download import (
    download_file,
    extract_zip,
    process_http_source,
    validate_content,
)
from op_etl_spark.sources.rest import count_sanity_check


class TestValidateContent:
    def test_rejects_empty(self):
        with pytest.raises(ValueError, match="empty"):
            validate_content(b"", "http://x")

    def test_rejects_html_error_page(self):
        with pytest.raises(ValueError, match="HTML"):
            validate_content(b"  <!DOCTYPE html><html>sign in</html>", "http://x")

    def test_accepts_geojson(self):
        validate_content(b'{"type": "FeatureCollection"}')


class TestDownloadFile:
    def test_lands_with_slugged_name(self, tmp_path):
        path = download_file(
            "http://host/data/V%20roads.GEOJSON".replace("%20", " "),
            str(tmp_path),
            fetch_bytes=lambda u: b'{"ok": 1}',
        )
        assert path.endswith(".geojson")
        assert " " not in path
        assert open(path, "rb").read() == b'{"ok": 1}'

    def test_collision_gets_timestamp_suffix(self, tmp_path):
        fetch = lambda u: b"data"  # noqa: E731
        p1 = download_file("http://h/a.json", str(tmp_path), fetch_bytes=fetch)
        p2 = download_file("http://h/a.json", str(tmp_path), fetch_bytes=fetch)
        assert p1 != p2
        assert p2.endswith(".json") and "a_" in p2

    def test_invalid_content_never_lands(self, tmp_path):
        with pytest.raises(ValueError):
            download_file(
                "http://h/err.json", str(tmp_path), fetch_bytes=lambda u: b""
            )
        assert list(tmp_path.iterdir()) == []


class TestHttpSource:
    def test_multi_layer_index_source(self, tmp_path):
        fetched = []

        def fetch(url):
            fetched.append(url)
            return json.dumps({"layer": url}).encode()

        landed = process_http_source(
            {
                "name": "idx",
                "authority": "AUTH",
                "url": "http://host/data",
                "raw": {"layers": ["roads", "rivers"], "ext": ".geojson"},
            },
            str(tmp_path),
            fetch_bytes=fetch,
        )
        assert fetched == [
            "http://host/data/roads.geojson",
            "http://host/data/rivers.geojson",
        ]
        assert len(landed) == 2
        assert all("/AUTH/" in p for p in landed)

    def test_zip_source_auto_extracts(self, tmp_path):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("nested/dir/layer.geojson", '{"type": "FeatureCollection"}')
            z.writestr("readme.txt", "hi")
        body = buf.getvalue()

        landed = process_http_source(
            {"name": "z", "authority": "A", "url": "http://host/pkg.zip"},
            str(tmp_path),
            fetch_bytes=lambda u: body,
        )
        # priority selection keeps only parseable geo candidates
        assert len(landed) == 1
        assert landed[0].endswith("layer.geojson")

    def test_extract_zip_skips_dirs(self, tmp_path):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("d/", "")
            z.writestr("d/x.json", "{}")
        p = tmp_path / "a.zip"
        p.write_bytes(buf.getvalue())
        out = extract_zip(str(p))
        assert len(out) == 1 and out[0].endswith("x.json")


class TestCountSanity:
    def _fetcher(self, small_n, large_n):
        def fetch(url, params):
            # envelope area decides which probe this is
            xmin, ymin, xmax, ymax = (float(v) for v in params["geometry"].split(","))
            area = (xmax - xmin) * (ymax - ymin)
            return {"count": small_n if area < 1e9 else large_n}

        return fetch

    SMALL = (600000.0, 6560000.0, 610000.0, 6570000.0)
    LARGE = (200000.0, 6100000.0, 900000.0, 7700000.0)

    def test_healthy_layer_passes(self):
        out = count_sanity_check(
            self._fetcher(40, 100), "http://h/0", {}, self.SMALL, self.LARGE
        )
        assert out["ok"] and out["ratio"] == pytest.approx(0.4)

    def test_sr_mismatch_flagged_by_tiny_ratio(self):
        out = count_sanity_check(
            self._fetcher(1, 100000), "http://h/0", {}, self.SMALL, self.LARGE
        )
        assert not out["ok"]

    def test_inverted_counts_flagged(self):
        out = count_sanity_check(
            self._fetcher(200, 100), "http://h/0", {}, self.SMALL, self.LARGE
        )
        assert not out["ok"]
