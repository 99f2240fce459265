"""Connector resilience parity: Retry-After honor, redirect blocking,
OGC inter-request politeness delay, and the REST debug probe.

Reference behaviors under test:
  - etl/http_utils.py:170-179 (respect_retry_after_header=True): a 429
    carrying Retry-After overrides the computed exponential backoff,
    capped at 30s;
  - etl/http_utils.py:49, 249-252 (DEFAULT_FOLLOW_REDIRECTS=False):
    3xx answers are surfaced as errors, not silently followed into a
    portal sign-in page parsed as data;
  - etl/download_ogc.py:70, 320-322 (ogc_api_delay): sequential
    next-link requests within one collection cursor are paced;
  - etl/download_rest.py:106-132 (diagnose_rest_response): count with
    and without bbox, classifying SR-mismatch over-filtering.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from op_etl_spark.sources.fetchers import (
    RETRY_AFTER_CAP_SECONDS,
    fetch_bytes,
    parse_retry_after,
)
from op_etl_spark.sources.ogc import _walk_collection
from op_etl_spark.sources.rest import diagnose_rest_response


# --- local HTTP server fixture ------------------------------------------------

class _Script(BaseHTTPRequestHandler):
    """Serves a scripted list of (status, headers, body) responses."""

    script: list[tuple[int, dict, bytes]] = []
    hits: list[str] = []

    def do_GET(self):  # noqa: N802
        type(self).hits.append(self.path)
        idx = min(len(type(self).hits) - 1, len(self.script) - 1)
        status, headers, body = self.script[idx]
        self.send_response(status)
        for k, v in headers.items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture
def scripted_server():
    servers = []

    def start(script):
        handler = type("H", (_Script,), {"script": script, "hits": []})
        srv = HTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return f"http://127.0.0.1:{srv.server_port}", handler

    yield start
    for srv in servers:
        srv.shutdown()
        srv.server_close()


# --- Retry-After --------------------------------------------------------------

class TestRetryAfter:
    def test_delta_seconds_overrides_backoff(self, scripted_server):
        url, handler = scripted_server(
            [
                (429, {"Retry-After": "7"}, b""),
                (200, {}, b"ok"),
            ]
        )
        sleeps = []
        body = fetch_bytes(url, {}, sleeper=sleeps.append)
        assert body == b"ok"
        assert sleeps == [7.0]  # not the default 0.5 * 2**0 backoff
        assert len(handler.hits) == 2

    def test_capped_at_30s(self, scripted_server):
        url, _ = scripted_server(
            [(503, {"Retry-After": "86400"}, b""), (200, {}, b"ok")]
        )
        sleeps = []
        assert fetch_bytes(url, {}, sleeper=sleeps.append) == b"ok"
        assert sleeps == [RETRY_AFTER_CAP_SECONDS]

    def test_missing_header_keeps_exponential_backoff(self, scripted_server):
        url, _ = scripted_server([(500, {}, b""), (500, {}, b""), (200, {}, b"ok")])
        sleeps = []
        assert fetch_bytes(url, {}, sleeper=sleeps.append) == b"ok"
        assert sleeps == [0.5, 1.0]

    def test_non_retryable_status_raises_immediately(self, scripted_server):
        url, handler = scripted_server([(404, {}, b"gone")])
        sleeps = []
        with pytest.raises(Exception):
            fetch_bytes(url, {}, sleeper=sleeps.append)
        assert sleeps == []
        assert len(handler.hits) == 1

    def test_parse_retry_after_forms(self):
        import email.utils
        import time

        assert parse_retry_after("12") == 12.0
        assert parse_retry_after("999999") == RETRY_AFTER_CAP_SECONDS
        assert parse_retry_after(None) is None
        assert parse_retry_after("not-a-date") is None
        # HTTP-date ~20s in the future parses to roughly that delta
        when = email.utils.formatdate(time.time() + 20, usegmt=True)
        got = parse_retry_after(when)
        assert got is not None and 17 <= got <= 21
        # past dates clamp to zero, never negative
        past = email.utils.formatdate(time.time() - 60, usegmt=True)
        assert parse_retry_after(past) == 0.0


# --- redirects ----------------------------------------------------------------

class TestRedirects:
    def test_blocked_by_default(self, scripted_server):
        url, handler = scripted_server(
            [(302, {"Location": "http://example.invalid/login"}, b"")]
        )
        with pytest.raises(RuntimeError, match="redirect blocked"):
            fetch_bytes(url, {})
        assert len(handler.hits) == 1  # did not follow

    def test_followed_when_opted_in(self, scripted_server):
        target_url, _ = scripted_server([(200, {}, b"real-data")])
        src_url, _ = scripted_server([(302, {"Location": target_url}, b"")])
        assert fetch_bytes(src_url, {}, follow_redirects=True) == b"real-data"


# --- OGC politeness delay -----------------------------------------------------

def _ogc_pages(n_pages: int):
    """Fetcher serving n_pages with next links; records request order."""
    calls = []

    def fetcher(url, params):
        calls.append(url)
        page = len(calls)
        doc = {
            "features": [
                {
                    "geometry": {"type": "Point", "coordinates": [1.0 * page, 2.0]},
                    "properties": {"p": page},
                }
            ],
            "links": [],
        }
        if page < n_pages:
            doc["links"] = [{"rel": "next", "href": f"http://x/items?page={page + 1}"}]
        return doc

    return fetcher, calls


class TestOgcDelay:
    def test_delay_observed_between_pages(self):
        fetcher, calls = _ogc_pages(3)
        sleeps = []
        rows = list(
            _walk_collection(
                fetcher, "http://x", "col", "src", "auth",
                None, None, None, 1000,
                delay_seconds=0.25, sleeper=sleeps.append,
            )
        )
        assert len(rows) == 3
        assert len(calls) == 3
        # paced BETWEEN sequential requests: n_pages - 1 sleeps, never before
        # the first request
        assert sleeps == [0.25, 0.25]

    def test_zero_delay_never_sleeps(self):
        fetcher, _ = _ogc_pages(2)
        sleeps = []
        list(
            _walk_collection(
                fetcher, "http://x", "col", "src", "auth",
                None, None, None, 1000,
                delay_seconds=0.0, sleeper=sleeps.append,
            )
        )
        assert sleeps == []


# --- REST debug probe ---------------------------------------------------------

def _count_fetcher(total: int, bbox_count: int):
    def fetch(url, params):
        assert params.get("returnCountOnly") == "true"
        return {"count": bbox_count if "geometry" in params else total}

    return fetch


class TestDiagnoseRestResponse:
    def test_sr_mismatch_detected(self):
        # layer has rows, bbox (interpreted in the wrong SR) selects none
        out = diagnose_rest_response(
            _count_fetcher(total=500, bbox_count=0),
            "http://x/0",
            bbox=(585826, 6550189, 648593, 6611661),
        )
        assert out["classification"] == "bbox-excludes-all"
        assert out["total_count"] == 500
        assert out["bbox_count"] == 0

    def test_healthy_layer_ok(self):
        out = diagnose_rest_response(
            _count_fetcher(500, 120), "http://x/0", bbox=(0, 0, 1, 1)
        )
        assert out["classification"] == "ok"
        assert out["ratio"] == pytest.approx(0.24)

    def test_empty_layer(self):
        out = diagnose_rest_response(_count_fetcher(0, 0), "http://x/0", bbox=(0, 0, 1, 1))
        assert out["classification"] == "empty-layer"

    def test_no_bbox_reports_total_only(self):
        out = diagnose_rest_response(_count_fetcher(42, 0), "http://x/0")
        assert out["classification"] == "no-bbox"
        assert out["total_count"] == 42

    def test_opt_in_over_filtering_threshold(self):
        out = diagnose_rest_response(
            _count_fetcher(1000, 3), "http://x/0", bbox=(0, 0, 1, 1), min_ratio=0.01
        )
        assert out["classification"] == "bbox-over-filtering"
