"""Default HTTP fetchers shared by the live connectors.

Retry policy mirrors the reference (etl/http_utils.py:170-179: 5 tries,
exponential backoff from 0.5s, retry on 429/500/502/503/504); response
size capped like etl/http_utils.py:39 (100 MB). Tests never use these —
every connector takes an injectable fetcher.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.parse
import urllib.request

MAX_RESPONSE_BYTES = 100 * 1024 * 1024  # etl/http_utils.py:39

_RETRY_CODES = (429, 500, 502, 503, 504)


def _fetch_bytes(url: str, params: dict) -> bytes:
    qs = urllib.parse.urlencode(params)
    full = f"{url}?{qs}" if qs else url
    last: Exception | None = None
    tries = 5
    for attempt in range(tries):
        try:
            with urllib.request.urlopen(full, timeout=60) as resp:
                body = resp.read(MAX_RESPONSE_BYTES + 1)
                if len(body) > MAX_RESPONSE_BYTES:
                    raise RuntimeError(f"response exceeds size cap: {full}")
                return body
        except urllib.error.HTTPError as e:
            last = e
            if e.code not in _RETRY_CODES:
                raise
        except (urllib.error.URLError, TimeoutError) as e:
            last = e
        if attempt < tries - 1:  # no pointless sleep after the final try
            time.sleep(0.5 * (2 ** attempt))
    raise RuntimeError(f"fetch failed after retries: {full}") from last


def default_text_fetcher(url: str, params: dict) -> str:
    return _fetch_bytes(url, params).decode("utf-8", errors="replace")


def default_json_fetcher(url: str, params: dict) -> dict:
    import json

    return json.loads(_fetch_bytes(url, params))
