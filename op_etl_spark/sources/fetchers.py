"""Default HTTP fetchers shared by the live connectors.

Retry policy mirrors the reference (etl/http_utils.py:170-179: 5 tries,
exponential backoff from 0.5s, retry on 429/500/502/503/504), and like
the reference (respect_retry_after_header=True, etl/http_utils.py:178) a
`Retry-After` header on a retryable status overrides the computed
backoff, capped at 30s — a rate-limited portal names its own pace
instead of being hammer-retried. Redirects are blocked by default
(etl/http_utils.py:49 DEFAULT_FOLLOW_REDIRECTS = False, 249-252: portal
sign-in flows answer 302 to an HTML login page, which would otherwise be
parsed as data). Response size capped like etl/http_utils.py:39
(100 MB). Tests never use the module-level fetchers directly — every
connector takes an injectable fetcher — but `fetch_bytes` itself is
testable via its `sleeper` hook.
"""

from __future__ import annotations

import email.utils
import time
import urllib.error
import urllib.parse
import urllib.request

MAX_RESPONSE_BYTES = 100 * 1024 * 1024  # etl/http_utils.py:39
RETRY_AFTER_CAP_SECONDS = 30.0

_RETRY_CODES = (429, 500, 502, 503, 504)


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: N802
        return None  # surface 3xx as HTTPError instead of following


_NO_REDIRECT_OPENER = urllib.request.build_opener(_NoRedirect)


def parse_retry_after(value: str | None) -> float | None:
    """Seconds to wait from a Retry-After header: either delta-seconds or
    an HTTP-date (RFC 9110 §10.2.3). Capped at RETRY_AFTER_CAP_SECONDS;
    unparseable values are ignored (None)."""
    if not value:
        return None
    value = value.strip()
    secs: float | None = None
    if value.isdigit():
        secs = float(value)
    else:
        try:
            when = email.utils.parsedate_to_datetime(value)
        except (TypeError, ValueError):
            return None
        if when is not None:
            secs = when.timestamp() - time.time()
    if secs is None:
        return None
    return max(0.0, min(secs, RETRY_AFTER_CAP_SECONDS))


def fetch_bytes(
    url: str,
    params: dict,
    *,
    follow_redirects: bool = False,
    sleeper=time.sleep,
) -> bytes:
    qs = urllib.parse.urlencode(params)
    full = f"{url}?{qs}" if qs else url
    opener = urllib.request.urlopen if follow_redirects else _NO_REDIRECT_OPENER.open
    last: Exception | None = None
    tries = 5
    for attempt in range(tries):
        retry_after: float | None = None
        try:
            with opener(full, timeout=60) as resp:
                body = resp.read(MAX_RESPONSE_BYTES + 1)
                if len(body) > MAX_RESPONSE_BYTES:
                    raise RuntimeError(f"response exceeds size cap: {full}")
                return body
        except urllib.error.HTTPError as e:
            if 300 <= e.code < 400:
                raise RuntimeError(
                    f"redirect blocked (follow_redirects=False): {full} -> "
                    f"{e.headers.get('Location')}"
                ) from e
            last = e
            if e.code not in _RETRY_CODES:
                raise
            retry_after = parse_retry_after(e.headers.get("Retry-After"))
        except (urllib.error.URLError, TimeoutError) as e:
            last = e
        if attempt < tries - 1:  # no pointless sleep after the final try
            backoff = 0.5 * (2 ** attempt)
            sleeper(retry_after if retry_after is not None else backoff)
    raise RuntimeError(f"fetch failed after retries: {full}") from last


# back-compat alias (older call sites / tests)
_fetch_bytes = fetch_bytes


def default_text_fetcher(url: str, params: dict) -> str:
    return fetch_bytes(url, params).decode("utf-8", errors="replace")


def default_json_fetcher(url: str, params: dict) -> dict:
    import json

    return json.loads(fetch_bytes(url, params))
