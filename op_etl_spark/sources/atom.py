"""Atom feed connector (reference S12: etl/download_atom.py).

Driver-side feed parse (guarded XML), then plan-time routing:
 - `rel="enclosure"` / zip-typed links -> file downloads into the
   landing dir (etl/download_atom.py:83-161);
 - filterable service links (WFS / OGC / ArcGIS REST detected by URL
   shape) -> re-dispatched to the matching connector with the global
   bbox (etl/download_atom.py:142-147, 164-235).

The return value is a routing plan, not data — the pipeline compiler
executes each route with the right connector. That keeps Atom what it
is in the reference: a dispatcher, not a data protocol.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from op_etl_spark.functions.xml_guards import safe_xml_parse

TextFetcher = Callable[[str, dict], str]


@dataclass(frozen=True)
class AtomRoute:
    kind: str  # 'file' | 'wfs' | 'ogc' | 'rest'
    url: str
    title: str


def detect_service_kind(url: str) -> str:
    """Filterable-service detection by URL shape
    (etl/download_atom.py:164-189)."""
    u = url.lower()
    if "service=wfs" in u or "/wfs" in u:
        return "wfs"
    if "/collections" in u or "/ogc/" in u or "oapif" in u:
        return "ogc"
    if "/featureserver" in u or "/mapserver" in u or "/rest/services" in u:
        return "rest"
    return "file"


def parse_feed(body: str, filter_services: bool = True) -> list[AtomRoute]:
    """Atom XML -> routing plan."""
    root = safe_xml_parse(body)
    if root is None:
        return []
    routes: list[AtomRoute] = []
    for entry in root.iter():
        if not entry.tag.endswith("entry"):
            continue
        title = next(
            (c.text for c in entry if c.tag.endswith("title") and c.text), ""
        )
        for link in entry:
            if not link.tag.endswith("link"):
                continue
            href = link.get("href")
            if not href:
                continue
            rel = link.get("rel", "")
            ltype = link.get("type", "")
            if rel == "enclosure" or "zip" in ltype:
                # an enclosure IS the download — never re-route it through
                # service detection (a zip served from /wfs/export/... is
                # still a zip); detection applies to the OTHER entry links
                routes.append(AtomRoute("file", href, title))
            elif filter_services:
                kind = detect_service_kind(href)
                if kind != "file":
                    routes.append(AtomRoute(kind, href, title))
    return routes


def read_atom_routes(text_fetcher: TextFetcher, feed_url: str,
                     filter_services: bool = True) -> list[AtomRoute]:
    body = text_fetcher(feed_url, {})
    return parse_feed(body, filter_services)
