"""Guarded XML parsing (reference F12: etl/http_utils.py:443-475).

Rejects DOCTYPE/ENTITY declarations (entity-expansion injection) and
bodies exceeding the element cap; returns None on any parse problem
(continue-on-failure semantics)."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

MAX_XML_ELEMENTS = 10_000

# whole-body scan: a DOCTYPE pushed past any fixed-size head window (e.g.
# behind a long comment) must still be rejected
_DOCTYPE_RE = re.compile(r"<!(?:DOCTYPE|ENTITY)", re.IGNORECASE)


def safe_xml_parse(body: str):
    if body is None:
        return None
    if _DOCTYPE_RE.search(body):
        return None
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return None
    count = sum(1 for _ in root.iter())
    if count > MAX_XML_ELEMENTS:
        return None
    return root
