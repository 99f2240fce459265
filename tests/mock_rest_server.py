"""In-process mock of an ArcGIS REST FeatureServer layer, importable by
dotted path on executors (tests/ is on the workers' PYTHONPATH).

The mock EVALUATES the `where` clause server-side, exactly like a real
ArcGIS server — so a query whose filter was NOT pushed down would return
extra rows and fail the result assertions (Spark does not re-apply
filters the reader claimed to push). That makes result correctness a
genuine end-to-end proof of pushdown.
"""

from __future__ import annotations

import re

N_ROWS = 35

ROWS = [
    {
        "OBJECTID": i,
        "name": f"site_{i % 7}",
        "pop": (i * 13) % 1000,
        "x": 400000.0 + i * 1000.0,
        "y": 6500000.0 + i * 500.0,
    }
    for i in range(1, N_ROWS + 1)
]

FIELDS = [
    {"name": "OBJECTID", "type": "esriFieldTypeOID"},
    {"name": "name", "type": "esriFieldTypeString"},
    {"name": "pop", "type": "esriFieldTypeInteger"},
]


def _eval_where(where: str, row: dict) -> bool:
    expr = where or "1=1"
    expr = expr.replace("1=1", "True")
    expr = re.sub(r"\bIS NOT NULL\b", "is not None", expr)
    expr = re.sub(r"\bIS NULL\b", "is None", expr)
    expr = re.sub(r"(?<![<>=!])=(?!=)", "==", expr)
    expr = re.sub(r"\bAND\b", "and", expr)
    expr = re.sub(r"\bOR\b", "or", expr)
    expr = re.sub(r"\bIN\b", "in", expr)
    return bool(eval(expr, {"__builtins__": {}}, dict(row)))  # noqa: S307 - test-only


def fetch_truncating(url: str, params: dict) -> dict:
    """Like `fetch` but emulates a server whose maxRecordCount is 10:
    query responses are truncated to 10 rows past resultOffset with
    exceededTransferLimit=true — the reader must re-page within a batch."""
    doc = fetch(url, params)
    if "features" not in doc:
        return doc
    offset = int(params.get("resultOffset", 0))
    window = doc["features"][offset : offset + 10]
    truncated = offset + 10 < len(doc["features"])
    out = dict(doc, features=window)
    if truncated:
        out["exceededTransferLimit"] = True
    return out


def fetch(url: str, params: dict) -> dict:
    if not url.endswith("/query"):
        return {
            "id": 0,
            "name": "mock_layer",
            "objectIdFieldName": "OBJECTID",
            "fields": FIELDS,
        }
    matched = [r for r in ROWS if _eval_where(params.get("where", "1=1"), r)]
    if str(params.get("returnIdsOnly")).lower() == "true":
        return {
            "objectIdFieldName": "OBJECTID",
            "objectIds": [r["OBJECTID"] for r in matched],
        }
    return {
        "spatialReference": {"wkid": 3006},
        "features": [
            {
                "attributes": {k: r[k] for k in ("OBJECTID", "name", "pop")},
                "geometry": {"x": r["x"], "y": r["y"]},
            }
            for r in matched
        ],
    }
