"""Minimal WKB codec for the six GeoJSON geometry types.

The engine's canonical staged geometry representation is WKB bytes in a
BinaryType column plus a `geom_type` string and `crs` int column
(SURVEY.md §1.2). This codec converts between WKB and GeoJSON-style
nested coordinate lists (what the parsers produce; reference:
etl/stage_files.py:18-29 works on the same nesting).

Little-endian, 2D, no SRID embedding (CRS rides in its own column where
it is filterable — a deliberate departure from EWKB).
"""

from __future__ import annotations

import struct

_TYPE_CODES = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
}
_CODE_TYPES = {v: k for k, v in _TYPE_CODES.items()}


def _pack_point(coords) -> bytes:
    return struct.pack("<2d", float(coords[0]), float(coords[1]))


def _pack_ring(ring) -> bytes:
    out = [struct.pack("<I", len(ring))]
    out.extend(struct.pack("<2d", float(p[0]), float(p[1])) for p in ring)
    return b"".join(out)


def wkb_dumps(geom_type: str, coordinates) -> bytes:
    """GeoJSON (type, coordinates) -> WKB bytes."""
    code = _TYPE_CODES[geom_type]
    head = struct.pack("<BI", 1, code)
    if geom_type == "Point":
        return head + _pack_point(coordinates)
    if geom_type == "LineString":
        return head + _pack_ring(coordinates)
    if geom_type == "Polygon":
        body = [struct.pack("<I", len(coordinates))]
        body.extend(_pack_ring(r) for r in coordinates)
        return head + b"".join(body)
    if geom_type == "MultiPoint":
        body = [struct.pack("<I", len(coordinates))]
        body.extend(wkb_dumps("Point", p) for p in coordinates)
        return head + b"".join(body)
    if geom_type == "MultiLineString":
        body = [struct.pack("<I", len(coordinates))]
        body.extend(wkb_dumps("LineString", ls) for ls in coordinates)
        return head + b"".join(body)
    if geom_type == "MultiPolygon":
        body = [struct.pack("<I", len(coordinates))]
        body.extend(wkb_dumps("Polygon", pg) for pg in coordinates)
        return head + b"".join(body)
    raise ValueError(f"unsupported geometry type: {geom_type}")


def _read_point(buf, off):
    x, y = struct.unpack_from("<2d", buf, off)
    return [x, y], off + 16


def _read_ring(buf, off):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    if n > (len(buf) - off) // 16:
        # declared count exceeds what the buffer can hold: malformed —
        # fail fast instead of looping to the buffer end
        raise ValueError(f"malformed WKB: ring declares {n} points")
    pts = []
    for _ in range(n):
        p, off = _read_point(buf, off)
        pts.append(p)
    return pts, off


def _loads_at(buf: bytes, off: int):
    byte_order, code = struct.unpack_from("<BI", buf, off)
    if byte_order != 1:
        raise ValueError("big-endian WKB not supported")
    off += 5
    gt = _CODE_TYPES[code]
    if gt == "Point":
        coords, off = _read_point(buf, off)
    elif gt == "LineString":
        coords, off = _read_ring(buf, off)
    elif gt == "Polygon":
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        coords = []
        for _ in range(n):
            r, off = _read_ring(buf, off)
            coords.append(r)
    else:  # multi-types: n nested full WKB geometries
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        coords = []
        for _ in range(n):
            (_, sub), _ign = struct.unpack_from("<BI", buf, off), None
            sub_gt, sub_coords, off = _loads_at(buf, off)
            coords.append(sub_coords)
    return gt, coords, off


def wkb_loads(buf: bytes):
    """WKB bytes -> (geom_type, GeoJSON-style coordinates).

    Malformed input always raises ValueError (never struct.error /
    KeyError), so connector-level `except (ValueError, ...)` guards see a
    single failure type from arbitrary untrusted blobs (GPKG, WKB cols)."""
    try:
        gt, coords, _ = _loads_at(buf, 0)
    except (struct.error, KeyError, IndexError, TypeError) as exc:
        raise ValueError(f"malformed WKB: {exc}") from exc
    return gt, coords


def envelope(geom_type: str, coordinates):
    """(xmin, ymin, xmax, ymax) of any GeoJSON coordinate nesting."""
    xs, ys = [], []

    def walk(c):
        if isinstance(c[0], (int, float)):
            xs.append(float(c[0]))
            ys.append(float(c[1]))
        else:
            for sub in c:
                walk(sub)

    walk(coordinates)
    return min(xs), min(ys), max(xs), max(ys)


def map_coords(geom_type: str, coordinates, fn):
    """Apply fn([x,y])->[x,y] over every coordinate pair, preserving nesting."""
    if isinstance(coordinates[0], (int, float)):
        return fn(coordinates)
    return [map_coords(geom_type, c, fn) for c in coordinates]
