"""Pure-Python ESRI Shapefile reader (reference S13:
etl/stage_files.py:434-478 `import_shapefile`, which delegates to ArcPy).

Reads .shp geometry records (Point/PolyLine/Polygon/MultiPoint, plus
their Z/M variants with Z/M dropped), attributes from the .dbf sidecar
(dBase III) and the CRS from the .prj WKT (SWEREF99/WGS84 detection,
default 3006 when the sidecar is missing — the reference's assume-3006
behavior, etl/stage_files.py:449-460).

Implemented from the public ESRI Shapefile Technical Description (July
1998) — no third-party geo libraries in this environment.
"""

from __future__ import annotations

import os
import struct

_SHAPE_POINT = {1, 11, 21}
_SHAPE_POLYLINE = {3, 13, 23}
_SHAPE_POLYGON = {5, 15, 25}
_SHAPE_MULTIPOINT = {8, 18, 28}


def _read_points(buf, off, n):
    pts = []
    for i in range(n):
        x, y = struct.unpack_from("<2d", buf, off + i * 16)
        pts.append([x, y])
    return pts, off + n * 16


def _parts_to_lists(buf, off, num_parts, num_points):
    parts = list(struct.unpack_from(f"<{num_parts}i", buf, off))
    off += num_parts * 4
    pts, off = _read_points(buf, off, num_points)
    bounds = parts + [num_points]
    return [pts[bounds[i]: bounds[i + 1]] for i in range(num_parts)], off


def read_shp(path: str):
    """Yield (geom_type, coordinates) per record (null shapes skipped)."""
    with open(path, "rb") as f:
        buf = f.read()
    (file_code,) = struct.unpack_from(">i", buf, 0)
    if file_code != 9994:
        raise ValueError(f"not a shapefile: {path}")
    (file_len_words,) = struct.unpack_from(">i", buf, 24)
    end = file_len_words * 2
    off = 100
    while off < end:
        _recno, content_len = struct.unpack_from(">2i", buf, off)
        off += 8
        rec_end = off + content_len * 2
        (shape_type,) = struct.unpack_from("<i", buf, off)
        p = off + 4
        if shape_type == 0:  # null shape
            pass
        elif shape_type in _SHAPE_POINT:
            x, y = struct.unpack_from("<2d", buf, p)
            yield "Point", [x, y]
        elif shape_type in _SHAPE_MULTIPOINT:
            (n,) = struct.unpack_from("<i", buf, p + 32)
            pts, _ = _read_points(buf, p + 36, n)
            yield "MultiPoint", pts
        elif shape_type in _SHAPE_POLYLINE:
            num_parts, num_points = struct.unpack_from("<2i", buf, p + 32)
            lines, _ = _parts_to_lists(buf, p + 40, num_parts, num_points)
            if len(lines) == 1:
                yield "LineString", lines[0]
            else:
                yield "MultiLineString", lines
        elif shape_type in _SHAPE_POLYGON:
            num_parts, num_points = struct.unpack_from("<2i", buf, p + 32)
            rings, _ = _parts_to_lists(buf, p + 40, num_parts, num_points)
            yield _assemble_polygons(rings)
        off = rec_end


def _signed_area(ring) -> float:
    s = 0.0
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _point_in_ring(pt, ring) -> bool:
    x, y = pt
    inside = False
    for i in range(len(ring) - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _assemble_polygons(rings):
    """Shapefile rings -> Polygon or MultiPolygon.

    The shapefile spec stores outer rings CLOCKWISE (negative shoelace
    area) and holes counter-clockwise, with no nesting structure — a
    record holding two islands has two CW rings. Emitting all rings as
    one GeoJSON Polygon would turn the second island into a HOLE of the
    first (GeoJSON ring 2..n are interior), so multiple outers must
    become a MultiPolygon with holes assigned by containment."""
    outers = [r for r in rings if _signed_area(r) < 0]
    holes = [r for r in rings if _signed_area(r) >= 0]
    if len(outers) <= 1:
        ordered = (outers + holes) if outers else rings
        return "Polygon", ordered
    polys = [[o] for o in outers]
    for h in holes:
        for poly in polys:
            if h and _point_in_ring(h[0], poly[0]):
                poly.append(h)
                break
        else:
            polys[0].append(h)  # orphan hole: keep, attached to first
    return "MultiPolygon", polys


def read_dbf(path: str):
    """Yield one {field: str} dict per record (dBase III, deleted rows
    skipped; values returned as trimmed strings — schema-on-read).
    A missing sidecar yields nothing (finite — callers pair with
    zip_longest, see read_shapefile)."""
    if not os.path.exists(path):
        return
    with open(path, "rb") as f:
        buf = f.read()
    n_records = struct.unpack_from("<i", buf, 4)[0]
    header_size = struct.unpack_from("<h", buf, 8)[0]
    record_size = struct.unpack_from("<h", buf, 10)[0]
    fields = []
    off = 32
    while off < header_size - 1 and buf[off] != 0x0D:
        name = buf[off: off + 11].split(b"\x00")[0].decode("ascii", "replace")
        length = buf[off + 16]
        fields.append((name, length))
        off += 32
    off = header_size
    for _ in range(n_records):
        if off + record_size > len(buf):
            break
        deleted = buf[off] == 0x2A
        rec = {}
        p = off + 1
        for name, length in fields:
            raw = buf[p: p + length]
            rec[name] = raw.decode("cp1252", "replace").strip()
            p += length
        off += record_size
        if not deleted:
            yield rec


def detect_prj_epsg(path: str, default: int = 3006) -> int:
    """CRS from the .prj sidecar WKT; missing sidecar -> assume 3006
    (etl/stage_files.py:449-460)."""
    prj = os.path.splitext(path)[0] + ".prj"
    if not os.path.exists(prj):
        return default
    try:
        wkt = open(prj, encoding="utf-8", errors="replace").read().upper()
    except OSError:
        return default
    if "SWEREF99_TM" in wkt or "SWEREF99 TM" in wkt:
        return 3006
    if "SWEREF99_16_30" in wkt or "SWEREF99 16 30" in wkt:
        return 3010
    if "WGS_1984" in wkt or "WGS 84" in wkt or "GCS_WGS_1984" in wkt:
        return 4326
    import re

    m = re.search(r'AUTHORITY\["EPSG",\s*"?(\d+)"?\]\s*\]\s*$', wkt)
    return int(m.group(1)) if m else default


def read_shapefile(path: str):
    """Full shapefile -> yields (geom_type, coords, props, epsg)."""
    from itertools import zip_longest

    epsg = detect_prj_epsg(path)
    dbf = read_dbf(os.path.splitext(path)[0] + ".dbf")
    # zip_longest: a missing/short .dbf must not truncate geometry records
    for shape, props in zip_longest(read_shp(path), dbf):
        if shape is None:  # more attribute rows than shapes: ignore extras
            continue
        gt, coords = shape
        yield gt, coords, props or {}, epsg
