"""Clip-to-AOI kernel (reference T3: etl/process.py:107-123
`arcpy.analysis.Clip` against the municipality AOI, configured as a bbox —
config/config.yaml:9-11, 135).

Exact rectangle clipping:
 - points: containment test,
 - lines: Liang-Barsky parametric clip (splits into clipped segments),
 - polygons: Sutherland-Hodgman against each rectangle edge (rectangles
   are convex, so S-H is exact).

Plus ray-cast point-in-polygon for arbitrary AOI polygons. All functions
work on GeoJSON coordinate nesting; the Spark operator applies the cheap
envelope prefilter first (functions/bbox.py) so these only run on
boundary-straddling rows.
"""

from __future__ import annotations


def point_in_bbox(p, bbox) -> bool:
    xmin, ymin, xmax, ymax = bbox
    return xmin <= p[0] <= xmax and ymin <= p[1] <= ymax


def clip_line_bbox(points, bbox):
    """Liang-Barsky clip of a polyline; returns list of clipped polylines
    (a line may exit and re-enter the box)."""
    xmin, ymin, xmax, ymax = bbox
    segments = []
    current = []
    for i in range(len(points) - 1):
        x0, y0 = points[i][0], points[i][1]
        x1, y1 = points[i + 1][0], points[i + 1][1]
        dx, dy = x1 - x0, y1 - y0
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in (
            (-dx, x0 - xmin),
            (dx, xmax - x0),
            (-dy, y0 - ymin),
            (dy, ymax - y0),
        ):
            if p == 0:
                if q < 0:
                    ok = False
                    break
            else:
                r = q / p
                if p < 0:
                    if r > t1:
                        ok = False
                        break
                    if r > t0:
                        t0 = r
                else:
                    if r < t0:
                        ok = False
                        break
                    if r < t1:
                        t1 = r
        if not ok:
            if current:
                segments.append(current)
                current = []
            continue
        a = [x0 + t0 * dx, y0 + t0 * dy]
        b = [x0 + t1 * dx, y0 + t1 * dy]
        if not current:
            current = [a, b]
        elif current[-1] == a:
            current.append(b)
        else:
            segments.append(current)
            current = [a, b]
        if t1 < 1.0:
            segments.append(current)
            current = []
    if current:
        segments.append(current)
    return [s for s in segments if len(s) >= 2]


def clip_ring_bbox(ring, bbox):
    """Sutherland-Hodgman clip of a polygon ring against a rectangle.
    Returns the clipped ring (closed) or [] when fully outside."""
    xmin, ymin, xmax, ymax = bbox

    def clip_edge(pts, inside, intersect):
        out = []
        n = len(pts)
        for i in range(n):
            cur, prev = pts[i], pts[i - 1]
            cur_in, prev_in = inside(cur), inside(prev)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
        return out

    def x_cross(p, c, x):
        t = (x - p[0]) / (c[0] - p[0])
        return [x, p[1] + t * (c[1] - p[1])]

    def y_cross(p, c, y):
        t = (y - p[1]) / (c[1] - p[1])
        return [p[0] + t * (c[0] - p[0]), y]

    pts = ring[:-1] if ring and ring[0] == ring[-1] else list(ring)
    for inside, intersect in (
        (lambda p: p[0] >= xmin, lambda p, c: x_cross(p, c, xmin)),
        (lambda p: p[0] <= xmax, lambda p, c: x_cross(p, c, xmax)),
        (lambda p: p[1] >= ymin, lambda p, c: y_cross(p, c, ymin)),
        (lambda p: p[1] <= ymax, lambda p, c: y_cross(p, c, ymax)),
    ):
        pts = clip_edge(pts, inside, intersect)
        if not pts:
            return []
    return pts + [pts[0]]


def clip_geometry_bbox(geom_type: str, coordinates, bbox):
    """Clip any GeoJSON geometry to a rectangle. Returns (geom_type,
    coordinates) of the clipped geometry or (None, None) when empty.
    Multi-part results stay in the corresponding Multi type."""
    if geom_type == "Point":
        return (geom_type, coordinates) if point_in_bbox(coordinates, bbox) else (None, None)
    if geom_type == "MultiPoint":
        kept = [p for p in coordinates if point_in_bbox(p, bbox)]
        return ("MultiPoint", kept) if kept else (None, None)
    if geom_type == "LineString":
        segs = clip_line_bbox(coordinates, bbox)
        if not segs:
            return (None, None)
        return ("LineString", segs[0]) if len(segs) == 1 else ("MultiLineString", segs)
    if geom_type == "MultiLineString":
        segs = [s for line in coordinates for s in clip_line_bbox(line, bbox)]
        return ("MultiLineString", segs) if segs else (None, None)
    if geom_type == "Polygon":
        rings = [clip_ring_bbox(r, bbox) for r in coordinates]
        rings = [r for r in rings if r]
        return ("Polygon", rings) if rings else (None, None)
    if geom_type == "MultiPolygon":
        polys = []
        for poly in coordinates:
            rings = [clip_ring_bbox(r, bbox) for r in poly]
            rings = [r for r in rings if r]
            if rings:
                polys.append(rings)
        return ("MultiPolygon", polys) if polys else (None, None)
    raise ValueError(f"unsupported geometry type: {geom_type}")


def point_in_polygon(p, ring) -> bool:
    """Ray-cast containment for an arbitrary (possibly concave) ring."""
    x, y = p[0], p[1]
    inside = False
    n = len(ring)
    j = n - 1
    for i in range(n):
        xi, yi = ring[i][0], ring[i][1]
        xj, yj = ring[j][0], ring[j][1]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside
