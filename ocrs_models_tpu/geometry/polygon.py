"""Polygon primitives: area, hulls, min-area rects, mitre offsets, clipping.

First-party replacements for the reference's GEOS usage:

- ``shrink_polygon`` replaces ``LinearRing.parallel_offset(dist, side,
  JOIN_STYLE.mitre)`` for mask generation (reference datasets/util.py:54-75).
  Like the reference, a polygon that degenerates when shrunk (GEOS: splits
  into a MultiLineString) yields an empty result.
- ``expand_quad`` replaces the outward parallel offset +
  ``minimum_rotated_rectangle`` used to undo mask shrinking at inference
  (reference postprocess.py:39-76).
- ``min_area_rect`` replaces ``cv2.minAreaRect``/``cv2.boxPoints``
  (rotating calipers over a convex hull).
- ``convex_intersection_area`` (Sutherland–Hodgman) replaces the
  Shapely intersection/union areas in box-match metrics
  (reference postprocess.py:138-142).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-9


def polygon_area(poly: np.ndarray) -> float:
    """Signed area via the shoelace formula (positive = counter-clockwise
    in a y-up frame; image coordinates are y-down, so visually-clockwise
    polygons have positive signed area here)."""
    p = np.asarray(poly, dtype=np.float64)
    if len(p) < 3:
        return 0.0
    x, y = p[:, 0], p[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Convex hull via Andrew's monotone chain. Returns CCW-ordered vertices
    (in the standard y-up sense)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # Lexicographic sort by (x, y).
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(points: np.ndarray) -> np.ndarray:
    """Minimum-area enclosing rotated rectangle of a point set.

    Returns a ``4x2`` array of corner coordinates (order: consecutive around
    the rectangle). Rotating-calipers over the convex hull: the optimal rect
    has one side collinear with a hull edge.
    """
    from . import native

    if native.available():
        return native.min_area_rect(points)
    pts = np.asarray(points, dtype=np.float64)
    hull = convex_hull(pts)
    if len(hull) == 0:
        return np.zeros((4, 2))
    if len(hull) == 1:
        return np.tile(hull[0], (4, 1))
    if len(hull) == 2:
        # Degenerate: zero-width rect along the segment.
        a, b = hull
        return np.array([a, b, b, a])

    edges = np.roll(hull, -1, axis=0) - hull
    lengths = np.hypot(edges[:, 0], edges[:, 1])
    keep = lengths > _EPS
    edges, lengths = edges[keep], lengths[keep]
    dirs = edges / lengths[:, None]
    # Deduplicate directions modulo pi.
    normals = np.stack([-dirs[:, 1], dirs[:, 0]], axis=1)

    # Project hull points onto each (dir, normal) frame: [E, H]
    proj_d = dirs @ hull.T
    proj_n = normals @ hull.T
    w = proj_d.max(axis=1) - proj_d.min(axis=1)
    h = proj_n.max(axis=1) - proj_n.min(axis=1)
    areas = w * h
    i = int(np.argmin(areas))
    d, n = dirs[i], normals[i]
    x0, x1 = proj_d[i].min(), proj_d[i].max()
    y0, y1 = proj_n[i].min(), proj_n[i].max()
    corners = np.array(
        [
            x0 * d + y0 * n,
            x1 * d + y0 * n,
            x1 * d + y1 * n,
            x0 * d + y1 * n,
        ]
    )
    return corners


def _offset_ring(poly: np.ndarray, dist: float) -> np.ndarray:
    """Offset a simple closed ring by ``dist`` with mitre joins.

    Positive ``dist`` offsets towards the interior (shrink); negative
    expands. Works for either vertex orientation by normalizing against the
    ring's signed area.
    """
    p = np.asarray(poly, dtype=np.float64)
    # Drop consecutive duplicate vertices (incl. an explicit closing vertex).
    keep = np.linalg.norm(p - np.roll(p, 1, axis=0), axis=1) > _EPS
    p = p[keep]
    if len(p) < 3:
        return np.zeros((0, 2))

    area = polygon_area(p)
    if abs(area) < _EPS:
        return np.zeros((0, 2))
    # Normalize: inward normal of edge (v_i -> v_{i+1}).
    # For a positively-oriented ring (shoelace > 0), the interior is to the
    # left of each edge; the left normal of direction (dx,dy) is (-dy,dx).
    sign = 1.0 if area > 0 else -1.0

    edges = np.roll(p, -1, axis=0) - p
    lengths = np.hypot(edges[:, 0], edges[:, 1])
    dirs = edges / lengths[:, None]
    inward = sign * np.stack([-dirs[:, 1], dirs[:, 0]], axis=1)

    # Each offset edge is the line through (p_i + dist*inward_i) with
    # direction dirs_i. New vertex i = intersection of offset edges (i-1, i).
    o_pts = p + dist * inward  # a point on each offset edge line
    out = np.empty_like(p)
    n = len(p)
    for i in range(n):
        j = (i - 1) % n
        d1, d2 = dirs[j], dirs[i]
        p1, p2 = o_pts[j], o_pts[i]
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-12:
            # Near-parallel edges: fall back to the translated vertex.
            out[i] = p[i] + dist * inward[i]
        else:
            t = ((p2[0] - p1[0]) * d2[1] - (p2[1] - p1[1]) * d2[0]) / denom
            out[i] = p1 + t * d1
    return out


def _ring_is_simple(poly: np.ndarray) -> bool:
    """True if no two non-adjacent edges of the ring intersect."""
    p = np.asarray(poly, dtype=np.float64)
    n = len(p)
    if n < 3:
        return False
    a = p
    b = np.roll(p, -1, axis=0)
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            if _segments_intersect(a[i], b[i], a[j], b[j]):
                return False
    return True


def _segments_intersect(p1, p2, p3, p4) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if v > _EPS:
            return 1
        if v < -_EPS:
            return -1
        return 0

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    return o1 != o2 and o3 != o4


def shrink_polygon(poly, dist: float) -> list[tuple[float, float]]:
    """Shrink a polygon so every edge moves inward by ``dist``.

    Returns an empty list when the polygon is too thin to survive the
    shrink — mirroring the reference, which drops polygons whose GEOS
    parallel offset splits into a MultiLineString (datasets/util.py:54-75).
    Degeneracy here = the offset ring flips orientation, loses almost all
    area, or self-intersects.
    """
    from . import native

    if native.available():
        out = native.polygon_offset(np.asarray(poly, dtype=np.float64), dist)
        return [(float(x), float(y)) for x, y in out]
    p = np.asarray(poly, dtype=np.float64)
    orig_area = polygon_area(p)
    out = _offset_ring(p, dist)
    if len(out) < 3:
        return []
    new_area = polygon_area(out)
    if new_area * orig_area <= 0:  # orientation flipped => collapsed
        return []
    if abs(new_area) >= abs(orig_area):  # shrink must lose area
        return []
    if not _ring_is_simple(out):
        return []
    return [(float(x), float(y)) for x, y in out]


def expand_polygon(poly, dist: float) -> np.ndarray:
    """Offset every edge of a polygon outward by ``dist`` (mitre joins)."""
    from . import native

    if native.available():
        return native.polygon_offset(np.asarray(poly, dtype=np.float64), -dist)
    return _offset_ring(np.asarray(poly, dtype=np.float64), -dist)


def expand_quad(quad: np.ndarray, dist: float) -> np.ndarray:
    """Enlarged copy of a quad: outward offset by ``dist``, then min-area
    rect (reference postprocess.py:39-65)."""
    quad = np.asarray(quad, dtype=np.float64)
    # A point-like quad can't be offset (reference: ring.length == 0 check).
    if np.ptp(quad, axis=0).max() < _EPS:
        return quad
    expanded = expand_polygon(quad, dist)
    if len(expanded) < 3:
        return quad
    return min_area_rect(expanded)


def expand_quads(quads: np.ndarray, dist: float) -> np.ndarray:
    """Expand each quad in an ``Nx4x2`` array (reference postprocess.py:68-76)."""
    quads = np.asarray(quads, dtype=np.float64)
    if len(quads) == 0:
        return quads.reshape(0, 4, 2)
    return np.stack([expand_quad(q, dist) for q in quads])


def _clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of polygon ``subject`` by convex ``clip``."""
    clip = np.asarray(clip, dtype=np.float64)
    if polygon_area(clip) < 0:
        clip = clip[::-1]
    output = list(np.asarray(subject, dtype=np.float64))
    n = len(clip)
    for i in range(n):
        if not output:
            return np.zeros((0, 2))
        a, b = clip[i], clip[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]

        def inside(p):
            return ex * (p[1] - a[1]) - ey * (p[0] - a[0]) >= -_EPS

        def intersect(p, q):
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            if abs(denom) < 1e-15:
                return q
            t = (ex * (a[1] - p[1]) - ey * (a[0] - p[0])) / denom
            return np.array([p[0] + t * dx, p[1] + t * dy])

        new_output = []
        m = len(output)
        for j in range(m):
            cur, nxt = output[j], output[(j + 1) % m]
            cur_in, nxt_in = inside(cur), inside(nxt)
            if cur_in:
                new_output.append(cur)
                if not nxt_in:
                    new_output.append(intersect(cur, nxt))
            elif nxt_in:
                new_output.append(intersect(cur, nxt))
        output = new_output
    return np.array(output) if output else np.zeros((0, 2))


def convex_intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    """Area of the intersection of two convex polygons."""
    from . import native

    if native.available():
        return native.convex_clip_area(a, b)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if polygon_area(a) < 0:
        a = a[::-1]
    inter = _clip_convex(a, b)
    if len(inter) < 3:
        return 0.0
    return abs(polygon_area(inter))
