"""Geometry constructors/derivations — ``FeatureCollector`` geometry-accessor
analogues (``geo/WithGeometry.java:20-304``, ``FeatureCollector.java:96-325``):
centroid, point-on-surface, line midpoint / point-along-line, partial line,
area/length in world and meter units.  Pure numpy on coordinate arrays.
"""

from __future__ import annotations

import numpy as np

WORLD_CIRCUMFERENCE_METERS = 40_075_016.686


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def polygon_area(rings: list[np.ndarray]) -> float:
    """|exterior| - |holes| (unsigned)."""
    if not rings:
        return 0.0
    a = abs(ring_area(rings[0]))
    for r in rings[1:]:
        a -= abs(ring_area(r))
    return a


def line_length(coords: np.ndarray) -> float:
    seg = np.diff(coords, axis=0)
    return float(np.hypot(seg[:, 0], seg[:, 1]).sum())


def centroid(kind: str, data) -> np.ndarray:
    """Geometric centroid (area/length/point weighted like JTS)."""
    if kind == "point":
        return np.asarray(data, dtype=np.float64)
    if kind == "linestring":
        c = np.asarray(data, dtype=np.float64)
        seg = np.diff(c, axis=0)
        w = np.hypot(seg[:, 0], seg[:, 1])
        if w.sum() == 0:
            return c.mean(axis=0)
        mids = (c[:-1] + c[1:]) / 2
        return (mids * w[:, None]).sum(axis=0) / w.sum()
    if kind == "polygon":
        rings = data
        cx = cy = aa = 0.0
        for k, ring in enumerate(rings):
            x, y = ring[:-1, 0], ring[:-1, 1]
            x1, y1 = ring[1:, 0], ring[1:, 1]
            cross = x * y1 - x1 * y
            a = cross.sum() / 2.0
            if a == 0:
                continue
            sign = 1.0 if k == 0 else -1.0 if (a > 0) == (aa > 0) else 1.0
            cx += sign * float(((x + x1) * cross).sum() / 6.0)
            cy += sign * float(((y + y1) * cross).sum() / 6.0)
            aa += sign * a
        if aa == 0:
            return rings[0][:-1].mean(axis=0)
        return np.array([cx / aa, cy / aa])
    raise ValueError(kind)


def point_on_surface(rings: list[np.ndarray]) -> np.ndarray:
    """A point guaranteed inside the polygon (JTS interior-point idea: widest
    inside interval on the horizontal line through the bbox middle, using the
    even-odd crossing parity)."""
    ext = rings[0]
    yc = (ext[:, 1].min() + ext[:, 1].max()) / 2.0
    xs: list[float] = []
    for ring in rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        m = (y0 <= yc) != (y1 <= yc)
        if m.any():
            t = (yc - y0[m]) / (y1[m] - y0[m])
            xs.extend((x0[m] + t * (x1[m] - x0[m])).tolist())
    if len(xs) < 2:
        return centroid("polygon", rings)
    xs.sort()
    widths = [(xs[i + 1] - xs[i], i) for i in range(0, len(xs) - 1, 2)]
    w, i = max(widths)
    return np.array([(xs[i] + xs[i + 1]) / 2.0, yc])


def line_midpoint(coords: np.ndarray) -> np.ndarray:
    return point_along_line(coords, 0.5)


def point_along_line(coords: np.ndarray, ratio: float) -> np.ndarray:
    """Point at ``ratio`` of the line's length (FeatureCollector
    ``pointAlongLine``)."""
    c = np.asarray(coords, dtype=np.float64)
    seg = np.diff(c, axis=0)
    w = np.hypot(seg[:, 0], seg[:, 1])
    total = w.sum()
    if total == 0:
        return c[0]
    target = np.clip(ratio, 0.0, 1.0) * total
    cum = np.concatenate([[0.0], np.cumsum(w)])
    i = int(np.searchsorted(cum, target, side="right") - 1)
    i = min(i, len(seg) - 1)
    t = (target - cum[i]) / w[i] if w[i] > 0 else 0.0
    return c[i] + t * seg[i]


def partial_line(coords: np.ndarray, start: float, end: float) -> np.ndarray:
    """Sub-line between length ratios [start, end] (``partialLine``)."""
    c = np.asarray(coords, dtype=np.float64)
    seg = np.diff(c, axis=0)
    w = np.hypot(seg[:, 0], seg[:, 1])
    total = w.sum()
    if total == 0 or end <= start:
        return c[:1]
    a, b = start * total, end * total
    cum = np.concatenate([[0.0], np.cumsum(w)])
    pts = [point_along_line(c, start)]
    for i in range(len(c)):
        if a < cum[i] < b:
            pts.append(c[i])
    pts.append(point_along_line(c, end))
    return np.array(pts)


def world_area_to_square_meters(area_world: float, lat_deg: float = 0.0) -> float:
    """Approximate m² of a world-unit area at the given latitude (mercator
    scale factor cos(lat); the reference's areaMeters uses the same
    first-order correction)."""
    scale = WORLD_CIRCUMFERENCE_METERS * np.cos(np.radians(lat_deg))
    return area_world * scale * scale


def world_length_to_meters(len_world: float, lat_deg: float = 0.0) -> float:
    return len_world * WORLD_CIRCUMFERENCE_METERS * np.cos(np.radians(lat_deg))


# ------------------------------------------- convexity / innermost point --

def is_convex_ring(ring: np.ndarray, threshold: float = 1e-3,
                   min_points_to_check: int = 10) -> bool:
    """Convexity test with rounding/concavity tolerance — the reference's
    ``GeoUtils.isConvex`` semantics (``GeoUtils.java:497-566``): track the
    largest positive and negative cross-product magnitude over sequential
    point triples (repeated points skipped, wrap-around included); convex
    iff the smaller side stays below ``threshold`` x the larger.
    """
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) > 1 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    # drop consecutive repeats
    if len(pts) > 1:
        keep = np.concatenate([[True], (np.diff(pts, axis=0) != 0).any(axis=1)])
        pts = pts[keep]
    n = len(pts)
    if n < 3:
        return False
    d = np.diff(np.vstack([pts, pts[:2]]), axis=0)  # edge vectors, wrapped
    z = d[:-1, 0] * d[1:, 1] - d[:-1, 1] * d[1:, 0]
    neg_z = pos_z = 1e-20
    checked = 0
    for zz in z:
        az = abs(zz)
        extended = False
        if zz < 0 and az > neg_z:
            neg_z, extended = az, True
        elif zz > 0 and az > pos_z:
            pos_z, extended = az, True
        checked += 1
        if checked >= min_points_to_check and (extended or checked == min_points_to_check):
            ratio = neg_z / pos_z if neg_z < pos_z else pos_z / neg_z
            if ratio > threshold:
                return False
    ratio = neg_z / pos_z if neg_z < pos_z else pos_z / neg_z
    return ratio <= threshold


def centroid_if_convex(rings: list[np.ndarray]) -> np.ndarray:
    """Centroid when the polygon is convex (no holes, convex exterior),
    else point-on-surface — ``WithGeometry.centroidIfConvex`` (:201-203)."""
    if len(rings) == 1 and is_convex_ring(rings[0]):
        return centroid("polygon", rings)
    return point_on_surface(rings)


def _dist_to_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Signed distance of points to the polygon boundary (+ inside)."""
    from .pip import points_in_polygon

    d2 = np.full(len(px), np.inf)
    for ring in rings:
        ax, ay = ring[:-1, 0], ring[:-1, 1]
        bx, by = ring[1:, 0], ring[1:, 1]
        ex, ey = bx - ax, by - ay
        ln2 = ex * ex + ey * ey
        ln2[ln2 == 0] = 1.0
        # (n_pts, n_edges) projection clamp
        t = ((px[:, None] - ax) * ex + (py[:, None] - ay) * ey) / ln2
        t = np.clip(t, 0.0, 1.0)
        cx = ax + t * ex
        cy = ay + t * ey
        dd = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
        d2 = np.minimum(d2, dd.min(axis=1))
    d = np.sqrt(d2)
    inside = points_in_polygon(px, py, rings)
    return np.where(inside, d, -d)


def innermost_point(rings: list[np.ndarray], tolerance: float = 0.1) -> np.ndarray:
    """Pole of inaccessibility — ``WithGeometry.innermostPoint(tolerance)``
    (:144-151): center of the maximum inscribed circle to a precision of
    ``sqrt(area) * tolerance``, via the public Mapbox *polylabel*
    quadtree-refinement algorithm (batched numpy distance evaluations).
    """
    import heapq

    ext = np.asarray(rings[0], dtype=np.float64)
    minx, miny = ext[:, 0].min(), ext[:, 1].min()
    maxx, maxy = ext[:, 0].max(), ext[:, 1].max()
    precision = max(np.sqrt(max(polygon_area(rings), 0.0)) * tolerance, 1e-12)
    size = min(maxx - minx, maxy - miny)
    if size == 0:
        return np.array([(minx + maxx) / 2.0, (miny + maxy) / 2.0])
    h = size / 2.0
    # seed cells over the bbox
    cxs, cys, hs = [], [], []
    x = minx
    while x < maxx:
        y = miny
        while y < maxy:
            cxs.append(x + h)
            cys.append(y + h)
            hs.append(h)
            y += size
        x += size
    cx = np.array(cxs)
    cy = np.array(cys)
    hh = np.array(hs)
    d = _dist_to_rings(cx, cy, rings)
    r2 = np.sqrt(2.0)
    heap = [(-(d[i] + hh[i] * r2), d[i], cx[i], cy[i], hh[i]) for i in range(len(cx))]
    heapq.heapify(heap)
    # best candidate starts at the centroid / bbox center
    c0 = centroid("polygon", rings)
    bd = float(_dist_to_rings(np.array([c0[0]]), np.array([c0[1]]), rings)[0])
    best = (bd, float(c0[0]), float(c0[1]))
    while heap:
        neg_pot, dist, x, y, hcell = heapq.heappop(heap)
        if -neg_pot - best[0] <= precision:
            break
        if dist > best[0]:
            best = (dist, x, y)
        q = hcell / 2.0
        nx = np.array([x - q, x + q, x - q, x + q])
        ny = np.array([y - q, y - q, y + q, y + q])
        nd = _dist_to_rings(nx, ny, rings)
        for i in range(4):
            pot = nd[i] + q * r2
            if pot - best[0] > precision:
                heapq.heappush(heap, (-pot, nd[i], nx[i], ny[i], q))
    return np.array([best[1], best[2]])


# ----------------------------------------------- spherical ring area --

AVERAGE_WORLD_RADIUS_METERS = 6_371_008.8
_AREA_FACTOR = AVERAGE_WORLD_RADIUS_METERS * AVERAGE_WORLD_RADIUS_METERS / 2


def ring_area_meters(lon_deg: np.ndarray, lat_deg: np.ndarray) -> float:
    """Spherical ring area in m² — operand-for-operand the reference's
    ``GeoUtils.ringAreaMeters`` (``GeoUtils.java:665-675``, the turf.js
    formula): sum over edges of (x[i+2] - x[i]) * sin(y[i+1]) with the
    reference's exact wrap-around indexing, times R²/2.  The ring arrays
    INCLUDE the closing point (numEdges = len - 1)."""
    x = np.radians(np.asarray(lon_deg, np.float64))
    y = np.radians(np.asarray(lat_deg, np.float64))
    n = len(x) - 1
    if n < 3:
        return 0.0
    total = 0.0
    for i in range(n):
        mid = 0 if i + 1 == n else i + 1
        upper = (i + 2) % n if i + 2 >= n else i + 2
        total += (x[upper] - x[i]) * np.sin(y[mid])
    return abs(total) * _AREA_FACTOR


def bbox_area_meters_vec(lon_min_deg, lat_min_deg, lon_max_deg,
                         lat_max_deg) -> np.ndarray:
    """Vectorized :func:`ring_area_meters` for axis-aligned boxes (ring
    [(x1,y1),(x2,y1),(x2,y2),(x1,y2),(x1,y1)]): the reference's four
    edge terms written out in the SAME left-associated order as the SQL
    twin, so floor(area) agrees bitwise."""
    x1 = np.radians(np.asarray(lon_min_deg, np.float64))
    x2 = np.radians(np.asarray(lon_max_deg, np.float64))
    ry1 = np.radians(np.asarray(lat_min_deg, np.float64))
    ry2 = np.radians(np.asarray(lat_max_deg, np.float64))
    t = ((x2 - x1) * np.sin(ry1) + (x1 - x2) * np.sin(ry2)
         + (x1 - x2) * np.sin(ry2) + (x2 - x1) * np.sin(ry1))
    return np.abs(t) * _AREA_FACTOR
