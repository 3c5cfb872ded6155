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
