"""Polygon validity repair — ``GeoUtils.snapAndFixPolygon`` (:315-399)
capability without JTS: snap coordinates to a precision grid, untwist
self-intersecting rings into simple sub-rings, drop degenerates, and
re-nest exteriors/holes by containment.

The reference escalates through JTS's GeometryFixer / buffer(0); the
equivalent semantic here (for the even-odd fill rule the tile pipeline
uses) is the classic *untwist* decomposition: split a ring at each proper
self-intersection into the two loops meeting there, recursively, until
every ring is simple — a bowtie becomes two triangles, a figure-eight its
two lobes.  Pure numpy; intersection tests are vectorized per segment.
"""

from __future__ import annotations

import numpy as np

from .multipolygon import nest_rings

TILE_PRECISION = 16.0  # same grid the MVT encoder quantizes to (1/16 px)


def snap_ring(ring: np.ndarray, precision: float = TILE_PRECISION) -> np.ndarray:
    """Pointwise round to the precision grid, dropping the consecutive
    duplicates the rounding creates (``PointwiseRounder`` semantics)."""
    q = np.rint(np.asarray(ring, dtype=np.float64) * precision) / precision
    if len(q) > 1:
        keep = np.concatenate([[True], (np.diff(q, axis=0) != 0).any(axis=1)])
        q = q[keep]
    if len(q) < 3:
        return np.empty((0, 2))
    if (q[0] != q[-1]).any():
        q = np.vstack([q, q[:1]])
    return q if len(q) >= 4 else np.empty((0, 2))


def _first_self_intersection(ring: np.ndarray):
    """First proper intersection between non-adjacent segments of a closed
    ring -> (i, j, point) or None.  Vectorized: segment i against all j>i+1.
    """
    p = ring[:-1]
    d = np.diff(ring, axis=0)
    n = len(p)
    for i in range(n - 2):
        j0 = i + 2
        j1 = n if i > 0 else n - 1  # first and last segment are adjacent
        if j0 >= j1:
            continue
        q = p[j0:j1]
        e = d[j0:j1]
        r = d[i]
        denom = r[0] * e[:, 1] - r[1] * e[:, 0]
        w = q - p[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (w[:, 0] * e[:, 1] - w[:, 1] * e[:, 0]) / denom
            u = (w[:, 0] * r[1] - w[:, 1] * r[0]) / denom
        eps = 1e-12
        hit = (np.abs(denom) > eps) & (t > eps) & (t < 1 - eps) & (u > eps) & (u < 1 - eps)
        if hit.any():
            k = int(np.flatnonzero(hit)[0])
            t0 = float(t[k])
            pt = p[i] + t0 * r
            return i, j0 + k, pt
    return None


def untwist_ring(ring: np.ndarray, max_splits: int = 64) -> list[np.ndarray]:
    """Split a self-intersecting closed ring into simple closed rings."""
    stack = [np.asarray(ring, dtype=np.float64)]
    out: list[np.ndarray] = []
    budget = max_splits
    while stack:
        r = stack.pop()
        if len(r) < 4:
            continue
        hit = _first_self_intersection(r) if budget > 0 else None
        if hit is None:
            out.append(r)
            continue
        budget -= 1
        i, j, pt = hit
        # loop between the crossing: pt -> points i+1..j -> pt
        inner = np.vstack([[pt], r[i + 1 : j + 1], [pt]])
        # remainder: points 0..i -> pt -> points j+1..end
        outer = np.vstack([r[: i + 1], [pt], r[j + 1 :]])
        for piece in (inner, outer):
            # drop consecutive duplicates introduced by splitting at a vertex
            keep = np.concatenate([[True], (np.diff(piece, axis=0) != 0).any(axis=1)])
            piece = piece[keep]
            if len(piece) >= 4:
                stack.append(piece)
    return out


def _ring_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def repair_polygon(rings: list[np.ndarray], precision: float = TILE_PRECISION,
                   min_area: float = 0.0) -> list[list[np.ndarray]]:
    """Snap + untwist + re-nest: returns a valid multipolygon
    ``[[exterior, hole, ...], ...]`` (exteriors positive-area in y-down
    coords, holes negative — the ``OrientationFixer`` convention).  Simple
    valid input comes back unchanged (modulo snapping)."""
    simple: list[np.ndarray] = []
    for r in rings:
        s = snap_ring(r, precision)
        if len(s) == 0:
            continue
        for piece in untwist_ring(s):
            if abs(_ring_area(piece)) > min_area:
                simple.append(piece)
    if not simple:
        return []
    return nest_rings(simple)
