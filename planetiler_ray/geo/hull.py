"""Convex hull kernel (ST_ConvexHull analogue) for the distributed hull
operator.

Distribution story: hulls are ASSOCIATIVE — hull(A ∪ B) = hull(hull(A) ∪
hull(B)) — so each batch emits its partial hull (tiny) and one final
per-group merge reproduces the exact hull of the full point set; the
shuffle moves only hull vertices, never the cloud.

Kernel shape: Andrew's monotone chain over a vectorized per-x min/max
prefilter.  Only the per-x extremes can be hull vertices, so the numpy
groupby-extreme pass (sort + run boundaries) cuts n points to at most
2 · |distinct x| candidates before the sequential chain walk — for
integer/gridded coordinates the walk is effectively O(domain), and for
continuous coordinates it degrades gracefully to the classic O(n log n).

Reference parity: the reference exposes hull-style geometry through JTS
(`geo/GeoUtils.java` convexHull call sites); this is a from-scratch
integer-exact implementation (cross products in int64) — not a port.
"""

from __future__ import annotations

import numpy as np


def _prefilter(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per distinct x keep only (min y, max y) — the only hull candidates."""
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    new = np.empty(len(xs), bool)
    new[0] = True
    new[1:] = xs[1:] != xs[:-1]
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:] - 1, len(xs) - 1]
    cx = np.concatenate([xs[starts], xs[ends]])
    cy = np.concatenate([ys[starts], ys[ends]])
    pts = np.unique(np.stack([cx, cy], axis=1), axis=0)
    return pts[:, 0], pts[:, 1]


def convex_hull(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Exact hull vertices, counter-clockwise, starting from the
    lexicographically smallest point.  Collinear boundary points are NOT
    vertices (strict turns only).  Returns an (m, 2) int64/float array.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    if len(x) == 0:
        return np.empty((0, 2), dtype=x.dtype)
    cx, cy = _prefilter(x, y)
    pts = list(zip(cx.tolist(), cy.tolist()))
    if len(pts) <= 2:
        return np.asarray(pts)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    ring = lower[:-1] + upper[:-1]
    return np.asarray(ring)


def hull_area2x(ring: np.ndarray) -> int:
    """Twice the signed shoelace area of the hull ring (int-exact for
    integer inputs at ANY magnitude — the cross terms are accumulated as
    Python ints, so coords near 2^31 cannot silently wrap the way int64
    numpy arithmetic would); positive for the CCW rings
    :func:`convex_hull` emits.  Hull rings are tiny (the hull of n points
    has O(log n) expected vertices), so the Python-int sum is not a hot
    loop."""
    if len(ring) < 3:
        return 0
    xs = [int(v) for v in ring[:, 0]]
    ys = [int(v) for v in ring[:, 1]]
    n = len(xs)
    return sum(xs[i] * ys[(i + 1) % n] - xs[(i + 1) % n] * ys[i]
               for i in range(n))
