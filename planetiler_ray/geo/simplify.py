"""Line simplification + smoothing on raw numpy coordinate arrays.

Capabilities mirrored from the reference (semantics only, fresh
implementations from the published algorithms):

* Douglas-Peucker with *squared perpendicular distance* tolerance —
  ``geo/DouglasPeuckerSimplifier.java`` (the default simplify method,
  ``geo/SimplifyMethod.java``).
* Visvalingam-Whyatt with effective-*area* threshold —
  ``geo/VWSimplifier.java``.
* Midpoint / dual-midpoint (Chaikin) smoothing — ``geo/MidpointSmoother.java``,
  ``geo/DualMidpointSmoother.java``.

Geometries are ``(n, 2)`` float64 arrays. Rings pass ``is_ring=True`` so the
closing point is preserved and a ring is never collapsed below 4 points.
"""

from __future__ import annotations

import numpy as np

DOUGLAS_PEUCKER = "douglas_peucker"
VISVALINGAM_WHYATT = "visvalingam_whyatt"


def _seg_dist_sq(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared distance of each point to segment a-b (vectorized)."""
    ab = b - a
    denom = float(ab[0] * ab[0] + ab[1] * ab[1])
    ap = pts - a
    if denom == 0.0:
        return ap[:, 0] ** 2 + ap[:, 1] ** 2
    t = np.clip((ap[:, 0] * ab[0] + ap[:, 1] * ab[1]) / denom, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d = pts - proj
    return d[:, 0] ** 2 + d[:, 1] ** 2


def simplify_dp(coords: np.ndarray, tolerance: float, is_ring: bool = False) -> np.ndarray:
    """Douglas-Peucker simplification keeping endpoints; iterative stack."""
    n = len(coords)
    if n <= 2 or tolerance < 0:
        return coords
    tol_sq = tolerance * tolerance
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        seg = coords[i + 1 : j]
        d = _seg_dist_sq(seg, coords[i], coords[j])
        k = int(np.argmax(d))
        if d[k] > tol_sq:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    out = coords[keep]
    if is_ring and len(out) < 4:
        return coords  # refuse to collapse a ring
    return out


def _tri_area2(a, b, c):
    return abs((b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1]))


def simplify_vw(coords: np.ndarray, tolerance: float, is_ring: bool = False) -> np.ndarray:
    """Visvalingam-Whyatt: drop the min-effective-area vertex until all
    remaining vertices have doubled-triangle-area > tolerance^2 (matching the
    reference's convention that ``setPixelTolerance`` squares the tolerance,
    ``VWSimplifier.java``)."""
    n = len(coords)
    if n <= 2 or tolerance < 0:
        return coords
    threshold = tolerance * tolerance * 2.0
    min_pts = 4 if is_ring else 2
    prev = np.arange(-1, n - 1)
    nxt = np.arange(1, n + 1)
    alive = np.ones(n, dtype=bool)
    count = n

    def area(i):
        return _tri_area2(coords[prev[i]], coords[i], coords[nxt[i]])

    import heapq

    heap = [(area(i), i) for i in range(1, n - 1)]
    heapq.heapify(heap)
    stamp = {i: a for a, i in heap}
    while heap and count > min_pts:
        a, i = heapq.heappop(heap)
        if not alive[i] or stamp.get(i) != a:
            continue
        if a >= threshold:
            break
        alive[i] = False
        count -= 1
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                na = area(j)
                stamp[j] = na
                heapq.heappush(heap, (na, j))
    out = coords[alive]
    if is_ring and len(out) < 4:
        return coords
    return out


def simplify(coords: np.ndarray, tolerance: float, method: str = DOUGLAS_PEUCKER,
             is_ring: bool = False) -> np.ndarray:
    if method == DOUGLAS_PEUCKER:
        return simplify_dp(coords, tolerance, is_ring)
    if method == VISVALINGAM_WHYATT:
        return simplify_vw(coords, tolerance, is_ring)
    raise ValueError(f"unknown simplify method {method!r}")


def smooth_midpoint(coords: np.ndarray, is_ring: bool = False) -> np.ndarray:
    """Replace each segment with its midpoint (``MidpointSmoother.java``)."""
    mids = (coords[:-1] + coords[1:]) / 2.0
    if is_ring:
        return np.vstack([mids, mids[:1]])
    return np.vstack([coords[:1], mids, coords[-1:]])


def smooth_chaikin(coords: np.ndarray, is_ring: bool = False, a: float = 0.25) -> np.ndarray:
    """Chaikin corner cutting (``DualMidpointSmoother.java``): each segment
    contributes points at ratios a and 1-a."""
    p0, p1 = coords[:-1], coords[1:]
    q = p0 + (p1 - p0) * a
    r = p0 + (p1 - p0) * (1.0 - a)
    inter = np.empty((len(q) * 2, 2))
    inter[0::2], inter[1::2] = q, r
    if is_ring:
        return np.vstack([inter, inter[:1]])
    return np.vstack([coords[:1], inter, coords[-1:]])
