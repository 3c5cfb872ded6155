"""Convex hull kernel properties (geo/hull.py) — pure numpy, no Ray."""

import numpy as np
import pytest

from planetiler_ray.geo.hull import convex_hull, hull_area2x


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _inside_or_on(ring, p):
    """Point inside or on the CCW convex ring: every edge cross >= 0."""
    n = len(ring)
    return all(
        _cross(ring[i], ring[(i + 1) % n], p) >= 0 for i in range(n)
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_hull_properties_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 200))
    x = rng.integers(-50, 50, n)
    y = rng.integers(-50, 50, n)
    ring = convex_hull(x, y)
    pts = set(zip(x.tolist(), y.tolist()))
    # hull vertices are input points
    assert all((int(a), int(b)) in pts for a, b in ring)
    # strictly convex CCW (no collinear vertices kept)
    m = len(ring)
    if m >= 3:
        for i in range(m):
            assert _cross(ring[i], ring[(i + 1) % m],
                          ring[(i + 2) % m]) > 0
    # every input point inside or on the ring
    for p in pts:
        assert _inside_or_on(ring, p)


def test_hull_merge_associative():
    rng = np.random.default_rng(7)
    x = rng.integers(-1000, 1000, 500)
    y = rng.integers(-1000, 1000, 500)
    whole = convex_hull(x, y)
    # split into 3 parts, hull each, merge the partial hull vertices
    parts = np.array_split(np.arange(500), 3)
    vx, vy = [], []
    for idx in parts:
        r = convex_hull(x[idx], y[idx])
        vx.append(r[:, 0])
        vy.append(r[:, 1])
    merged = convex_hull(np.concatenate(vx), np.concatenate(vy))
    assert np.array_equal(np.sort(whole, axis=0), np.sort(merged, axis=0))
    assert hull_area2x(whole) == hull_area2x(merged)


def test_parabola_planted_hull():
    K = 6
    t = np.arange(-K, K + 1)
    ring_x, ring_y = t, t * t
    u = np.arange(-(K - 1), K)
    int_x, int_y = u, u * u + 1
    x = np.concatenate([ring_x, int_x])
    y = np.concatenate([ring_y, int_y])
    ring = convex_hull(x, y)
    # hull is exactly the parabola points
    assert len(ring) == 2 * K + 1
    assert set(zip(ring[:, 0].tolist(), ring[:, 1].tolist())) == set(
        zip(ring_x.tolist(), ring_y.tolist()))
    # shoelace matches the closed form: |sum_t t(t+1)| + 2K^3 pieces
    open_sum = int(sum(t0 * (t0 + 1) ** 2 - (t0 + 1) * t0 ** 2
                       for t0 in range(-K, K)))
    assert abs(hull_area2x(ring)) == abs(open_sum + 2 * K ** 3)


def test_degenerate_inputs():
    assert len(convex_hull(np.array([]), np.array([]))) == 0
    one = convex_hull(np.array([3]), np.array([4]))
    assert one.tolist() == [[3, 4]]
    # collinear points: hull collapses to the 2 extremes
    x = np.arange(10)
    ring = convex_hull(x, 2 * x)
    assert sorted(ring.tolist()) == [[0, 0], [9, 18]]
    # duplicates
    ring = convex_hull(np.array([0, 0, 1, 1]), np.array([0, 0, 1, 1]))
    assert sorted(ring.tolist()) == [[0, 0], [1, 1]]
