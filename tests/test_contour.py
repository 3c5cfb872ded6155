"""Marching-squares contour kernel (geo/contour.py) unit tests."""

import numpy as np

from planetiler_ray.geo.contour import (
    CASE_SEGMENTS,
    block_cases,
    cells_to_segments,
    corner_scatter,
)


def _endpoint_multiset(x0, y0, x1, y1):
    pts = {}
    for x, y in zip(np.concatenate([x0, x1]), np.concatenate([y0, y1])):
        pts[(float(x), float(y))] = pts.get((float(x), float(y)), 0) + 1
    return pts


def test_single_cell_diamond():
    # one occupied cell -> 4 blocks, each a single-corner case -> a closed
    # 4-segment diamond through the block edge midpoints
    x0, y0, x1, y1 = cells_to_segments(np.array([3]), np.array([5]), 16)
    assert len(x0) == 4
    # closed loop: every endpoint appears exactly twice
    assert all(c == 2 for c in _endpoint_multiset(x0, y0, x1, y1).values())


def test_square_block_ring():
    # 2x2 occupied square -> 8 boundary segments, one interior case-15 block
    cx = np.array([1, 2, 1, 2])
    cy = np.array([1, 1, 2, 2])
    bx, by, cs = block_cases(cx, cy, 16)
    assert len(cs) == 9  # 3x3 blocks touched
    assert (cs == 15).sum() == 1  # the interior block
    x0, y0, x1, y1 = cells_to_segments(cx, cy, 16)
    assert len(x0) == 8
    assert all(c == 2 for c in _endpoint_multiset(x0, y0, x1, y1).values())


def test_saddle_emits_two_segments():
    # diagonal cells (0,0) and (1,1) share block (0,0) as TL+BR = case 10
    bx, by, cs = block_cases(np.array([0, 1]), np.array([0, 1]), 16)
    sad = cs[(bx == 0) & (by == 0)]
    assert list(sad) == [10]
    assert CASE_SEGMENTS[10] == 2


def test_corner_scatter_bits_sum_to_case():
    # scatter + SUM reproduces the brute-force dense stencil on a random grid
    rng = np.random.default_rng(42)
    n_side = 32
    occ = rng.random((n_side, n_side)) < 0.3
    cy, cx = np.nonzero(occ)
    bx, by, cs = block_cases(cx, cy, n_side)
    dense = np.zeros((n_side + 2, n_side + 2), bool)
    dense[1:-1, 1:-1] = occ
    for x, y, c in zip(bx, by, cs):
        tl = dense[y + 1, x + 1]
        tr = dense[y + 1, x + 2]
        br = dense[y + 2, x + 2]
        bl = dense[y + 2, x + 1]
        assert c == 8 * tl + 4 * tr + 2 * br + 1 * bl
        assert c > 0
    # every block with a nonzero case is present
    want = 0
    for y in range(-1, n_side):
        for x in range(-1, n_side):
            c = (8 * dense[y + 1, x + 1] + 4 * dense[y + 1, x + 2]
                 + 2 * dense[y + 2, x + 2] + 1 * dense[y + 2, x + 1])
            want += c > 0
    assert len(cs) == want


def test_segments_touch_occupied_boundary():
    # every emitted segment midpoint-edge lies on a block with a mixed case
    cx = np.array([4, 5, 6])
    cy = np.array([4, 4, 4])
    x0, y0, x1, y1 = cells_to_segments(cx, cy, 16)
    bx, by, cs = block_cases(cx, cy, 16)
    n_expected = int(CASE_SEGMENTS[cs].sum())
    assert len(x0) == n_expected
    # all endpoints at half-integer positions (edge midpoints)
    frac = np.concatenate([x0, y0, x1, y1]) % 0.5
    assert np.allclose(frac, 0.0)
