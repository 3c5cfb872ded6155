"""Vectorized Hilbert curve index on a 2^order x 2^order grid.

Same capability as the reference's ``util/Hilbert.java:8-128`` (used for
PMTiles tile ordering and within-tile geometry ordering,
``geo/TileCoord.java:157-161``), implemented from the public Wikipedia
iterative rotate-and-accumulate algorithm, vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np


def xy_to_hilbert(order: int, x, y):
    """(x, y) -> distance d along the Hilbert curve of the given order."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << np.int64(max(order - 1, 0))
    if order == 0:
        return d
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def hilbert_to_xy(order: int, d):
    """Inverse of :func:`xy_to_hilbert`."""
    d = np.asarray(d, dtype=np.int64)
    t = d.copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    s = np.int64(1)
    top = np.int64(1) << np.int64(order)
    while s < top:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y
