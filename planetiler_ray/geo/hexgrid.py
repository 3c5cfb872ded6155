"""Hierarchical hexagonal cell index over the web-mercator plane (H3-style).

Provides the H3-shaped capability surface (hex binning of points, resolution
hierarchy, neighbor rings) used by the spatial-keying stage.  Cells are
pointy-top hexagons in axial coordinates on the world unit square; resolution
``r`` hexagons have circumradius ``R = K / 2^r`` (K chosen so res 0 covers the
world with a handful of cells).  Unlike true H3 there is no icosahedron — ids
are NOT H3-compatible (the H3 base-cell tables are proprietary-sized data we
do not vendor); the hierarchy is aperture-4 by construction.

Cell id layout: ``[res:4][q+2^29:30][r+2^29:30]`` in an int64 — deterministic,
sortable within a resolution, and cheap to compute vectorized.
"""

from __future__ import annotations

import numpy as np

K0 = 0.5  # res-0 circumradius in world units
_BIAS = np.int64(1) << np.int64(29)


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Round fractional axial coords to the nearest hex (cube rounding)."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.rint(xf)
    ry = np.rint(yf)
    rz = np.rint(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_cell(world_x, world_y, res: int):
    """World unit-square coordinates -> hex cell id at resolution res."""
    size = K0 / (1 << res)
    x = np.asarray(world_x, dtype=np.float64)
    y = np.asarray(world_y, dtype=np.float64)
    qf = (np.sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / size
    rf = (2.0 / 3.0 * y) / size
    q, r = _axial_round(qf, rf)
    return (np.int64(res) << np.int64(60)) | ((q + _BIAS) << np.int64(30)) | (r + _BIAS)


def hex_decode(cid):
    cid = np.asarray(cid, dtype=np.int64)
    res = (cid >> np.int64(60)) & np.int64(0xF)
    q = ((cid >> np.int64(30)) & np.int64((1 << 30) - 1)) - _BIAS
    r = (cid & np.int64((1 << 30) - 1)) - _BIAS
    return res, q, r


def hex_center(cid):
    """Cell id -> world (x, y) of the hex center."""
    res, q, r = hex_decode(cid)
    size = K0 / np.power(2.0, res.astype(np.float64))
    x = size * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    y = size * (1.5 * r)
    return x, y


def hex_parent(cid, parent_res: int):
    """Coarser-resolution cell containing this cell's center."""
    x, y = hex_center(cid)
    return hex_cell(x, y, parent_res)


def hex_ring1(cid):
    """The 6 neighbors of a cell (axial direction vectors)."""
    res, q, r = hex_decode(cid)
    dirs = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64)
    q = q[..., None] + dirs[:, 0]
    r = r[..., None] + dirs[:, 1]
    return (res[..., None] << np.int64(60)) | ((q + _BIAS) << np.int64(30)) | (r + _BIAS)
