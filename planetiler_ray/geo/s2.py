"""S2-style hierarchical cell ids, vectorized (pure numpy).

Implements the published S2 cell-id scheme (s2geometry.io docs): the sphere is
projected onto 6 cube faces, each face carries a Hilbert space-filling curve
over a 2^30 x 2^30 grid, and a cell id packs ``[face:3][curve_position:2*level]``
into a 64-bit integer with a trailing 1 bit marking the level.  The quadratic
uv->st transform matches the published S2_QUADRATIC_PROJECTION.

NOTE: the per-face Hilbert generator here is our own (``geo/hilbert.py``) with
the documented per-face swap parity, so ids share S2's *structure* (layout,
hierarchy, locality) but are not bit-identical to Google's library (which is
not available in this environment).  All engine-internal uses (indexing,
grouping, coarsening via :func:`parent`) only rely on the structure.
Capability analogue in the reference: tile/H3/S2 spatial keying for the
feature->cell assignment stage (SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

from .hilbert import xy_to_hilbert

MAX_LEVEL = 30


def lonlat_to_xyz(lon, lat):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        np.where(face == 0, x, np.where(face == 1, y, z)) < 0, 3, 0
    )
    # u, v per face (published S2 face layout)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn, div) in enumerate(
        [
            (lambda: y, lambda: z, lambda: x),
            (lambda: -x, lambda: z, lambda: y),
            (lambda: -x, lambda: -y, lambda: z),
            (lambda: z, lambda: y, lambda: -x),
            (lambda: z, lambda: -x, lambda: -y),
            (lambda: -y, lambda: -x, lambda: -z),
        ]
    ):
        m = face == f
        if np.any(m):
            d = div()
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ufn() / d, u)
                v = np.where(m, vfn() / d, v)
    return face.astype(np.int64), u, v


def uv_to_st(u):
    """S2_QUADRATIC_PROJECTION: approximately equal-area cell sizes."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_ij(s, level: int = MAX_LEVEL):
    n = np.int64(1) << np.int64(level)
    return np.clip(np.floor(np.asarray(s) * np.float64(n)).astype(np.int64), 0, n - 1)


def cell_id(lon, lat, level: int = MAX_LEVEL):
    """Leaf-or-level cell id for (lon, lat) arrays at the given level."""
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    # per-face swap parity so adjacent faces join smoothly (S2's kSwapMask idea)
    swap = (face & 1) == 1
    ii = np.where(swap, j, i)
    jj = np.where(swap, i, j)
    pos = xy_to_hilbert(level, ii, jj)
    # [face:3][pos:2*level][1][zeros]
    shift = np.int64(2 * (MAX_LEVEL - level))
    return (face << np.int64(2 * MAX_LEVEL + 1)) | (pos << (shift + 1)) | (np.int64(1) << shift)


def cell_level(cid):
    """Level of a cell id = MAX_LEVEL - (position of lowest set bit) / 2."""
    cid = np.asarray(cid, dtype=np.int64)
    lsb = cid & (-cid)
    # log2 of lsb via bit width
    k = np.zeros_like(cid)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.int64(1) << np.int64(shift))
        k = np.where(m, k + shift, k)
        v = np.where(m, v >> np.int64(shift), v)
    return MAX_LEVEL - k // 2


def parent(cid, level: int):
    """Ancestor cell id at the given (coarser) level."""
    cid = np.asarray(cid, dtype=np.int64)
    lsb = np.int64(1) << np.int64(2 * (MAX_LEVEL - level))
    return (cid & ~(2 * lsb - 1)) | lsb


def contains(ancestor, descendant):
    """True where ancestor cell contains descendant cell (same definition as
    S2: range [id - lsb + 1, id + lsb - 1])."""
    ancestor = np.asarray(ancestor, dtype=np.int64)
    descendant = np.asarray(descendant, dtype=np.int64)
    lsb = ancestor & (-ancestor)
    return (descendant >= ancestor - lsb + 1) & (descendant <= ancestor + lsb - 1)
