"""Morton (Z-order) codes and quadtree range coverings.

The Z-order curve is the third space-filling index family in this repo
next to Hilbert (``geo/hilbert.py``) and quadkeys: interleaving the bits
of (tile_x, tile_y) gives a single integer whose *prefixes* are quadtree
cells, so any bbox can be covered by a short list of contiguous code
ranges — the classic index-pushdown trick (S2 coverings, Geomesa/BBOX
scans) that turns a 2-D window query into a handful of 1-D range scans a
sorted/partitioned store can serve without touching the rest of the
data.  Reference parity: planetiler sorts features by a tile id that is
exactly such an interleaved address (``TileCoord.java`` encode/decode);
the covering generalizes its per-tile addressing to arbitrary windows.

Everything here is integer-exact and vectorized; the covering runs on
the driver over a handful of query boxes (broadcast side), never over
the data.
"""

from __future__ import annotations

import numpy as np

_B = [
    0x5555555555555555,
    0x3333333333333333,
    0x0F0F0F0F0F0F0F0F,
    0x00FF00FF00FF00FF,
    0x0000FFFF0000FFFF,
]


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit k lands at bit 2k."""
    v = v & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(_B[4])
    v = (v | (v << np.uint64(8))) & np.uint64(_B[3])
    v = (v | (v << np.uint64(4))) & np.uint64(_B[2])
    v = (v | (v << np.uint64(2))) & np.uint64(_B[1])
    v = (v | (v << np.uint64(1))) & np.uint64(_B[0])
    return v


def xy_to_morton(x, y) -> np.ndarray:
    """Vectorized Z-order code: x bits at even positions, y at odd."""
    x = np.asarray(x, np.uint64)
    y = np.asarray(y, np.uint64)
    return (_part1by1(x) | (_part1by1(y) << np.uint64(1))).astype(np.int64)


def morton_to_xy(m) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(m, np.uint64)

    def compact(v):
        v = v & np.uint64(_B[0])
        v = (v | (v >> np.uint64(1))) & np.uint64(_B[1])
        v = (v | (v >> np.uint64(2))) & np.uint64(_B[2])
        v = (v | (v >> np.uint64(4))) & np.uint64(_B[3])
        v = (v | (v >> np.uint64(8))) & np.uint64(_B[4])
        v = (v | (v >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
        return v.astype(np.int64)

    return compact(m), compact(m >> np.uint64(1))


def cover_ranges(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, z: int
) -> list[tuple[int, int]]:
    """Minimal-ish list of inclusive Morton-code ranges at level ``z``
    covering the INCLUSIVE tile rectangle [x_lo..x_hi] x [y_lo..y_hi].

    Standard quadtree descent: a subtree fully inside the box contributes
    its whole contiguous code range ``[m << 2k, ((m+1) << 2k) - 1]``; a
    subtree partially inside splits into its 4 children; disjoint
    subtrees are dropped.  Adjacent/overlapping ranges are merged, so the
    result length is O(perimeter) of the box, never O(area).  Runs on the
    driver per query box (a few dozen iterations), independent of data
    size.
    """
    if x_lo > x_hi or y_lo > y_hi:
        return []
    out: list[tuple[int, int]] = []
    # stack entries: (prefix_code, cell_x, cell_y, level) where level is
    # the number of remaining bit-pairs below this cell (z at the root).
    stack = [(0, 0, 0, z)]
    while stack:
        code, cx, cy, lvl = stack.pop()
        side = 1 << lvl
        bx_lo, bx_hi = cx << lvl, ((cx + 1) << lvl) - 1
        by_lo, by_hi = cy << lvl, ((cy + 1) << lvl) - 1
        if bx_hi < x_lo or bx_lo > x_hi or by_hi < y_lo or by_lo > y_hi:
            continue
        if (
            bx_lo >= x_lo and bx_hi <= x_hi
            and by_lo >= y_lo and by_hi <= y_hi
        ) or lvl == 0:
            lo = code << (2 * lvl)
            out.append((lo, lo + (1 << (2 * lvl)) - 1))
            continue
        for dy in (0, 1):
            for dx in (0, 1):
                stack.append(
                    (
                        (code << 2) | (dy << 1) | dx,
                        (cx << 1) | dx,
                        (cy << 1) | dy,
                        lvl - 1,
                    )
                )
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged
