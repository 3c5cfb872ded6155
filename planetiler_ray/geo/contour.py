"""Marching-squares isoline extraction over a sparse occupancy raster.

The raster→vector contouring counterpart of ``geo/rasterunion.py`` (which
goes vector→raster→vector for polygon merging): threshold a density raster,
classify every 2x2 cell block into one of 16 marching-squares cases, and
emit the unit isoline segments through the block-edge midpoints.

Corner convention (y grows DOWN, like tile space): a block anchored at
(bx, by) has corners TL=(bx,by) weight 8, TR=(bx+1,by) weight 4,
BR=(bx+1,by+1) weight 2, BL=(bx,by+1) weight 1 — so the case index is the
usual TL·8+TR·4+BR·2+BL·1.  Saddles (cases 5 and 10) take the fixed
"separate both inside corners" resolution (two segments each), which keeps
the output deterministic without a center-value probe.

Distribution note: the engine never materializes the dense raster — each
occupied cell scatters ONE corner bit to the 4 blocks it touches
(``corner_scatter``), a bounded ``groupby(block).sum(bit)`` ORs them (the
bits are distinct powers of two, so SUM == OR), and segment emission is a
per-case table lookup.  Everything here is numpy over flat arrays; the Ray
wiring lives in ``pipelines/webgeo.q_contour_census``.
"""

from __future__ import annotations

import numpy as np

# segments per case: 0 for empty/full, 2 for the two saddles, else 1
CASE_SEGMENTS = np.array([0, 1, 1, 1, 1, 2, 1, 1, 1, 1, 2, 1, 1, 1, 1, 0],
                         dtype=np.int64)

# edge ids: 0=top, 1=right, 2=bottom, 3=left; midpoint offsets in cell units
_EDGE_DX = np.array([0.5, 1.0, 0.5, 0.0])
_EDGE_DY = np.array([0.0, 0.5, 1.0, 0.5])

# case -> list of (edge_a, edge_b) segments (saddles resolved per docstring)
_CASE_EDGES: list[list[tuple[int, int]]] = [
    [],                    # 0
    [(3, 2)],              # 1  BL
    [(2, 1)],              # 2  BR
    [(3, 1)],              # 3  BL+BR
    [(0, 1)],              # 4  TR
    [(0, 1), (3, 2)],      # 5  TR+BL (saddle)
    [(0, 2)],              # 6  TR+BR
    [(3, 0)],              # 7  TR+BR+BL
    [(3, 0)],              # 8  TL
    [(0, 2)],              # 9  TL+BL
    [(0, 3), (2, 1)],      # 10 TL+BR (saddle)
    [(0, 1)],              # 11 TL+BL+BR
    [(3, 1)],              # 12 TL+TR
    [(2, 1)],              # 13 TL+TR+BL
    [(3, 2)],              # 14 TL+TR+BR
    [],                    # 15
]

# flattened per-case segment tables for vectorized emission
_SEG_CASE = np.array([c for c, segs in enumerate(_CASE_EDGES) for _ in segs],
                     dtype=np.int64)
_SEG_A = np.array([a for segs in _CASE_EDGES for a, _ in segs], dtype=np.int64)
_SEG_B = np.array([b for segs in _CASE_EDGES for _, b in segs], dtype=np.int64)
_CASE_SEG_OFF = np.concatenate([[0], np.cumsum(CASE_SEGMENTS)])


def corner_scatter(cx: np.ndarray, cy: np.ndarray, n_side: int):
    """(occupied cell coords) -> (block_id, corner_bit) contribution rows.

    Cell (cx,cy) is the TL corner of block (cx,cy), TR of (cx-1,cy),
    BR of (cx-1,cy-1) and BL of (cx,cy-1).  Block ids are offset by +1 in
    both axes so the x=-1 / y=-1 border blocks stay nonnegative:
    id = (by+1)*(n_side+1) + (bx+1), collision-free for bx,by in
    [-1, n_side-1].
    """
    cx = np.asarray(cx, dtype=np.int64)
    cy = np.asarray(cy, dtype=np.int64)
    m = len(cx)
    stride = n_side + 1
    block = np.empty(4 * m, np.int64)
    bit = np.empty(4 * m, np.int64)
    block[0::4] = (cy + 1) * stride + (cx + 1)
    bit[0::4] = 8
    block[1::4] = (cy + 1) * stride + cx
    bit[1::4] = 4
    block[2::4] = cy * stride + cx
    bit[2::4] = 2
    block[3::4] = cy * stride + (cx + 1)
    bit[3::4] = 1
    return block, bit


def block_cases(cx: np.ndarray, cy: np.ndarray, n_side: int):
    """Dense-free case classification: returns (bx, by, case) for every
    block touching at least one occupied cell (case in 1..15)."""
    block, bit = corner_scatter(cx, cy, n_side)
    uniq, inv = np.unique(block, return_inverse=True)
    cs = np.zeros(len(uniq), np.int64)
    np.add.at(cs, inv, bit)  # bits are distinct powers of two: SUM == OR
    stride = n_side + 1
    bx = uniq % stride - 1
    by = uniq // stride - 1
    return bx, by, cs


def cells_to_segments(cx: np.ndarray, cy: np.ndarray, n_side: int):
    """Full marching-squares pass: occupied cells -> isoline segments.

    Returns (x0, y0, x1, y1) float64 arrays of segment endpoints at block
    edge midpoints (cell units).  Segments along the iso-contour of the
    binary occupancy field; cases 0/15 emit nothing, saddles emit two.
    """
    bx, by, cs = block_cases(cx, cy, n_side)
    nseg = CASE_SEGMENTS[cs]
    rep = np.repeat(np.arange(len(cs)), nseg)
    # per-block slot index within its case's segment list
    slot = np.arange(len(rep)) - np.repeat(
        np.concatenate([[0], np.cumsum(nseg)])[:-1], nseg
    )
    tbl = _CASE_SEG_OFF[cs[rep]] + slot
    ea, eb = _SEG_A[tbl], _SEG_B[tbl]
    bxr = bx[rep].astype(np.float64)
    byr = by[rep].astype(np.float64)
    return (
        bxr + _EDGE_DX[ea], byr + _EDGE_DY[ea],
        bxr + _EDGE_DX[eb], byr + _EDGE_DY[eb],
    )
