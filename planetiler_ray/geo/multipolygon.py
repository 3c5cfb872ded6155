"""Multipolygon assembly from unordered way segments + ring nesting.

Re-implements the semantics of the reference's imposm3-derived assembler
(``reader/osm/OsmMultipolygon.java:37-380``, invoked from
``OsmReader.java:922-962``):

1. stitch unordered way segments into closed rings by matching endpoints
   (coordinates quantized so float join points snap together);
2. sort rings by |area| descending;
3. nest rings by containment: a ring contained in an odd number of
   larger rings is a hole (inner), else an outer; each inner is attached to
   its smallest containing outer.

Pure numpy; used by the relation-assembly stage of the OSM-style pipeline
(``groupby(relation_id).map_groups``).
"""

from __future__ import annotations

import numpy as np

from .pip import points_in_ring

QUANT = 1e7  # ~1e-7 deg endpoint snapping, mirrors node-precision packing


def _key(pt) -> tuple[int, int]:
    return (int(round(pt[0] * QUANT)), int(round(pt[1] * QUANT)))


def stitch_rings(segments: list[np.ndarray]) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Join way segments end-to-end into closed rings.

    Returns (closed_rings, leftover_open_chains).  Segments may need
    reversal; closed input segments pass through.
    """
    closed: list[np.ndarray] = []
    open_segs: list[np.ndarray] = []
    for s in segments:
        s = np.asarray(s, dtype=np.float64)
        if len(s) < 2:
            continue
        if _key(s[0]) == _key(s[-1]) and len(s) >= 4:
            closed.append(s)
        else:
            open_segs.append(s)
    # endpoint index
    while open_segs:
        chain = open_segs.pop()
        extended = True
        while extended:
            extended = False
            tail = _key(chain[-1])
            head = _key(chain[0])
            if tail == head and len(chain) >= 4:
                closed.append(chain)
                chain = None
                break
            for i, s in enumerate(open_segs):
                if _key(s[0]) == tail:
                    chain = np.vstack([chain, s[1:]])
                elif _key(s[-1]) == tail:
                    chain = np.vstack([chain, s[::-1][1:]])
                elif _key(s[-1]) == head:
                    chain = np.vstack([s, chain[1:]])
                elif _key(s[0]) == head:
                    chain = np.vstack([s[::-1], chain[1:]])
                else:
                    continue
                open_segs.pop(i)
                extended = True
                break
        if chain is not None:
            if _key(chain[0]) == _key(chain[-1]) and len(chain) >= 4:
                closed.append(chain)
            else:
                # reference drops un-closeable chains (logs a warning)
                pass
    return closed, []


def _area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def nest_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Rings -> polygons [[exterior, hole, ...], ...] by area-sorted
    containment nesting (alternating outer/inner, imposm3 semantics)."""
    if not rings:
        return []
    order = sorted(range(len(rings)), key=lambda i: -abs(_area(rings[i])))
    depth = [0] * len(rings)
    parent = [-1] * len(rings)
    for oi, i in enumerate(order):
        ri = rings[i]
        # probe with an edge MIDPOINT, not a vertex: rings produced by
        # untwisting share their split vertex with a sibling's boundary, and
        # a boundary-vertex ray cast misclassifies containment (a bowtie
        # lobe would nest as its sibling's hole).  An edge midpoint of a
        # simple ring lies strictly on the ring, never on a sibling vertex.
        probe = 0.5 * (ri[0] + ri[1]) if len(ri) > 1 else ri[0]
        best = -1
        for j in order[:oi]:  # only larger rings can contain
            if points_in_ring(np.array([probe[0]]), np.array([probe[1]]), rings[j])[0]:
                if best == -1 or abs(_area(rings[j])) < abs(_area(rings[best])):
                    best = j
        if best >= 0:
            parent[i] = best
            depth[i] = depth[best] + 1
    polys: dict[int, list[np.ndarray]] = {}
    for i in range(len(rings)):
        if depth[i] % 2 == 0:
            polys.setdefault(i, []).insert(0, _orient(rings[i], ccw=False))
    for i in range(len(rings)):
        if depth[i] % 2 == 1:
            outer = parent[i]
            while outer >= 0 and depth[outer] % 2 == 1:
                outer = parent[outer]
            if outer in polys:
                polys[outer].append(_orient(rings[i], ccw=True))
    return [polys[k] for k in sorted(polys)]


def _orient(ring: np.ndarray, ccw: bool) -> np.ndarray:
    a = _area(ring)
    # screen/world coords with y down: CW exterior has positive shoelace here;
    # we just normalize: exterior one winding, holes the other
    if (a < 0) == ccw:
        return ring
    return ring[::-1].copy()


def assemble_multipolygon(segments: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Way segments -> nested multipolygon (list of [exterior, holes...])."""
    rings, _ = stitch_rings(segments)
    return nest_rings(rings)
