"""Point-in-polygon + nearest-point spatial indexes, pure numpy.

Re-implements the *semantics* of the reference's STRtree-backed indexes:

* :class:`PolygonIndex` — ``get_containing`` / ``get_containing_or_nearest``
  (``geo/PolygonIndex.java:20-130``: points matched to containing polygon,
  with a fallback to the nearest polygon when none contains).
* :class:`PointIndex` — ``get_within(point, r)`` / ``get_nearest(point, r)``
  (``geo/PointIndex.java:22-110``).

Instead of an STRtree (no shapely here) both use a uniform grid-bucket index
over the data bounding box; queries are vectorized with numpy.  These classes
are built ONCE per actor (in ``__init__`` of an actor-pool ``map_batches``
stage) from a broadcast ``ray.put`` handle — never per batch.

Containment rule: even-odd crossing number over all rings of a polygon
(holes included automatically).  Boundary points follow the half-open
convention of the crossing test (a point exactly on a horizontal lower edge
counts as inside; the synthetic oracle mirrors this with half-open ranges).
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of many points against one ring. O(pts*edges)."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(len(px), dtype=bool)
    # Process edges in chunks to bound the (pts x edges) temporary.
    n_edges = len(x0)
    chunk = max(1, min(n_edges, max(1, 4_000_000 // max(len(px), 1))))
    for s in range(0, n_edges, chunk):
        ex0, ey0 = x0[s : s + chunk], y0[s : s + chunk]
        ex1, ey1 = x1[s : s + chunk], y1[s : s + chunk]
        cond = (ey0[None, :] > py[:, None]) != (ey1[None, :] > py[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ex0[None, :] + (py[:, None] - ey0[None, :]) / (ey1[None, :] - ey0[None, :]) * (
                ex1[None, :] - ex0[None, :]
            )
        crossing = cond & (px[:, None] < xint)
        inside ^= (crossing.sum(axis=1) % 2).astype(bool)
    return inside


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring)
    return inside


def _dist_sq_to_segments(px, py, ax, ay, bx, by):
    """Min squared distance from each point to ANY of the segments (a, b)."""
    best = np.full(len(px), np.inf)
    n = len(ax)
    chunk = max(1, min(n, max(1, 4_000_000 // max(len(px), 1))))
    for s in range(0, n, chunk):
        dx = (bx[s : s + chunk] - ax[s : s + chunk])[None, :]
        dy = (by[s : s + chunk] - ay[s : s + chunk])[None, :]
        apx = px[:, None] - ax[s : s + chunk][None, :]
        apy = py[:, None] - ay[s : s + chunk][None, :]
        denom = dx * dx + dy * dy
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.clip(np.where(denom > 0, (apx * dx + apy * dy) / denom, 0.0), 0.0, 1.0)
        ddx = apx - t * dx
        ddy = apy - t * dy
        d = ddx * ddx + ddy * ddy
        best = np.minimum(best, d.min(axis=1))
    return best


class PolygonIndex:
    """Grid-bucketed polygon index for containment + nearest queries.

    ``polygons`` is a list of ``(payload_id, rings)`` where rings is a list of
    closed (n, 2) float64 arrays (exterior first). All coordinates in one CRS
    (we use lon/lat degrees for the admin join; semantics are CRS-agnostic).
    """

    def __init__(self, polygons, grid: int = 64):
        self.ids = np.array([p[0] for p in polygons], dtype=np.int64)
        self.rings = [p[1] for p in polygons]
        boxes = np.array(
            [
                [
                    min(r[:, 0].min() for r in rings),
                    min(r[:, 1].min() for r in rings),
                    max(r[:, 0].max() for r in rings),
                    max(r[:, 1].max() for r in rings),
                ]
                for rings in self.rings
            ],
            dtype=np.float64,
        ).reshape(-1, 4)
        self.boxes = boxes
        self.minx, self.miny = boxes[:, 0].min(), boxes[:, 1].min()
        self.maxx, self.maxy = boxes[:, 2].max(), boxes[:, 3].max()
        self.grid = grid
        self.sx = (self.maxx - self.minx) / grid or 1.0
        self.sy = (self.maxy - self.miny) / grid or 1.0
        self.cells: dict[tuple[int, int], np.ndarray] = {}
        buckets: dict[tuple[int, int], list[int]] = {}
        for i, (x0, y0, x1, y1) in enumerate(boxes):
            cx0, cy0 = self._cell(x0, y0)
            cx1, cy1 = self._cell(x1, y1)
            for cx in range(cx0, cx1 + 1):
                for cy in range(cy0, cy1 + 1):
                    buckets.setdefault((cx, cy), []).append(i)
        self.cells = {k: np.array(v, dtype=np.int64) for k, v in buckets.items()}

    def _cell(self, x, y):
        cx = int(np.clip((x - self.minx) / self.sx, 0, self.grid - 1))
        cy = int(np.clip((y - self.miny) / self.sy, 0, self.grid - 1))
        return cx, cy

    def _cells_vec(self, px, py):
        cx = np.clip(((px - self.minx) / self.sx).astype(np.int64), 0, self.grid - 1)
        cy = np.clip(((py - self.miny) / self.sy).astype(np.int64), 0, self.grid - 1)
        return cx, cy

    def get_containing(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """First containing polygon's payload id per point, -1 if none.

        Two strategies: few polygons -> one vectorized bbox+crossing sweep per
        polygon over all unresolved points (no per-cell Python loop); many
        polygons -> grid-cell candidate grouping.
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = np.full(len(px), -1, dtype=np.int64)
        if len(self.ids) <= 256:
            unresolved = np.ones(len(px), dtype=bool)
            for ci in range(len(self.ids)):
                if not unresolved.any():
                    break
                x0, y0, x1, y1 = self.boxes[ci]
                m = unresolved & (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
                if not m.any():
                    continue
                idx = np.flatnonzero(m)
                inside = points_in_polygon(px[idx], py[idx], self.rings[ci])
                hit = idx[inside]
                out[hit] = self.ids[ci]
                unresolved[hit] = False
            return out
        cx, cy = self._cells_vec(px, py)
        cell_key = cx * np.int64(self.grid) + cy
        order = np.argsort(cell_key, kind="stable")
        sk = cell_key[order]
        bounds = np.flatnonzero(np.diff(sk)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(sk)]])
        for s, e in zip(starts, ends):
            idxs = order[s:e]
            key = (int(cx[idxs[0]]), int(cy[idxs[0]]))
            cands = self.cells.get(key)
            if cands is None:
                continue
            qx, qy = px[idxs], py[idxs]
            unresolved = np.ones(len(idxs), dtype=bool)
            for ci in cands:
                if not unresolved.any():
                    break
                x0, y0, x1, y1 = self.boxes[ci]
                m = unresolved & (qx >= x0) & (qx <= x1) & (qy >= y0) & (qy <= y1)
                if not m.any():
                    continue
                inside = points_in_polygon(qx[m], qy[m], self.rings[ci])
                hit = np.flatnonzero(m)[inside]
                out[idxs[hit]] = self.ids[ci]
                unresolved[hit] = False
        return out

    def get_containing_or_nearest(self, px: np.ndarray, py: np.ndarray,
                                  max_candidates: int | None = None) -> np.ndarray:
        """Containing polygon id, else nearest polygon by boundary distance
        (``PolygonIndex.getContainingOrNearest``, PolygonIndex.java:93-130)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        out = self.get_containing(px, py)
        miss = np.flatnonzero(out < 0)
        if len(miss) == 0:
            return out
        qx, qy = px[miss], py[miss]
        best = np.full(len(miss), np.inf)
        best_id = np.full(len(miss), -1, dtype=np.int64)
        for ci in range(len(self.ids)):
            segs = [
                (r[:-1, 0], r[:-1, 1], r[1:, 0], r[1:, 1]) for r in self.rings[ci]
            ]
            d = np.full(len(miss), np.inf)
            for ax, ay, bx, by in segs:
                d = np.minimum(d, _dist_sq_to_segments(qx, qy, ax, ay, bx, by))
            better = d < best
            best = np.where(better, d, best)
            best_id = np.where(better, self.ids[ci], best_id)
        out[miss] = best_id
        return out


class PointIndex:
    """Grid-bucketed point index: radius + nearest queries, vectorized.

    ``get_nearest`` distance metric is plain euclidean in the index CRS (the
    oracle SQL mirrors ``(dx*dx + dy*dy)`` exactly); ties break on smallest id.
    """

    def __init__(self, ids: np.ndarray, x: np.ndarray, y: np.ndarray):
        order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")
        self.ids = np.asarray(ids, dtype=np.int64)[order]
        self.x = np.asarray(x, dtype=np.float64)[order]
        self.y = np.asarray(y, dtype=np.float64)[order]

    def get_nearest(self, px, py, max_radius: float | None = None):
        """Nearest point id (and squared distance) per query; -1 beyond radius.

        Brute-force vectorized (the right side is a broadcast small table —
        same regime as the reference's in-memory STRtree).  Chunked so the
        (queries x points) matrix stays bounded.
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = len(px)
        out_id = np.full(n, -1, dtype=np.int64)
        out_d = np.full(n, np.inf)
        m = len(self.x)
        if m == 0 or n == 0:
            return out_id, out_d
        # BLAS GEMM candidate scoring (argmin of -2 p.q + |q|^2), then EXACT
        # re-score of the top candidates with the oracle's (dx*dx + dy*dy)
        # expression so ordering is bit-identical to the SQL twin.
        ncand = min(4, m)
        qmat = np.column_stack([self.x, self.y])  # (m, 2)
        qn = self.x * self.x + self.y * self.y
        chunk = max(1, 32_000_000 // m)
        for s in range(0, n, chunk):
            pc = np.column_stack([px[s : s + chunk], py[s : s + chunk]])  # (c, 2)
            score = pc @ (-2.0 * qmat.T)
            score += qn[None, :]
            if ncand < m:
                cand = np.argpartition(score, ncand - 1, axis=1)[:, :ncand]
            else:
                cand = np.broadcast_to(np.arange(m), (len(pc), m))
            dx = pc[:, 0:1] - self.x[cand]
            dy = pc[:, 1:2] - self.y[cand]
            d = dx * dx + dy * dy
            cid = self.ids[cand]
            # order by (exact d2, poi_id): min d2, then min id among exact ties
            min_d = d.min(axis=1, keepdims=True)
            tied = d == min_d
            tied_ids = np.where(tied, cid, np.int64(1) << np.int64(62))
            out_id[s : s + chunk] = tied_ids.min(axis=1)
            out_d[s : s + chunk] = min_d[:, 0]
            if ncand < m:
                # if EVERY preselected candidate ties exactly, the true
                # min-id tie-mate may have been cut by the approximate
                # preselection — re-score those rows exactly over all points
                saturated = np.flatnonzero(tied.all(axis=1))
                for ri in saturated:
                    dx = pc[ri, 0] - self.x
                    dy = pc[ri, 1] - self.y
                    dall = dx * dx + dy * dy
                    mind = dall.min()
                    out_id[s + ri] = self.ids[dall == mind].min()
                    out_d[s + ri] = mind
        if max_radius is not None:
            r2 = max_radius * max_radius
            far = out_d > r2
            out_id[far] = -1
        return out_id, out_d

    def count_within(self, px, py, radius: float) -> np.ndarray:
        """Number of indexed points within radius of each query (euclidean)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        r2 = radius * radius
        n = len(px)
        out = np.zeros(n, dtype=np.int64)
        chunk = max(1, 8_000_000 // max(len(self.x), 1))
        for s in range(0, n, chunk):
            dx = px[s : s + chunk, None] - self.x[None, :]
            dy = py[s : s + chunk, None] - self.y[None, :]
            d = dx * dx + dy * dy
            out[s : s + chunk] = (d <= r2).sum(axis=1)
        return out
