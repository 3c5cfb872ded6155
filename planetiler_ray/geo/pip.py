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
        # uniform grid (CSR buckets) for the nearest-neighbor ring search —
        # ~sqrt(m) cells per axis keeps ~O(1) points per cell
        m = len(self.ids)
        self._g = max(1, int(np.sqrt(max(m, 1))))
        if m:
            self._x0, self._y0 = float(self.x.min()), float(self.y.min())
            self._cw = max((float(self.x.max()) - self._x0) / self._g, 1e-300)
            self._ch = max((float(self.y.max()) - self._y0) / self._g, 1e-300)
            cx = np.clip(((self.x - self._x0) / self._cw).astype(np.int64), 0, self._g - 1)
            cy = np.clip(((self.y - self._y0) / self._ch).astype(np.int64), 0, self._g - 1)
            cell = cx * self._g + cy
            corder = np.argsort(cell, kind="stable")
            self._sorted_idx = corder
            self._cell_start = np.searchsorted(cell[corder], np.arange(self._g * self._g + 1))

    def _cell_of(self, px: np.ndarray, py: np.ndarray):
        # clip BEFORE casting: a degenerate axis (cw/ch ~ 1e-300) blows the
        # ratio to inf and inf->int64 is undefined (same fix as the
        # candidate builder)
        g1 = float(self._g - 1)
        cx = np.clip((px - self._x0) / self._cw, 0.0, g1).astype(np.int64)
        cy = np.clip((py - self._y0) / self._ch, 0.0, g1).astype(np.int64)
        return cx, cy

    def _build_cell_candidates(self):
        """Per grid cell: the POI subset guaranteed to contain the exact
        nearest (and all its ties) for ANY query inside that cell.

        Rule: if the Chebyshev cell-ring ``r_c`` around a cell contains a
        POI, every query in the cell has nearest distance <=
        hypot((r_c+1)*cw, (r_c+1)*ch); all POIs (and tie-mates) within that
        distance lie inside ring ``r'= floor(that/min(cw,ch)) + 1``.  So the
        candidate list for the cell = POIs within ring r' — the grid only
        prunes, never changes the exact result.
        """
        g = self._g
        counts = np.diff(self._cell_start).reshape(g, g)
        pref = np.zeros((g + 1, g + 1), dtype=np.int64)
        pref[1:, 1:] = counts.cumsum(axis=0).cumsum(axis=1)

        def box_count(cx0, cx1, cy0, cy1):
            return (pref[cx1 + 1, cy1 + 1] - pref[cx0, cy1 + 1]
                    - pref[cx1 + 1, cy0] + pref[cx0, cy0])

        cxs, cys = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
        cxs, cys = cxs.ravel(), cys.ravel()
        r_c = np.full(g * g, -1, dtype=np.int64)
        pending = np.arange(g * g)
        r = 0
        while len(pending):
            x0 = np.maximum(cxs[pending] - r, 0)
            x1 = np.minimum(cxs[pending] + r, g - 1)
            y0 = np.maximum(cys[pending] - r, 0)
            y1 = np.minimum(cys[pending] + r, g - 1)
            has = box_count(x0, x1, y0, y1) > 0
            r_c[pending[has]] = r
            pending = pending[~has]
            r += 1
        diag = np.hypot((r_c + 1) * self._cw, (r_c + 1) * self._ch)
        # clip before casting: a degenerate axis (all points collinear ->
        # cell height ~0) would blow the ratio to inf; a ring of g covers
        # the whole grid anyway
        r_cov = np.clip(diag / min(self._cw, self._ch), 0, g).astype(np.int64) + 1
        # gather per-cell candidate lists via CSR column strips
        lists: list[np.ndarray] = []
        offs = [0]
        box = np.empty((g * g, 4))  # world-coord cover box per cell (or inf)
        for c in range(g * g):
            cx, cy = c // g, c % g
            rr = int(r_cov[c])
            x0, x1 = max(cx - rr, 0), min(cx + rr, g - 1)
            y0, y1 = max(cy - rr, 0), min(cy + rr, g - 1)
            parts = [
                self._sorted_idx[self._cell_start[sx * g + y0] : self._cell_start[sx * g + y1 + 1]]
                for sx in range(x0, x1 + 1)
            ]
            cand = np.concatenate(parts) if parts else np.empty(0, np.int64)
            lists.append(cand)
            offs.append(offs[-1] + len(cand))
            # cover-box bounds (±inf where the box hits the grid edge: no
            # uncovered POIs can exist beyond the data extent on that side)
            box[c] = (
                self._x0 + x0 * self._cw if x0 > 0 else -np.inf,
                self._x0 + (x1 + 1) * self._cw if x1 < g - 1 else np.inf,
                self._y0 + y0 * self._ch if y0 > 0 else -np.inf,
                self._y0 + (y1 + 1) * self._ch if y1 < g - 1 else np.inf,
            )
        self._cand_flat = np.concatenate(lists) if lists else np.empty(0, np.int64)
        self._cand_off = np.array(offs, dtype=np.int64)
        self._cov_box = box

    def get_nearest(self, px, py, max_radius: float | None = None):
        """Nearest point id (and squared distance) per query; -1 beyond radius.

        Exact semantics (the oracle's ``dx*dx + dy*dy`` with min-id tie
        break): queries are grouped by grid cell and scored only against the
        cell's precomputed exact-cover candidate list — replaces the round-1
        brute-force GEMM + argpartition (O(n*m) time and 256 MB score
        matrices per actor at m=1000).
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = len(px)
        out_id = np.full(n, -1, dtype=np.int64)
        out_d = np.full(n, np.inf)
        m = len(self.x)
        if m == 0 or n == 0:
            return out_id, out_d
        if not hasattr(self, "_cand_flat"):
            self._build_cell_candidates()
        g = self._g
        qcx, qcy = self._cell_of(px, py)
        qcell = qcx * g + qcy
        order = np.argsort(qcell, kind="stable")
        cell_sorted = qcell[order]
        bounds = np.flatnonzero(np.concatenate([[True], cell_sorted[1:] != cell_sorted[:-1]]))
        bounds = np.append(bounds, n)
        big_id = np.int64(1) << np.int64(62)
        for bi in range(len(bounds) - 1):
            s, e = bounds[bi], bounds[bi + 1]
            c = int(cell_sorted[s])
            cand = self._cand_flat[self._cand_off[c] : self._cand_off[c + 1]]
            qi = order[s:e]
            dx = px[qi, None] - self.x[cand][None, :]
            dy = py[qi, None] - self.y[cand][None, :]
            d = dx * dx + dy * dy
            min_d = d.min(axis=1, keepdims=True)
            tied_ids = np.where(d == min_d, self.ids[cand][None, :], big_id)
            out_id[qi] = tied_ids.min(axis=1)
            out_d[qi] = min_d[:, 0]
        # the cover proof assumes the query lies INSIDE its (clipped) cell;
        # verify via the cover-box margin and brute-rescan violations (only
        # out-of-bbox or pathological queries — rare by construction)
        bx0, bx1, by0, by1 = self._cov_box[qcell].T
        margin = np.minimum(np.minimum(px - bx0, bx1 - px),
                            np.minimum(py - by0, by1 - py))
        # strict <: a POI exactly on the box boundary belongs to the next
        # cell (half-open) and could tie — rescan that measure-zero case too
        ok = np.isinf(margin) | ((margin >= 0) & (out_d < margin * margin))
        redo = np.flatnonzero(~ok)
        if len(redo):
            rid, rd = self.get_nearest_brute(px[redo], py[redo])
            out_id[redo] = rid
            out_d[redo] = rd
        if max_radius is not None:
            far = out_d > max_radius * max_radius
            out_id[far] = -1
        return out_id, out_d

    def get_nearest_brute(self, px, py, max_radius: float | None = None):
        """Reference brute-force (exact, chunked) — kept for parity tests."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        n = len(px)
        out_id = np.full(n, -1, dtype=np.int64)
        out_d = np.full(n, np.inf)
        m = len(self.x)
        if m == 0 or n == 0:
            return out_id, out_d
        chunk = max(1, 8_000_000 // m)
        for s in range(0, n, chunk):
            dx = px[s : s + chunk, None] - self.x[None, :]
            dy = py[s : s + chunk, None] - self.y[None, :]
            d = dx * dx + dy * dy
            min_d = d.min(axis=1, keepdims=True)
            tied_ids = np.where(d == min_d, self.ids[None, :], np.int64(1) << np.int64(62))
            out_id[s : s + chunk] = tied_ids.min(axis=1)
            out_d[s : s + chunk] = min_d[:, 0]
        if max_radius is not None:
            far = out_d > max_radius * max_radius
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
