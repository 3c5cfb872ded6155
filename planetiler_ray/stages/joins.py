"""Spatial join stages: actor-pool classes for map_batches.

The reference does these joins with in-memory STRtrees queried from the
profile (``geo/PolygonIndex.java``, ``geo/PointIndex.java``).  Ray-Data-native
restatement: the small side (admin polygons / POI table) is broadcast ONCE via
``ray.put`` on the driver; each actor of the pool rebuilds its index ONCE in
``__init__`` from the broadcast handle; ``__call__`` then answers a whole
Arrow batch vectorized.  No shuffle — the big side streams through.

Usage:
    handle = ray.put(load_admin_polygons(sf_dir))
    ds = ds.map_batches(PIPJoiner, fn_constructor_args=(handle,),
                        batch_format="pyarrow", concurrency=4, num_cpus=1)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.pip import PointIndex, PolygonIndex


def _resolve(handle):
    """Accept either a raw object or a ray.ObjectRef broadcast handle."""
    try:
        import ray

        if isinstance(handle, ray.ObjectRef):
            return ray.get(handle)
    except ImportError:
        pass
    return handle


class PIPJoiner:
    """Point-in-polygon join: adds ``admin_id`` (containing polygon, or -1).

    ``mode='containing'`` mirrors ``PolygonIndex.getContaining``;
    ``mode='nearest'`` mirrors ``getContainingOrNearest`` (fallback to the
    nearest polygon when no polygon contains the point).
    """

    def __init__(self, polygons_handle, mode: str = "containing",
                 lat_col: str = "lat", lon_col: str = "lon", out_col: str = "admin_id"):
        polygons = _resolve(polygons_handle)
        self.index = PolygonIndex(polygons)
        self.mode = mode
        self.lat_col, self.lon_col, self.out_col = lat_col, lon_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy()
        lat = batch.column(self.lat_col).to_numpy()
        if self.mode == "containing":
            ids = self.index.get_containing(lon, lat)
        else:
            ids = self.index.get_containing_or_nearest(lon, lat)
        return batch.append_column(self.out_col, pa.array(ids, pa.int64()))


class Enricher:
    """Fused spatial-enrichment actor: PIP join + kNN + S2/hex cells in ONE
    actor-pool stage (both indexes built once per actor from broadcast
    handles; fewer pools = less startup + fewer inter-stage hops)."""

    def __init__(self, polygons_handle, pois_handle, s2_level: int = 12,
                 hex_res: int = 9):
        self.pip = PolygonIndex(_resolve(polygons_handle))
        ids, lon, lat = _resolve(pois_handle)
        self.knn = PointIndex(np.asarray(ids), np.asarray(lon), np.asarray(lat))
        self.s2_level = s2_level
        self.hex_res = hex_res

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geo import hexgrid, mercator, s2

        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        out = batch.append_column(
            "admin_id", pa.array(self.pip.get_containing(lon, lat), pa.int64())
        )
        nid, _ = self.knn.get_nearest(lon, lat)
        out = out.append_column("poi_id", pa.array(nid, pa.int64()))
        out = out.append_column(
            "s2_cell", pa.array(s2.cell_id(lon, lat, self.s2_level), pa.int64())
        )
        wx = mercator.lon_to_world_x(lon)
        wy = mercator.lat_to_world_y(lat)
        return out.append_column(
            "hex_cell", pa.array(hexgrid.hex_cell(wx, wy, self.hex_res), pa.int64())
        )


class KNNJoiner:
    """Nearest-POI enrichment: adds ``poi_id`` (+ optionally ``poi_d2`` and a
    radius count), euclidean in degrees, ties -> smallest id.

    Mirrors ``PointIndex.getNearest`` / ``getWithin`` semantics.
    """

    def __init__(self, pois_handle, max_radius: float | None = None,
                 within_radius: float | None = None,
                 lat_col: str = "lat", lon_col: str = "lon"):
        ids, lon, lat = _resolve(pois_handle)
        self.index = PointIndex(np.asarray(ids), np.asarray(lon), np.asarray(lat))
        self.max_radius = max_radius
        self.within_radius = within_radius
        self.lat_col, self.lon_col = lat_col, lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy()
        lat = batch.column(self.lat_col).to_numpy()
        nid, d2 = self.index.get_nearest(lon, lat, self.max_radius)
        out = batch.append_column("poi_id", pa.array(nid, pa.int64()))
        if self.within_radius is not None:
            cnt = self.index.count_within(lon, lat, self.within_radius)
            out = out.append_column("poi_within", pa.array(cnt, pa.int64()))
        return out


class RangeJoiner:
    """Broadcast range join (the IP-geolocation / tariff-table shape):
    each row's integer value is matched to the interval [lo, hi) that
    contains it.  Intervals must be non-overlapping; rows outside every
    interval get label_id -1 (callers filter for inner-join semantics).

    Actor-pool stage: the (lo, hi, label_id) table ships once per actor
    via ``ray.put`` (never per batch); lookup is ONE ``searchsorted`` on
    the sorted lo array + an upper-bound check per batch — O(log R) per
    row against a million-interval table, no shuffle.
    """

    def __init__(self, ranges_handle, value_col: str, out_col: str = "label_id"):
        lo, hi, label = _resolve(ranges_handle)
        lo = np.asarray(lo, dtype=np.int64)
        order = np.argsort(lo, kind="stable")
        self.lo = lo[order]
        self.hi = np.asarray(hi, dtype=np.int64)[order]
        self.label = np.asarray(label, dtype=np.int64)[order]
        if (self.lo[1:] < self.hi[:-1]).any():
            raise ValueError("RangeJoiner: overlapping intervals")
        self.value_col, self.out_col = value_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = batch.column(self.value_col).to_numpy().astype(np.int64)
        pos = np.searchsorted(self.lo, v, side="right") - 1
        pc = np.maximum(pos, 0)
        inside = (pos >= 0) & (v < self.hi[pc])
        out = np.where(inside, self.label[pc], -1)
        return batch.append_column(self.out_col, pa.array(out, pa.int64()))


def box_overlap_pairs(ext_ds, span_cap: int = 20000, n_buckets: int = 256):
    """2-D rectangle-overlap spatial join over integer-mdeg bboxes: all
    pairs (a < b) of boxes that intersect (closed edges), exactly once each.

    The R-tree-free distributed shape: boxes wider than ``span_cap`` in
    either axis are excluded (the compactness filter the oracle mirrors);
    the grid pitch EQUALS the cap, so every surviving box covers at most
    2x2 grid cells.  Each box scatters to its covered cells (<=4 rows), a
    bucketed groupby co-locates cells, and within each cell an O(k^2)
    numpy broadcast finds intersections — but a pair is REPORTED only in
    the cell containing the top-left corner of the intersection rectangle
    (the classic grid-join dedup rule), so output needs no distinct pass.

    Scale note: per-cell work is quadratic in cell population; the cap
    bounds box size, not density — a city every page mentions makes a hot
    cell.  At that point lower ``span_cap`` (finer pitch) or pre-aggregate
    identical boxes; both preserve exactness.

    Input columns: doc_id, lat_min, lat_max, lon_min, lon_max (int mdeg).
    Output: doc_a, doc_b (int64, doc_a < doc_b).
    """
    from .assemble import hash_bucket

    OFF_LON, OFF_LAT = 180000, 90000  # shift to nonnegative before floor-div

    def scatter(batch: pa.Table) -> pa.Table:
        span_ok = pa.compute.and_(
            pa.compute.less_equal(
                pa.compute.subtract(batch.column("lat_max"), batch.column("lat_min")),
                span_cap,
            ),
            pa.compute.less_equal(
                pa.compute.subtract(batch.column("lon_max"), batch.column("lon_min")),
                span_cap,
            ),
        )
        t = batch.filter(span_ok)
        n = t.num_rows
        doc = t.column("doc_id").to_numpy()
        x0 = t.column("lon_min").to_numpy() + OFF_LON
        x1 = t.column("lon_max").to_numpy() + OFF_LON
        y0 = t.column("lat_min").to_numpy() + OFF_LAT
        y1 = t.column("lat_max").to_numpy() + OFF_LAT
        cx0, cx1 = x0 // span_cap, x1 // span_cap
        cy0, cy1 = y0 // span_cap, y1 // span_cap
        # up to 4 covered cells per box; mask the degenerate duplicates
        dx = np.tile(np.array([0, 1, 0, 1]), n)
        dy = np.tile(np.array([0, 0, 1, 1]), n)
        cxr = np.repeat(cx0, 4) + dx * np.repeat(cx1 - cx0, 4)
        cyr = np.repeat(cy0, 4) + dy * np.repeat(cy1 - cy0, 4)
        keep = ((dx == 0) | (np.repeat(cx1 > cx0, 4))) & (
            (dy == 0) | (np.repeat(cy1 > cy0, 4))
        )
        cell = (cyr * 200000 + cxr)[keep]
        rep = np.repeat(np.arange(n), 4)[keep]
        return pa.table({
            "cell": pa.array(cell, pa.int64()),
            "bucket": pa.array(hash_bucket(cell, n_buckets), pa.int64()),
            "doc_id": pa.array(doc[rep], pa.int64()),
            "x0": pa.array(x0[rep], pa.int64()),
            "x1": pa.array(x1[rep], pa.int64()),
            "y0": pa.array(y0[rep], pa.int64()),
            "y1": pa.array(y1[rep], pa.int64()),
        })

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        cell = group.column("cell").to_numpy()
        doc = group.column("doc_id").to_numpy()
        x0 = group.column("x0").to_numpy()
        x1 = group.column("x1").to_numpy()
        y0 = group.column("y0").to_numpy()
        y1 = group.column("y1").to_numpy()
        order = np.lexsort((doc, cell))
        cell, doc = cell[order], doc[order]
        x0, x1, y0, y1 = x0[order], x1[order], y0[order], y1[order]
        bounds = np.flatnonzero(np.diff(cell)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cell)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):  # loop over CELL RUNS, not rows
            k = e - s
            if k < 2:
                continue
            i, j = np.triu_indices(k, 1)
            xi0, xj0 = x0[s:e][i], x0[s:e][j]
            yi0, yj0 = y0[s:e][i], y0[s:e][j]
            hit = (
                (xi0 <= x1[s:e][j]) & (xj0 <= x1[s:e][i])
                & (yi0 <= y1[s:e][j]) & (yj0 <= y1[s:e][i])
            )
            # report only where the intersection's min corner falls in
            # THIS cell — exactly-once emission across cells
            ix = np.maximum(xi0, xj0)
            iy = np.maximum(yi0, yj0)
            hit &= (iy // span_cap) * 200000 + ix // span_cap == cell[s]
            if hit.any():
                a = doc[s:e][i[hit]]
                b = doc[s:e][j[hit]]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
        if not out_a:
            return pa.table({
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
            })
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
        })

    return (
        ext_ds.map_batches(scatter, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )
