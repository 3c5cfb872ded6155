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
