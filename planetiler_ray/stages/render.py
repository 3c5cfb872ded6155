"""Render stage: world-geometry features -> per-(zoom, tile) clipped rows.

The reference's ``render/FeatureRenderer.java:63-111`` semantics: for each
feature, for each zoom in [min_zoom, max_zoom]: scale, skip if smaller than
``min_pixel_size`` (sqrt-area for polygons, length for lines), simplify at
the per-zoom pixel tolerance, slice into tiles (``TiledGeometry``).  Output
rows carry tile-local pixel geometry as WKB in the ``geom_px`` column.

Used as a ``map_batches`` body over a Dataset of feature rows with lon/lat
WKB geometry (``geom_wkb``) — each input row explodes into many tile rows
(THE record-count-exploding op, SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import clip, mercator, tile, wkb
from ..geo.simplify import simplify_dp

DEFAULT_TOLERANCE_PX = 0.5
DEFAULT_MIN_PIXEL_SIZE = 1.0


def _project_ring(ring_lonlat: np.ndarray) -> np.ndarray:
    return np.column_stack(
        [
            mercator.lon_to_world_x(ring_lonlat[:, 0]),
            mercator.lat_to_world_y(ring_lonlat[:, 1]),
        ]
    )


def _ring_area_signed(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def _ring_area_world(ring: np.ndarray) -> float:
    return abs(_ring_area_signed(ring))


def _orient_polygon(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Normalize MVT winding in y-down coords: exterior (ring 0) positive
    shoelace area, holes negative (``VectorTile.java`` enforces the same
    before encode).  Lon/lat sources are typically OGC CCW, which flips to
    negative under the y-down mercator projection — without this, spec
    decoders read exteriors as holes.  Clipping preserves orientation, so
    normalizing once here covers every sliced tile downstream."""
    out = []
    for i, r in enumerate(rings):
        a = _ring_area_signed(r)
        want_pos = i == 0
        if (a < 0) == want_pos:
            r = r[::-1].copy()
        out.append(r)
    return out


def render_geometry_rows(
    feature_id: int,
    kind: str,
    geom_lonlat,
    layer: str,
    attrs_row: dict,
    min_zoom: int,
    max_zoom: int,
    buffer_px: float = clip.DEFAULT_BUFFER_PX,
    min_pixel_size: float = DEFAULT_MIN_PIXEL_SIZE,
    tolerance_px: float = DEFAULT_TOLERANCE_PX,
    zooms=None,
):
    """Generator of per-tile row dicts for one feature (lines/polygons).

    ``geom_lonlat``: polygon -> list of rings; linestring -> (n,2) array.
    ``zooms``: optional explicit zoom list; intersected with [min, max].
    """
    zoom_iter = [z for z in (zooms if zooms is not None else range(min_zoom, max_zoom + 1))
                 if min_zoom <= z <= max_zoom]
    if kind == "polygon":
        rings_w = _orient_polygon([_project_ring(r) for r in geom_lonlat])
        area_w = _ring_area_world(rings_w[0])
        for z in zoom_iter:
            px_per_world = 256.0 * (1 << z)
            if np.sqrt(area_w) * px_per_world < min_pixel_size:
                continue
            tol_world = tolerance_px / px_per_world
            simp = [simplify_dp(r, tol_world, is_ring=True) for r in rings_w]
            simp = [r for r in simp if len(r) >= 4]
            if not simp:
                continue
            for tx, ty, rings_px, is_fill in clip.polygon_tiles(simp, z, buffer_px):
                yield {
                    "tile_id": int(tile.encode_tile_id(z, tx, ty)),
                    "z": z,
                    "tile_x": int(tx),
                    "tile_y": int(ty),
                    "layer": layer,
                    "kind": "polygon",
                    "geom_px": wkb.encode_wkb("polygon", rings_px),
                    "is_fill": bool(is_fill),
                    "feature_id": feature_id,
                    **attrs_row,
                }
    elif kind == "linestring":
        line_w = _project_ring(np.asarray(geom_lonlat))
        seg = np.diff(line_w, axis=0)
        length_w = float(np.sum(np.hypot(seg[:, 0], seg[:, 1])))
        for z in zoom_iter:
            px_per_world = 256.0 * (1 << z)
            if length_w * px_per_world < min_pixel_size:
                continue
            tol_world = tolerance_px / px_per_world
            simp = simplify_dp(line_w, tol_world)
            for tx, ty, parts_px in clip.line_tiles(simp, z, buffer_px):
                yield {
                    "tile_id": int(tile.encode_tile_id(z, tx, ty)),
                    "z": z,
                    "tile_x": int(tx),
                    "tile_y": int(ty),
                    "layer": layer,
                    "kind": "linestring",
                    "geom_px": wkb.encode_wkb("multilinestring", parts_px),
                    "is_fill": False,
                    "feature_id": feature_id,
                    **attrs_row,
                }
    else:
        raise ValueError(kind)


def render_admin_batch(batch: pa.Table, min_zoom=None, max_zoom=None, zooms=None) -> pa.Table:
    """map_batches body for the admin_polygons table (FIXTURES.md §2 schema:
    admin_id, name, iso_code, geom_wkb lon/lat, min_zoom, max_zoom)."""
    rows: list[dict] = []
    for i in range(batch.num_rows):
        geom_kind, rings = wkb.decode_wkb(batch.column("geom_wkb")[i].as_py())
        polys = rings if geom_kind == "multipolygon" else [rings]
        mz = int(batch.column("min_zoom")[i].as_py()) if min_zoom is None else min_zoom
        xz = int(batch.column("max_zoom")[i].as_py()) if max_zoom is None else max_zoom
        attrs = {
            "name": batch.column("name")[i].as_py(),
            "iso_code": batch.column("iso_code")[i].as_py(),
        }
        for poly_rings in polys:
            rows.extend(
                render_geometry_rows(
                    feature_id=int(batch.column("admin_id")[i].as_py()),
                    kind="polygon",
                    geom_lonlat=poly_rings,
                    layer="admin",
                    attrs_row=attrs,
                    min_zoom=mz,
                    max_zoom=xz,
                    zooms=zooms,
                )
            )
    if not rows:
        return pa.table(
            {
                "tile_id": pa.array([], pa.int64()),
                "z": pa.array([], pa.int64()),
                "tile_x": pa.array([], pa.int64()),
                "tile_y": pa.array([], pa.int64()),
                "layer": pa.array([], pa.string()),
                "kind": pa.array([], pa.string()),
                "geom_px": pa.array([], pa.binary()),
                "is_fill": pa.array([], pa.bool_()),
                "feature_id": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
                "iso_code": pa.array([], pa.string()),
            }
        )
    cols = {k: [r.get(k) for r in rows] for k in rows[0]}
    return pa.table(cols)
