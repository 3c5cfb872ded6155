"""Spatial keying: assign web-mercator tiles (all zooms), S2 cells and hex
cells to point rows — vectorized ``map_batches`` bodies over Arrow batches.

This is the zoom-range-expansion analogue of the reference's render step
(``render/FeatureRenderer.java:63-98``: for each feature, for each zoom in
[min_zoom..max_zoom], emit per-tile rows).  For points the expansion is pure
integer math — no clipping — plus buffer-duplication into neighboring tiles
(``TiledGeometry.java:245-268`` fast path) handled by
``geo.clip.point_tiles_vec``.

DuckDB-oracle-mirrored formulas: see ``planetiler_ray.oracle.sql_tile_expr``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import clip, hexgrid, mercator, s2, tile


def assign_tiles(batch: pa.Table, zooms=None, lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Point rows -> (row replicated per zoom) with tile_x/tile_y/tile_id.

    No buffer duplication (one tile per point per zoom) — this is the
    oracle-checkable variant used by q_tile_counts.
    """
    if zooms is None:
        zooms = list(range(15))
    lat = batch.column(lat_col).to_numpy()
    lon = batch.column(lon_col).to_numpy()
    wx = mercator.lon_to_world_x(lon)
    wy = mercator.lat_to_world_y(lat)
    n = len(lat)
    zs, txs, tys = [], [], []
    for z in zooms:
        zs.append(np.full(n, z, dtype=np.int64))
        txs.append(mercator.world_to_tile(wx, z))
        tys.append(mercator.world_to_tile(wy, z))
    z_arr = np.concatenate(zs)
    tx = np.concatenate(txs)
    ty = np.concatenate(tys)
    idx = np.tile(np.arange(n, dtype=np.int64), len(zooms))
    take = pa.array(idx, pa.int64())
    cols = {name: batch.column(name).take(take) for name in batch.column_names}
    cols["z"] = pa.array(z_arr, pa.int64())
    cols["tile_x"] = pa.array(tx, pa.int64())
    cols["tile_y"] = pa.array(ty, pa.int64())
    cols["tile_id"] = pa.array(tile.encode_tile_id(z_arr, tx, ty), pa.int64())
    return pa.table(cols)


def assign_cells(batch: pa.Table, s2_level: int = 12, hex_res: int = 9,
                 lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Add s2_cell and hex_cell columns (no row expansion)."""
    lat = batch.column(lat_col).to_numpy()
    lon = batch.column(lon_col).to_numpy()
    wx = mercator.lon_to_world_x(lon)
    wy = mercator.lat_to_world_y(lat)
    out = batch.append_column("s2_cell", pa.array(s2.cell_id(lon, lat, s2_level), pa.int64()))
    return out.append_column("hex_cell", pa.array(hexgrid.hex_cell(wx, wy, hex_res), pa.int64()))


def label_grid_prune(batch: pa.Table, grid_by_zoom, limit_by_zoom,
                     sort_cols=("feature_id",)) -> pa.Table:
    """PRE-shuffle partial label-grid pruning (the hot-tile salting combiner).

    Top-k per (tile, grid-cell) is distributive: keeping the k best rows per
    cell within every batch, then the exact k best per cell in the final
    assembler, yields byte-identical output to no pruning — while the skewed
    hot tile (the Paris cluster) sheds most of its rows BEFORE the all-to-all
    shuffle.  This is the Ray-native restatement of the reference's
    stream-counting early drop (``FeatureGroup.add:616-637``) + the salted
    repartition called for by BASELINE.json's north_rule (the per-batch
    partials are the salt partitions; determinism is test-pinned).

    ``grid_by_zoom`` / ``limit_by_zoom``: callables z -> px / k (None = keep).
    ``sort_cols`` MUST match the assembler's within-cell ordering
    (sort_key then feature_id when a sort-key column exists) or the partial
    top-k would keep different rows than the final exact top-k.
    """
    z = batch.column("z").to_numpy()
    px = batch.column("px").to_numpy()
    py = batch.column("py").to_numpy()
    tile_id = batch.column("tile_id").to_numpy()
    n = len(z)
    keep = np.ones(n, dtype=bool)
    sort_arrays = [batch.column(c).to_numpy() for c in sort_cols]
    # the assembler applies label-grid limits PER LAYER — the partial top-k
    # must group the same way or multi-layer streams would over-prune
    if "layer" in batch.schema.names:
        _, layer_code = np.unique(
            np.asarray(batch.column("layer").to_pylist(), dtype=object),
            return_inverse=True,
        )
        layer_code = layer_code.astype(np.int64)
    else:
        layer_code = np.zeros(n, dtype=np.int64)
    for zz in np.unique(z):
        grid = grid_by_zoom(int(zz))
        limit = limit_by_zoom(int(zz))
        if not grid or not limit:
            continue
        m = np.flatnonzero(z == zz)
        cell = (
            np.floor_divide(px[m], grid).astype(np.int64) * 100003
            + np.floor_divide(py[m], grid).astype(np.int64)
        )
        # pure-numpy "keep first `limit` per (tile, cell) in sort order":
        # lexsort, then rank-within-run via a running group-start index
        keys = [a[m] for a in reversed(sort_arrays)] + [cell, layer_code[m], tile_id[m]]
        order = np.lexsort(keys)
        tid_s = tile_id[m][order]
        lay_s = layer_code[m][order]
        cell_s = cell[order]
        new_grp = np.concatenate(
            [[True], (tid_s[1:] != tid_s[:-1]) | (lay_s[1:] != lay_s[:-1])
             | (cell_s[1:] != cell_s[:-1])]
        )
        seq = np.arange(len(order), dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_grp, seq, 0))
        rank = seq - start
        keep[m[order[rank >= limit]]] = False
    return batch.filter(pa.array(keep))


def slice_points(batch: pa.Table, zooms=None, buffer_px: float = 4.0,
                 lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Point rows -> per-(zoom, tile) rows WITH buffer duplication and
    tile-local pixel coords — the real render-path expansion feeding the
    tile-keyed shuffle.

    Output adds: z, tile_x, tile_y, tile_id, px, py.
    """
    if zooms is None:
        zooms = list(range(15))
    lat = batch.column(lat_col).to_numpy()
    lon = batch.column(lon_col).to_numpy()
    wx = mercator.lon_to_world_x(lon)
    wy = mercator.lat_to_world_y(lat)
    srcs, zs, txs, tys, pxs, pys = [], [], [], [], [], []
    for z in zooms:
        src, tx, ty, px, py = clip.point_tiles_vec(wx, wy, z, buffer_px)
        srcs.append(src)
        zs.append(np.full(len(src), z, dtype=np.int64))
        txs.append(tx)
        tys.append(ty)
        pxs.append(px)
        pys.append(py)
    src = np.concatenate(srcs)
    z_arr = np.concatenate(zs)
    tx = np.concatenate(txs)
    ty = np.concatenate(tys)
    take = pa.array(src, pa.int64())
    cols = {name: batch.column(name).take(take) for name in batch.column_names}
    cols["z"] = pa.array(z_arr, pa.int64())
    cols["tile_x"] = pa.array(tx, pa.int64())
    cols["tile_y"] = pa.array(ty, pa.int64())
    cols["tile_id"] = pa.array(tile.encode_tile_id(z_arr, tx, ty), pa.int64())
    cols["px"] = pa.array(np.concatenate(pxs), pa.float64())
    cols["py"] = pa.array(np.concatenate(pys), pa.float64())
    return pa.table(cols)
