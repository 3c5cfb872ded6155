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
import pandas as pd
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


# ----------------------------------------------------- raster <-> vector --

def zonal_stats(points_ds, rect_rows, z: int = 8,
                lat_col: str = "lat", lon_col: str = "lon"):
    """Raster zonal statistics: rasterize points onto the zoom-``z``
    web-mercator grid (per-batch partial counts -> ONE bounded groupby-sum,
    state <= 4**z cells), then assign each occupied cell to the axis-aligned
    zone whose tile-space range covers it and reduce per zone.

    ``rect_rows`` is the tiny zone table [(zone_id, lon_w, lat_s, lon_e,
    lat_n)] — broadcast by value into the cell->zone map stage (closure over
    a few hundred floats, NOT a shuffle join).  Zone ranges are half-open in
    tile space: a cell cx belongs to the zone iff ``tile(lon_w) <= cx <
    tile(lon_e)`` (same for y with the north edge first, since world-y grows
    southward) — both computed with the identical forward-mercator chain the
    tile oracles mirror, so the assignment is float-parity-exact against
    SQL.  Fringe cells outside every zone are dropped on both sides.

    Output per zone: (zone_id, n_cells, n_points, max_cell_n) — the classic
    zonal max/sum/count over a density raster.  Scale: the raster is
    bounded by 4**z regardless of input rows; the zone map is O(log zones)
    per cell via two searchsorted probes when zones form a grid, O(zones)
    otherwise (here: linear scan over <=25 rects, vectorized per column).
    """
    from ray.data.aggregate import Count, Max, Sum

    n_side = 1 << z
    zone_id = np.array([r[0] for r in rect_rows], np.int64)
    x_w = mercator.world_to_tile(
        mercator.lon_to_world_x(np.array([r[1] for r in rect_rows])), z)
    x_e = mercator.world_to_tile(
        mercator.lon_to_world_x(np.array([r[3] for r in rect_rows])), z)
    y_n = mercator.world_to_tile(
        mercator.lat_to_world_y(np.array([r[4] for r in rect_rows])), z)
    y_s = mercator.world_to_tile(
        mercator.lat_to_world_y(np.array([r[2] for r in rect_rows])), z)

    def partial_counts(batch: pa.Table) -> pa.Table:
        lat = batch.column(lat_col).to_numpy()
        lon = batch.column(lon_col).to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    def assign_zone(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        n = batch.column("n").to_numpy()
        cx = cell % n_side
        cy = cell // n_side
        zid = np.full(len(cell), -1, np.int64)
        for i in range(len(zone_id)):
            m = (cx >= x_w[i]) & (cx < x_e[i]) & (cy >= y_n[i]) & (cy < y_s[i])
            zid[m] = zone_id[i]
        keep = zid >= 0
        return pa.table({
            "zone_id": pa.array(zid[keep], pa.int64()),
            "n": pa.array(n[keep], pa.int64()),
        })

    return (
        points_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(assign_zone, batch_format="pyarrow")
        .groupby("zone_id")
        .aggregate(
            Count(alias_name="n_cells"),
            Sum("n", alias_name="n_points"),
            Max("n", alias_name="max_cell_n"),
        )
    )


def raster_distance(points_ds, z: int = 6, threshold: int = 2,
                    max_dist: int = 2,
                    lat_col: str = "lat", lon_col: str = "lon"):
    """Grid distance transform (proximity raster): hop distance from every
    cell to the nearest occupied cell, capped at ``max_dist`` — the raster
    op behind "distance to nearest road/coast" layers.

    Multi-source BFS as Dataset rounds: the occupied raster (ONE combining
    shuffle, state <= 4**z cells) seeds dist=0; each round expands the
    frontier by the 4 arithmetic neighbors (no edge table — neighbors are
    cell±1 / cell±n_side with bound guards) and a groupby-min keeps the
    first (= shortest) label per cell.  Exactly ``max_dist`` rounds, each a
    small shuffle over <= 5x the labeled set; per-round state is bounded by
    the raster size, never by input rows.

    Returns (cell, dist) with dist in [0, max_dist].
    """
    from ray.data.aggregate import Min, Sum

    n_side = 1 << z

    def partial_counts(batch: pa.Table) -> pa.Table:
        lat = batch.column(lat_col).to_numpy()
        lon = batch.column(lon_col).to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    def seed(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy()
        cell = batch.column("cell").to_numpy()[n >= threshold]
        return pa.table({
            "cell": pa.array(cell, pa.int64()),
            "dist": pa.array(np.zeros(len(cell), np.int64), pa.int64()),
        })

    state = (
        points_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(seed, batch_format="pyarrow")
        .materialize()
    )

    def expand(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        dist = batch.column("dist").to_numpy()
        x = cell % n_side
        y = cell // n_side
        outs_c, outs_d = [cell], [dist]
        for delta, mask in ((1, x < n_side - 1), (-1, x > 0),
                            (n_side, y < n_side - 1), (-n_side, y > 0)):
            outs_c.append(cell[mask] + delta)
            outs_d.append(dist[mask] + 1)
        return pa.table({
            "cell": pa.array(np.concatenate(outs_c), pa.int64()),
            "dist": pa.array(np.concatenate(outs_d), pa.int64()),
        })

    for _ in range(max_dist):
        state = (
            state.map_batches(expand, batch_format="pyarrow")
            .groupby("cell")
            .aggregate(Min("dist", alias_name="dist"))
            .materialize()
        )
    return state


def _grid_edges(cells: np.ndarray, n_side: int):
    """4-connectivity edges (index pairs) of a SORTED occupied-cell array
    via sorted membership probes (searchsorted east/south)."""
    m = len(cells)
    x = cells % n_side
    eis, ejs = [], []
    for delta, mask in ((1, x < n_side - 1), (n_side, np.ones(m, bool))):
        tgt = cells + delta
        pos = np.searchsorted(cells, tgt)
        ok = mask & (pos < m)
        ok[ok] = cells[pos[ok]] == tgt[ok]
        eis.append(np.flatnonzero(ok))
        ejs.append(pos[ok])
    return np.concatenate(eis), np.concatenate(ejs)


def _label_grid_components(cells: np.ndarray, n_side: int,
                           edges=None) -> np.ndarray:
    """Vectorized union-find over a sorted occupied-cell array: returns the
    component-min cell id per cell.  4-connectivity edges come from sorted
    membership probes (searchsorted east/south); labels converge by
    min-propagation + pointer jumping in O(log diameter) numpy passes."""
    m = len(cells)
    lab = np.arange(m, dtype=np.int64)
    if m == 0:
        return cells
    ei, ej = _grid_edges(cells, n_side) if edges is None else edges
    while True:
        before = lab.copy()
        low = np.minimum(lab[ei], lab[ej])
        np.minimum.at(lab, ei, low)
        np.minimum.at(lab, ej, low)
        lab = lab[lab[lab]]  # pointer jumping: compress toward the root
        if np.array_equal(lab, before):
            break
    return cells[lab]


def raster_regions(points_ds, z: int = 6, threshold: int = 2,
                   lat_col: str = "lat", lon_col: str = "lon",
                   num_partitions: int = 16, max_rounds: int = 32,
                   small_cells: int = 1 << 22):
    """Raster->vector round trip as a distributed operator (the north-rule
    "raster<->vector" surface, exercised end-to-end rather than only by the
    ``geo.rasterunion`` kernel tests).

    1. **Rasterize**: every point lands in a zoom-``z`` web-mercator grid
       cell (the same integer tile math as the render path); per-batch
       partial counts -> ONE small groupby-sum (combiner before shuffle,
       state bounded by 4**z cells, never by rows).
    2. **Threshold**: cells with ``n >= threshold`` form the occupied mask
       (the binary raster).
    3. **Adjacency**: 4-neighbor edges are derived WITHOUT a pairwise join:
       each occupied cell drops flag 1 on the edge-slot key it can open to
       the east/south and flag 2 on the slot of its west/north neighbor; a
       groupby-sum keeps slots with fsum == 3 (both endpoints occupied).
       One shuffle over <= 2 rows per occupied cell.
    4. **Label**: connected regions via the same distributed min-label
       propagation the dedup suite uses
       (``stages.dedup.connected_components``); self-edges keep singleton
       cells alive.  Rounds are bounded by region diameter <= 2*2**z —
       ``max_rounds`` guards the pathological snake; the synthetic raster's
       regions have diameter <= ~8.
    5. **Vectorize**: one feature per region — cell count, point mass and
       the integer bbox — via a native hash join (labels x cell stats) and
       a final tiny groupby.

    Output: (region_id, n_cells, n_points, min_x, min_y, max_x, max_y)
    where region_id = min cell id of the region.  The reference's analogue
    is the raster buffer-union-unbuffer merge (`FeatureMerge.java`
    mergeNearbyPolygons) — this is the same raster trip expressed as
    Dataset stages so it scales past one machine's raster.

    **Two labeling paths.** The occupied raster is bounded by ``4**z``
    cells no matter how many input rows there are, so when ``4**z <=
    small_cells`` (default 4M cells ⇒ z <= 11) the labeling runs as a
    single vectorized union-find on the driver over the already-tiny
    materialized ``occ`` table — O(cells · log diameter) numpy, no
    per-round shuffles.  Deeper zooms (z=14 ⇒ 268M cells) take the
    distributed min-label propagation path (steps 3–4 above).  Both paths
    produce identical labels (component-min cell id).
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    from .dedup import connected_components

    n_side = 1 << z

    def partial_counts(batch: pa.Table) -> pa.Table:
        lat = batch.column(lat_col).to_numpy()
        lon = batch.column(lon_col).to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    def keep_occupied(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy()
        return batch.filter(pa.array(n >= threshold))

    occ = (
        points_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(keep_occupied, batch_format="pyarrow")
        .materialize()  # tiny (<= occupied cells); reused by 3 consumers
    )

    if n_side * n_side <= small_cells:
        # bounded-raster fast path: occ has <= 4**z rows by construction
        # (a constant of the query, independent of input size), so the
        # labeling + vectorization is one driver-side numpy pass.
        import ray.data

        df = occ.to_pandas()
        order = np.argsort(df["cell"].to_numpy())
        cells = df["cell"].to_numpy()[order]
        nvals = df["n"].to_numpy()[order]
        ei, ej = _grid_edges(cells, n_side)
        region = _label_grid_components(cells, n_side, edges=(ei, ej))
        x = cells % n_side
        y = cells // n_side
        uniq, inv, counts = np.unique(region, return_inverse=True,
                                      return_counts=True)
        k = len(uniq)
        npts = np.zeros(k, np.int64)
        np.add.at(npts, inv, nvals)
        # perimeter in cell-edge units: 4 per cell minus 2 per internal edge
        edge_cnt = np.zeros(k, np.int64)
        np.add.at(edge_cnt, inv[ei], 1)
        perim = 4 * counts.astype(np.int64) - 2 * edge_cnt
        minx = np.full(k, n_side, np.int64)
        miny = np.full(k, n_side, np.int64)
        maxx = np.full(k, -1, np.int64)
        maxy = np.full(k, -1, np.int64)
        np.minimum.at(minx, inv, x)
        np.minimum.at(miny, inv, y)
        np.maximum.at(maxx, inv, x)
        np.maximum.at(maxy, inv, y)
        return ray.data.from_arrow(pa.table({
            "region_id": pa.array(uniq, pa.int64()),
            "n_cells": pa.array(counts.astype(np.int64), pa.int64()),
            "n_points": pa.array(npts, pa.int64()),
            "perimeter": pa.array(perim, pa.int64()),
            "min_x": pa.array(minx, pa.int64()),
            "min_y": pa.array(miny, pa.int64()),
            "max_x": pa.array(maxx, pa.int64()),
            "max_y": pa.array(maxy, pa.int64()),
        }))

    def edge_flags(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        x = cell % n_side
        y = cell // n_side
        keys, flags = [], []
        for mask, key, flag in (
            (x < n_side - 1, 2 * cell, 1),          # east slot, opener
            (x > 0, 2 * (cell - 1), 2),             # east slot of west nbr
            (y < n_side - 1, 2 * cell + 1, 1),      # south slot, opener
            (y > 0, 2 * (cell - n_side) + 1, 2),    # south slot of north nbr
        ):
            keys.append(key[mask])
            flags.append(np.full(int(mask.sum()), flag, dtype=np.int64))
        return pa.table(
            {
                "ekey": pa.array(np.concatenate(keys), pa.int64()),
                "flag": pa.array(np.concatenate(flags), pa.int64()),
            }
        )

    def to_edges(batch: pa.Table) -> pa.Table:
        k = batch.column("ekey").to_numpy()
        s = batch.column("fsum").to_numpy()
        k = k[s == 3]
        a = k >> 1
        b = a + np.where(k & 1 == 0, 1, n_side)
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    adj = (
        occ.map_batches(edge_flags, batch_format="pyarrow")
        .groupby("ekey")
        .aggregate(Sum("flag", alias_name="fsum"))
        .map_batches(to_edges, batch_format="pyarrow")
    )
    self_edges = occ.map_batches(
        lambda b: pa.table({"a": b.column("cell"), "b": b.column("cell")}),
        batch_format="pyarrow",
    )
    labels = connected_components(
        adj.union(self_edges), max_rounds=max_rounds
    ).map_batches(
        lambda b: pa.table({"cell": b.column("node"), "region_id": b.column("comp")}),
        batch_format="pyarrow",
    )

    def add_xy(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        deg = batch.column("deg").to_numpy()
        return (
            batch.append_column("x", pa.array(cell % n_side, pa.int64()))
            .append_column("y", pa.array(cell // n_side, pa.int64()))
            .append_column("perim_part", pa.array(4 - deg, pa.int64()))
        )

    # merge labels x counts x degrees WITHOUT a binary join: the first two
    # sides hold exactly one row per occupied cell, so union + groupby-sum
    # with 0-fill on the missing columns reconstructs the joined row
    # (robust to empty shuffle partitions, one exchange); the degree side
    # adds 1 per internal-edge endpoint for the perimeter measure.
    def fill_cols(keep: str):
        def f(batch: pa.Table) -> pa.Table:
            def zeros():
                return pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())

            return pa.table({
                "cell": batch.column("cell"),
                "n": batch.column("n") if keep == "n" else zeros(),
                "region_id": (batch.column("region_id")
                              if keep == "region_id" else zeros()),
                "deg": (batch.column("deg") if keep == "deg" else zeros()),
            })

        return f

    def edge_degrees(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        return pa.table({
            "cell": pa.array(np.concatenate([a, b]), pa.int64()),
            "deg": pa.array(np.ones(2 * len(a), np.int64), pa.int64()),
        })

    merged = (
        occ.map_batches(fill_cols("n"), batch_format="pyarrow")
        .union(labels.map_batches(fill_cols("region_id"), batch_format="pyarrow"))
        .union(adj.map_batches(edge_degrees, batch_format="pyarrow")
               .map_batches(fill_cols("deg"), batch_format="pyarrow"))
        .groupby("cell")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("region_id", alias_name="region_id"),
            Sum("deg", alias_name="deg"),
        )
    )
    return (
        merged.map_batches(add_xy, batch_format="pyarrow")
        .groupby("region_id")
        .aggregate(
            Count(alias_name="n_cells"),
            Sum("n", alias_name="n_points"),
            Sum("perim_part", alias_name="perimeter"),
            Min("x", alias_name="min_x"),
            Min("y", alias_name="min_y"),
            Max("x", alias_name="max_x"),
            Max("y", alias_name="max_y"),
        )
    )


def dbscan_census(points_ds, z: int = 6, minpts: int = 3,
                  lat_col: str = "lat", lon_col: str = "lon"):
    """Grid DBSCAN (the cell-based DBSCAN variant every big-data system
    ships — density clustering over a bounded raster): a zoom-``z`` cell
    is CORE if its 3x3 neighborhood holds >= ``minpts`` points; clusters
    are 4-connected components of core cells; an occupied non-core cell
    4-adjacent to a core cell is BORDER (assigned to the min-labelled
    adjacent cluster); everything else occupied is NOISE.

    Scale shape: identical to :func:`raster_regions` — per-batch partial
    cell counts -> ONE groupby-sum bounds state at 4**z cells (a constant
    of the query, independent of row count); the density / labeling /
    census passes then run vectorized on the materialized <=4**z-row cell
    table (the documented bounded-raster fast path; past z~11 the
    distributed neighbor-emission + min-label-propagation path of
    ``raster_regions`` applies verbatim).

    Output: one row per cluster (cluster_id = min core cell id,
    core_cells, core_points, other_cells, other_points = border stats)
    plus ONE noise row (cluster_id = -1, zeros, noise cells/points) —
    always emitted, zero-filled when there is no noise.
    """
    from ray.data.aggregate import Sum
    import ray.data

    n_side = 1 << z

    def partial_counts(batch: pa.Table) -> pa.Table:
        lat = batch.column(lat_col).to_numpy()
        lon = batch.column(lon_col).to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    df = (
        points_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()  # <= 4**z rows by construction
    )
    order = np.argsort(df["cell"].to_numpy())
    cells = df["cell"].to_numpy()[order]
    n = df["n"].to_numpy()[order]
    x = cells % n_side
    y = cells // n_side
    m = len(cells)

    # 3x3 neighborhood density via sorted membership probes
    dens = np.zeros(m, np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            valid = ((x + dx >= 0) & (x + dx < n_side)
                     & (y + dy >= 0) & (y + dy < n_side))
            tgt = cells + dy * n_side + dx
            pos = np.searchsorted(cells, tgt)
            ok = valid & (pos < m)
            ok[ok] = cells[pos[ok]] == tgt[ok]
            dens[ok] += n[pos[ok]]

    is_core = dens >= minpts
    core_cells = cells[is_core]
    core_n = n[is_core]
    region = _label_grid_components(core_cells, n_side)

    # border: occupied non-core, 4-adjacent to a core cell; cluster =
    # min region over adjacent cores (deterministic assignment)
    nc_cells = cells[~is_core]
    nc_n = n[~is_core]
    nx, ny = nc_cells % n_side, nc_cells // n_side
    INF = np.int64(2**62)
    bcluster = np.full(len(nc_cells), INF, np.int64)
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        valid = ((nx + dx >= 0) & (nx + dx < n_side)
                 & (ny + dy >= 0) & (ny + dy < n_side))
        tgt = nc_cells + dy * n_side + dx
        pos = np.searchsorted(core_cells, tgt)
        ok = valid & (pos < len(core_cells))
        ok[ok] = core_cells[pos[ok]] == tgt[ok]
        bcluster[ok] = np.minimum(bcluster[ok], region[pos[ok]])
    is_border = bcluster < INF

    # census
    uniq, inv = np.unique(region, return_inverse=True)
    core_cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    core_pts = np.zeros(len(uniq), np.int64)
    np.add.at(core_pts, inv, core_n)
    bc = np.zeros(len(uniq), np.int64)
    bp = np.zeros(len(uniq), np.int64)
    if is_border.any():
        bu = np.searchsorted(uniq, bcluster[is_border])
        np.add.at(bc, bu, 1)
        np.add.at(bp, bu, nc_n[is_border])
    noise_cells = int((~is_border).sum())
    noise_pts = int(nc_n[~is_border].sum())
    out = pd.DataFrame({
        "cluster_id": np.concatenate([uniq, [np.int64(-1)]]),
        "core_cells": np.concatenate([core_cnt, [0]]),
        "core_points": np.concatenate([core_pts, [0]]),
        "other_cells": np.concatenate([bc, [noise_cells]]),
        "other_points": np.concatenate([bp, [noise_pts]]),
    }).astype(np.int64)
    return ray.data.from_pandas(out)


def line_of_sight(points_ds, z: int = 6, threshold: int = 2, k: int = 8,
                  lat_col: str = "lat", lon_col: str = "lon"):
    """Raster line-of-sight / visibility analysis (the viewshed primitive):
    the ``k`` hottest occupied cells of the zoom-``z`` mention raster are
    "towers" (rank by count desc, cell asc); for every tower pair the
    rounded-DDA grid line between cell centers is walked and every
    INTERMEDIATE occupied cell blocks the sight line.

    The DDA step is pure integer rational rounding —
    ``xi = x0 + floor((2*i*dx + s) / (2*s))`` with ``s = max(|dx|,|dy|)``
    — so the SQL twin reproduces the identical walk.  Scale shape: the
    usual bounded-raster reduction (per-batch partials -> ONE groupby-sum,
    state <= 4**z cells); the pair walk runs over k^2/2 * <=2**z tiny
    probes on the materialized bounded cell table (raster_regions' fast
    path contract).  Output per pair: (cell_a, cell_b, n_blockers,
    visible)."""
    from ray.data.aggregate import Sum
    import ray.data

    n_side = 1 << z

    def partial_counts(batch: pa.Table) -> pa.Table:
        lat = batch.column(lat_col).to_numpy()
        lon = batch.column(lon_col).to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    df = (
        points_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()  # <= 4**z rows by construction
    )
    cells = df["cell"].to_numpy()
    n = df["n"].to_numpy()
    occ_mask = n >= threshold
    occ = np.sort(cells[occ_mask])
    occ_n = n[occ_mask]
    # towers: top-k by (count desc, cell asc)
    oc = cells[occ_mask]
    order = np.lexsort((oc, -occ_n))[:k]
    towers = oc[order]
    towers = towers[np.argsort(towers)]  # canonical pair order by cell id

    def occupied(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
        tgt = cy * n_side + cx
        pos = np.searchsorted(occ, tgt)
        ok = pos < len(occ)
        ok[ok] = occ[pos[ok]] == tgt[ok]
        return ok

    rows = []
    tx, ty = towers % n_side, towers // n_side
    for a in range(len(towers)):
        for b in range(a + 1, len(towers)):
            dx = int(tx[b] - tx[a])
            dy = int(ty[b] - ty[a])
            s = max(abs(dx), abs(dy))
            if s <= 1:
                rows.append((int(towers[a]), int(towers[b]), 0, 1))
                continue
            i = np.arange(1, s)
            xi = int(tx[a]) + (2 * i * dx + s) // (2 * s)
            yi = int(ty[a]) + (2 * i * dy + s) // (2 * s)
            blk = int(occupied(xi, yi).sum())
            rows.append((int(towers[a]), int(towers[b]), blk,
                         int(blk == 0)))
    out = pd.DataFrame(rows, columns=["cell_a", "cell_b", "n_blockers",
                                      "visible"]).astype(np.int64)
    return ray.data.from_pandas(out)


def _density_flow_graph(points_ds, z: int, lat_col: str, lon_col: str):
    """Shared D8 routing graph over the mention-density raster: rasterize
    (bounded 4**z cells), then route every cell to its strictly-denser
    max-density 8-neighbor (ties -> smallest target cell id).  Returns
    sorted (cells, n, has_out, target_pos)."""
    from ray.data.aggregate import Sum

    n_side = 1 << z

    def partial_counts(batch: pa.Table) -> pa.Table:
        lat = batch.column(lat_col).to_numpy()
        lon = batch.column(lon_col).to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    df = (
        points_ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()  # <= 4**z rows by construction
    )
    order = np.argsort(df["cell"].to_numpy())
    cells = df["cell"].to_numpy()[order]
    n = df["n"].to_numpy()[order]
    x, y = cells % n_side, cells // n_side
    m = len(cells)

    best_n = np.full(m, -1, np.int64)
    best_cell = np.full(m, 2**62, np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            valid = ((x + dx >= 0) & (x + dx < n_side)
                     & (y + dy >= 0) & (y + dy < n_side))
            tgt = cells + dy * n_side + dx
            pos = np.searchsorted(cells, tgt)
            ok = valid & (pos < m)
            ok[ok] = cells[pos[ok]] == tgt[ok]
            tn = np.where(ok, n[np.where(ok, pos, 0)], -1)
            tc = np.where(ok, tgt, 2**62)
            better = (tn > best_n) | ((tn == best_n) & (tc < best_cell))
            best_n = np.where(better, tn, best_n)
            best_cell = np.where(better, tc, best_cell)
    has_out = best_n > n
    target_pos = np.searchsorted(cells, np.where(has_out, best_cell, cells[0]))
    return cells, n, has_out, target_pos


def watershed_labels(points_ds, z: int = 6,
                     lat_col: str = "lat", lon_col: str = "lon"):
    """Watershed delineation over the density raster: every occupied cell
    is labelled with the terminal SINK its D8 flow path ends at (the
    basin segmentation that pairs with :func:`flow_accumulation`).  The
    routing DAG's paths resolve by pointer jumping in O(log path) numpy
    passes over the bounded cell table.  Output: (cell, sink)."""
    import ray.data

    cells, n, has_out, target_pos = _density_flow_graph(
        points_ds, z, lat_col, lon_col)
    m = len(cells)
    nxt = np.where(has_out, target_pos, np.arange(m))
    while True:
        nn = nxt[nxt]
        if np.array_equal(nn, nxt):
            break
        nxt = nn
    out = pd.DataFrame({
        "cell": cells,
        "sink": cells[nxt],
    }).astype(np.int64)
    return ray.data.from_pandas(out)


def flow_accumulation(points_ds, z: int = 6,
                      lat_col: str = "lat", lon_col: str = "lon"):
    """D8-style flow accumulation over the mention-density raster (the
    hydrology/terrain classic, density standing in for inverse
    elevation): every occupied zoom-``z`` cell routes to its strictly-
    denser max-density 8-neighbor (ties -> smallest target cell id; no
    denser neighbor -> sink), and a cell's accumulation is the number of
    cells whose flow path passes through it (itself included).  The
    routing graph is a DAG by construction (density strictly increases
    along flow), so accumulation is a single pass over cells in
    ascending (density, cell) order.

    Scale shape: the bounded-raster contract — per-batch partials ->
    ONE groupby-sum (state <= 4**z cells), then vectorized neighbor
    probes + one bounded accumulation pass on the materialized cell
    table.  Output: (cell, n, acc, is_sink)."""
    import ray.data

    cells, n, has_out, target_pos = _density_flow_graph(
        points_ds, z, lat_col, lon_col)
    m = len(cells)

    acc = np.ones(m, np.int64)
    for i in np.lexsort((cells, n)):       # ascending (density, cell)
        if has_out[i]:
            acc[target_pos[i]] += acc[i]

    out = pd.DataFrame({
        "cell": cells,
        "n": n,
        "acc": acc,
        "is_sink": (~has_out).astype(np.int64),
    }).astype(np.int64)
    return ray.data.from_pandas(out)


def ridge_cells(points_ds, z: int = 6,
                lat_col: str = "lat", lon_col: str = "lon"):
    """Basin-boundary (ridge) census: pairs of rook-adjacent occupied
    cells whose D8 watersheds differ, counted per unordered sink pair —
    the drainage-divide structure that completes the
    :func:`flow_accumulation` / :func:`watershed_labels` family.
    Output: (sink_a, sink_b, n_edges), sink_a < sink_b."""
    import ray.data

    n_side = 1 << z
    cells, n, has_out, target_pos = _density_flow_graph(
        points_ds, z, lat_col, lon_col)
    m = len(cells)
    nxt = np.where(has_out, target_pos, np.arange(m))
    while True:
        nn = nxt[nxt]
        if np.array_equal(nn, nxt):
            break
        nxt = nn
    sink = cells[nxt]
    x = cells % n_side
    pairs = {}
    for delta, guard in ((1, x < n_side - 1), (n_side, np.ones(m, bool))):
        tgt = cells + delta
        pos = np.searchsorted(cells, tgt)
        ok = guard & (pos < m)
        ok[ok] = cells[pos[ok]] == tgt[ok]
        i = np.flatnonzero(ok)
        j = pos[i]
        diff = sink[i] != sink[j]
        sa = np.minimum(sink[i][diff], sink[j][diff])
        sb = np.maximum(sink[i][diff], sink[j][diff])
        for a, b in zip(sa.tolist(), sb.tolist()):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    out = pd.DataFrame(
        [(a, b, c) for (a, b), c in sorted(pairs.items())],
        columns=["sink_a", "sink_b", "n_edges"],
    ).astype(np.int64)
    return ray.data.from_pandas(out)


def basin_depth(points_ds, z: int = 6,
                lat_col: str = "lat", lon_col: str = "lon"):
    """Flow-path-length histogram: for every occupied cell, the number of
    D8 hops to its terminal sink (0 = the sink itself), censused as
    (depth, n_cells) — the hypsometric companion of
    :func:`watershed_labels`.  Depths resolve by pointer DOUBLING
    (d += d[nxt]; nxt = nxt[nxt]) in O(log path) passes over the bounded
    cell table; recursive step-count SQL twin."""
    import ray.data

    cells, n, has_out, target_pos = _density_flow_graph(
        points_ds, z, lat_col, lon_col)
    m = len(cells)
    nxt = np.where(has_out, target_pos, np.arange(m))
    d = has_out.astype(np.int64)
    while True:
        nn = nxt[nxt]
        if np.array_equal(nn, nxt):
            break
        d = d + d[nxt]
        nxt = nn
    u, c = np.unique(d, return_counts=True)
    out = pd.DataFrame({"depth": u, "n_cells": c}).astype(np.int64)
    return ray.data.from_pandas(out)
