"""Unit tests for the pure-numpy geo kernel (mirrors the reference's
TileCoordTest / TiledGeometryTest / simplifier test strategy, SURVEY.md §5)."""

import numpy as np
import pytest

from planetiler_ray.geo import mercator as M
from planetiler_ray.geo import tile as T
from planetiler_ray.geo.hilbert import hilbert_to_xy, xy_to_hilbert
from planetiler_ray.geo import s2
from planetiler_ray.geo import hexgrid
from planetiler_ray.geo.simplify import simplify_dp, simplify_vw, smooth_chaikin
from planetiler_ray.geo import wkb
from planetiler_ray.geo.pip import PointIndex, PolygonIndex, points_in_polygon
from planetiler_ray.geo import clip
from planetiler_ray.geo import mvt


def test_mercator_roundtrip():
    lon = np.array([-180.0, -74.006, 0.0, 2.3522, 179.999])
    lat = np.array([-85.0, -33.9249, 0.0, 48.8566, 85.0])
    x, y = M.lon_to_world_x(lon), M.lat_to_world_y(lat)
    assert np.all((x >= 0) & (x <= 1) & (y >= 0) & (y <= 1))
    np.testing.assert_allclose(M.world_x_to_lon(x), lon, atol=1e-9)
    np.testing.assert_allclose(M.world_y_to_lat(y), lat, atol=1e-9)
    # known anchor: equator/greenwich is the center of the world square
    assert M.lon_to_world_x(0.0) == 0.5
    assert abs(M.lat_to_world_y(0.0) - 0.5) < 1e-15


def test_tile_assignment_known_values():
    # Paris z12: classic slippy values
    tx, ty = M.lonlat_to_tile(2.3522, 48.8566, 12)
    assert (int(tx), int(ty)) == (2074, 1409)
    tx, ty = M.lonlat_to_tile(-74.006, 40.7128, 10)
    assert (int(tx), int(ty)) == (301, 385)
    # clamping at the edges
    tx, ty = M.lonlat_to_tile(180.0, -90.0, 4)
    assert (int(tx), int(ty)) == (15, 15)


def test_flat_location_roundtrip():
    lon = np.linspace(-179.9, 179.9, 1000)
    lat = np.linspace(-84.9, 84.9, 1000)
    packed = M.encode_flat_location(lon, lat)
    lon2, lat2 = M.decode_flat_location(packed)
    np.testing.assert_allclose(lon2, lon, atol=1e-6)
    np.testing.assert_allclose(lat2, lat, atol=1e-6)


def test_hilbert_roundtrip_and_locality():
    for order in (1, 2, 5, 10):
        n = 1 << order
        xs, ys = np.meshgrid(np.arange(min(n, 32)), np.arange(min(n, 32)))
        d = xy_to_hilbert(order, xs.ravel(), ys.ravel())
        x2, y2 = hilbert_to_xy(order, d)
        np.testing.assert_array_equal(x2, xs.ravel())
        np.testing.assert_array_equal(y2, ys.ravel())
    # the full order-2 curve is a permutation of 0..15
    d = xy_to_hilbert(2, *np.meshgrid(np.arange(4), np.arange(4)))
    assert sorted(d.ravel().tolist()) == list(range(16))
    # consecutive distances are adjacent cells
    x, y = hilbert_to_xy(4, np.arange(256))
    steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert np.all(steps == 1)


def test_tile_id_roundtrip_all_orders():
    rng = np.random.default_rng(0)
    z = rng.integers(0, 15, 500)
    n = np.int64(1) << z
    x = (rng.random(500) * n).astype(np.int64)
    y = (rng.random(500) * n).astype(np.int64)
    for order in (T.XYZ, T.TMS, T.HILBERT):
        tid = T.encode_tile_id(z, x, y, order)
        z2, x2, y2 = T.decode_tile_id(tid, order)
        np.testing.assert_array_equal(z2, z)
        np.testing.assert_array_equal(x2, x)
        np.testing.assert_array_equal(y2, y)
    # zoom offsets: ids of zoom z start exactly after all tiles of zooms < z
    assert T.num_tiles_through(0) == 1
    assert T.num_tiles_through(1) == 5
    assert T.num_tiles_through(2) == 21
    assert int(T.encode_tile_id(1, 0, 0)) == 1
    # convert between orders preserves (z, x, y)
    tid_xyz = T.encode_tile_id(z, x, y, T.XYZ)
    tid2 = T.convert_tile_id(tid_xyz, T.XYZ, T.HILBERT)
    z3, x3, y3 = T.decode_tile_id(tid2, T.HILBERT)
    np.testing.assert_array_equal(x3, x)
    np.testing.assert_array_equal(y3, y)


def test_sort_key_bit_layout():
    rng = np.random.default_rng(1)
    tile = rng.integers(0, T.num_tiles_through(14), 300)
    layer = rng.integers(0, 255, 300)
    sk = rng.integers(T.SORT_KEY_MIN, T.SORT_KEY_MAX + 1, 300)
    hg = rng.integers(0, 2, 300)
    key = T.encode_sort_key(tile, layer, sk, hg)
    t2, l2, s2_, h2 = T.decode_sort_key(key)
    np.testing.assert_array_equal(t2, tile)
    np.testing.assert_array_equal(l2, layer)
    np.testing.assert_array_equal(s2_, sk)
    np.testing.assert_array_equal(h2, hg)
    # int64 order == (tile, layer, sort_key, has_group) lexicographic order
    perm = np.lexsort((hg, sk, layer, tile))
    np.testing.assert_array_equal(np.argsort(key, kind="stable"), perm)


def test_s2_structure():
    lon = np.array([2.3522, -74.006, 139.6917, 151.2093, 0.0])
    lat = np.array([48.8566, 40.7128, 35.6895, -33.8688, -0.001])
    leaf = s2.cell_id(lon, lat, 30)
    assert np.all(s2.cell_level(leaf) == 30)
    c10 = s2.cell_id(lon, lat, 10)
    assert np.all(s2.cell_level(c10) == 10)
    # parent at level 10 of the leaf == direct level-10 cell
    np.testing.assert_array_equal(s2.parent(leaf, 10), c10)
    assert np.all(s2.contains(c10, leaf))
    # nearby points share coarse cells; antipodal points don't
    a = s2.cell_id(np.array([2.35]), np.array([48.85]), 10)
    b = s2.cell_id(np.array([2.36]), np.array([48.86]), 10)
    far = s2.cell_id(np.array([-178.0]), np.array([-48.85]), 10)
    assert s2.parent(a, 5) == s2.parent(b, 5)
    assert s2.parent(a, 2) != s2.parent(far, 2)


def test_hexgrid():
    x = np.array([0.1, 0.100001, 0.9, 0.5])
    y = np.array([0.2, 0.200001, 0.8, 0.5])
    c = hexgrid.hex_cell(x, y, 9)
    assert c[0] == c[1]  # near-identical points share a cell
    assert c[0] != c[2]
    res, q, r = hexgrid.hex_decode(c)
    assert np.all(res == 9)
    # center of a cell maps back to the same cell
    cx, cy = hexgrid.hex_center(c)
    np.testing.assert_array_equal(hexgrid.hex_cell(cx, cy, 9), c)
    # parenting is consistent: parent contains the child center
    p = hexgrid.hex_parent(c, 5)
    res_p, _, _ = hexgrid.hex_decode(p)
    assert np.all(res_p == 5)
    assert len(np.unique(hexgrid.hex_ring1(c[0]))) == 6


def test_simplify_dp():
    # collinear points collapse
    line = np.array([[0.0, 0.0], [1.0, 0.001], [2.0, 0.0], [3.0, 0.001], [4.0, 0.0]])
    out = simplify_dp(line, 0.01)
    np.testing.assert_array_equal(out, line[[0, 4]])
    # large deviation kept
    line2 = np.array([[0.0, 0.0], [2.0, 5.0], [4.0, 0.0]])
    out2 = simplify_dp(line2, 0.5)
    assert len(out2) == 3
    # ring never collapses below 4 points
    ring = np.array([[0, 0], [1, 0.001], [2, 0], [1, -0.001], [0, 0]], dtype=float)
    assert len(simplify_dp(ring, 10.0, is_ring=True)) >= 4


def test_simplify_vw():
    line = np.array([[0.0, 0.0], [1.0, 0.001], [2.0, 0.0], [3.0, 5.0], [4.0, 0.0]])
    out = simplify_vw(line, 0.5)
    # the tiny-area vertex is dropped, the big spike kept
    assert [0.0, 0.0] in out.tolist() and [3.0, 5.0] in out.tolist()
    assert [1.0, 0.001] not in out.tolist()


def test_chaikin():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    sm = smooth_chaikin(sq, is_ring=True)
    assert len(sm) == 9  # 4 segments * 2 + closing


def test_wkb_roundtrip():
    pt = np.array([1.5, -2.5])
    k, d = wkb.decode_wkb(wkb.encode_wkb("point", pt))
    assert k == "point" and np.allclose(d, pt)
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    k, rings = wkb.decode_wkb(wkb.encode_wkb("polygon", [ring, hole]))
    assert k == "polygon" and len(rings) == 2 and np.allclose(rings[1], hole)
    k, parts = wkb.decode_wkb(wkb.encode_wkb("multipolygon", [[ring], [hole]]))
    assert k == "multipolygon" and len(parts) == 2

    # DuckDB spatial-free sanity: duckdb can't parse, but our own decode must
    # be stable across encode(decode(encode(x)))
    b = wkb.encode_wkb("polygon", [ring, hole])
    k2, r2 = wkb.decode_wkb(b)
    assert wkb.encode_wkb(k2, r2) == b


def test_points_in_polygon_with_hole():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
    px = np.array([5.0, 2.0, 11.0, 5.0])
    py = np.array([5.0, 2.0, 5.0, 4.5])
    got = points_in_polygon(px, py, [ring, hole])
    np.testing.assert_array_equal(got, [False, True, False, False])


def test_polygon_index_contain_and_nearest():
    polys = []
    for i in range(4):
        x0 = i * 10.0
        ring = np.array([[x0, 0], [x0 + 8, 0], [x0 + 8, 8], [x0, 8], [x0, 0]])
        polys.append((100 + i, [ring]))
    idx = PolygonIndex(polys)
    px = np.array([4.0, 14.0, 24.0, 34.0, 9.0])
    py = np.array([4.0, 4.0, 4.0, 4.0, 4.0])
    got = idx.get_containing(px, py)
    np.testing.assert_array_equal(got[:4], [100, 101, 102, 103])
    assert got[4] == -1  # in the gap between polygons
    got2 = idx.get_containing_or_nearest(px, py)
    assert got2[4] in (100, 101)  # nearest of the two neighbors (tie -> either)


def test_point_index_nearest():
    ids = np.array([1, 2, 3], dtype=np.int64)
    x = np.array([0.0, 10.0, 20.0])
    y = np.array([0.0, 0.0, 0.0])
    idx = PointIndex(ids, x, y)
    nid, d2 = idx.get_nearest(np.array([1.0, 12.0]), np.array([0.0, 0.0]))
    np.testing.assert_array_equal(nid, [1, 2])
    np.testing.assert_allclose(d2, [1.0, 4.0])
    nid2, _ = idx.get_nearest(np.array([100.0]), np.array([0.0]), max_radius=5.0)
    assert nid2[0] == -1
    assert idx.count_within(np.array([0.0]), np.array([0.0]), 10.0)[0] == 2


def test_point_tiles_buffer_duplication():
    # a point exactly on the corner of 4 tiles at z2 appears in all 4
    wx = np.array([0.5])
    wy = np.array([0.5])
    src, tx, ty, px, py = clip.point_tiles_vec(wx, wy, 2, buffer_px=4)
    tiles = set(zip(tx.tolist(), ty.tolist()))
    assert tiles == {(1, 1), (2, 1), (1, 2), (2, 2)}
    # interior point far from edges -> exactly one tile
    src, tx, ty, px, py = clip.point_tiles_vec(np.array([0.3]), np.array([0.3]), 2)
    assert len(tx) == 1 and (int(tx[0]), int(ty[0])) == (1, 1)
    assert 0 <= px[0] <= 256


def test_line_tiles():
    # horizontal line crossing two z1 tiles
    line = np.array([[0.1, 0.3], [0.9, 0.3]])
    tiles = {(x, y): parts for x, y, parts in clip.line_tiles(line, 1)}
    assert set(tiles) == {(0, 0), (1, 0)}
    # local pixel coords include the buffer overhang
    (p0,) = tiles[(0, 0)]
    assert p0[:, 0].max() <= 256 + 4 and p0[:, 0].min() >= -4


def test_polygon_tiles_with_fill():
    # polygon covering most of the world: at z3 interior tiles must be fills
    ring = np.array([[0.05, 0.05], [0.95, 0.05], [0.95, 0.95], [0.05, 0.95], [0.05, 0.05]])
    results = list(clip.polygon_tiles([ring], 3))
    by_tile = {(x, y): (rings, fill) for x, y, rings, fill in results}
    assert (3, 3) in by_tile and by_tile[(3, 3)][1] is True  # deep interior -> fill
    assert (0, 0) in by_tile and by_tile[(0, 0)][1] is False  # corner -> clipped
    # every tile in 0..7 x 0..7 intersecting the polygon is present
    assert len(by_tile) == 64
    # fill ring is the canonical buffered square
    rings, _ = by_tile[(4, 4)]
    np.testing.assert_array_equal(rings[0], clip.fill_ring_px())


def test_polygon_tiles_hole():
    ring = np.array([[0.05, 0.05], [0.95, 0.05], [0.95, 0.95], [0.05, 0.95], [0.05, 0.05]])
    hole = np.array([[0.4, 0.4], [0.6, 0.4], [0.6, 0.6], [0.4, 0.6], [0.4, 0.4]])
    results = {(x, y): (r, f) for x, y, r, f in clip.polygon_tiles([ring, hole], 3)}
    # center tile (3.2..4.8 world*8) overlaps the hole: must NOT be a fill
    assert results[(4, 4)][1] is False or len(results[(4, 4)][0]) > 1
    # the hole's own interior: tile (3.5,3.5)... world 0.5*8=4 -> tile (4,4) covers hole boundary
    # a tile fully inside the hole is absent or has no area: hole spans 3.2-4.8,
    # so no full tile fits inside; just assert corner tiles are still present
    assert (0, 0) in results


def test_mvt_roundtrip():
    ring = np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0], [0.0, 0.0]])
    line = np.array([[10.0, 10.0], [50.0, 50.0], [90.0, 10.0]])
    pts = np.array([[128.0, 128.0]])
    layers = {
        "water": [
            {"id": 7, "kind": "polygon", "parts": [ring], "attrs": {"kind": "lake", "area": 4.5}},
        ],
        "roads": [
            {"id": 8, "kind": "linestring", "parts": [line], "attrs": {"hw": "primary", "lanes": 2}},
            {"id": 9, "kind": "point", "parts": [pts], "attrs": {"name": "x", "ok": True}},
        ],
    }
    data = mvt.encode_tile(layers)
    back = mvt.decode_tile(data)
    assert set(back) == {"water", "roads"}
    w = back["water"]["features"][0]
    assert w["id"] == 7 and w["type"] == mvt.GEOM_POLYGON
    np.testing.assert_allclose(w["parts"][0], ring, atol=1 / 16)
    assert w["attrs"] == {"kind": "lake", "area": 4.5}
    r = back["roads"]["features"][0]
    np.testing.assert_allclose(r["parts"][0], line, atol=1 / 16)
    assert r["attrs"]["lanes"] == 2
    p = back["roads"]["features"][1]
    np.testing.assert_allclose(p["parts"][0], pts, atol=1 / 16)
    assert p["attrs"]["ok"] is True
    # gzip round trip
    assert mvt.gunzip_tile(mvt.gzip_tile(data)) == data


def test_point_antimeridian_wrap():
    # point just west of the antimeridian buffers into the EASTmost column's
    # wrap (x=0) and vice versa (FIXTURES golden case 2)
    wx = np.array([0.9999])  # ~lon 179.96, z4: tile x=15, near right edge
    wy = np.array([0.5])
    src, tx, ty, px, py = clip.point_tiles_vec(wx, wy, 4, buffer_px=4)
    tiles = set(zip(tx.tolist(), ty.tolist()))
    assert (15, 7) in tiles or (15, 8) in tiles
    assert any(t[0] == 0 for t in tiles)  # wrapped into x=0 with px ≈ -buffer
    wrapped_px = px[tx == 0]
    assert (wrapped_px < 0).all() and (wrapped_px >= -4.1).all()
    # and the westmost point wraps into x = 15
    src2, tx2, _, px2, _ = clip.point_tiles_vec(np.array([0.0001]), wy, 4)
    assert any(tx2 == 15) and (px2[tx2 == 15] > 256).all()
    # no wrap at z0
    src3, tx3, *_ = clip.point_tiles_vec(np.array([0.9999]), wy, 0)
    assert set(tx3.tolist()) == {0}


def test_line_antimeridian_wrap():
    # crossing lines use CONTINUOUS x past 1.0 (lon beyond 180), like the
    # reference's mercator coords; world x 0.97 -> 1.03 wraps into column 0
    line = np.array([[0.97, 0.4], [1.03, 0.4]])
    tiles = {(x, y) for x, y, _ in clip.line_tiles(line, 3)}
    # z3: crossing means columns 7 and 0 only (NOT the long way around 1..6)
    assert (7, 3) in tiles and (0, 3) in tiles
    assert not any(t[0] in (2, 3, 4, 5) for t in tiles)
    # non-crossing line unaffected
    line2 = np.array([[0.2, 0.4], [0.3, 0.4]])
    tiles2 = {(x, y) for x, y, _ in clip.line_tiles(line2, 3)}
    assert all(1 <= t[0] <= 2 for t in tiles2)


def test_polygon_antimeridian_wrap():
    # polygon straddling the date line with continuous x in [0.96, 1.04]
    ring = np.array([[0.96, 0.45], [1.04, 0.45], [1.04, 0.55], [0.96, 0.55], [0.96, 0.45]])
    got = {(x, y) for x, y, _, _ in clip.polygon_tiles([ring], 4)}
    xs = {t[0] for t in got}
    assert 15 in xs and 0 in xs
    assert not any(x in (3, 4, 5, 6, 7, 8, 9, 10, 11, 12) for x in xs)


def test_z15_supported():
    """z15 ids fit the 33-bit tile field; fills work at z15 (FIXTURES case 5)."""
    tid = T.encode_tile_id(15, 32767, 32767)
    z, x, y = T.decode_tile_id(tid)
    assert (int(z), int(x), int(y)) == (15, 32767, 32767)
    assert T.num_tiles_through(15) < (1 << 31)
    key = T.encode_sort_key(tid, 5, 0, 0)
    t2, l2, *_ = T.decode_sort_key(key)
    assert int(t2) == int(tid) and int(l2) == 5
    # a tiny polygon produces fills at z15 in its interior
    ring = np.array([[0.50000, 0.50000], [0.50030, 0.50000],
                     [0.50030, 0.50030], [0.50000, 0.50030], [0.50000, 0.50000]])
    res = list(clip.polygon_tiles([ring], 15))
    assert any(f for *_, f in res)  # at least one filled interior tile
    assert len(res) >= 25


def _shoelace(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def test_mvt_polygon_winding_enforced():
    """Spec 4.3.3.3: exterior positive y-down shoelace, holes negative —
    regardless of input winding (ADVICE round 1, high)."""
    ext_ccw = np.array([[10.0, 10], [10, 200], [200, 200], [200, 10], [10, 10]])
    hole_cw = np.array([[50.0, 50], [120, 50], [120, 120], [50, 120], [50, 50]])
    assert _shoelace(ext_ccw) < 0 and _shoelace(hole_cw) > 0  # wrong on purpose
    cmds = mvt.encode_commands("polygon", [ext_ccw, hole_cw])
    rings = mvt.decode_commands(cmds, mvt.GEOM_POLYGON)
    assert len(rings) == 2
    assert _shoelace(rings[0]) > 0  # exterior now positive
    assert _shoelace(rings[1]) < 0  # hole now negative


def test_render_polygon_winding_fill_and_edge_agree():
    """CCW lon/lat exterior (OGC default): every emitted tile ring — edge
    tiles AND interior fill tiles — must decode with positive-area exterior."""
    from planetiler_ray.stages.render import render_geometry_rows

    ring = np.array([[0.0, 0.0], [30.0, 0.0], [30.0, 25.0], [0.0, 25.0], [0.0, 0.0]])
    rows = list(render_geometry_rows(1, "polygon", [ring], "admin", {}, 6, 6))
    assert len(rows) > 1 and any(r["is_fill"] for r in rows)
    for r in rows:
        kind, rings = wkb.decode_wkb(r["geom_px"])
        assert kind == "polygon"
        assert _shoelace(rings[0]) > 0, (r["tile_x"], r["tile_y"], r["is_fill"])


def test_polygon_fill_census_semantics():
    """The densified diamond generator closes both rings, nests the hole,
    and the fill detector agrees with a brute-force parity reference on the
    snapped grid (fills = untouched rows with odd center parity; the hole
    must punch fill tiles back out)."""
    from planetiler_ray.geo import clip, mercator
    from planetiler_ray.pipelines.webgeo import FILL_SUB, diamond_rings_mdeg

    rings = diamond_rings_mdeg(7)
    outer, hole = rings
    assert np.array_equal(outer[0], outer[-1]) and np.array_equal(hole[0], hole[-1])
    assert np.abs(hole).max() <= np.abs(outer).max()

    z = 9
    scale = float(FILL_SUB << z)
    w = [np.column_stack([mercator.lon_to_world_x(r[:, 0] / 1000.0),
                          mercator.lat_to_world_y(r[:, 1] / 1000.0)]) for r in rings]
    q = [(np.floor(r * scale) + 0.5) / scale for r in w]
    fills = {(x, y) for x, y, _, isf in clip.polygon_tiles(q, z) if isf}
    assert fills  # a 8-20 degree polygon at z=9 has interior tiles

    # brute reference: center parity over BOTH rings, row untouched by any
    # edge bbox (buffered), mirrors oracle.sql_polygon_fill
    buf = 4.0 / 256.0
    sq = [r * (1 << z) for r in q]
    for (cx, cy) in list(fills)[:50]:
        xl, yc = cx + 0.5, cy + 0.5
        crossings = 0
        touched = False
        for r in sq:
            for i in range(len(r) - 1):
                (x0, y0), (x1, y1) = r[i], r[i + 1]
                if (min(x0, x1) <= cx + 1 + buf and max(x0, x1) >= cx - buf
                        and np.floor(min(y0, y1) - buf) <= cy <= np.floor(max(y0, y1) + buf)):
                    touched = True
                if (x0 <= xl) != (x1 <= xl):
                    t = (xl - x0) / (x1 - x0)
                    if y0 + t * (y1 - y0) < yc:
                        crossings += 1
        assert not touched and crossings % 2 == 1, (cx, cy)

    # hole interior is NOT filled: its center tile must be absent
    c_mer = np.mean(q[1][:-1], axis=0) * (1 << z)
    assert (int(c_mer[0]), int(c_mer[1])) not in fills


def test_chaikin_dyadic_exact_on_integer_coords():
    """Two Chaikin rounds on integer inputs produce exact sixteenths —
    (x*16) hits integers bit-for-bit (the claim behind the chaikin_smooth
    oracle), and the corner-cutting keeps endpoints for open lines."""
    from planetiler_ray.geo.simplify import smooth_chaikin

    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(2, 9))
        c = rng.integers(-180000, 180000, (n, 2)).astype(np.float64)
        sm = smooth_chaikin(smooth_chaikin(c))
        m16 = sm * 16.0
        assert np.array_equal(m16, np.rint(m16))  # exact integers
        assert np.array_equal(sm[0], c[0]) and np.array_equal(sm[-1], c[-1])
        assert len(sm) == 4 * n
