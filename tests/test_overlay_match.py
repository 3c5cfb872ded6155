"""Planar overlay (segment crossings), map matching, one-round VW
simplification, grid DBSCAN and bounded SSSP — kernel-level tests; the
exact-oracle gate covers the end-to-end paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _orient_cross(ax, ay, bx, by, cx, cy, dx, dy):
    """Reference strict proper-crossing predicate (python ints)."""
    o1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    o2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
    o3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
    o4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
    return o1 * o2 < 0 and o3 * o4 < 0


def test_strict_crossing_predicate_matrix():
    # crossing X
    assert _orient_cross(0, 0, 10, 10, 0, 10, 10, 0)
    # sharing an endpoint -> NOT a proper crossing (o == 0 somewhere)
    assert not _orient_cross(0, 0, 10, 10, 10, 10, 20, 0)
    # collinear overlap -> not proper
    assert not _orient_cross(0, 0, 10, 0, 5, 0, 15, 0)
    # disjoint
    assert not _orient_cross(0, 0, 1, 1, 5, 5, 6, 6)


def test_segment_crossings_matches_bruteforce(ray_session, sf_dir):
    from planetiler_ray.pipelines import osm

    got = osm.segment_crossings(sf_dir).to_pandas()
    got = got.sort_values(list(got.columns), ignore_index=True)

    # brute force over ALL segment pairs from the same deterministic world
    segs = []
    nodes = osm.nodes_ds(sf_dir).to_pandas().set_index("node_id")
    refs = osm.way_refs_ds(sf_dir).to_pandas()
    refs = refs.join(nodes, on="node_id")
    refs = refs.sort_values(["way_id", "seq", "node_id"])
    w = refs["way_id"].to_numpy()
    base_y = (w * osm.WAY_ANCHOR_LAT_MULT) % 160000 - 80000
    base_x = (w * osm.WAY_ANCHOR_LON_MULT) % 350000 - 175000
    y = base_y + (refs["lat_mdeg"].to_numpy() % 2000) - 1000
    x = base_x + (refs["lon_mdeg"].to_numpy() % 2000) - 1000
    starts = np.concatenate([[0], np.flatnonzero(np.diff(w)) + 1])
    counts = np.diff(np.concatenate([starts, [len(w)]]))
    s = np.arange(len(w), dtype=np.int64) - np.repeat(starts, counts)
    same = w[1:] == w[:-1]
    keep = same & ((x[1:] != x[:-1]) | (y[1:] != y[:-1]))
    sw, ss = w[:-1][keep], s[:-1][keep]
    x1, y1, x2, y2 = x[:-1][keep], y[:-1][keep], x[1:][keep], y[1:][keep]
    rows = []
    n = len(sw)
    for i in range(n):  # row-vs-rest vectorized brute force
        j0 = i + 1
        dxi, dyi = x2[i] - x1[i], y2[i] - y1[i]
        o1 = dxi * (y1[j0:] - y1[i]) - dyi * (x1[j0:] - x1[i])
        o2 = dxi * (y2[j0:] - y1[i]) - dyi * (x2[j0:] - x1[i])
        dxj, dyj = x2[j0:] - x1[j0:], y2[j0:] - y1[j0:]
        o3 = dxj * (y1[i] - y1[j0:]) - dyj * (x1[i] - x1[j0:])
        o4 = dxj * (y2[i] - y1[j0:]) - dyj * (x2[i] - x1[j0:])
        hit = (sw[j0:] != sw[i]) & (o1 * o2 < 0) & (o3 * o4 < 0)
        for j in np.flatnonzero(hit) + j0:
            a, b = (i, j) if sw[i] < sw[j] else (j, i)
            rows.append((sw[a], ss[a], sw[b], ss[b]))
    want = pd.DataFrame(rows, columns=["way_a", "seq_a", "way_b", "seq_b"])
    # segment key = within-way row rank, unique by construction — pairs
    # need no dedup (drop_duplicates kept as a no-op safety)
    want = want.drop_duplicates().sort_values(list(want.columns),
                                              ignore_index=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64))


def test_map_match_within_radius_and_nearest(ray_session, sf_dir):
    from planetiler_ray.pipelines import osm

    got = osm.map_match(sf_dir).to_pandas()
    # every match within the radius, one row per matched probe
    assert (got["d2_floor"] <= osm.MATCH_R ** 2).all()
    assert got["probe_id"].is_unique
    # probes are one-per-order; matched subset only
    import pyarrow.parquet as pq

    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    assert 0 < len(got) <= n_orders


def test_vw_simplify_census_invariants(ray_session, sf_dir):
    from planetiler_ray.pipelines import osm

    df = osm.vw_simplify_census(sf_dir).to_pandas()
    assert (df["n_kept"] >= 2).all()            # endpoints always survive
    assert (df["n_kept"] <= df["n_nodes"]).all()
    assert (df["removed_area2"] >= 0).all()
    # 2-node ways keep everything and remove nothing
    two = df[df["n_nodes"] == 2]
    assert (two["n_kept"] == 2).all() and (two["removed_area2"] == 0).all()


def test_dbscan_census_constructed(ray_session):
    import ray

    from planetiler_ray.stages.tiling import dbscan_census

    # two dense blobs + one isolated point, placed via inverse web-mercator
    # by using a coarse zoom so each blob falls inside one cell block
    pts = []
    for _ in range(5):
        pts.append((10.0, 10.0))    # blob A: 5 points, one cell -> core
    for _ in range(4):
        pts.append((-40.0, 120.0))  # blob B
    pts.append((60.0, -150.0))      # noise single
    ds = ray.data.from_pandas(pd.DataFrame(pts, columns=["lat", "lon"]))
    out = dbscan_census(ds, z=4, minpts=3).to_pandas()
    noise = out[out["cluster_id"] == -1]
    clusters = out[out["cluster_id"] >= 0]
    assert len(clusters) == 2
    assert sorted(clusters["core_points"].tolist()) == [4, 5]
    assert noise["other_points"].iloc[0] == 1


def test_sssp_rounds_tiny_graph(ray_session):
    import ray

    from planetiler_ray.stages import graph

    # path 0-1-2-3 plus shortcut 0-3; weights w = 1 + (3a + 7b) % 9
    e = ray.data.from_pandas(pd.DataFrame(
        {"src": [0, 1, 2, 0], "dst": [1, 2, 3, 3]}))
    w01 = 1 + (0 * 3 + 1 * 7) % 9   # 8
    w12 = 1 + (1 * 3 + 2 * 7) % 9   # 9
    w23 = 1 + (2 * 3 + 3 * 7) % 9   # 1
    w03 = 1 + (0 * 3 + 3 * 7) % 9   # 4
    out = graph.sssp_rounds(e, n_nodes=4, seed_mod=101, rounds=3)
    d = dict(zip(out["node_id"], out["dist"]))
    assert d[0] == 0
    assert d[1] == w01
    assert d[3] == min(w03, w01 + w12 + w23)
    assert d[2] == min(w01 + w12, w03 + w23)


def test_sssp_jacobi_round_bound(ray_session):
    """With rounds=1 only direct neighbors of the seed are reached."""
    import ray

    from planetiler_ray.stages import graph

    e = ray.data.from_pandas(pd.DataFrame(
        {"src": [0, 1, 2], "dst": [1, 2, 3]}))
    out = graph.sssp_rounds(e, n_nodes=4, seed_mod=101, rounds=1)
    assert set(out["node_id"]) == {0, 1}


def test_rect_union_area_decomposition_independent(ray_session, sf_dir):
    from planetiler_ray.pipelines import osm

    a = osm.rect_union_area(sf_dir, pitch=10000).to_pandas()
    b = osm.rect_union_area(sf_dir, pitch=6500).to_pandas()
    assert a["union_area"].iloc[0] == b["union_area"].iloc[0]
    # bounded by the sum of areas and at least the largest single rect
    import numpy as np
    import pyarrow.parquet as pq

    c = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey"])["c_custkey"].to_numpy()
    x0, y0, w, h = osm._rel_rect(c)
    assert a["union_area"].iloc[0] <= int((w.astype(np.int64) * h).sum())
    assert a["union_area"].iloc[0] >= int((w.astype(np.int64) * h).max())
    assert a["n_rects"].iloc[0] == len(c)


def test_zone_diameter_matches_bruteforce(ray_session, sf_dir):
    from planetiler_ray.pipelines import webgeo

    got = webgeo.q_zone_diameter(sf_dir).to_pandas()
    got = got.sort_values("admin_id", ignore_index=True)
    pts = webgeo.mentions_ds(sf_dir).to_pandas()
    lon = pts["lon_mdeg"].to_numpy().astype(np.int64)
    lat = pts["lat_mdeg"].to_numpy().astype(np.int64)
    col = np.floor((lon / 1000.0 + 180.0005) / 72.0).astype(np.int64)
    row = np.floor((lat / 1000.0 + 85.0005) / 34.0).astype(np.int64)
    zone = row * 5 + col
    rows = []
    for z in np.unique(zone):
        m = zone == z
        dx = lon[m][:, None] - lon[m][None, :]
        dy = lat[m][:, None] - lat[m][None, :]
        rows.append((z, int((dx * dx + dy * dy).max())))
    want = pd.DataFrame(rows, columns=["admin_id", "diam2"])
    pd.testing.assert_frame_equal(got.astype(np.int64),
                                  want.astype(np.int64))


def test_ivf_recall_bounds(ray_session, sf_dir):
    from planetiler_ray.pipelines import training

    out = training.q_ivf_recall(sf_dir).to_pandas()
    assert (out["hits"] >= 0).all() and (out["hits"] <= out["k"]).all()
    # probing every list IS the exact search -> perfect recall
    full = training.q_ivf_recall(sf_dir, n_probe=8).to_pandas()
    assert (full["hits"] == full["k"]).all()
