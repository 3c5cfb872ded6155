"""Line merging + routes line-layer pipeline tests."""

import numpy as np
import pytest

from planetiler_ray.geo.linemerge import merge_lines


def test_merge_joins_degree2():
    a = np.array([[0.0, 0.0], [10.0, 0.0]])
    b = np.array([[10.0, 0.0], [20.0, 0.0]])
    out = merge_lines([a, b])
    assert len(out) == 1 and len(out[0]) == 3
    # reversed second segment still joins
    out2 = merge_lines([a, b[::-1]])
    assert len(out2) == 1


def test_merge_preserves_junctions():
    a = np.array([[0.0, 0.0], [10.0, 0.0]])
    b = np.array([[10.0, 0.0], [20.0, 0.0]])
    c = np.array([[10.0, 0.0], [10.0, 10.0]])  # third edge at the junction
    out = merge_lines([a, b, c])
    assert len(out) == 3  # degree-3 endpoint never merged through


def test_merge_drops_short():
    a = np.array([[0.0, 0.0], [1.0, 0.0]])
    b = np.array([[50.0, 0.0], [80.0, 0.0]])
    out = merge_lines([a, b], min_length=5.0)
    assert len(out) == 1 and out[0][0, 0] == 50.0


def test_route_tiles_merge_lines(ray_session):
    from planetiler_ray.geo import mvt
    from planetiler_ray.pipelines import routes

    df = routes.route_tiles_ds("/root/testdata/sf0.001", zooms=[0, 4]).to_pandas()
    assert len(df) > 0
    # decode the z0 tile: all ways merged per cls -> at most 4 features
    row = df[df.z == 0].iloc[0]
    d = mvt.decode_tile(mvt.gunzip_tile(row.tile_gz))
    feats = d["routes"]["features"]
    assert 0 < len(feats) <= 4
    assert all(f["type"] == mvt.GEOM_LINESTRING for f in feats)
    assert {f["attrs"]["cls"] for f in feats} <= {"c0", "c1", "c2", "c3"}


def test_stroke_merging_through_junction():
    """With strokes=True the straight pair merges through a degree-3 node;
    the perpendicular arm stays separate (straightest-angle semantics)."""
    a = np.array([[0.0, 0.0], [10.0, 0.0]])
    b = np.array([[10.0, 0.0], [20.0, 0.0]])
    c = np.array([[10.0, 0.0], [10.0, 10.0]])
    out = merge_lines([a, b, c], strokes=True)
    assert len(out) == 2
    lens = sorted(len(o) for o in out)
    straight = max(out, key=len)
    assert straight[0, 0] == 0.0 and straight[-1, 0] == 20.0
    # default (strokes=False) behavior unchanged
    assert len(merge_lines([a, b, c])) == 3


def test_merge_strokes_loop_at_junction_preserves_length():
    """A loop with both endpoints at one junction: after its first arm is
    merged, the second pair at the junction must not reuse the (now stale)
    orientation flag — total polyline length is invariant under merging
    (ADVICE round 1, linemerge)."""
    from planetiler_ray.geo.linemerge import merge_strokes

    loop = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    a = np.array([[-20.0, 0], [0, 0]])
    b = np.array([[0.0, 0], [0, -20]])

    def total_len(chains):
        return sum(float(np.hypot(*np.diff(c, axis=0).T).sum()) for c in chains)

    before = total_len([loop, a, b])
    merged = merge_strokes([loop, a, b])
    assert abs(total_len(merged) - before) < 1e-9
