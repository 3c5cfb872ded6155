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


# ---------------------------------------------------------------------------
# line_cover: line_tiles kernel vs the closed segment-vs-box SAT reference
# ---------------------------------------------------------------------------

def _sat_cover(q_scaled: np.ndarray, z: int, buf: float = 4.0 / 256.0):
    """Brute-force reference: tile covered iff some segment's CLOSED
    intersection with the buffered tile box is non-empty (the integer SAT
    test of routes.sql_line_cover, done here in exact dyadic float)."""
    n = 1 << z
    out = set()
    for i in range(len(q_scaled) - 1):
        (x0, y0), (x1, y1) = q_scaled[i], q_scaled[i + 1]
        cx_lo = int(np.floor(min(x0, x1) - buf))
        cx_hi = int(np.floor(max(x0, x1) + buf))
        cy_lo = max(0, int(np.floor(min(y0, y1) - buf)))
        cy_hi = min(n - 1, int(np.floor(max(y0, y1) + buf)))
        for cx in range(cx_lo, cx_hi + 1):
            a, b = cx - buf, cx + 1 + buf
            for cy in range(cy_lo, cy_hi + 1):
                c, d = cy - buf, cy + 1 + buf
                if max(x0, x1) < a or min(x0, x1) > b:
                    continue
                if max(y0, y1) < c or min(y0, y1) > d:
                    continue
                cr = [(x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
                      for px in (a, b) for py in (c, d)]
                if min(cr) <= 0.0 <= max(cr):
                    out.add((cx % n, cy))
    return out


def test_line_cover_kernel_matches_sat_reference():
    """On the half-offset snapped grid (odd numerators, even bounds — no
    boundary ties) the real stripe-slicing kernel's coverage set equals the
    closed segment-box intersection everywhere, including horizontal /
    vertical / duplicate-point degeneracies.  This is the exactness claim
    behind the line_cover oracle (routes.sql_line_cover)."""
    from planetiler_ray.geo import clip

    rng = np.random.default_rng(42)
    sub = 4096
    for z in (2, 4, 6):
        scale = float(sub << z)
        for trial in range(40):
            m = int(rng.integers(2, 7))
            w = rng.random((m, 2)) * np.array([1.0, 0.9]) + np.array([0.0, 0.05])
            if trial % 5 == 1:
                w[:, 1] = w[0, 1]  # horizontal
            if trial % 5 == 2:
                w[:, 0] = w[0, 0]  # vertical
            if trial % 5 == 3 and m >= 3:
                w[1] = w[0]  # duplicate consecutive vertex
            q = (np.floor(w * scale) + 0.5) / scale
            got = {(x, y) for x, y, _ in clip.line_tiles(q, z)}
            want = _sat_cover(q * (1 << z), z)
            assert got == want, (z, trial)
