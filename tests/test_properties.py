"""Property-based tests (hypothesis) for the geo kernel — beyond the
reference's test strategy (SURVEY §5.7 notes it has no randomized testing)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from planetiler_ray.geo import mercator as M
from planetiler_ray.geo import tile as T
from planetiler_ray.geo import wkb
from planetiler_ray.geo.linemerge import _length, merge_lines
from planetiler_ray.geo.mvt import decode_commands, encode_commands, unzigzag, zigzag
from planetiler_ray.geo.simplify import simplify_dp


@given(st.integers(0, 15), st.data())
@settings(max_examples=200, deadline=None)
def test_tile_id_roundtrip_property(z, data):
    n = 1 << z
    x = data.draw(st.integers(0, n - 1))
    y = data.draw(st.integers(0, n - 1))
    for order in (T.XYZ, T.TMS, T.HILBERT):
        z2, x2, y2 = T.decode_tile_id(T.encode_tile_id(z, x, y, order), order)
        assert (int(z2), int(x2), int(y2)) == (z, x, y)


@given(st.integers(0, T.num_tiles_through(15) - 1), st.integers(0, 255),
       st.integers(T.SORT_KEY_MIN, T.SORT_KEY_MAX), st.booleans())
@settings(max_examples=200, deadline=None)
def test_sort_key_roundtrip_property(tile, layer, sk, hg):
    t, l, s, h = T.decode_sort_key(T.encode_sort_key(tile, layer, sk, int(hg)))
    assert (int(t), int(l), int(s), int(h)) == (tile, layer, sk, int(hg))


@given(st.integers(-(2**40), 2**40))
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip_property(v):
    assert int(unzigzag(zigzag(v))) == v


@given(st.floats(-180, 180), st.floats(-85, 85))
@settings(max_examples=200, deadline=None)
def test_mercator_roundtrip_property(lon, lat):
    x = float(M.lon_to_world_x(lon))
    y = float(M.lat_to_world_y(lat))
    assert 0.0 <= x <= 1.0 and 0.0 <= y <= 1.0
    assert abs(float(M.world_x_to_lon(x)) - lon) < 1e-9
    assert abs(float(M.world_y_to_lat(y)) - lat) < 1e-7


@given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
                min_size=2, max_size=30),
       st.floats(0, 10))
@settings(max_examples=200, deadline=None)
def test_simplify_dp_properties(pts, tol):
    coords = np.array(pts, dtype=np.float64)
    out = simplify_dp(coords, tol)
    # endpoints preserved, output is a subsequence of input
    assert (out[0] == coords[0]).all() and (out[-1] == coords[-1]).all()
    assert len(out) <= len(coords)
    i = 0
    for p in out:
        while i < len(coords) and not (coords[i] == p).all():
            i += 1
        assert i < len(coords), "output point not in input order"


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                min_size=3, max_size=12, unique=True))
@settings(max_examples=100, deadline=None)
def test_wkb_roundtrip_property(pts):
    ring = np.array(pts + [pts[0]], dtype=np.float64)
    k, rings = wkb.decode_wkb(wkb.encode_wkb("polygon", [ring]))
    assert k == "polygon"
    np.testing.assert_array_equal(rings[0], ring)
    k2, line = wkb.decode_wkb(wkb.encode_wkb("linestring", ring[:-1]))
    np.testing.assert_array_equal(line, ring[:-1])


@given(st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40), st.integers(0, 40),
              st.integers(0, 40)).filter(lambda t: (t[0], t[1]) != (t[2], t[3])),
    min_size=1, max_size=15))
@settings(max_examples=100, deadline=None)
def test_merge_lines_preserves_length(segs):
    segments = [np.array([[a, b], [c, d]], dtype=np.float64) for a, b, c, d in segs]
    total = sum(_length(s) for s in segments)
    merged = merge_lines(segments, min_length=0.0)
    merged_total = sum(_length(c) for c in merged)
    assert abs(total - merged_total) < 1e-6


@given(st.lists(st.tuples(st.floats(0, 256), st.floats(0, 256)),
                min_size=2, max_size=20))
@settings(max_examples=100, deadline=None)
def test_mvt_line_roundtrip_property(pts):
    line = np.array(pts, dtype=np.float64)
    # drop consecutive duplicates at MVT resolution to make roundtrip exact
    q = np.rint(line * 16) / 16
    keep = np.concatenate([[True], (np.diff(np.rint(q * 16), axis=0) != 0).any(axis=1)])
    q = q[keep]
    if len(q) < 2:
        return
    cmds = encode_commands("linestring", [q])
    back = decode_commands(cmds, 2)
    assert len(back) == 1
    np.testing.assert_allclose(back[0], q, atol=1 / 32)


def test_kcore_peel_invariants(ray_session):
    """k-core peeling: monotone alive sets, in_core nodes all have final
    degree >= k, and every final-round degree counts only edges between
    final-alive-or-just-peeled nodes (cross-checked against a NetworkX-free
    brute reference on a small deterministic graph)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from planetiler_ray.stages.graph import kcore_peel

    n = 60
    d = np.arange(n)
    src = np.concatenate([d, d, d])
    dst = np.concatenate([(d * d + a) % n for a in (7, 13, 29)])
    e = ray.data.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                      "dst": pa.array(dst, pa.int64())}))
    k, rounds = 4, 3
    out = kcore_peel(e, n_nodes=n, k=k, rounds=rounds)

    # brute reference
    pairs = {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(src, dst) if a != b}
    alive = np.ones(n, bool)
    deg = np.zeros(n, np.int64)
    for _ in range(rounds):
        deg = np.zeros(n, np.int64)
        for a, b in pairs:
            if alive[a] and alive[b]:
                deg[a] += 1
                deg[b] += 1
        alive &= deg >= k
    assert np.array_equal(out["deg"].to_numpy(), deg)
    assert np.array_equal(out["in_core"].to_numpy(), alive.astype(np.int64))
    assert ((out["deg"][out["in_core"] == 1]) >= k).all()


def test_cms_never_underestimates_and_is_exact_when_sparse(ray_session):
    """Count-Min guarantee: est >= true for every probe; with far fewer
    keys than w=1024 columns, collisions are rare so most probes are exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from planetiler_ray.stages.sketch import cms_counts

    rng = np.random.default_rng(3)
    keys = np.repeat(np.arange(70), rng.integers(1, 40, 70))
    ds = ray.data.from_arrow(pa.table({"user_id": pa.array(keys, pa.int64())}))
    out = cms_counts(ds, probe_mod=7).take_all()
    assert out
    true = {int(k): int((keys == k).sum()) for k in np.unique(keys) if k % 7 == 0}
    for r in out:
        assert r["true_n"] == true[r["user_id"]]
        assert r["est"] >= r["true_n"]
    exact = sum(r["est"] == r["true_n"] for r in out)
    assert exact >= len(out) - 1  # <=70 keys in 4x1024 cells: ~no collisions


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    """Bloom guarantee: every build key probes positive; with a deliberately
    tiny bit array the false-positive rate is non-zero but bounded (sanity
    that the 4 hash rows actually differ)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from planetiler_ray.stages.sketch import bloom_probe

    n = 300
    build = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})
    )
    probe = ray.data.from_arrow(
        pa.table({"key": pa.array(np.arange(3 * n), pa.int64())})
    )
    out = {r["key"]: r["in_bloom"] for r in
           bloom_probe(build, probe, bits=1 << 10).take_all()}
    assert all(out[k] == 1 for k in range(n))  # no false negatives, ever
    fps = sum(out[k] for k in range(n, 3 * n))
    # m=1024, n=300, k=4 -> p_fp ~ (1-exp(-1200/1024))^4 ~ 0.22
    assert 0 < fps < 2 * n * 0.5
