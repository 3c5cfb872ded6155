"""Expression DSL + scalar parse library tests (reference: ExpressionTest,
ParseTest patterns)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from planetiler_ray.functions import expression as E
from planetiler_ray.functions import parse as P


def _batch():
    return pa.table(
        {
            "highway": ["motorway", "path", "primary", None],
            "name": ["A1", "trail", "Main St", "x"],
            "kind": ["linestring", "linestring", "point", "polygon"],
            "lanes": [4, None, 2, 0],
        }
    )


def test_match_any_exact_and_pattern():
    b = _batch()
    np.testing.assert_array_equal(
        E.match_any("highway", "motorway", "primary").evaluate(b),
        [True, False, True, False],
    )
    np.testing.assert_array_equal(
        E.match_any("name", "%St%").evaluate(b), [False, False, True, False]
    )
    # missing column -> all false
    assert not E.match_any("nope", "x").evaluate(b).any()


def test_field_type_cmp_combinators():
    b = _batch()
    np.testing.assert_array_equal(
        E.match_field("highway").evaluate(b), [True, True, True, False]
    )
    np.testing.assert_array_equal(
        E.match_type("linestring").evaluate(b), [True, True, False, False]
    )
    np.testing.assert_array_equal(
        E.MatchCmp("lanes", ">=", 2).evaluate(b), [True, False, True, False]
    )
    e = E.match_any("highway", "motorway") | (
        E.match_type("point") & E.MatchCmp("lanes", ">", 1)
    )
    np.testing.assert_array_equal(e.evaluate(b), [True, False, True, False])
    np.testing.assert_array_equal((~e).evaluate(b), [False, True, False, True])


def test_simplify_constant_folding():
    e = E.And([E.TRUE, E.match_field("x")])
    assert isinstance(e.simplify(), E.MatchField)
    assert E.And([E.FALSE, E.match_field("x")]).simplify() is E.FALSE
    assert E.Or([E.TRUE, E.match_field("x")]).simplify() is E.TRUE
    assert isinstance(E.Not(E.Not(E.match_field("x"))).simplify(), E.MatchField)


def test_multi_expression_dispatch():
    b = _batch()
    me = E.MultiExpression(
        [
            ("roads", E.match_any("highway", "motorway", "primary")),
            ("paths", E.match_any("highway", "path")),
            ("other", E.TRUE),
        ]
    )
    np.testing.assert_array_equal(me.first_match(b), [0, 1, 0, 2])
    assert me.payload(0) == "roads"


def test_expr_from_config():
    b = _batch()
    cfg = {"__any__": [{"highway": ["motorway"]}, {"__all__": [{"__type__": "point"}, {"lanes__ge": 2}]}]}
    e = E.expr_from_config(cfg)
    np.testing.assert_array_equal(e.evaluate(b), [True, False, True, False])
    assert E.expr_from_config(None) is E.TRUE


def test_parse_long_and_bool():
    s = pd.Series(["42", " -7 junk", "x", None])
    out = P.parse_long_or_null(s)
    assert out.tolist()[:2] == [42, -7]
    assert np.isnan(out.tolist()[2])
    np.testing.assert_array_equal(
        P.parse_bool(pd.Series(["yes", "0", "false", "anything", None])),
        [True, False, False, True, False],
    )
    np.testing.assert_array_equal(
        P.parse_direction(pd.Series(["1", "-1", "reverse", "no", "true"])),
        [1, -1, -1, 0, 1],
    )


def test_parse_meters():
    s = pd.Series(["5", "10 ft", "2 mi", "1 km", "3 nmi"])
    out = P.parse_meters(s)
    np.testing.assert_allclose(out, [5.0, 3.048, 3218.688, 1000.0, 5556.0])


def test_wayzorder():
    z = P.wayzorder(
        pd.Series(["motorway", "residential", "path"]),
        layer=pd.Series(["1", None, None]),
        bridge=pd.Series(["yes", None, None]),
        tunnel=pd.Series([None, "yes", None]),
    )
    np.testing.assert_array_equal(z, [29, -7, 0])


def test_simhash_semantics():
    """Pinned: identical texts -> hamming 0; near texts small; unrelated large
    (regression for the unsigned-underflow bug where every bit was set)."""
    from planetiler_ray.stages.dedup import simhash64

    t = pd.Series([
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different words entirely unrelated content here",
        "the quick brown fox jumps over the lazy dog",
    ])
    h = simhash64(t)
    assert h[0] != np.uint64(0xFFFFFFFFFFFFFFFF)

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(h[0], h[3]) == 0
    assert 0 < ham(h[0], h[1]) < 16
    assert ham(h[0], h[2]) > 20


def test_minhash_jaccard_estimate():
    """MinHash signature similarity approximates word-shingle Jaccard."""
    from planetiler_ray.stages.dedup import minhash_of_shingles, word_shingles

    t = pd.Series([
        "a b c d e f g h i j k l m n o p",
        "a b c d e f g h i j k l m n o q",   # ~high overlap
        "z y x w v u t s r q p o n m l k",   # low overlap with first
    ])
    sh = word_shingles(t, k=3)
    sigs = [minhash_of_shingles(s) for s in sh]
    sim01 = (sigs[0] == sigs[1]).mean()
    sim02 = (sigs[0] == sigs[2]).mean()
    assert sim01 > sim02
    assert sim01 > 0.5


def test_zoom_function():
    from planetiler_ray.pipelines.profile import ZoomFunction, resolve_zoom

    zf = ZoomFunction({0: 10, 8: None, 12: 4}, default=99)
    assert zf.at(0) == 10 and zf.at(7) == 10
    assert zf.at(8) is None and zf.at(11) is None
    assert zf.at(12) == 4 and zf.at(14) == 4
    assert resolve_zoom(zf, 3) == 10
    assert resolve_zoom(7, 3) == 7  # plain values pass through


def test_fnv64_arrow_parity():
    """Vectorized Arrow-buffer FNV-1a == scalar reference, incl. slices."""
    import pyarrow as pa

    from planetiler_ray.functions.vhash import fnv64_arrow, fnv64_scalar

    strs = ["", "a", "hello world", "日本語テキスト", "x" * 300] + [
        f"tok{i}" for i in range(50)
    ]
    got = fnv64_arrow(pa.array(strs))
    exp = np.array([fnv64_scalar(s) for s in strs], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
    sl = pa.array(strs)[3:40]
    np.testing.assert_array_equal(
        fnv64_arrow(sl), np.array([fnv64_scalar(s) for s in strs[3:40]], dtype=np.uint64)
    )


def test_bucket_pairs_mega_cluster_bounded():
    """A planted boilerplate mega-cluster must not explode into O(m^2)
    pairs: above the cap, star edges keep the connected component."""
    from planetiler_ray.stages.dedup import _bucket_pairs

    ids = np.arange(100_000, dtype=np.int64)
    ii, jj = _bucket_pairs(ids, cap=256)
    assert len(ii) == len(ids) - 1  # not ~5e9
    assert (ii == 0).all()  # star to the min id: component intact
    # small buckets stay exact all-pairs
    ii, jj = _bucket_pairs(np.arange(20, dtype=np.int64), cap=256)
    assert len(ii) == 190


def test_embedding_neardup_group_split_bounded():
    """_group_neardup_pairs recursively splits oversize buckets instead of
    one giant GEMM; planted near-identical siblings still pair up."""
    from planetiler_ray.stages.ann import _group_neardup_pairs, _normalize

    rng = np.random.default_rng(3)
    base = _normalize(rng.normal(size=(4000, 16)))
    sib = _normalize(base + rng.normal(0, 1e-3, size=base.shape))
    m = np.concatenate([base, sib])
    ids = np.concatenate([np.arange(4000), np.arange(4000) + 1_000_000])
    order = rng.permutation(len(ids))
    chunks = _group_neardup_pairs(ids[order], m[order], tau=0.999, cap=512)
    pairs = set()
    for a, b, _ in chunks:
        pairs.update(zip(a.tolist(), b.tolist()))
    # recursion keeps near-identical siblings on the same side of every
    # median split in practice; require near-total recall
    found = sum((i, i + 1_000_000) in pairs for i in range(4000))
    assert found >= 3900, found


def test_geomops_convexity_and_innermost():
    """GeoUtils.isConvex / WithGeometry.centroidIfConvex / innermostPoint
    semantics (convex -> centroid; concave -> inside point; pole of
    inaccessibility respects holes)."""
    from planetiler_ray.geo.geomops import (centroid_if_convex,
                                            innermost_point, is_convex_ring)
    from planetiler_ray.geo.pip import points_in_polygon

    sq = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    lsh = np.array([[0.0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10], [0, 0]])
    assert is_convex_ring(sq)
    assert is_convex_ring(sq[::-1])  # winding-independent
    assert not is_convex_ring(lsh)
    # tiny concavity below the 1e-3 ratio threshold still counts as convex
    near = np.array([[0.0, 0], [5, 0.001], [10, 0], [10, 10], [0, 10], [0, 0]])
    assert is_convex_ring(near)
    np.testing.assert_allclose(centroid_if_convex([sq]), [5, 5])
    c = centroid_if_convex([lsh])
    assert points_in_polygon(np.array([c[0]]), np.array([c[1]]), [lsh])[0]
    np.testing.assert_allclose(innermost_point([sq], 0.01), [5, 5], atol=0.2)
    hole = np.array([[1.0, 1], [5, 1], [5, 5], [1, 5], [1, 1]])
    p = innermost_point([sq, hole], 0.01)
    assert p[0] > 5.5 and p[1] > 5.5  # pushed away from the hole
    p2 = innermost_point([lsh], 0.01)
    assert points_in_polygon(np.array([p2[0]]), np.array([p2[1]]), [lsh])[0]


def test_forwarding_profile_registry():
    """ForwardingProfile dispatch: source/feature handlers, vectorized
    filter() gating, only/exclude layers, layer+tile post hooks."""
    import pyarrow as pa

    from planetiler_ray.functions.expression import match_any
    from planetiler_ray.pipelines.forwarding import ForwardingProfile
    from planetiler_ray.pipelines.profile import LayerSpec

    calls = []

    class Roads:
        layer_name = "roads"
        layer_spec = LayerSpec(name="roads")
        filter_expr = match_any("kind", "road")

        def process_batch(self, batch):
            return pa.table({"layer": pa.array(["roads"] * batch.num_rows),
                             "v": batch.column("v")})

        def post_process_layer(self, features, z):
            calls.append(("layer", z))
            return features

    class Water:
        layer_name = "water"
        filter_expr = match_any("kind", "water")

        def process_batch(self, batch):
            return pa.table({"layer": pa.array(["water"] * batch.num_rows),
                             "v": batch.column("v")})

    class TileHook:
        def post_process_tile(self, layers, z, x, y):
            calls.append(("tile", z))
            return layers

        def on_finish(self, source):
            calls.append(("finish", source))

    fp = ForwardingProfile(only_layers=["roads"])
    fp.register_source_handler("osm", Roads())
    fp.register_source_handler("osm", Water())  # excluded by only_layers
    fp.register_handler(TileHook())
    batch = pa.table({"kind": pa.array(["road", "water", "road"]),
                      "v": pa.array([1, 2, 3])})
    out = fp.process_source_batch("osm", batch)
    assert out.num_rows == 2  # only the road rows, only the roads handler
    assert set(out.column("layer").to_pylist()) == {"roads"}
    assert fp.cares_about_layer("roads") and not fp.cares_about_layer("water")
    assert fp.cares_about_source("osm") and not fp.cares_about_source("ne")
    prof = fp.to_tiling_profile()
    assert "roads" in prof.layers and "water" not in prof.layers
    feats = prof.layers["roads"].post_process([{"id": 1}], 5)
    assert feats == [{"id": 1}]
    prof.post_process_tile({"roads": [], "water": []}, 3, 0, 0)
    fp.finish("osm")
    assert ("layer", 5) in calls and ("tile", 3) in calls and ("finish", "osm") in calls


def test_struct_dynamic_accessor():
    """reader/Struct.java semantics: dotted paths, [] flat-map, lenient
    coercions, absorbing NULL."""
    import pyarrow as pa

    from planetiler_ray.functions.structs import NULL, of

    s = of({"a": {"b": [{"c": 1}, {"c": 2}, {"d": 3}]}, "n": "42",
            "f": "1.5", "yes": "yes", "t": 1700000000000})
    assert s.get("a", "b", 0, "c").as_int() == 1
    assert s.get("a.b[].c").as_list() == [of(1), of(2)]  # flat-map over list
    assert s.get("a.b").get(1).get("c").as_int() == 2
    assert s.get("missing").is_null() and s.get("missing", "x", "y") is NULL
    assert s.get("missing").or_else(9).as_int() == 9
    assert s.get("n").as_int() == 42 and s.get("f").as_double() == 1.5
    assert s.get("f").as_int() is None  # "1.5" is not an int
    assert s.get("yes").as_bool() is True and of("off").as_bool() is False
    ts = s.get("t").as_timestamp()
    assert ts.year == 2023
    assert of(3.9).as_int() == 3  # numeric truncation
    assert s.get("a").is_struct() and not s.get("n").is_struct()
    assert '"c":1' in s.get("a").as_json()
    # pyarrow struct scalars unwrap transparently
    t = pa.table({"tags": [{"name": "x", "h": ["a", "b"]}]})
    row = of(t.column("tags")[0])
    assert row.get("name").as_string() == "x"
    assert row.get("h").get(1).as_string() == "b"
    # nulls dropped from maps like the reference
    assert of({"a": None, "b": 1}).as_map().keys() == {"b"}


def test_prometheus_exposition(tmp_path):
    """PrometheusStats-style exposition: plain + labelled counters, gauges,
    atomic textfile write."""
    from planetiler_ray.state.progress import prometheus_text

    snap = {"elapsed_s": 2.5,
            "counts": {"rendered": 10, "tiles:z4": 3, "tiles:z5": 7,
                       "data errors!": 1}}
    text = prometheus_text(snapshot=snap, extra_gauges={"mem_bytes": 123})
    assert "# TYPE planetiler_ray_rendered_total counter" in text
    assert "planetiler_ray_rendered_total 10" in text
    assert 'planetiler_ray_tiles_total{label="z4"} 3' in text
    assert 'planetiler_ray_tiles_total{label="z5"} 7' in text
    assert "planetiler_ray_data_errors__total 1" in text  # sanitized name
    assert "planetiler_ray_mem_bytes 123" in text
    assert "planetiler_ray_elapsed_seconds 2.5" in text


def test_mulmod61_exact_vs_python_ints():
    import numpy as np

    from planetiler_ray.stages.sketch import (
        HASH_A, HASH_B, HASH_C, M61, _mulmod61, hash61)

    rng = np.random.default_rng(42)
    a = rng.integers(0, M61, size=5000, dtype=np.int64).astype(np.uint64)
    for b in (HASH_A, HASH_B, 3, M61 - 1, 1):
        got = _mulmod61(a, b)
        exp = [(int(x) * b) % M61 for x in a[:300]]
        assert got[:300].tolist() == exp, b

    v = rng.integers(-2**62, 2**62, size=300, dtype=np.int64)
    got = hash61(v)
    exp = []
    for x in v:
        h = (int(x) % (2**64)) % M61
        h = (h * HASH_A + HASH_C) % M61
        h = (h ^ (h >> 29)) % M61
        h = (h * HASH_B) % M61
        exp.append((h ^ (h >> 31)) % M61)
    assert got.tolist() == exp


def test_hash61_register_distribution():
    """The xor-shift folds must break the affine structure: consecutive
    ids spread ~uniformly over 256 registers AND the trailing-zero rho
    follows the geometric law closely enough for HLL (the pure
    multiplicative version failed this with ~40% estimator bias)."""
    import numpy as np

    from planetiler_ray.stages.sketch import hash61

    h = hash61(np.arange(100_000, dtype=np.int64))
    reg = h % np.uint64(256)
    counts = np.bincount(reg.astype(np.int64), minlength=256)
    # chi-square-ish sanity: all registers within 3x of the mean
    assert counts.min() > 100_000 / 256 / 3
    assert counts.max() < 100_000 / 256 * 3
    w = h >> np.uint64(8)
    tz = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    lowest = w[nz] & (~w[nz] + np.uint64(1))
    tz[nz] = np.log2(lowest.astype(np.float64)).astype(np.int64)
    # P(tz >= k) = 2^-k: check the first few levels within 20%
    for k in (1, 2, 3, 4):
        frac = (tz >= k).mean()
        assert abs(frac - 2.0**-k) < 0.2 * 2.0**-k, (k, frac)


def test_multiexpression_first_match_precedence():
    """Earlier rules shadow later ones; %patterns% and numeric cmp compose;
    unmatched rows return -1 (the expr_classify dispatch contract)."""
    import numpy as np
    import pyarrow as pa

    from planetiler_ray.functions.expression import (
        MatchCmp,
        MultiExpression,
        match_any,
    )

    rules = MultiExpression(
        [
            ("a", match_any("lang", "en") & MatchCmp("n", ">=", 10)),
            ("b", match_any("txt", "%foo%")),
            ("c", MatchCmp("n", "<", 5)),
        ]
    )
    batch = pa.table(
        {
            "lang": ["en", "en", "de", "de"],
            "txt": ["foo", "bar", "xfooy", "bar"],
            "n": [12, 3, 7, 99],
        }
    )
    got = rules.first_match(batch)
    # row0: rule a wins although b also matches; row1: only c; row2: b; row3: none
    assert np.array_equal(got, np.array([0, 2, 1, -1]))
