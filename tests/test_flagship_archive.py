"""Flagship archive build + resume + tile-content tests (golden-style checks
mirroring PlanetilerTests' exact-tile assertions)."""

import json
import os

import numpy as np
import pytest

from planetiler_ray.geo import mvt

SF = "/root/testdata/sf0.001"
ZOOMS = [0, 2, 4, 6]


@pytest.fixture(scope="module")
def archive(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("archive"))
    from planetiler_ray.pipelines import flagship

    df = flagship.build_archive(SF, out, zooms=ZOOMS, n_buckets=64)
    return out, df


def test_build_summary(archive):
    out, df = archive
    assert df.n_tiles.sum() > 0
    assert not df.skipped.any()
    # z0 tile exists and decodes
    data = mvt.gunzip_tile(open(os.path.join(out, "0", "0", "0.pbf"), "rb").read())
    d = mvt.decode_tile(data)
    assert "places" in d and "admin" in d
    # admin layer at z0: all 25 rect polygons land in the single z0 tile
    assert len(d["admin"]["features"]) == 25


def test_label_grid_limit_applied(archive):
    out, df = archive
    # z2: with 64px grid and limit 8, each z2 tile has <= 8*16 cells... check
    # a tile: no grid cell holds more than 8 places features
    path = os.path.join(out, "2", "2", "1.pbf")
    if not os.path.exists(path):
        pytest.skip("tile empty at this sf")
    d = mvt.decode_tile(mvt.gunzip_tile(open(path, "rb").read()))
    pts = [f["parts"][0][0] for f in d["places"]["features"]]
    cells = {}
    for x, y in pts:
        c = (int(x // 64), int(y // 64))
        cells[c] = cells.get(c, 0) + 1
    assert max(cells.values()) <= 8


def test_resume_skips_and_output_stable(archive):
    out, df = archive
    from planetiler_ray.pipelines import flagship

    before = open(os.path.join(out, "0", "0", "0.pbf"), "rb").read()
    df2 = flagship.build_archive(SF, out, zooms=ZOOMS, n_buckets=64)
    assert df2.skipped.all()
    after = open(os.path.join(out, "0", "0", "0.pbf"), "rb").read()
    assert before == after
    # manifests carry lineage
    m = json.load(open(os.path.join(out, "_manifest", os.listdir(os.path.join(out, "_manifest"))[0])))
    assert m["lineage"]["sf_dir"] == SF


def test_partial_resume_rebuilds_missing(archive, ray_session):
    out, df = archive
    from planetiler_ray.pipelines import flagship

    # delete one bucket's manifest -> only that bucket rebuilds
    mdir = os.path.join(out, "_manifest")
    victim = sorted(os.listdir(mdir))[0]
    os.remove(os.path.join(mdir, victim))
    df3 = flagship.build_archive(SF, out, zooms=ZOOMS, n_buckets=64)
    rebuilt = df3[~df3.skipped]
    assert len(rebuilt) == 1
    assert os.path.exists(os.path.join(mdir, victim))


def test_salted_prune_equivalence(ray_session):
    """FIXTURES golden case 8: the pre-shuffle label-grid combiner (hot-tile
    salting) must produce byte-identical tiles vs the unpruned path."""
    from planetiler_ray.pipelines import flagship

    a = flagship.tiles_ds(SF, zooms=[2, 6], n_buckets=32, prune=True).to_pandas()
    b = flagship.tiles_ds(SF, zooms=[2, 6], n_buckets=32, prune=False).to_pandas()
    a = a.sort_values("tile_id", ignore_index=True)
    b = b.sort_values("tile_id", ignore_index=True)
    assert (a["content_hash"] == b["content_hash"]).all()
    # and the combiner actually reduces the shuffled volume on the hot tile
    # (needs dense batches -> replicate; per-batch partial prune is a no-op on
    # tiny batches, which is still correct)
    pa_ = flagship.point_rows_ds(SF, zooms=[2, 6], repl=10, prune=True).count()
    pb = flagship.point_rows_ds(SF, zooms=[2, 6], repl=10, prune=False).count()
    assert pa_ < pb


def test_tiles_deterministic_across_parallelism(ray_session, tmp_path):
    """FIXTURES.md golden case 10: identical output across parallelism levels
    (here: different bucket counts => different grouping/parallel layout)."""
    from planetiler_ray.pipelines import flagship

    a = flagship.tiles_ds(SF, zooms=[2, 4], n_buckets=16).to_pandas()
    b = flagship.tiles_ds(SF, zooms=[2, 4], n_buckets=128).to_pandas()
    a = a.sort_values("tile_id", ignore_index=True)
    b = b.sort_values("tile_id", ignore_index=True)
    assert (a["content_hash"] == b["content_hash"]).all()
    assert (a["n_features"] == b["n_features"]).all()


def test_post_process_hooks(ray_session):
    """Profile.postProcessLayerFeatures / postProcessTileFeatures analogues."""
    from planetiler_ray.pipelines import flagship
    from planetiler_ray.pipelines.profile import flagship_profile
    from planetiler_ray.geo import mvt

    prof = flagship_profile()

    def drop_pois(feats, z):
        for f in feats:
            f["attrs"].pop("poi_id", None)
        return feats

    def tag_tile(layers, z, x, y):
        for feats in layers.values():
            for f in feats:
                f["attrs"]["zxy"] = f"{z}/{x}/{y}"
        return layers

    prof.layers["places"].post_process = drop_pois
    prof.post_process_tile = tag_tile
    df = flagship.tiles_ds(SF, zooms=[2], n_buckets=8, profile=prof).to_pandas()
    row = df.sort_values("n_features", ascending=False).iloc[0]
    d = mvt.decode_tile(mvt.gunzip_tile(row.tile_gz))
    for f in d["places"]["features"]:
        assert "poi_id" not in f["attrs"]
        assert f["attrs"]["zxy"] == f"2/{int(row.tile_x)}/{int(row.tile_y)}"


def test_fused_encode_matches_generic_path(ray_session):
    """The fused per-layer wire-byte fast path (no merging, no hooks) must be
    byte-identical to the generic feature-dict -> encode_tile path.  Forcing
    an identity post_process on every layer disables the fast path without
    changing semantics, so the gzipped tile bytes must match exactly."""
    from planetiler_ray.pipelines import flagship
    from planetiler_ray.pipelines.profile import flagship_profile

    generic = flagship_profile()
    for spec in generic.layers.values():
        spec.post_process = lambda feats, z: feats  # forces generic path

    a = flagship.tiles_ds(SF, zooms=[0, 2, 4], n_buckets=16).to_pandas()
    b = flagship.tiles_ds(SF, zooms=[0, 2, 4], n_buckets=16,
                          profile=generic).to_pandas()
    a = a.sort_values("tile_id", ignore_index=True)
    b = b.sort_values("tile_id", ignore_index=True)
    assert list(a.tile_id) == list(b.tile_id)
    assert (a.n_features == b.n_features).all()
    assert all(x == y for x, y in zip(a.tile_gz, b.tile_gz))
