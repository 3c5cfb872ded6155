"""geomops constructors + geojson source + stream sinks + stats tests."""

import json
import os

import numpy as np
import pytest

from planetiler_ray.geo import geomops as G


def test_centroid_and_area():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    np.testing.assert_allclose(G.centroid("polygon", [sq]), [2, 2])
    assert abs(G.ring_area(sq)) == 16
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    assert G.polygon_area([sq, hole]) == 15
    line = np.array([[0, 0], [2, 0], [2, 2]], dtype=float)
    assert G.line_length(line) == 4
    np.testing.assert_allclose(G.centroid("linestring", line), [1.5, 0.5])


def test_point_on_surface_with_hole():
    # C-shaped region: square with a hole covering the center line
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], dtype=float)
    p = G.point_on_surface([sq, hole])
    from planetiler_ray.geo.pip import points_in_polygon

    assert points_in_polygon(np.array([p[0]]), np.array([p[1]]), [sq, hole])[0]


def test_point_along_line_and_partial():
    line = np.array([[0, 0], [10, 0]], dtype=float)
    np.testing.assert_allclose(G.point_along_line(line, 0.25), [2.5, 0])
    np.testing.assert_allclose(G.line_midpoint(line), [5, 0])
    part = G.partial_line(np.array([[0, 0], [4, 0], [10, 0]], dtype=float), 0.25, 0.75)
    np.testing.assert_allclose(part[0], [2.5, 0])
    np.testing.assert_allclose(part[-1], [7.5, 0])
    assert any((p == [4, 0]).all() for p in part)


def test_geojson_roundtrip(ray_session, tmp_path):
    from planetiler_ray.geo import wkb
    from planetiler_ray.sources.geojson import read_geojson, read_ndjson_features

    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "id": 7, "properties": {"name": "a"},
             "geometry": {"type": "Point", "coordinates": [1.5, 2.5]}},
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Polygon",
                          "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}},
        ],
    }
    p = tmp_path / "x.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson(str(p)).to_pandas()
    assert len(df) == 2
    k, d = wkb.decode_wkb(df.iloc[0]["geom_wkb"])
    assert k == "point" and tuple(d) == (1.5, 2.5)
    # NDJSON
    nd = tmp_path / "x.ndjson"
    nd.write_text("\n".join(json.dumps(f) for f in fc["features"]))
    df2 = read_ndjson_features(str(nd)).to_pandas()
    assert len(df2) == 2
    pt = df2[df2["geom_type"] == "point"].iloc[0]
    assert json.loads(pt["properties"])["name"] == "a"


def test_stream_sinks_and_stats(ray_session, tmp_path):
    import base64

    import ray.data

    from planetiler_ray.pipelines import flagship, stats
    from planetiler_ray.pipelines.profile import flagship_profile
    from planetiler_ray.sinks.streams import write_csv_archive, write_json_archive

    tiles = flagship.tiles_ds("/root/testdata/sf0.001", zooms=[2, 4], n_buckets=16)
    df = tiles.to_pandas()
    ds = ray.data.from_pandas(df)
    out_csv = str(tmp_path / "csv")
    write_csv_archive(ds, out_csv)
    files = [f for f in os.listdir(out_csv) if f.endswith(".csv")]
    assert files
    line = open(os.path.join(out_csv, files[0])).readlines()[1]
    z, x, y, b64 = line.strip().split(",")
    from planetiler_ray.geo import mvt

    blob = base64.b64decode(b64)
    row = df[(df.z == int(z)) & (df.tile_x == int(x)) & (df.tile_y == int(y))]
    assert blob == row.iloc[0].tile_gz
    # stats
    zs = stats.zoom_summary(ray.data.from_pandas(df))
    assert set(zs["z"]) == {2, 4}
    assert (zs["n_tiles"] > 0).all()
    big = stats.biggest_tiles(ray.data.from_pandas(df), 3)
    assert len(big) == 3 and big["n_bytes"].is_monotonic_decreasing
    meta = stats.archive_metadata(ray.data.from_pandas(df), flagship_profile())
    assert meta["tile_count"] == len(df)
