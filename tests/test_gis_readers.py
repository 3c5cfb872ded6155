"""Shapefile / GeoPackage reader round-trips (pure-spec parsers, no GDAL)."""

import numpy as np
import pyarrow as pa
import pytest

from planetiler_ray.geo import wkb


def test_geopackage_roundtrip(ray_session, tmp_path):
    from planetiler_ray.sources.geopackage import (list_feature_tables,
                                                   read_geopackage,
                                                   write_geopackage)

    path = str(tmp_path / "t.gpkg")
    sq = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    wkbs = [
        wkb.encode_wkb("point", np.array([[1.5, 2.5]])),
        wkb.encode_wkb("polygon", [sq]),
    ]
    write_geopackage(path, "features", ["name"], {"name": ["a", "b"]}, wkbs)
    assert list_feature_tables(path) == ["features"]
    df = read_geopackage(path, rows_per_task=1).to_pandas().sort_values("fid")
    assert list(df["name"]) == ["a", "b"]
    kind, pt = wkb.decode_wkb(df["geom_wkb"].iloc[0])
    assert kind == "point" and np.allclose(pt, [[1.5, 2.5]])
    kind, rings = wkb.decode_wkb(df["geom_wkb"].iloc[1])
    assert kind == "polygon" and np.allclose(rings[0], sq)


def test_shapefile_roundtrip(ray_session, tmp_path):
    from planetiler_ray.sources.shapefile import (read_shapefile,
                                                  write_shapefile)

    base = str(tmp_path / "shapes")
    sq = np.array([[0.0, 0], [0, 10], [10, 10], [10, 0], [0, 0]])  # CW outer
    hole = np.array([[2.0, 2], [6, 2], [6, 6], [2, 6], [2, 2]])    # CCW hole
    write_shapefile(
        base,
        kinds=["polygon", "polygon"],
        geoms=[[sq, hole], [sq + 20.0]],
        fields=[("name", "C", 10), ("rank", "N", 5)],
        attrs={"name": ["with_hole", "plain"], "rank": [3, 7]},
    )
    df = read_shapefile(base + ".shp", records_per_task=1).to_pandas()
    df = df.sort_values("name", ignore_index=True)
    assert list(df["name"]) == ["plain", "with_hole"]
    assert list(df["rank"]) == [7, 3]
    kind, rings = wkb.decode_wkb(df["geom_wkb"][df["name"] == "with_hole"].iloc[0])
    assert kind == "polygon" and len(rings) == 2  # hole re-nested
    kind2, rings2 = wkb.decode_wkb(df["geom_wkb"][df["name"] == "plain"].iloc[0])
    assert kind2 == "polygon" and len(rings2) == 1


def test_shapefile_points_and_lines(ray_session, tmp_path):
    from planetiler_ray.sources.shapefile import (read_shapefile,
                                                  write_shapefile)

    base = str(tmp_path / "pts")
    write_shapefile(
        base,
        kinds=["point", "point"],
        geoms=[np.array([3.0, 4.0]), np.array([-1.0, 2.0])],
        fields=[("id", "N", 4)],
        attrs={"id": [1, 2]},
    )
    df = read_shapefile(base + ".shp").to_pandas().sort_values("id")
    assert list(df["id"]) == [1, 2]
    kind, pt = wkb.decode_wkb(df["geom_wkb"].iloc[0])
    assert kind == "point" and np.allclose(pt, [[3, 4]])
