"""Raster buffer-union-unbuffer merge tests (mergeNearbyPolygons / z13
building-merge semantics on the tile lattice)."""

import numpy as np
import pytest

from planetiler_ray.geo.pip import points_in_polygon
from planetiler_ray.geo.rasterunion import (
    rasterize_rings,
    trace_contours,
    union_buffer_unbuffer,
)


def _sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        dtype=float,
    )


def test_rasterize_and_trace_roundtrip():
    m = rasterize_rings([_sq(50, 50, 100)], res=256)
    assert abs(m.sum() - (100 * 256 / 264) ** 2) < 200
    rings = trace_contours(m)
    assert len(rings) == 1
    r = rings[0]
    assert (r[0] == r[-1]).all()


def test_union_merges_nearby_only_with_buffer():
    a, b = [_sq(10, 10, 50)], [_sq(66, 10, 50)]
    assert len(union_buffer_unbuffer([a, b], buffer_px=0)) == 2
    merged = union_buffer_unbuffer([a, b], buffer_px=6)
    assert len(merged) == 1
    # merged ring spans both squares
    xs = merged[0][:, 0]
    assert xs.min() < 12 and xs.max() > 114


def test_union_preserves_holes():
    rings = union_buffer_unbuffer([[_sq(10, 10, 100), _sq(40, 40, 30)]], buffer_px=0)
    assert len(rings) == 2
    assert not points_in_polygon(np.array([55.0]), np.array([55.0]), rings)[0]
    assert points_in_polygon(np.array([20.0]), np.array([20.0]), rings)[0]


def test_min_area_filter():
    tiny = [_sq(10, 10, 1)]
    big = [_sq(100, 100, 50)]
    out = union_buffer_unbuffer([tiny, big], buffer_px=0, min_area_px=4.0)
    assert len(out) == 1  # the 1px sliver is dropped


def test_building_merge_in_assembler(ray_session):
    """Many small same-attr squares in one tile merge to few polygons."""
    import pyarrow as pa

    from planetiler_ray.geo import mvt, wkb
    from planetiler_ray.pipelines.profile import LayerSpec, TilingProfile
    from planetiler_ray.stages.assemble import make_tile_assembler

    prof = TilingProfile(name="b").add(
        LayerSpec(name="buildings", attr_cols=("cls",),
                  merge_polygons_union=True, merge_buffer_px=3.0)
    )
    # a 5x5 grid of 8px buildings with 4px gaps -> one merged blob
    rows = []
    fid = 0
    for i in range(5):
        for j in range(5):
            ring = _sq(40 + i * 12, 40 + j * 12, 8)
            rows.append(
                {"tile_id": 100, "z": 13, "tile_x": 1, "tile_y": 2,
                 "layer": "buildings", "kind": "polygon",
                 "geom_px": wkb.encode_wkb("polygon", [ring]),
                 "feature_id": fid, "px": float("nan"), "py": float("nan"),
                 "cls": "bld"}
            )
            fid += 1
    batch = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    out = make_tile_assembler(prof)(batch)
    d = mvt.decode_tile(mvt.gunzip_tile(out.column("tile_gz")[0].as_py()))
    feats = d["buildings"]["features"]
    assert len(feats) == 1  # one merged multipolygon feature
    assert out.column("n_features")[0].as_py() == 1
