"""Spherical ring area (GeoUtils.ringAreaMeters parity) — kernel + query."""

import duckdb
import numpy as np

from planetiler_ray.geo.geomops import bbox_area_meters_vec, ring_area_meters

SF = "/root/testdata/sf0.001"


def test_bbox_matches_general_kernel():
    rng = np.random.default_rng(7)
    for _ in range(50):
        x1, x2 = np.sort(rng.uniform(-180, 180, 2))
        y1, y2 = np.sort(rng.uniform(-85, 85, 2))
        ring_x = np.array([x1, x2, x2, x1, x1])
        ring_y = np.array([y1, y1, y2, y2, y1])
        a = ring_area_meters(ring_x, ring_y)
        b = bbox_area_meters_vec([x1], [y1], [x2], [y2])[0]
        assert a == b


def test_ring_area_properties():
    # degenerate rings are zero
    assert ring_area_meters([0, 1, 0], [0, 0, 0]) == 0.0
    assert bbox_area_meters_vec([5.0], [10.0], [5.0], [40.0])[0] == 0.0
    # orientation-independent (reference takes abs)
    cw = ring_area_meters([0, 0, 1, 1, 0], [0, 1, 1, 0, 0])
    ccw = ring_area_meters([0, 1, 1, 0, 0], [0, 0, 1, 1, 0])
    assert cw == ccw > 0
    # 1x1 deg at the equator ~ 12,360 km^2 (turf formula magnitude check)
    assert 1.2e10 < cw < 1.3e10
    # shrinks toward the pole
    polar = ring_area_meters([0, 1, 1, 0, 0], [80, 80, 81, 81, 80])
    assert polar < cw / 4


def test_extent_area_parity(ray_session):
    import __ray_entry__ as e
    from planetiler_ray.pipelines import webgeo

    df = (webgeo.q_extent_area(SF).to_pandas()
          .sort_values("doc_id", ignore_index=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = (con.execute(e.oracle_sql()["extent_area"]).fetchdf()
           .sort_values("doc_id", ignore_index=True))
    assert len(df) == len(exp) > 0
    for col in ["doc_id", "n_mentions", "area_m2"]:
        np.testing.assert_array_equal(
            df[col].to_numpy().astype(np.int64),
            exp[col].to_numpy().astype(np.int64))
