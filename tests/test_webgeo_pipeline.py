"""End-to-end pipeline tests over the sf0.001 tables (uses the session Ray
fixture; mirrors the reference's PlanetilerTests in-memory strategy)."""

import numpy as np
import pandas as pd
import pytest

from planetiler_ray.sources import pages as P
from planetiler_ray.sources import world as W
from planetiler_ray.stages.geoparse import parse_mentions


def test_extract_invariant_no_ray():
    """Per-row invariant: extract(html) is byte-identical to text."""
    doc_id = np.arange(57)
    base = pd.Series(["hello & <world> " + str(i) for i in doc_id])
    text = P.build_text(doc_id, base)
    html = P.build_html(doc_id, text)
    extracted = P.extract_text_series(html)
    assert (extracted == text).all()


def test_parse_matches_formula_no_ray():
    doc_id = np.arange(200)
    base = pd.Series(["plain words only"] * len(doc_id))
    text = P.build_text(doc_id, base)
    got = parse_mentions(text, doc_id)
    # expected from the arithmetic model
    rows = []
    for d in doc_id:
        n_m = d % 4
        for j in range(n_m):
            la, lo = P.mention_mdeg(np.array([d]), j)
            rows.append((d, j, int(la[0]), int(lo[0])))
        if d % P.HOT_EVERY == 0:
            la, lo = P.hot_mdeg(np.array([d]))
            rows.append((d, n_m, int(la[0]), int(lo[0])))
    exp = pd.DataFrame(rows, columns=["doc_id", "mention_idx", "lat_mdeg", "lon_mdeg"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), exp.astype("int64")
    )


def test_decoys_rejected():
    text = pd.Series([P.DECOY_SUFFIX, "(12.345, 67.890) ok"])
    got = parse_mentions(text, np.array([0, 1]))
    assert got["doc_id"].tolist() == [1]
    assert got["lat_mdeg"].tolist() == [12345]


def test_admin_rects_partition_the_world():
    """Every mention-grid point belongs to exactly one admin rect."""
    lat_m = np.arange(-85000, 85000, 7717)
    lon_m = np.arange(-180000, 180000, 13313)
    from planetiler_ray.geo.pip import PolygonIndex

    polys = [(k, [W.admin_ring(k)]) for k in range(25)]
    idx = PolygonIndex(polys)
    lons, lats = np.meshgrid(lon_m / 1000.0, lat_m / 1000.0)
    got = idx.get_containing(lons.ravel(), lats.ravel())
    assert (got >= 0).all()
    # formula cross-check
    col = np.floor((lons.ravel() - (-180.0 - W.ADMIN_EDGE_OFF)) / W.ADMIN_LON_W).astype(int)
    row = np.floor((lats.ravel() - (-85.0 - W.ADMIN_EDGE_OFF)) / W.ADMIN_LAT_H).astype(int)
    np.testing.assert_array_equal(got, row * W.ADMIN_COLS + col)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert {"z", "tile_x", "tile_y", "n_features", "n_bytes"} <= set(df.columns)
    # the hot Paris z6 tile exists (label-grid caps its point count, so it
    # need not be the biggest); q_tile_counts asserts the raw skew separately
    z6 = df[df["z"] == 6]
    assert ((z6["tile_x"] == 32) & (z6["tile_y"] == 22)).any()


def test_tile_counts_hot_tile(ray_session):
    from planetiler_ray.pipelines import webgeo

    df = webgeo.q_tile_counts("/root/testdata/sf0.001").to_pandas()
    z6 = df[df["z"] == 6]
    top = z6.sort_values("n", ascending=False).iloc[0]
    assert (top["tile_x"], top["tile_y"]) == (32, 22)  # the synthetic skew knob


def test_queries_have_oracles():
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    # the core 5 are oracle-checked
    assert {"pages_meta", "geoparse", "tile_counts", "pip_join", "knn_join"} <= set(os_)


def test_real_pages_parquet_input(ray_session, tmp_path):
    """Production entry: materialized pages parquet -> identical mentions."""
    from planetiler_ray.pipelines import webgeo

    out = str(tmp_path / "pages")
    webgeo.write_pages_parquet("/root/testdata/sf0.001", out)
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(out + "/*.parquet")
    schema = pq.ParquetFile(files[0]).schema_arrow
    assert {"url", "warc_ts", "html", "text", "lang"} <= set(schema.names)
    a = (
        webgeo.mentions_from_pages(out)
        .to_pandas()
        .sort_values(["doc_id", "mention_idx"], ignore_index=True)
    )
    b = (
        webgeo.mentions_ds("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["doc_id", "mention_idx"], ignore_index=True)
    )
    assert (a["lat_mdeg"] == b["lat_mdeg"]).all()
    assert (a["lon_mdeg"] == b["lon_mdeg"]).all()


def test_progress_counters(ray_session):
    import ray

    from planetiler_ray.pipelines import webgeo
    from planetiler_ray.state.progress import Counters, count_stage

    counters = Counters.get()
    ray.get(counters.reset.remote())
    ds = webgeo.mentions_ds("/root/testdata/sf0.001").map_batches(
        count_stage("mentions"), batch_format="pyarrow"
    )
    n = ds.count()
    import time

    time.sleep(1)  # fire-and-forget increments drain
    snap = ray.get(counters.snapshot.remote())
    assert snap["counts"].get("mentions") == n


def test_min_pixel_size_suppression():
    """FIXTURES golden case 4: small polygons are suppressed at low zooms."""
    import numpy as np

    from planetiler_ray.stages.render import render_geometry_rows

    # ~0.1 deg square: ~0.07px at z0, big at z10
    ring = np.array([[10.0, 10.0], [10.1, 10.0], [10.1, 10.1], [10.0, 10.1], [10.0, 10.0]])
    rows = list(render_geometry_rows(1, "polygon", [ring], "t", {}, 0, 10,
                                     min_pixel_size=1.0))
    zs = sorted({r["z"] for r in rows})
    assert 0 not in zs and 2 not in zs  # suppressed at low zoom
    assert 10 in zs                      # present at high zoom
    # threshold monotone: once visible, stays visible
    assert zs == list(range(zs[0], 11))


def test_url_parse_kernel(ray_session):
    from planetiler_ray.pipelines import webgeo

    t = webgeo.q_url_parse("/root/testdata/sf0.001").take_batch(50, batch_format="pandas")
    for url, host, path, depth in zip(t["url"], t["host"], t["path"], t["depth"]):
        assert url == f"https://{host}{path}"
        assert depth == path.count("/")


def test_domain_cap_trims_multi_page_domains(ray_session, tmp_path):
    """Hosts collide when doc_ids span >997 (host = doc_id % 997): the cap
    must keep exactly the k smallest doc_ids per host."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from planetiler_ray.pipelines import webgeo

    # example5.com gets 3 pages (5, 1002, 1999), example7.com gets 2 (7, 1004)
    ids = [5, 1002, 1999, 7, 1004, 42]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([f"body {i}" for i in ids]),
                "lang": pa.array(["en"] * len(ids)),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        webgeo.q_domain_cap(str(tmp_path), k=2)
        .to_pandas()
        .sort_values(["host", "doc_id"])
        .reset_index(drop=True)
    )
    kept = df.groupby("host")["doc_id"].apply(list).to_dict()
    assert kept["example5.com"] == [5, 1002]       # 1999 trimmed
    assert kept["example7.com"] == [7, 1004]
    assert kept["example42.com"] == [42]
    assert len(df) == 5


@pytest.mark.parametrize("small_cells", [1 << 22, 0],
                         ids=["driver-unionfind", "distributed"])
def test_raster_regions_stage(ray_session, small_cells):
    """L-shaped 3-cell region + singleton + below-threshold cell, z=3.
    Runs both labeling paths: the bounded-raster driver union-find and the
    distributed min-label propagation (forced via small_cells=0)."""
    import math

    import ray.data

    from planetiler_ray.stages.tiling import raster_regions

    def cell_latlon(x, y, z=3):
        n = 1 << z
        lon = (x + 0.5) / n * 360.0 - 180.0
        wy = (y + 0.5) / n
        lat = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * wy))))
        return lat, lon

    rows = []
    for cx, cy, npts in [(1, 1, 2), (2, 1, 2), (2, 2, 2), (5, 5, 2), (6, 6, 1)]:
        lat, lon = cell_latlon(cx, cy)
        rows += [{"lat": lat, "lon": lon}] * npts
    out = (
        raster_regions(ray.data.from_items(rows), z=3, threshold=2,
                       small_cells=small_cells)
        .to_pandas()
        .sort_values("region_id")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    big = out.iloc[0]
    assert big.region_id == 1 * 8 + 1 and big.n_cells == 3 and big.n_points == 6
    assert (big.min_x, big.min_y, big.max_x, big.max_y) == (1, 1, 2, 2)
    assert big.perimeter == 8  # L-tromino: 4*3 cells - 2*2 internal edges
    single = out.iloc[1]
    assert single.region_id == 5 * 8 + 5 and single.n_cells == 1 and single.n_points == 2
    assert single.perimeter == 4


def test_zonal_stats_stage(ray_session):
    """Two zones; cells assigned by half-open tile ranges; max/sum/count."""
    import ray.data

    from planetiler_ray.stages.tiling import zonal_stats

    # zone 0: lon [-180, -90), lat [-85, 0); zone 1: lon [0, 90), lat [0, 85)
    rects = [(0, -180.0, -85.0, -90.0, 0.0), (1, 0.0, 0.0, 90.0, 85.0)]
    rows = (
        [{"lat": -40.0, "lon": -120.0}] * 3   # one hot cell in zone 0
        + [{"lat": -41.0, "lon": -100.0}]     # second zone-0 cell
        + [{"lat": 40.0, "lon": 45.0}] * 2    # zone 1
        + [{"lat": 40.0, "lon": 120.0}]       # outside every zone: dropped
    )
    out = (
        zonal_stats(ray.data.from_items(rows), rects, z=6)
        .to_pandas()
        .sort_values("zone_id")
        .reset_index(drop=True)
    )
    assert out["zone_id"].tolist() == [0, 1]
    z0 = out.iloc[0]
    assert (z0.n_cells, z0.n_points, z0.max_cell_n) == (2, 4, 3)
    z1 = out.iloc[1]
    assert (z1.n_cells, z1.n_points, z1.max_cell_n) == (1, 2, 2)


def test_raster_distance_stage(ray_session):
    """Single occupied cell at (4,4), z=3: dist ring sizes 1/4/8 (capped 2)."""
    import math

    import ray.data

    from planetiler_ray.stages.tiling import raster_distance

    n = 8
    lon = (4 + 0.5) / n * 360.0 - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * (4 + 0.5) / n))))
    out = (
        raster_distance(ray.data.from_items([{"lat": lat, "lon": lon}] * 2),
                        z=3, threshold=2, max_dist=2)
        .to_pandas()
    )
    by_d = out.groupby("dist")["cell"].count().to_dict()
    assert by_d == {0: 1, 1: 4, 2: 8}
    assert set(out[out.dist == 0]["cell"]) == {4 * 8 + 4}


def test_hex_ring1_neighbors_symmetric_no_ray():
    """Ring-1 is symmetric: b in ring(a) <=> a in ring(b); 6 distinct ids."""
    from planetiler_ray.geo import hexgrid

    cid = hexgrid.hex_cell(np.array([0.37]), np.array([0.61]), 7)
    ring = hexgrid.hex_ring1(cid)[0]
    assert len(set(ring.tolist())) == 6 and cid[0] not in ring
    for nbr in ring:
        back = hexgrid.hex_ring1(np.array([nbr]))[0]
        assert cid[0] in back
