"""Morton codes, quadtree coverings, tile-pyramid rollup and the
morton_cover index-pushdown query — kernel pins + DuckDB oracle parity."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_morton_roundtrip():
    from planetiler_ray.geo import morton

    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 14, 4096)
    y = rng.integers(0, 1 << 14, 4096)
    m = morton.xy_to_morton(x, y)
    rx, ry = morton.morton_to_xy(m)
    np.testing.assert_array_equal(rx, x)
    np.testing.assert_array_equal(ry, y)
    # prefix property: the parent cell's code is the child's code >> 2
    mp = morton.xy_to_morton(x >> 1, y >> 1)
    np.testing.assert_array_equal(mp, np.asarray(m) >> 2)


def test_cover_ranges_exact_membership():
    """The covering must contain EXACTLY the codes of tiles in the box
    (quadtree descent emits whole-subtree ranges only when fully inside,
    so after merging the ranges are tight, not just a superset)."""
    from planetiler_ray.geo import morton

    z = 6
    n = 1 << z
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    codes = morton.xy_to_morton(xs.ravel(), ys.ravel())
    for box in [(3, 17, 5, 40), (0, n - 1, 0, n - 1), (10, 10, 20, 20),
                (0, 5, n - 7, n - 1)]:
        x_lo, x_hi, y_lo, y_hi = box
        ranges = morton.cover_ranges(x_lo, x_hi, y_lo, y_hi, z)
        inside = (
            (xs.ravel() >= x_lo) & (xs.ravel() <= x_hi)
            & (ys.ravel() >= y_lo) & (ys.ravel() <= y_hi)
        )
        in_ranges = np.zeros(len(codes), bool)
        for lo, hi in ranges:
            in_ranges |= (codes >= lo) & (codes <= hi)
        np.testing.assert_array_equal(in_ranges, inside)
        # merged: strictly increasing, non-adjacent
        for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
            assert a_hi + 1 < b_lo
    assert morton.cover_ranges(5, 4, 0, 0, z) == []


def test_cover_ranges_bounded_by_perimeter():
    from planetiler_ray.geo import morton

    z = 12
    ranges = morton.cover_ranges(100, 3000, 50, 2000, z)
    # O(perimeter) not O(area): the box holds ~5.7M tiles
    assert len(ranges) < 6000


def test_tile_pyramid_oracle_parity(ray_session):
    import __ray_entry__ as e
    from planetiler_ray.pipelines import webgeo

    df = (
        webgeo.q_tile_pyramid(SF)
        .to_pandas()
        .sort_values("z", ignore_index=True)
    )
    exp = _con().execute(e.oracle_sql()["tile_pyramid"]).fetchdf()
    assert len(df) == len(exp) == 13
    # conservation: every zoom sees the same mention total
    assert df["n_mentions"].nunique() == 1
    for col in ["z", "n_tiles", "n_mentions", "n_max", "x_sum", "y_sum", "wsum"]:
        np.testing.assert_array_equal(
            df[col].to_numpy().astype(np.int64),
            exp[col].to_numpy().astype(np.int64),
        ), col


def test_morton_cover_oracle_parity(ray_session):
    import __ray_entry__ as e
    from planetiler_ray.pipelines import webgeo

    df = (
        webgeo.q_morton_cover(SF)
        .to_pandas()
        .sort_values("bbox_id", ignore_index=True)
    )
    exp = _con().execute(e.oracle_sql()["morton_cover"]).fetchdf()
    assert len(df) == len(exp) == len(webgeo.MORTON_BBOXES_MDEG)
    for col in ["bbox_id", "n_ranges", "n_candidates", "n_exact"]:
        np.testing.assert_array_equal(
            df[col].to_numpy().astype(np.int64),
            exp[col].to_numpy().astype(np.int64),
        ), col
    # the index scan must be a superset of the refined answer
    assert (df["n_candidates"] >= df["n_exact"]).all()
    assert (df["n_exact"] > 0).any()
