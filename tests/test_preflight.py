"""Resource-preflight accuracy: estimates from a bounded sample must land
within 2x of a measured run (the Planetiler pre-run estimate contract)."""

import pytest

SF = "/root/testdata/sf0.01"
ZOOMS = [0, 2, 4, 6]


@pytest.fixture(scope="module")
def plan_and_actual(ray_session):
    from planetiler_ray.pipelines import flagship
    from planetiler_ray.pipelines.preflight import estimate_build

    est = estimate_build(SF, zooms=ZOOMS, sample_rows=250)
    rows_ds = flagship.tile_rows_ds(SF, zooms=ZOOMS).materialize()
    actual_rows = rows_ds.count()
    actual_bytes = rows_ds.size_bytes()
    tiles = flagship.tiles_ds(SF, zooms=ZOOMS).count()
    return est, actual_rows, actual_bytes, tiles


def _within_2x(est, actual):
    return actual / 2 <= est <= actual * 2


def test_row_estimate_within_2x(plan_and_actual):
    est, actual_rows, _, _ = plan_and_actual
    assert _within_2x(est["est_shuffle_rows"], actual_rows), (
        est["est_shuffle_rows"], actual_rows)


def test_shuffle_bytes_within_2x(plan_and_actual):
    est, _, actual_bytes, _ = plan_and_actual
    assert _within_2x(est["est_shuffle_bytes"], actual_bytes), (
        est["est_shuffle_bytes"], actual_bytes)


def test_tile_bounds_bracket_actual(plan_and_actual):
    est, _, _, tiles = plan_and_actual
    assert est["est_tiles_min"] <= tiles <= est["est_tiles_max"]


def test_bucket_warning_fires(ray_session):
    from planetiler_ray.pipelines.preflight import estimate_build, format_plan

    est = estimate_build(SF, zooms=ZOOMS, sample_rows=100, repl=1000,
                         n_buckets=1)
    assert any("rows/bucket" in w for w in est["warnings"])
    assert "WARNING" in format_plan(est)
