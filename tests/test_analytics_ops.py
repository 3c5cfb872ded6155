"""Invariant tests for the analytics/eval operators added in the round-4
continuation (the exact-oracle gate pins full values at two sfs; these
pin semantics that survive refactors)."""

import numpy as np
import pandas as pd


def test_line_of_sight_pairs_and_flags(ray_session, sf_dir):
    from planetiler_ray.pipelines import webgeo

    out = webgeo.q_line_of_sight(sf_dir, k=6).to_pandas()
    assert len(out) == 6 * 5 // 2                 # all tower pairs
    assert (out["cell_a"] < out["cell_b"]).all()  # canonical order
    assert ((out["visible"] == 1) == (out["n_blockers"] == 0)).all()


def test_burst_hours_never_fires_without_history(ray_session, sf_dir):
    from planetiler_ray.pipelines import training

    out = training.q_burst_hours(sf_dir).to_pandas()
    # burst requires n * 24 > 2 * trail by definition
    assert (out["n"] * 24 > 2 * out["trail"]).all()


def test_trend_slope_denominator_positive(ray_session, sf_dir):
    from planetiler_ray.pipelines import training

    out = training.q_trend_slope(sf_dir).to_pandas()
    # Cauchy-Schwarz: n*Sxx - Sx^2 > 0 unless all hours identical
    assert (out["slope_den"] > 0).all()
    assert (out["n_hours"] > 1).all()


def test_readability_monotonic_pieces(ray_session):
    import ray
    import pyarrow.parquet  # noqa: F401

    from planetiler_ray.stages.text import readability

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["Short one. Yes!", "aeiou " * 50 + "."],
    })
    out = readability(ray.data.from_pandas(docs)).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[1, "n_sentences"] == 2
    assert out.loc[2, "n_vowel_groups"] == 50
    # many syllables per word -> lower score
    assert out.loc[2, "flesch_milli"] < out.loc[1, "flesch_milli"]


def test_decay_score_recent_beats_old(ray_session):
    import ray

    from planetiler_ray.stages.events import decay_score

    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-03 00:00"])
    ev = pd.DataFrame({
        "event_type": ["old", "new"],
        "ts": ts,
        "value": [1.00, 1.00],
    })
    out = decay_score(ray.data.from_pandas(ev)).to_pandas()
    out = out.set_index("event_type")
    assert out.loc["new", "heat"] == 100          # age 0 -> full cents
    assert out.loc["old", "heat"] == 0            # 48h of halving -> 0


def test_rolling_active_bounds(ray_session, sf_dir):
    from planetiler_ray.pipelines import training

    roll = training.q_rolling_active(sf_dir).to_pandas()
    hourly = training.q_rolling_active(sf_dir, w=1).to_pandas()
    m = roll.merge(hourly, on="h", suffixes=("_24", "_1"))
    # a 24h window can never contain fewer distinct users than its last hour
    assert (m["active_users_24"] >= m["active_users_1"]).all()


def test_knn_classify_shape_and_votes(ray_session, sf_dir):
    from planetiler_ray.pipelines import training

    out = training.q_knn_classify(sf_dir).to_pandas()
    assert len(out) == 16
    assert (out["votes"] >= 1).all() and (out["votes"] <= 5).all()


def test_geoparquet_roundtrip_identity(ray_session, sf_dir):
    from planetiler_ray.pipelines import webgeo

    got = webgeo.q_geoparquet_roundtrip(sf_dir).to_pandas()
    want = webgeo.q_geoparse(sf_dir).to_pandas()
    cols = ["doc_id", "mention_idx", "lat_mdeg", "lon_mdeg"]
    a = got[cols].sort_values(cols, ignore_index=True)
    b = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(a.astype(np.int64), b.astype(np.int64))


def test_active_seconds_bounds(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from planetiler_ray.pipelines import training

    out = training.q_active_seconds(sf_dir).to_pandas()
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    n_events = ev.num_rows
    n_users = len(set(ev["user_id"].to_pylist()))
    assert len(out) == n_users
    w = 1_800_000_000
    # covered time is at least one window per user, at most one per event
    assert (out["covered_us"] >= w).all()
    assert out["covered_us"].sum() <= n_events * w


def test_flow_accumulation_conservation(ray_session, sf_dir):
    from planetiler_ray.pipelines import webgeo

    out = webgeo.q_flow_accumulation(sf_dir).to_pandas()
    # every cell contributes exactly itself once: sink accumulations
    # partition the cell set
    assert out.loc[out["is_sink"] == 1, "acc"].sum() >= len(out)
    assert (out["acc"] >= 1).all()
    # sinks are local density maxima: acc mass conservation — the sum of
    # accumulation over sinks counts each cell once per terminal path
    n_cells = len(out)
    assert out.loc[out["is_sink"] == 1, "acc"].sum() == n_cells


def test_basin_depth_sinks_match_flow(ray_session, sf_dir):
    from planetiler_ray.pipelines import webgeo

    depth = webgeo.q_basin_depth(sf_dir).to_pandas().set_index("depth")
    flow = webgeo.q_flow_accumulation(sf_dir).to_pandas()
    # depth-0 cells are exactly the sinks
    assert depth.loc[0, "n_cells"] == int(flow["is_sink"].sum())
    assert depth["n_cells"].sum() == len(flow)
