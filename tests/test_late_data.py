"""Watermark / late-data census: the distributed carry-in prefix must
reproduce the sequential single-pass running max exactly, including
across bucket boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(n=500, seed=7):
    rng = np.random.default_rng(seed)
    # arrival order = event_id; event time wanders with occasional big
    # backward jumps so some events are late at every delay scale
    steps = rng.integers(-1_200_000_000, 2_000_000_000, n)
    tu = np.maximum.accumulate(np.cumsum(steps)) - np.cumsum(
        np.abs(steps) // 3
    )
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (base + tu - tu.min()).astype("datetime64[us]"),
        "user_id": rng.integers(0, 50, n).astype(np.int64),
        "event_type": np.array(["view", "click", "purchase"])[
            rng.integers(0, 3, n)],
        "value": rng.random(n),
        "props": ["{}"] * n,
    })


def _reference(df, delay_us):
    tu = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    wm = np.maximum.accumulate(
        np.concatenate([[np.int64(-(2 ** 62))], tu]))[:-1]
    late = tu < wm - delay_us
    return (
        pd.DataFrame({"event_type": df["event_type"], "late": late})
        .groupby("event_type", as_index=False)
        .agg(n_events=("late", "size"), n_late=("late", "sum"))
        .sort_values("event_type", ignore_index=True)
    )


def test_late_data_matches_sequential(ray_session, tmp_path):
    from planetiler_ray.pipelines.training import q_late_data

    df = _events()
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    # documents.parquet not needed by q_late_data
    delay = 600_000_000
    got = (
        q_late_data(str(tmp_path), delay_us=delay, n_buckets=16)
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    want = _reference(df, delay)
    assert (got["event_type"] == want["event_type"]).all()
    assert (got["n_events"].astype(int) == want["n_events"]).all()
    assert (got["n_late"].astype(int) == want["n_late"].astype(int)).all()
    assert got["n_late"].sum() > 0  # the corpus actually exercises lateness
