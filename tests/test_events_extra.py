"""Edge cases for the late-round event/incremental operators (the sf-table
gate only sees the happy path)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(rows):
    import ray

    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["tsu"], unit="us")
    return ray.data.from_pandas(
        df[["event_id", "ts", "user_id", "event_type", "value"]]
        if "value" in df.columns
        else df[["event_id", "ts", "user_id", "event_type"]]
    )


def test_funnel_order_matters(ray_session):
    from planetiler_ray.stages.events import funnel

    rows = [
        # user 1: view -> click -> purchase (fully converts)
        {"event_id": 1, "tsu": 100, "user_id": 1, "event_type": "view"},
        {"event_id": 2, "tsu": 200, "user_id": 1, "event_type": "click"},
        {"event_id": 3, "tsu": 300, "user_id": 1, "event_type": "purchase"},
        # user 2: click BEFORE any view -> only level 1 (its view) counts
        {"event_id": 4, "tsu": 100, "user_id": 2, "event_type": "click"},
        {"event_id": 5, "tsu": 200, "user_id": 2, "event_type": "view"},
        {"event_id": 6, "tsu": 150, "user_id": 2, "event_type": "purchase"},
        # user 3: no view at all -> no levels
        {"event_id": 7, "tsu": 100, "user_id": 3, "event_type": "purchase"},
    ]
    out = funnel(_events(rows)).to_pandas()
    assert out["n_s1"].tolist() == [2]  # users 1 and 2 viewed
    assert out["n_s2"].tolist() == [1]  # only user 1 clicked after viewing
    assert out["n_s3"].tolist() == [1]


def test_corpus_diff_statuses(ray_session):
    import ray

    from planetiler_ray.stages.incremental import corpus_diff

    old = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    )
    new = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [2, 3, 4], "text": ["b", "CHANGED", "d"]})
    )
    out = corpus_diff(old, new).to_pandas().set_index("doc_id")["status"]
    assert out[1] == "removed"
    assert out[2] == "same"
    assert out[3] == "changed"
    assert out[4] == "added"


def test_window_ohlc_partial_merge_matches_single_batch(ray_session):
    """Splitting the input into many tiny blocks must not change open/close
    (candidate partials merge correctly)."""
    import ray

    from planetiler_ray.stages.events import window_ohlc

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "tsu": rng.integers(0, 4 * 3600 * 1_000_000, size=n),
            "user_id": rng.integers(0, 10, size=n),
            "event_type": rng.choice(["view", "click"], size=n),
            "value": rng.normal(10, 3, size=n).round(2),
        }
    )
    one = window_ohlc(_events(df.to_dict("records"))).to_pandas()
    many = window_ohlc(
        _events(df.to_dict("records")).repartition(37)
    ).to_pandas()
    key = ["event_type", "window_id"]
    a = one.sort_values(key, ignore_index=True)
    b = many.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)

def test_running_total_segments_and_negatives(ray_session):
    import ray.data

    from planetiler_ray.stages.events import running_total

    rows = [
        # user 1: 3 events out of ts order across batches; one negative
        {"event_id": 3, "user_id": 1, "ts": 300, "value": -2.5},
        {"event_id": 1, "user_id": 1, "ts": 100, "value": 10.0},
        {"event_id": 2, "user_id": 1, "ts": 200, "value": 0.25},
        # user 65 lands in bucket 1 (65 % 64) with user 1: separate segment
        {"event_id": 4, "user_id": 65, "ts": 50, "value": 7.0},
        {"event_id": 5, "user_id": 65, "ts": 60, "value": 1.0},
        # same-ts tie ordered by event_id
        {"event_id": 7, "user_id": 2, "ts": 10, "value": 1.0},
        {"event_id": 6, "user_id": 2, "ts": 10, "value": 2.0},
    ]
    import pandas as pd
    import pyarrow as pa

    t = pa.table(
        {
            "event_id": [r["event_id"] for r in rows],
            "user_id": [r["user_id"] for r in rows],
            "ts": pa.array(
                pd.to_datetime([r["ts"] for r in rows], unit="us"),
                pa.timestamp("us"),
            ),
            "value": [r["value"] for r in rows],
        }
    )
    out = (running_total(ray.data.from_arrow(t)).to_pandas()
           .set_index("event_id")["running_cents"])
    assert out[1] == 1000 and out[2] == 1025 and out[3] == 775
    assert out[4] == 700 and out[5] == 800
    assert out[6] == 200 and out[7] == 300

def test_event_seq_ordering_and_pivot_missing_types(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from planetiler_ray.stages.events import event_seq, pivot_counts

    t = pa.table(
        {
            "event_id": [2, 1, 3, 4],
            "user_id": [1, 1, 1, 65],
            "ts": pa.array(pd.to_datetime([20, 10, 10, 5], unit="us"),
                           pa.timestamp("us")),
            "event_type": ["click", "view", "purchase", "signup"],
        }
    )
    ds = ray.data.from_arrow(t)
    seq = event_seq(ds).to_pandas().set_index("user_id")
    # user 1: ts=10 ties -> event_id order (1 view, 3 purchase), then click
    assert seq.loc[1, "seq"] == "vpc" and seq.loc[1, "n_events"] == 3
    assert seq.loc[65, "seq"] == "s"
    # pivot: types absent from the batch still come out as zero columns
    piv = pivot_counts(ds).to_pandas().set_index("user_id")
    assert piv.loc[1, "n_click"] == 1 and piv.loc[1, "n_error"] == 0
    assert set(piv.columns) == {"n_click", "n_error", "n_purchase",
                                "n_signup", "n_view"}

def test_interval_join_window_boundaries(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from planetiler_ray.stages.events import WINDOW_US, T0_US, interval_join_views

    W = WINDOW_US
    base = T0_US + 10 * W
    rows = [
        # purchase at base: views at exactly -W (in), -W-1 (out), -1 (in),
        # 0 (out: half-open [t-W, t)), plus another user's view (out)
        ("view", 1, base - W, 1),
        ("view", 1, base - W - 1, 2),
        ("view", 1, base - 1, 3),
        ("view", 1, base, 4),
        ("view", 2, base - 5, 5),
        ("purchase", 1, base, 6),
        ("purchase", 3, base, 7),  # user with no views at all
    ]
    t = pa.table(
        {
            "event_type": [r[0] for r in rows],
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                pd.to_datetime([r[2] for r in rows], unit="us"),
                pa.timestamp("us"),
            ),
            "event_id": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    out = (interval_join_views(ray.data.from_arrow(t)).to_pandas()
           .set_index("event_id")["n_prior_views"])
    assert out[6] == 2  # -W and -1 count; -W-1 and 0 do not
    assert out[7] == 0


def test_pareto_front_matches_dominance_definition(ray_session):
    """The staircase reduction equals the brute NOT-EXISTS dominance front
    on distinct pairs, regardless of how rows are split into batches."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from planetiler_ray.stages.events import pareto_front

    rng = np.random.default_rng(11)
    n = 400
    vals = rng.integers(0, 50, n) / 100.0 * 100  # coarse grid -> many ties
    ts = pd.to_datetime(rng.integers(0, 10**6, n), unit="us")
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts), "value": pa.array(vals, pa.float64())})
    ).repartition(7)
    got = {(r["cents"], r["tsu"]) for r in pareto_front(ds).take_all()}

    cents = np.round(vals * 100).astype(np.int64)
    tsu = ts.astype("int64").to_numpy()
    pairs = set(zip(cents.tolist(), tsu.tolist()))
    want = {
        (x, y)
        for (x, y) in pairs
        if not any(
            (qx >= x and qy >= y and (qx > x or qy > y)) for (qx, qy) in pairs
        )
    }
    assert got == want and got
